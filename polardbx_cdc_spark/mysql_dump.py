"""MySQL-protocol binlog dump endpoint — the COM_BINLOG_DUMP framing of
the reference's dump server (CdcServer.java:70,154 serves the same
contract over gRPC; the CN fronts it with the MySQL protocol so a stock
replica/`mysqlbinlog --read-from-remote-server` can attach). This module
implements the public client/server protocol subset that attach needs:

* server greeting (HandshakeV10) and HandshakeResponse41 acceptance —
  auth is accepted unconditionally (the slice serves localhost; real
  deployments front this with the platform's auth),
* ``COM_BINLOG_DUMP`` (0x12): [pos:4][flags:2][server_id:4][file] —
  streams every event from that byte position through the rotated chain,
  each event framed as a MySQL packet whose payload is ``0x00`` (OK)
  followed by the raw event bytes — exactly what a replica's relay-log
  writer ingests,
* ``COM_QUIT`` (0x01) and an OK for anything else (a real replica's
  preamble SELECTs are catalog concerns; see catalog.py for the engine's
  SQL surface).

Packet framing is the standard [len:3 LE][seq:1][payload]; payloads
larger than 0xFFFFFF are split per the protocol. The event bytes come
from the same wire files `binlog_wire.export_wire_files` renders, so a
consumer that speaks MySQL replication gets CRC-checksummed binlog v4
events with FDE/TABLE_MAP/ROWS/GTID framing.
"""

from __future__ import annotations

import os
import socket
import socketserver
import struct
import threading

from . import binlog_wire as W

COM_QUIT = 0x01
COM_QUERY = 0x03
COM_BINLOG_DUMP = 0x12
COM_REGISTER_SLAVE = 0x15

_MAX_PACKET = 0xFFFFFF


def _write_packet(wfile, seq: int, payload: bytes) -> int:
    """Write one (possibly split) protocol packet; returns next seq."""
    view = memoryview(payload)
    while True:
        chunk = view[:_MAX_PACKET]
        wfile.write(len(chunk).to_bytes(3, "little") + bytes([seq & 0xFF]) + chunk)
        seq += 1
        view = view[_MAX_PACKET:]
        if len(chunk) < _MAX_PACKET:
            break
    wfile.flush()
    return seq


def _read_packet(rfile) -> tuple[int, bytes] | None:
    head = rfile.read(4)
    if len(head) < 4:
        return None
    ln = int.from_bytes(head[:3], "little")
    seq = head[3]
    payload = rfile.read(ln)
    if ln == _MAX_PACKET:  # continuation packets
        nxt = _read_packet(rfile)
        if nxt:
            payload += nxt[1]
    return seq, payload


def _ok_packet() -> bytes:
    # OK: header(0x00) affected_rows(lenenc 0) last_insert_id(0) status(2) warnings(2)
    return b"\x00\x00\x00\x02\x00\x00\x00"


def _err_packet(code: int, msg: str) -> bytes:
    return (
        b"\xff" + struct.pack("<H", code) + b"#HY000" + msg.encode()
    )


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):  # noqa: D102
        srv: MySQLDumpServer = self.server.dump_server  # type: ignore[attr-defined]
        # HandshakeV10 greeting
        auth1, auth2 = b"12345678", b"901234567890\x00"
        greeting = (
            b"\x0a"  # protocol 10
            + b"8.0.32-polardbx-cdc-spark\x00"
            + struct.pack("<I", 1)  # thread id
            + auth1 + b"\x00"
            + struct.pack("<H", 0x80FF)  # capabilities (lower)
            + b"\x21"  # charset utf8
            + struct.pack("<H", 0x0002)  # status: autocommit
            + struct.pack("<H", 0x0000)  # capabilities (upper)
            + bytes([len(auth1) + len(auth2)])
            + b"\x00" * 10
            + auth2
            + b"mysql_native_password\x00"
        )
        seq = _write_packet(self.wfile, 0, greeting)
        resp = _read_packet(self.rfile)
        if resp is None:
            return
        _write_packet(self.wfile, resp[0] + 1, _ok_packet())  # auth OK

        while True:
            pkt = _read_packet(self.rfile)
            if pkt is None:
                return
            _seq, payload = pkt
            if not payload:
                return
            cmd = payload[0]
            if cmd == COM_QUIT:
                return
            if cmd == COM_REGISTER_SLAVE:
                _write_packet(self.wfile, 1, _ok_packet())
                continue
            if cmd == COM_BINLOG_DUMP:
                pos = struct.unpack_from("<I", payload, 1)[0]
                # flags(2) @5, server_id(4) @7, file @11
                fname = payload[11:].split(b"\x00")[0].decode() or None
                self._stream_dump(srv, fname, pos)
                return  # dump holds the connection; done = close
            # anything else: OK (catalog.py owns the SQL surface)
            _write_packet(self.wfile, 1, _ok_packet())

    def _stream_dump(self, srv: "MySQLDumpServer", fname: str | None,
                     pos: int) -> None:
        files = srv.files()
        if not files:
            _write_packet(self.wfile, 1, _err_packet(1236, "no binlog files"))
            return
        if fname is None or fname == "":
            fname = files[0]
        if fname not in files:
            _write_packet(
                self.wfile, 1,
                _err_packet(1236, f"could not find binlog file {fname!r}"),
            )
            return
        seq = 1
        for name in files[files.index(fname):]:
            with open(os.path.join(srv.wire_dir, name), "rb") as fh:
                buf = fh.read()
            if buf[:4] != W.MAGIC:
                continue
            start = max(pos, 4) if name == fname else 4
            body = buf[4:]
            off = start - 4
            while off + W.HEADER_LEN <= len(body):
                elen = struct.unpack_from("<I", body, off + 9)[0]
                if elen < W.HEADER_LEN + W.CHECKSUM_LEN or off + elen > len(body):
                    break
                # event packet: OK byte + raw event bytes
                seq = _write_packet(
                    self.wfile, seq, b"\x00" + body[off : off + elen]
                )
                off += elen
        # end of chain: EOF packet (a live server would block and push)
        _write_packet(self.wfile, seq, b"\xfe\x00\x00\x02\x00")


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class MySQLDumpServer:
    """Serve a wire-binlog directory over the MySQL protocol."""

    def __init__(self, wire_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.wire_dir = wire_dir
        self._srv = _Server((host, port), _Handler)
        self._srv.dump_server = self  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    def files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.wire_dir)
            if f.startswith("binlog.") and f.split(".")[-1].isdigit()
        )

    @property
    def address(self) -> tuple[str, int]:
        return self._srv.server_address[:2]

    def start(self) -> tuple[str, int]:
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self.address

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "MySQLDumpServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


# -- minimal replica-side client (protocol exerciser) -----------------------

def binlog_dump_fetch(host: str, port: int, file_name: str = "",
                      pos: int = 4, server_id: int = 99) -> bytes:
    """Attach like a replica: handshake → COM_BINLOG_DUMP → collect the
    raw event bytes from the event packets until EOF. Returns bytes that
    feed straight into ``binlog_wire.decode_events`` — a relay log."""
    with socket.create_connection((host, port), timeout=30) as sock:
        rf = sock.makefile("rb")
        wf = sock.makefile("wb")
        greet = _read_packet(rf)
        assert greet is not None and greet[1][0] == 0x0A, "bad greeting"
        # HandshakeResponse41: capabilities, max packet, charset, 23 zeros,
        # user, empty auth response
        resp = (
            struct.pack("<I", 0x0200 | 0x8000)  # PROTOCOL_41 | SECURE_CONN
            + struct.pack("<I", 1 << 24)
            + b"\x21" + b"\x00" * 23
            + b"replica\x00" + b"\x00"
        )
        _write_packet(wf, greet[0] + 1, resp)
        ok = _read_packet(rf)
        assert ok is not None and ok[1][:1] == b"\x00", "auth rejected"
        dump = (
            bytes([COM_BINLOG_DUMP])
            + struct.pack("<I", pos)
            + struct.pack("<H", 0)
            + struct.pack("<I", server_id)
            + file_name.encode()
        )
        _write_packet(wf, 0, dump)
        out = bytearray()
        while True:
            pkt = _read_packet(rf)
            if pkt is None:
                break
            payload = pkt[1]
            if payload[:1] == b"\xfe" and len(payload) < 9:
                break  # EOF
            if payload[:1] == b"\xff":
                raise ValueError(f"server error: {payload[9:].decode(errors='replace')}")
            assert payload[:1] == b"\x00"
            out += payload[1:]
        return bytes(out)
