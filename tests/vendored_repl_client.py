"""A minimal, INDEPENDENT MySQL replication client, written strictly from
the public MySQL Client/Server protocol documentation (dev.mysql.com
"Connection Phase" + "Replication Protocol" chapters / the protocol
layouts in the public `mysql-server` source headers). It shares NO code
with `polardbx_cdc_spark.mysql_dump` — packet framing, handshake
parsing, auth scramble, and dump commands are all re-derived here from
the spec so a green attach test is evidence of wire-level interop with
a third-party-shaped client, not a self-roundtrip.

Scope: connection-phase HandshakeV10 → HandshakeResponse41 with a real
``mysql_native_password`` scramble, COM_REGISTER_SLAVE,
COM_BINLOG_DUMP, COM_BINLOG_DUMP_GTID (binary Gtid_set payload), the
binlog event stream (network-stream 0x00 framing, >16MB packet
reassembly, EOF/ERR packets, HEARTBEAT filtering left to the caller,
optional per-event CRC32 verification — ``verify_checksum=True`` checks
the trailing 4 bytes against zlib.crc32 of the frame, what a replica's
``binlog_checksum_options`` verify does), and COM_QUERY with a
text-protocol result-set parser (the stock replica preamble surface:
SELECT @@vars, SHOW MASTER STATUS, SET @master_binlog_checksum /
@master_heartbeat_period).
"""

from __future__ import annotations

import hashlib
import socket
import zlib
from dataclasses import dataclass, field

# -- capability flags (Protocol::CapabilityFlags) ---------------------------
CLIENT_LONG_PASSWORD = 0x00000001
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000

# -- commands ----------------------------------------------------------------
COM_QUIT = 0x01
COM_QUERY = 0x03
COM_REGISTER_SLAVE = 0x15
COM_BINLOG_DUMP = 0x12
COM_BINLOG_DUMP_GTID = 0x1E

BINLOG_DUMP_NON_BLOCK = 0x01

_MAX_PAYLOAD = 0xFFFFFF


class ServerError(Exception):
    """ERR_Packet from the server: (code, sql_state, message)."""

    def __init__(self, code: int, sql_state: str, message: str):
        super().__init__(f"[{code}] {sql_state}: {message}")
        self.code, self.sql_state, self.message = code, sql_state, message


@dataclass
class HandshakeV10:
    server_version: str
    thread_id: int
    capabilities: int
    charset: int
    status: int
    auth_plugin_name: str
    nonce: bytes  # auth-plugin-data part 1 + part 2, trailing NUL dropped
    raw: bytes = field(repr=False, default=b"")


def native_password_scramble(password: str, nonce: bytes) -> bytes:
    """Authentication::Native41:
    SHA1(password) XOR SHA1(nonce + SHA1(SHA1(password)))."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


class SpecReplicationClient:
    """Spec-derived replication client; one instance = one connection."""

    def __init__(self, host: str, port: int, *, user: str = "repl",
                 password: str = "", server_id: int = 54321,
                 timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._user, self._password = user, password
        self.server_id = server_id
        self._recv_seq = 0
        self.handshake = self._connect_phase()

    # -- packet layer (3-byte LE length + 1-byte sequence id) ---------------

    def _read_exact(self, n: int) -> bytes:
        chunks = bytearray()
        while len(chunks) < n:
            part = self._sock.recv(n - len(chunks))
            if not part:
                raise ConnectionError("server closed mid-packet")
            chunks += part
        return bytes(chunks)

    def _read_packet(self) -> bytes:
        """One logical packet, reassembling the 16MB-1 continuation rule:
        a payload of exactly 0xFFFFFF bytes is ALWAYS followed by another
        packet (possibly empty) that continues it."""
        payload = bytearray()
        while True:
            head = self._read_exact(4)
            n = head[0] | head[1] << 8 | head[2] << 16
            self._recv_seq = head[3]
            payload += self._read_exact(n)
            if n < _MAX_PAYLOAD:
                return bytes(payload)

    def _send_packet(self, payload: bytes, seq: int) -> int:
        off = 0
        while True:
            part = payload[off : off + _MAX_PAYLOAD]
            head = bytes((len(part) & 0xFF, (len(part) >> 8) & 0xFF,
                          (len(part) >> 16) & 0xFF, seq & 0xFF))
            self._sock.sendall(head + part)
            seq += 1
            off += len(part)
            if len(part) < _MAX_PAYLOAD:
                return seq

    # -- connection phase ----------------------------------------------------

    def _connect_phase(self) -> HandshakeV10:
        greet = self._read_packet()
        hs = self._parse_handshake_v10(greet)
        if not hs.capabilities & CLIENT_PROTOCOL_41:
            raise ServerError(0, "08004", "server lacks CLIENT_PROTOCOL_41")
        caps = CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
        if hs.capabilities & CLIENT_PLUGIN_AUTH:
            caps |= CLIENT_PLUGIN_AUTH
        auth = native_password_scramble(self._password, hs.nonce)
        resp = bytearray()
        resp += caps.to_bytes(4, "little")
        resp += (1 << 24).to_bytes(4, "little")  # max packet size
        resp += bytes((hs.charset,))
        resp += bytes(23)  # filler
        resp += self._user.encode() + b"\x00"
        resp += bytes((len(auth),)) + auth  # CLIENT_SECURE_CONNECTION form
        if caps & CLIENT_PLUGIN_AUTH:
            resp += b"mysql_native_password\x00"
        self._send_packet(bytes(resp), self._recv_seq + 1)
        self._expect_ok()
        return hs

    @staticmethod
    def _parse_handshake_v10(b: bytes) -> HandshakeV10:
        if b[0] != 0x0A:
            raise ServerError(0, "08004", f"protocol {b[0]}, want 10")
        z = b.index(0, 1)
        version = b[1:z].decode()
        p = z + 1
        thread_id = int.from_bytes(b[p : p + 4], "little")
        part1 = b[p + 4 : p + 12]
        # p+12: one filler byte (0x00)
        cap_low = int.from_bytes(b[p + 13 : p + 15], "little")
        charset = b[p + 15]
        status = int.from_bytes(b[p + 16 : p + 18], "little")
        cap_high = int.from_bytes(b[p + 18 : p + 20], "little")
        caps = cap_low | cap_high << 16
        auth_len = b[p + 20] if caps & CLIENT_PLUGIN_AUTH else 0
        # p+21 .. p+31: 10 reserved bytes, all 0x00
        q = p + 31
        part2 = b""
        if caps & CLIENT_SECURE_CONNECTION:
            n2 = max(13, auth_len - 8)
            part2 = b[q : q + n2]
            q += n2
        plugin = ""
        if caps & CLIENT_PLUGIN_AUTH:
            zp = b.index(0, q)
            plugin = b[q:zp].decode()
        # auth-plugin-data is exactly 20 bytes; part 2 carries a trailing
        # NUL filler. Slice, don't rstrip — a nonce whose 20th byte IS
        # 0x00 must survive intact or the scramble diverges.
        blob = part1 + part2
        if len(blob) >= 20:
            nonce = blob[:20]
        elif blob.endswith(b"\x00"):
            # short blob: strip ONLY the single trailing NUL filler — a
            # nonce legitimately ending in 0x00 bytes must not be eaten
            # by an rstrip (same hazard as the normal path above)
            nonce = blob[:-1]
        else:
            nonce = blob
        return HandshakeV10(version, thread_id, caps, charset, status,
                            plugin, nonce, raw=b)

    def _expect_ok(self) -> bytes:
        pkt = self._read_packet()
        if pkt and pkt[0] == 0xFF:
            code = int.from_bytes(pkt[1:3], "little")
            state, msg = "", pkt[3:].decode(errors="replace")
            if msg.startswith("#"):
                state, msg = msg[1:6], msg[6:]
            raise ServerError(code, state, msg)
        return pkt

    # -- replication commands ------------------------------------------------

    def register_slave(self) -> None:
        """COM_REGISTER_SLAVE: server_id(4) + empty host/user/password
        (len-prefixed) + port(2) + rank(4) + master_id(4)."""
        body = (bytes((COM_REGISTER_SLAVE,))
                + self.server_id.to_bytes(4, "little")
                + b"\x00" * 3          # 0-length hostname, user, password
                + (0).to_bytes(2, "little")
                + (0).to_bytes(4, "little")
                + (0).to_bytes(4, "little"))
        self._send_packet(body, 0)
        self._expect_ok()

    # -- COM_QUERY (text protocol) -------------------------------------------

    @staticmethod
    def _lenenc(b: bytes, p: int) -> tuple[int | None, int]:
        """Length-encoded integer (spec: <251 literal, 0xFC 2-byte,
        0xFD 3-byte, 0xFE 8-byte, 0xFB = NULL marker in row packets)."""
        first = b[p]
        if first < 0xFB:
            return first, p + 1
        if first == 0xFB:
            return None, p + 1
        if first == 0xFC:
            return b[p + 1] | b[p + 2] << 8, p + 3
        if first == 0xFD:
            return b[p + 1] | b[p + 2] << 8 | b[p + 3] << 16, p + 4
        return int.from_bytes(b[p + 1 : p + 9], "little"), p + 9

    def query(self, sql: str) -> tuple[list[str], list[list[str | None]]]:
        """COM_QUERY; returns (column_names, rows) for a result set, or
        ([], []) for an OK response. Column definition packets are
        ColumnDefinition41: catalog/schema/table/org_table/name/org_name
        as length-encoded strings — the name is the 5th."""
        self._send_packet(bytes((COM_QUERY,)) + sql.encode(), 0)
        first = self._read_packet()
        if first and first[0] == 0xFF:
            code = int.from_bytes(first[1:3], "little")
            msg = first[3:].decode(errors="replace")
            state = ""
            if msg.startswith("#"):
                state, msg = msg[1:6], msg[6:]
            raise ServerError(code, state, msg)
        if first and first[0] == 0x00:
            return [], []  # OK: no result set
        n_cols, _ = self._lenenc(first, 0)
        names: list[str] = []
        for _i in range(int(n_cols)):
            col = self._read_packet()
            p = 0
            parts = []
            for _f in range(6):  # catalog schema table org_table name org_name
                ln, p = self._lenenc(col, p)
                parts.append(col[p : p + int(ln or 0)])
                p += int(ln or 0)
            names.append(parts[4].decode())
        eof = self._read_packet()
        if not (eof and eof[0] == 0xFE):
            raise ServerError(0, "08S01", "missing EOF after column defs")
        rows: list[list[str | None]] = []
        while True:
            pkt = self._read_packet()
            if pkt and pkt[0] == 0xFE and len(pkt) < 9:
                return names, rows
            row: list[str | None] = []
            p = 0
            while p < len(pkt):
                ln, p = self._lenenc(pkt, p)
                if ln is None:
                    row.append(None)
                else:
                    row.append(pkt[p : p + int(ln)].decode())
                    p += int(ln)
            rows.append(row)

    def set_binlog_checksum(self, mode: str) -> None:
        """Declare what this replica can verify — the libmysql preamble
        statement (mode "CRC32"/"NONE", or the expression form when mode
        is "@@global.binlog_checksum")."""
        val = mode if mode.startswith("@@") else f"'{mode}'"
        self.query(f"SET @master_binlog_checksum = {val}")

    def set_heartbeat_period(self, seconds: float) -> None:
        """SET @master_heartbeat_period — NANOSECONDS on the wire, like a
        real replica (0 disables idle heartbeats)."""
        self.query(f"SET @master_heartbeat_period = {int(seconds * 1e9)}")

    def binlog_dump(self, filename: str, pos: int = 4, *,
                    non_block: bool = True, verify_checksum: bool = False):
        """COM_BINLOG_DUMP: pos(4) flags(2) server_id(4) filename(EOF).
        Yields raw event byte strings from the network stream."""
        flags = BINLOG_DUMP_NON_BLOCK if non_block else 0
        body = (bytes((COM_BINLOG_DUMP,))
                + pos.to_bytes(4, "little")
                + flags.to_bytes(2, "little")
                + self.server_id.to_bytes(4, "little")
                + filename.encode())
        self._send_packet(body, 0)
        yield from self._event_stream(verify_checksum=verify_checksum)

    def binlog_dump_gtid(self, executed: dict[bytes, list[tuple[int, int]]],
                         *, non_block: bool = True,
                         verify_checksum: bool = False):
        """COM_BINLOG_DUMP_GTID: flags(2) server_id(4) name_len(4) name
        pos(8) data_len(4) Gtid_set. The Gtid_set binary layout (public
        Gtid_set::encode): n_sids(8){ sid(16) n_intervals(8)
        { start(8) end(8) }* }* with end EXCLUSIVE."""
        gs = bytearray(len(executed).to_bytes(8, "little"))
        for sid, ivs in executed.items():
            gs += sid + len(ivs).to_bytes(8, "little")
            for s, e in ivs:
                gs += s.to_bytes(8, "little") + e.to_bytes(8, "little")
        flags = BINLOG_DUMP_NON_BLOCK if non_block else 0
        body = (bytes((COM_BINLOG_DUMP_GTID,))
                + flags.to_bytes(2, "little")
                + self.server_id.to_bytes(4, "little")
                + (0).to_bytes(4, "little")   # name_len 0: resolve by GTID
                + (4).to_bytes(8, "little")   # pos
                + len(gs).to_bytes(4, "little") + bytes(gs))
        self._send_packet(body, 0)
        yield from self._event_stream(verify_checksum=verify_checksum)

    def _event_stream(self, verify_checksum: bool = False):
        """Binlog network stream: each packet is 0x00 + event bytes; a
        0xFE packet shorter than 9 bytes ends the dump; 0xFF is an ERR.
        ``verify_checksum``: check each frame's trailing CRC32 (zlib
        polynomial over everything before the last 4 bytes) — what a
        CRC32-negotiated replica verifies before relaying a frame."""
        while True:
            pkt = self._read_packet()
            if not pkt:
                return
            marker = pkt[0]
            if marker == 0xFE and len(pkt) < 9:
                return
            if marker == 0xFF:
                code = int.from_bytes(pkt[1:3], "little")
                msg = pkt[3:].decode(errors="replace")
                state = ""
                if msg.startswith("#"):
                    state, msg = msg[1:6], msg[6:]
                raise ServerError(code, state, msg)
            if marker != 0x00:
                raise ServerError(0, "08S01", f"bad stream marker {marker:#x}")
            frame = pkt[1:]
            if verify_checksum and len(frame) >= 23:
                want = int.from_bytes(frame[-4:], "little")
                got = zlib.crc32(frame[:-4]) & 0xFFFFFFFF
                if want != got:
                    raise ServerError(
                        0, "HY000",
                        f"event CRC32 mismatch: {got:#010x} != {want:#010x}")
            yield frame

    def close(self) -> None:
        try:
            self._send_packet(bytes((COM_QUIT,)), 0)
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
