"""MySQL-protocol binlog dump: a replica-style client performs the real
handshake + COM_BINLOG_DUMP against the wire files and receives a relay
log identical to the files' event stream."""

from __future__ import annotations

import os

import pytest

from polardbx_cdc_spark import binlog_wire as W
from polardbx_cdc_spark import mysql_dump as M


@pytest.fixture()
def served_wire(tmp_path):
    wire = str(tmp_path / "wire")
    os.makedirs(wire)
    td = W.TableDef("d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_VARCHAR, 256)])

    def rows_event(vals):
        return W.encode_table_map(3, td) + W.encode_rows_event(
            W.WRITE_ROWS_EVENT, 3, td, vals
        )

    W.write_binlog_file(
        wire + "/binlog.000001",
        [rows_event([[1, "a"], [2, "b"]]), W.encode_xid(7)],
        next_file="binlog.000002",
    )
    W.write_binlog_file(wire + "/binlog.000002", [rows_event([[3, "c"]])])
    srv = M.MySQLDumpServer(wire)
    host, port = srv.start()
    yield {"wire": wire, "host": host, "port": port}
    srv.stop()


def test_replica_attach_receives_full_relay_log(served_wire):
    relay = M.binlog_dump_fetch(
        served_wire["host"], served_wire["port"], "binlog.000001", 4
    )
    evs = W.decode_events(relay)
    rows = [r for e in evs if e["type"] == W.WRITE_ROWS_EVENT for r in e["rows"]]
    assert rows == [[1, "a"], [2, "b"], [3, "c"]]
    # the relay log is event-faithful: FDEs and the rotate chain came through
    kinds = [e["type"] for e in evs]
    assert W.FORMAT_DESCRIPTION_EVENT in kinds and W.ROTATE_EVENT in kinds
    assert any(e["type"] == W.XID_EVENT and e["xid"] == 7 for e in evs)


def test_attach_mid_file_from_event_boundary(served_wire):
    # find the byte offset of the second event via a header walk
    with open(served_wire["wire"] + "/binlog.000001", "rb") as fh:
        buf = fh.read()
    import struct as _s

    first_len = _s.unpack_from("<I", buf, 4 + 9)[0]
    pos = 4 + first_len  # skip FDE
    relay = M.binlog_dump_fetch(
        served_wire["host"], served_wire["port"], "binlog.000001", pos
    )
    evs = W.decode_events(relay)
    assert evs[0]["type"] != W.FORMAT_DESCRIPTION_EVENT  # FDE skipped
    rows = [r for e in evs if e["type"] == W.WRITE_ROWS_EVENT for r in e["rows"]]
    assert rows == [[1, "a"], [2, "b"], [3, "c"]]


def test_unknown_file_yields_protocol_error(served_wire):
    with pytest.raises(ValueError, match="could not find binlog file"):
        M.binlog_dump_fetch(
            served_wire["host"], served_wire["port"], "binlog.999999", 4
        )


def test_large_event_split_across_packets(tmp_path):
    """An event bigger than one MySQL packet (16 MB) must arrive intact
    through the packet-splitting path."""
    wire = str(tmp_path / "wire")
    os.makedirs(wire)
    td = W.TableDef("d", "t", [(W.TYPE_BLOB, 4)])
    big = bytes(range(256)) * (70_000)  # ~17.9 MB blob
    ev = W.encode_table_map(1, td) + W.encode_rows_event(
        W.WRITE_ROWS_EVENT, 1, td, [[big]]
    )
    W.write_binlog_file(wire + "/binlog.000001", [ev])
    with M.MySQLDumpServer(wire) as srv:
        host, port = srv.address
        relay = M.binlog_dump_fetch(host, port, "binlog.000001", 4)
    evs = W.decode_events(relay)
    got = [r for e in evs if e["type"] == W.WRITE_ROWS_EVENT for r in e["rows"]]
    assert got == [[big]]


def test_replica_attach_to_pipeline_rendered_gtid_files(spark, sf_dir, tmp_path):
    """Full-stack integration: streaming pipeline renders GTID-framed
    wire files; a MySQL-protocol replica client attaches and its relay
    log decodes to the sink's exact row count with per-txn GTIDs."""
    from polardbx_cdc_spark import binlog_wire as BW
    from polardbx_cdc_spark.model import derive_cdc_stream
    from polardbx_cdc_spark.streaming import pipeline

    out, wire = str(tmp_path / "binlog"), str(tmp_path / "wire")
    sink = pipeline.BinlogSink(out, rotate_rows=400, frame_txns=True)
    sink.recover(spark)
    sink(derive_cdc_stream(spark, sf_dir), batch_id=0)
    sink.flush()
    BW.export_wire_files(spark, out, wire, emit_gtid=True).collect()

    import os

    first = sorted(f for f in os.listdir(wire) if f.startswith("binlog."))[0]
    with M.MySQLDumpServer(wire) as srv:
        host, port = srv.address
        relay = M.binlog_dump_fetch(host, port, first, 4)
    evs = W.decode_events(relay)
    n_rows = sum(len(e["rows"]) for e in evs if e["type"] in W.ROWS_EVENTS)
    from pyspark.sql import functions as F

    expected = (
        spark.read.parquet(out)
        .filter(F.col("action").isin("INSERT", "UPDATE", "DELETE"))
        .count()
    )
    assert n_rows == expected
    gtids = [e["gno"] for e in evs if e["type"] == W.GTID_LOG_EVENT]
    xids = [e for e in evs if e["type"] == W.XID_EVENT]
    assert len(gtids) == len(xids) > 0


def test_protocol_robustness_garbage_and_bad_pos(served_wire):
    """Protocol edge cases: a client sending garbage after handshake gets
    an OK (unknown command) not a hang; a dump from a mid-event (invalid)
    byte position terminates cleanly at the walk's broken header."""
    import socket
    import struct as _s

    host, port = served_wire["host"], served_wire["port"]
    with socket.create_connection((host, port), timeout=15) as sock:
        rf, wf = sock.makefile("rb"), sock.makefile("wb")
        greet = M._read_packet(rf)
        assert greet is not None
        M._write_packet(wf, greet[0] + 1, b"\x00" * 40)  # junk handshake resp
        ok = M._read_packet(rf)
        assert ok is not None and ok[1][:1] == b"\x00"
        M._write_packet(wf, 0, b"\x63garbage-command")  # unknown cmd 0x63
        resp = M._read_packet(rf)
        assert resp is not None and resp[1][:1] == b"\x00"

    # dump from a non-boundary position: server streams zero events and
    # EOFs (the walk sees an invalid header) — no crash, no hang
    relay = M.binlog_dump_fetch(host, port, "binlog.000001", 7)
    assert relay == b"" or W.decode_events(relay, tolerate_truncation=True) is not None
