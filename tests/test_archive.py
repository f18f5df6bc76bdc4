"""Binlog archive store: upload/index/selection/fetch semantics
(RdsBinlogExtractor + BinlogUrlDownloader behaviors on a directory
object store)."""

from __future__ import annotations

import os

import pytest

from polardbx_cdc_spark.archive import BinlogArchive


def _run_sink_and_export(spark, sf_dir, tmpdir):
    from polardbx_cdc_spark import binlog_wire as W
    from polardbx_cdc_spark.streaming import pipeline, source

    out, wire = tmpdir + "/binlog", tmpdir + "/wire"
    q, sink = pipeline.run_binlog_pipeline(
        source.cdc_stream(spark, sf_dir), out, tmpdir + "/ckpt",
        rotate_rows=250, frame_txns=True,
    )
    q.awaitTermination(120)
    sink.flush()
    W.export_wire_files(spark, out, wire).collect()
    return wire


def test_archive_upload_select_fetch_round_trip(spark, sf_dir, tmp_path):
    """End to end: rotate-complete wire files archive with GCN-derived
    TSO covers (open tail skipped); window selection is index-only and
    minimal; fetched files verify and decode identically to the
    originals."""
    from polardbx_cdc_spark import binlog_wire as W

    tmpdir = str(tmp_path)
    wire = _run_sink_and_export(spark, sf_dir, tmpdir)
    files = sorted(f for f in os.listdir(wire) if f.startswith("binlog."))
    arc = BinlogArchive(tmpdir + "/archive")
    entries = arc.upload_wire_dir(wire)
    assert len(entries) == len(files) - 1  # open tail never archived
    assert all(e["first_tso"] <= e["last_tso"] for e in entries)

    # idempotent re-upload; immutability enforced
    again = arc.upload_wire_dir(wire)
    assert again == entries
    victim = os.path.join(tmpdir, "tampered")
    with open(os.path.join(wire, entries[0]["name"]), "rb") as fh:
        data = bytearray(fh.read())
    data[-1] ^= 0xFF
    with open(victim, "wb") as fh:
        fh.write(bytes(data))
    os.replace(victim, os.path.join(tmpdir, entries[0]["name"]))
    with pytest.raises(ValueError, match="different content"):
        arc.upload(os.path.join(tmpdir, entries[0]["name"]), "0", "1")

    # selection: a window inside file i's cover picks exactly the files
    # whose ranges intersect — never the whole archive
    mid = entries[len(entries) // 2]
    picked = arc.select_covering(mid["first_tso"], mid["last_tso"])
    assert mid["name"] in {e["name"] for e in picked}
    full = arc.select_covering("0" * 19, "9" * 19)
    assert len(full) == len(entries)
    if len(entries) > 1:
        assert len(picked) < len(entries)

    # fetch: bytes verify and decode == original decode
    dest = tmpdir + "/fetched"
    paths = arc.fetch_covering(mid["first_tso"], mid["last_tso"], dest)
    for p in paths:
        orig = os.path.join(wire, os.path.basename(p))
        assert W.read_binlog_file(p) == W.read_binlog_file(orig)


def test_archive_fetch_resume_and_checksum(spark, sf_dir, tmp_path):
    """An interrupted fetch resumes from the .part offset; a corrupted
    partial fails the checksum and is discarded."""
    tmpdir = str(tmp_path)
    wire = _run_sink_and_export(spark, sf_dir, tmpdir)
    arc = BinlogArchive(tmpdir + "/archive")
    entries = arc.upload_wire_dir(wire)
    name = entries[0]["name"]
    dest = tmpdir + "/fetched"
    os.makedirs(dest)

    # simulate a torn download: first half already on disk
    src = os.path.join(arc.root, name)
    with open(src, "rb") as fh:
        blob = fh.read()
    with open(os.path.join(dest, name + ".part"), "wb") as fh:
        fh.write(blob[: len(blob) // 2])
    p = arc.fetch(name, dest)
    assert os.path.getsize(p) == entries[0]["size"]

    # corrupted partial → checksum failure, partial removed
    os.remove(p)
    with open(os.path.join(dest, name + ".part"), "wb") as fh:
        fh.write(b"\x00" * (len(blob) // 2))
    with pytest.raises(ValueError, match="checksum mismatch"):
        arc.fetch(name, dest)
    assert not os.path.exists(os.path.join(dest, name + ".part"))
    # clean retry succeeds
    assert os.path.getsize(arc.fetch(name, dest)) == entries[0]["size"]
