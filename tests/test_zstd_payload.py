"""TRANSACTION_PAYLOAD ZSTD path + vendored zstd_mini frame codec.

Round-8 closure of the ZSTD test gap: the payload compression branch
(reference enum BinlogEventType.java:38) is now exercised with zero
external dependencies via the RFC 8878 raw-block frames of
``polardbx_cdc_spark.zstd_mini``."""

from __future__ import annotations

import os

import pytest

from polardbx_cdc_spark import binlog_wire as W
from polardbx_cdc_spark import zstd_mini as Z


@pytest.mark.parametrize("n", [0, 1, 255, 256, 65791, 65792, 300_000])
def test_zstd_mini_roundtrip_all_fcs_widths(n):
    data = os.urandom(n)
    frame = Z.compress(data)
    assert frame[:4] == Z.MAGIC
    assert Z.decompress(frame) == data


def test_zstd_mini_rle_and_skippable_frames_decode():
    # handcrafted: single-segment FHD (flag 0, 1-byte FCS=10), RLE block
    rle = Z.MAGIC + bytes([0x20, 10]) + (((10 << 3) | 2) | 1).to_bytes(
        3, "little"
    ) + b"x"
    assert Z.decompress(rle) == b"x" * 10
    # a leading skippable frame is ignored (RFC 8878 §3.1.2)
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"pad"
    assert Z.decompress(skip + Z.compress(b"hello")) == b"hello"


def test_zstd_mini_rejects_entropy_frames_and_garbage():
    cb = Z.MAGIC + bytes([0x20, 3]) + (((3 << 3) | 4) | 1).to_bytes(3, "little") + b"abc"
    with pytest.raises(Z.UnsupportedFrame):
        Z.decompress(cb)
    with pytest.raises(ValueError):
        Z.decompress(b"nope")
    with pytest.raises(ValueError):
        Z.decompress(Z.compress(b"abc")[:-1])  # truncated raw block


def test_zstd_mini_interops_with_real_zstd_when_present():
    zstandard = pytest.importorskip("zstandard")
    data = b"binlog " * 1000
    # our frames decode under libzstd
    assert zstandard.ZstdDecompressor().decompress(
        Z.compress(data), max_output_size=len(data)
    ) == data
    # constant input often produces RLE blocks; if libzstd entropy-codes
    # instead, zstd_mini must refuse cleanly rather than mis-decode
    real = zstandard.ZstdCompressor().compress(data)
    try:
        assert Z.decompress(real) == data
    except Z.UnsupportedFrame:
        pass


def test_payload_zstd_roundtrip_without_zstandard():
    td = W.TableDef("d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_VARCHAR, 32)])
    evs = [
        W.encode_query("d", "BEGIN"),
        W.encode_table_map(5, td),
        W.encode_rows_event(W.WRITE_ROWS_EVENT, 5, td, [[1, "a"], [2, "b"]]),
        W.encode_xid(99),
    ]
    p = W.encode_transaction_payload(evs, compression=W.COMPRESS_ZSTD)
    out = W.decode_events(p)
    assert len(out) == 1
    assert out[0]["compression_type"] == W.COMPRESS_ZSTD
    inner = out[0]["events"]
    assert [e["type"] for e in inner] == [
        W.QUERY_EVENT, W.TABLE_MAP_EVENT, W.WRITE_ROWS_EVENT, W.XID_EVENT
    ]
    assert inner[2]["rows"] == [[1, "a"], [2, "b"]]
    # expanded stream == the uncompressed twin's expansion
    plain = W.encode_transaction_payload(evs, compression=W.COMPRESS_NONE)
    flat_z = W.expand_payload_events(W.decode_events(p))
    flat_n = W.expand_payload_events(W.decode_events(plain))
    assert [
        (e["type"], e.get("rows"), e.get("xid")) for e in flat_z
    ] == [(e["type"], e.get("rows"), e.get("xid")) for e in flat_n]


def test_payload_tlv_truncation_raises_valueerror_not_indexerror():
    # field length overruns the body
    bad = W.encode_event(W.TRANSACTION_PAYLOAD_EVENT, b"\x02\x01", 0)
    with pytest.raises(ValueError, match="overruns"):
        W.decode_events(bad)
    # no end mark at all
    bad2 = W.encode_event(W.TRANSACTION_PAYLOAD_EVENT, b"\x02\x01\x00", 0)
    with pytest.raises(ValueError, match="TRANSACTION_PAYLOAD"):
        W.decode_events(bad2)


def test_payload_zstd_missing_uncompressed_size_still_decodes():
    """UNCOMPRESSED_SIZE is optional on the wire — a frame without the
    TLV must decode via the frame's own content size."""
    raw = W.strip_event_checksums(W.encode_xid(7))
    body = Z.compress(raw)

    def field(ftype: int, value: int) -> bytes:
        v = W._lenenc(value)
        return W._lenenc(ftype) + W._lenenc(len(v)) + v

    hdr = (
        field(W._OTW_COMPRESSION_TYPE, W.COMPRESS_ZSTD)
        + field(W._OTW_PAYLOAD_SIZE, len(body))
        + W._lenenc(W._OTW_HEADER_END)
    )
    ev = W.encode_event(W.TRANSACTION_PAYLOAD_EVENT, hdr + body, 0)
    out = W.decode_events(ev)
    assert out[0]["events"][0]["xid"] == 7


def test_wire_frame_rows_partial_update_pk_comes_from_before_image():
    """ADVICE r7: a MINIMAL after-image omitting the pk must not surface
    the literal string 'None' — the before-image carries the key."""
    td = W.TableDef("d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_DOUBLE, 8)])
    ev = W.encode_table_map(5, td) + W.encode_rows_event(
        W.UPDATE_ROWS_EVENT, 5, td,
        [([41, 1.5], [41, 2.5])],
        present=[True, True], present_after=[False, True],
    )
    blob = W.MAGIC + W.encode_fde() + ev
    rows = W.wire_frame_rows("f", blob)
    upd = [r for r in rows if r[2] == "UPDATE"]
    assert len(upd) == 1
    assert upd[0][5] == "41"  # pk from the before-image, never "None"


def test_zstd_ffi_full_entropy_codec_roundtrip():
    """System-libzstd ctypes tier: real entropy coding both ways, frames
    interchangeable with zstd_mini's raw-block frames, mini correctly
    refusing entropy frames into the ffi fallback."""
    from polardbx_cdc_spark import zstd_ffi as FFI

    if not FFI.available():
        pytest.skip("no system libzstd")
    data = b"binlog event stream " * 5000
    c = FFI.compress(data)
    assert len(c) < len(data) // 10  # genuinely entropy-coded
    assert FFI.decompress(c) == data
    assert FFI.decompress(c, usize=len(data)) == data
    assert FFI.decompress(Z.compress(data)) == data  # raw-block interop
    with pytest.raises(Z.UnsupportedFrame):
        Z.decompress(c)


def test_zstd_ffi_interops_with_zstd_cli():
    """Cross-implementation check against the zstd CLI binary: our
    frames decode under the reference implementation and vice versa —
    the interop a real MySQL server round-trip would exercise."""
    import shutil
    import subprocess

    from polardbx_cdc_spark import zstd_ffi as FFI

    if not FFI.available() or not shutil.which("zstd"):
        pytest.skip("no libzstd / zstd CLI")
    data = os.urandom(1000) + b"compressible " * 2000
    out = subprocess.run(["zstd", "-d", "-c"], input=FFI.compress(data),
                         capture_output=True)
    assert out.returncode == 0 and out.stdout == data
    out2 = subprocess.run(["zstd", "-c", "-19"], input=data,
                          capture_output=True)
    assert FFI.decompress(out2.stdout) == data
    # raw-block mini frames decode under the CLI too
    out3 = subprocess.run(["zstd", "-d", "-c"], input=Z.compress(data),
                          capture_output=True)
    assert out3.returncode == 0 and out3.stdout == data


def test_payload_entropy_zstd_end_to_end():
    """With libzstd present the TRANSACTION_PAYLOAD ZSTD branch carries
    REAL entropy-coded bodies — and they are smaller than the events."""
    from polardbx_cdc_spark import zstd_ffi as FFI

    if not FFI.available():
        pytest.skip("no system libzstd")
    td = W.TableDef("d", "t", [(W.TYPE_LONGLONG, None), (W.TYPE_VARCHAR, 64)])
    evs = [W.encode_table_map(5, td)] + [
        W.encode_rows_event(W.WRITE_ROWS_EVENT, 5, td,
                            [[i, f"row-{i % 7}"] for i in range(50)])
    ] + [W.encode_xid(1)]
    p = W.encode_transaction_payload(evs, compression=W.COMPRESS_ZSTD)
    assert len(p) < len(b"".join(evs)) // 2
    flat = W.expand_payload_events(W.decode_events(p))
    rows = [r for e in flat if e["type"] == W.WRITE_ROWS_EVENT for r in e["rows"]]
    assert len(rows) == 50 and rows[7] == [7, "row-0"]


def test_mini_windowed_frame_for_oversize_payloads():
    """ADVICE r8: payloads above the 128 MiB single-segment limit must
    emit a bounded Window_Descriptor (non-single-segment header) or real
    decoders reject the frame. Exercised via the testable threshold."""
    data = (b"0123456789abcdef" * 5000) + os.urandom(4096)  # ~84 KB
    frame = Z.compress(data, single_segment_max=1 << 14)
    fhd = frame[4]
    assert not (fhd >> 5) & 1, "Single_Segment_Flag must be clear"
    assert frame[5] == 7 << 3, "Window_Descriptor: 128 KiB window"
    assert Z.decompress(frame) == data
    # small payloads keep the exact single-segment form
    small = Z.compress(data)
    assert (small[4] >> 5) & 1


def test_mini_windowed_frame_decodes_under_reference_zstd():
    import shutil
    import subprocess

    from polardbx_cdc_spark import zstd_ffi as FFI

    data = b"windowed-frame " * 20000  # ~300 KB, multi-block
    frame = Z.compress(data, single_segment_max=1 << 14)
    if FFI.available():
        assert FFI.decompress(frame) == data
    if shutil.which("zstd"):
        out = subprocess.run(["zstd", "-d", "-c"], input=frame,
                             capture_output=True)
        assert out.returncode == 0 and out.stdout == data


def test_ffi_available_degrades_on_missing_symbols(monkeypatch):
    """ADVICE r8: an old libzstd missing a declared symbol raises
    AttributeError from _load(); available() must answer False, not
    crash the compress/decompress fallback chain."""
    from polardbx_cdc_spark import zstd_ffi as FFI

    def boom():
        raise AttributeError("ZSTD_getFrameContentSize")

    monkeypatch.setattr(FFI, "_load", boom)
    assert FFI.available() is False
