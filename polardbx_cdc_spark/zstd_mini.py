"""Minimal pure-Python Zstandard frame codec (RFC 8878 subset).

Why this exists: MySQL 8.0.20+ wraps transactions in
TRANSACTION_PAYLOAD events compressed with ZSTD
(reference enum: polardbx-cdc-format/.../BinlogEventType.java:38,
``TRANSACTION_PAYLOAD`` / libbinlogevents Transaction_payload_event).
The full ``zstandard`` package is not always available, so this module
implements the *frame* layer of RFC 8878 natively:

- :func:`compress` emits a spec-valid Zstandard frame using only
  Raw (stored) blocks — zero entropy coding, but any conforming
  decoder (``zstd`` CLI, libzstd, ``zstandard``) decodes it. Raw
  blocks are what libzstd itself falls back to for incompressible
  input, so this is a legal, interoperable encoding — just without
  size reduction.
- :func:`decompress` decodes frames consisting of Raw and RLE blocks
  (everything :func:`compress` produces, plus libzstd output for
  incompressible / constant input). Frames that contain entropy-coded
  ``Compressed_Block``s raise :class:`UnsupportedFrame`; callers fall
  back to the real ``zstandard`` package for those
  (``binlog_wire._zstd_decompress``).

Scale note: this codec runs inside Arrow-batched executors on
per-transaction payloads (bounded by the binlog group size), never on
whole files — pure byte slicing, no Python-per-row work.
"""

from __future__ import annotations

MAGIC = b"\x28\xb5\x2f\xfd"  # 0xFD2FB528 little-endian
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F
_BLOCK_MAX = 128 * 1024  # Block_Maximum_Size upper bound (RFC 8878 §3.1.1.2.4)


class UnsupportedFrame(NotImplementedError):
    """Valid Zstandard frame using features this mini codec does not
    implement (entropy-coded blocks, dictionaries)."""


#: Above this size a single-segment frame's implied Window_Size (== the
#: full content size) exceeds libzstd's default 128 MiB window limit and
#: conforming decoders reject the frame ("frame requires too much
#: memory"), so compress() switches to a windowed (non-single-segment)
#: header with a bounded Window_Descriptor — safe for Raw blocks, which
#: never back-reference beyond the current block.
_SINGLE_SEGMENT_MAX = 1 << 27  # 128 MiB


def compress(data: bytes, *, single_segment_max: int = _SINGLE_SEGMENT_MAX) -> bytes:
    """Wrap *data* in a Zstandard frame of Raw blocks.

    The frame always carries Frame_Content_Size, so decoders can
    pre-allocate exactly — mirroring what MySQL's payload TLV header
    also announces via UNCOMPRESSED_SIZE. Payloads up to
    ``single_segment_max`` use the single-segment form (Window_Size ==
    content size); larger ones emit a Window_Descriptor bounded at
    128 KiB (Raw blocks copy through, never referencing history).
    """
    n = len(data)
    single = n <= single_segment_max
    # Frame_Content_Size field width per RFC 8878 §3.1.1.1.1: with
    # Single_Segment set, flag 0 → 1 byte; flag 1 → 2 bytes storing
    # (size - 256); flag 2 → 4 bytes; flag 3 → 8 bytes. Without
    # Single_Segment, flag 0 means NO field, so force ≥1.
    if n <= 0xFF and single:
        fcs_flag, fcs = 0, n.to_bytes(1, "little")
    elif 256 <= n <= 0xFFFF + 256:
        fcs_flag, fcs = 1, (n - 256).to_bytes(2, "little")
    elif n <= 0xFFFFFFFF:
        fcs_flag, fcs = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs = 3, n.to_bytes(8, "little")
    fhd = (fcs_flag << 6) | (int(single) << 5)  # no checksum, no dict
    out = bytearray(MAGIC)
    out.append(fhd)
    if not single:
        # Window_Descriptor: windowLog = 10 + exponent; exponent 7 →
        # 128 KiB window == Block_Maximum_Size, the most any Raw block
        # needs buffered.
        out.append(7 << 3)
    out += fcs
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, type=Raw, size=0
        return bytes(out)
    pos = 0
    while pos < n:
        size = min(_BLOCK_MAX, n - pos)
        last = 1 if pos + size >= n else 0
        out += ((size << 3) | last).to_bytes(3, "little")
        out += data[pos : pos + size]
        pos += size
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode a Zstandard frame made of Raw/RLE blocks.

    Skippable frames are skipped; the content checksum (if flagged) is
    skipped, not verified (the enclosing binlog event carries its own
    CRC32). Raises :class:`UnsupportedFrame` on entropy-coded blocks or
    dictionary references, ``ValueError`` on malformed input.
    """
    pos = 0
    # leading skippable frames: magic 0x184D2A5?, 4-byte LE length
    while (
        pos + 8 <= len(data)
        and _SKIPPABLE_LO
        <= int.from_bytes(data[pos : pos + 4], "little")
        <= _SKIPPABLE_HI
    ):
        pos += 8 + int.from_bytes(data[pos + 4 : pos + 8], "little")
    if data[pos : pos + 4] != MAGIC:
        raise ValueError("not a Zstandard frame (bad magic)")
    pos += 4
    if pos >= len(data):
        raise ValueError("truncated frame header")
    fhd = data[pos]
    pos += 1
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    has_checksum = (fhd >> 2) & 1
    did_flag = fhd & 3
    if fhd & 0x10:
        raise ValueError("reserved frame-header bit set")
    if not single:
        pos += 1  # Window_Descriptor
    if did_flag:
        raise UnsupportedFrame("dictionary-referencing frame")
    fcs_width = (1 if single else 0, 2, 4, 8)[fcs_flag]
    fcs: int | None = None
    if fcs_width:
        if pos + fcs_width > len(data):
            raise ValueError("truncated Frame_Content_Size")
        fcs = int.from_bytes(data[pos : pos + fcs_width], "little")
        if fcs_width == 2:
            fcs += 256
        pos += fcs_width
    out = bytearray()
    while True:
        if pos + 3 > len(data):
            raise ValueError("truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 0:  # Raw
            if pos + bsize > len(data):
                raise ValueError("raw block overruns frame")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if pos >= len(data):
                raise ValueError("truncated RLE block")
            out += data[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:
            raise UnsupportedFrame(
                "entropy-coded Zstandard block: install 'zstandard' to "
                "decode payloads produced by a real MySQL server"
            )
        else:
            raise ValueError("reserved block type")
        if last:
            break
    if has_checksum:
        pos += 4  # XXH64 low 32 bits — unverified, see docstring
    if fcs is not None and len(out) != fcs:
        raise ValueError(
            f"frame content size mismatch: header {fcs}, decoded {len(out)}"
        )
    return bytes(out)
