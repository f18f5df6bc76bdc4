"""ctypes binding to the system libzstd — full Zstandard compress AND
entropy-coded decompress without the ``zstandard`` Python package.

Closes the last sliver of the TRANSACTION_PAYLOAD ZSTD gap: a real
MySQL 8.0.20+ server emits entropy-coded frames, which the vendored
:mod:`zstd_mini` raw-block codec intentionally refuses. Where a
``libzstd`` shared library exists (virtually every Linux image — it is
a glibc-adjacent base dependency), this module decodes/encodes the full
format through the stable public C ABI (``ZSTD_compress`` /
``ZSTD_decompress`` / streaming ``ZSTD_decompressStream`` for frames
without an embedded content size).

Scale note: used inside Arrow-batched executors on per-transaction
payloads; each call is one C roundtrip over a contiguous buffer, no
Python per-byte work. ``available()`` gates callers — absence of the
library degrades to zstd_mini raw-block frames (still spec-valid
Zstandard), never an error.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_CONTENTSIZE_UNKNOWN = 2**64 - 1
_CONTENTSIZE_ERROR = 2**64 - 2

_lib = None


class _Buf(ctypes.Structure):
    _fields_ = [
        ("ptr", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    lib = ctypes.CDLL(name)
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getErrorName.restype = ctypes.c_char_p
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    lib.ZSTD_createDStream.restype = ctypes.c_void_p
    lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
    lib.ZSTD_initDStream.argtypes = [ctypes.c_void_p]
    lib.ZSTD_initDStream.restype = ctypes.c_size_t
    lib.ZSTD_decompressStream.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_Buf), ctypes.POINTER(_Buf),
    ]
    lib.ZSTD_decompressStream.restype = ctypes.c_size_t
    lib.ZSTD_DStreamOutSize.restype = ctypes.c_size_t
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, AttributeError):
        # AttributeError: an old libzstd (pre-1.3) missing a declared
        # symbol (ZSTD_getFrameContentSize / ZSTD_DStreamOutSize) — must
        # degrade to zstd_mini/zstandard, not crash the fallback chain
        return False


def _check(lib, ret: int) -> int:
    if lib.ZSTD_isError(ret):
        raise ValueError(
            f"libzstd: {lib.ZSTD_getErrorName(ret).decode(errors='replace')}"
        )
    return ret


def compress(data: bytes, level: int = 3) -> bytes:
    lib = _load()
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = _check(lib, lib.ZSTD_compress(dst, bound, data, len(data), level))
    return dst.raw[:n]


def decompress(data: bytes, usize: int | None = None) -> bytes:
    """Decompress one frame. ``usize`` (if known, e.g. from the payload
    TLV) sizes the output buffer directly; otherwise the frame header's
    content size is used, and frames written without one fall through to
    the streaming decoder."""
    lib = _load()
    if usize is None:
        csize = lib.ZSTD_getFrameContentSize(data, len(data))
        if csize == _CONTENTSIZE_ERROR:
            raise ValueError("libzstd: not a Zstandard frame")
        if csize != _CONTENTSIZE_UNKNOWN:
            usize = int(csize)
    if usize is not None:
        dst = ctypes.create_string_buffer(max(usize, 1))
        n = _check(
            lib, lib.ZSTD_decompress(dst, max(usize, 1), data, len(data))
        )
        return dst.raw[:n]
    # streaming: content size absent from the frame header
    ds = lib.ZSTD_createDStream()
    if not ds:
        raise MemoryError("ZSTD_createDStream failed")
    try:
        _check(lib, lib.ZSTD_initDStream(ds))
        chunk = lib.ZSTD_DStreamOutSize()
        src = ctypes.create_string_buffer(data, len(data))
        inb = _Buf(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        out = bytearray()
        buf = ctypes.create_string_buffer(chunk)
        while inb.pos < inb.size:
            outb = _Buf(ctypes.cast(buf, ctypes.c_void_p), chunk, 0)
            _check(lib, lib.ZSTD_decompressStream(
                ds, ctypes.byref(outb), ctypes.byref(inb)
            ))
            out += buf.raw[: outb.pos]
        return bytes(out)
    finally:
        lib.ZSTD_freeDStream(ds)
