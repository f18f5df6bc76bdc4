"""REAL media codecs with zero external dependencies: BMP and PPM/PGM
images (struct/bytes parsing), WAV audio (stdlib ``wave``), nearest-
neighbor resize (NumPy indexing), and deterministic feature extraction.

Upgrades the multimodal tier's decode step from an md5 stub to genuine
byte-level decoding for every format the container can handle without
external codec libraries. JPEG/PNG get real header/metadata parsers and
MP4 a real box-walk parser (``parse_mp4``); only their entropy-coded
pixel/sample payloads fall back to the documented stub in
``multimodal.py`` (they need a full codec library). All
arithmetic is NumPy over the decoded arrays — deterministic for identical
payload bytes on any platform.

Reference scope note: the reference engine has no media operators; this
tier is the LLM-training-data extension (SURVEY §2.9 north-star), so the
formats are chosen for verifiability, not MySQL parity.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, bottom-up — the classic BITMAPINFOHEADER form)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """H×W×3 uint8 (RGB) → 24-bit BMP bytes (BGR on disk, rows bottom-up,
    each row padded to 4 bytes)."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects H x W x 3 RGB")
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    out = bytearray(header + info)
    pad = b"\x00" * (row_size - w * 3)
    bgr = arr[:, :, ::-1]  # RGB → BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        out += bgr[y].tobytes() + pad
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → H×W×3 uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hsize, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    arr = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        off = data_offset + i * row_size
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off)
        y = h - 1 - i if bottom_up else i
        arr[y] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return arr


# ---------------------------------------------------------------------------
# PPM (P6) / PGM (P5) — binary netpbm
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        return b"P5\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, whitespace-separated width height maxval, ONE
    # whitespace byte, then the raster (comments start with '#')
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end : end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    if magic == b"P5":
        return np.frombuffer(payload, np.uint8, w * h, pos).reshape(h, w)
    return np.frombuffer(payload, np.uint8, w * h * 3, pos).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# WAV (PCM16 via stdlib wave)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono/stereo samples → RIFF/WAVE bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, int16 samples [n] or [n, nch])."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        rate = w.getframerate()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype=np.int16)
    if nch > 1:
        samples = samples.reshape(-1, nch)
    return rate, samples


# ---------------------------------------------------------------------------
# sniffing / resize / features
# ---------------------------------------------------------------------------


def sniff(payload: bytes) -> str | None:
    """Magic-byte format detection for the natively-decodable set."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:6] in (b"GIF89a", b"GIF87a"):
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return None


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize by index sampling — a REAL resize (no PIL
    needed), exact and deterministic."""
    src_h, src_w = arr.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, feat_dim: int = 8) -> list[float]:
    """Deterministic image features: [w, h, mean R, mean G, mean B,
    mean luminance, std luminance, edge-energy proxy], padded/truncated to
    ``feat_dim``; channel stats normalized to [0, 1]."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    f = arr.astype(np.float64)
    lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    dx = np.abs(np.diff(lum, axis=1)).mean() if w > 1 else 0.0
    feats = [
        float(w), float(h),
        float(f[:, :, 0].mean() / 255), float(f[:, :, 1].mean() / 255),
        float(f[:, :, 2].mean() / 255),
        float(lum.mean() / 255), float(lum.std() / 255), float(dx / 255),
    ]
    return (feats + [0.0] * feat_dim)[:feat_dim]


def audio_features(rate: int, samples: np.ndarray, feat_dim: int = 8) -> list[float]:
    """Deterministic audio features: [duration_s, rms, zero-crossing
    rate, peak, mean |x|, low/high half-band energy split via a 2-point
    difference, dc offset]."""
    x = samples.astype(np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    n = len(x)
    if n == 0:
        return [0.0] * feat_dim
    xs = x / 32768.0
    diff = np.diff(xs) if n > 1 else np.zeros(1)
    zc = float((np.signbit(xs[1:]) != np.signbit(xs[:-1])).mean()) if n > 1 else 0.0
    total_e = float((xs**2).mean())
    hf_e = float((diff**2).mean()) / 2
    feats = [
        n / rate, float(np.sqrt(total_e)), zc, float(np.abs(xs).max()),
        float(np.abs(xs).mean()), max(total_e - hf_e, 0.0), hf_e,
        float(xs.mean()),
    ]
    return (feats + [0.0] * feat_dim)[:feat_dim]


# ---------------------------------------------------------------------------
# PNG (8-bit truecolor RGB/RGBA, non-interlaced) — stdlib zlib only.
# Full spec path: signature, IHDR/IDAT/IEND chunks with CRC32, zlib
# inflate, and ALL FIVE scanline filters (None/Sub/Up/Average/Paeth)
# reconstructed per the PNG 1.2 specification.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """H×W×3 (RGB) or H×W×4 (RGBA) uint8 → PNG bytes. Scanlines use the
    Up filter (type 2) so decoders must exercise real reconstruction,
    not just a None-filter fast path."""
    import zlib as _z

    h, w, c = arr.shape
    if c not in (3, 4):
        raise ValueError("encode_png expects H x W x 3|4")
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int16)
    for y in range(h):
        row = arr[y].astype(np.int16)
        filt = ((row - prev) % 256).astype(np.uint8)
        raw += b"\x02" + filt.tobytes()
        prev = row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → H×W×C uint8. Verifies the signature and every chunk
    CRC; supports 8-bit color types 2 (RGB) and 6 (RGBA),
    non-interlaced, all five scanline filters."""
    import zlib as _z

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if _z.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or interlace:
        raise ValueError("PNG slice covers 8-bit RGB/RGBA non-interlaced only")
    c = 3 if color_type == 2 else 4
    raw = _z.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline payload length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub
            rec = bytearray(stride)
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                rec[i] = (line[i] + left) & 0xFF
        elif ft == 2:  # Up
            rec = bytearray((np.frombuffer(bytes(line), dtype=np.uint8) + prev).astype(np.uint8).tobytes())
        elif ft == 3:  # Average
            rec = bytearray(stride)
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                rec[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = bytearray(stride)
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                ul = int(prev[i - c]) if i >= c else 0
                rec[i] = (line[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
        out[y] = np.frombuffer(bytes(rec), dtype=np.uint8)
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# GIF (87a/89a): pure-Python LZW both directions — makes animated-GIF
# frame EXTRACTION real (the video-shaped member of the media tier).
# Scope: global color table, full-frame images (no partial-frame
# disposal composition), no interlace.
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, resets at 4096 codes,
    little-endian bit packing, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    buf = b""
    for byte in data:
        nxt = buf + bytes([byte])
        if nxt in table:
            buf = nxt
            continue
        out_bits.append((table[buf], width))
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096:
            out_bits.append((clear, width))
            table, next_code, width = reset()
        buf = bytes([byte])
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((eoi, width))
    # pack little-endian
    acc = n = 0
    packed = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos_bits = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos_bits
        v = 0
        for i in range(width):
            if pos_bits >= total_bits:
                return eoi
            if data[pos_bits >> 3] & (1 << (pos_bits & 7)):
                v |= 1 << i
            pos_bits += 1
        return v

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


#: fixed 6·6·6 color cube + 40 grays global palette (web-safe-ish):
#: deterministic quantization both directions without per-image palettes
_GIF_CUBE = 6


def _gif_palette() -> np.ndarray:
    pal = []
    lv = [0, 51, 102, 153, 204, 255]
    for r in lv:
        for g in lv:
            for b in lv:
                pal.append((r, g, b))
    n_gray = 256 - len(pal)
    for i in range(n_gray):
        v = i * 255 // max(n_gray - 1, 1)  # even ramp 0..255
        pal.append((v, v, v))
    return np.array(pal[:256], dtype=np.uint8)


def _quantize(arr: np.ndarray) -> np.ndarray:
    """RGB → palette indexes in the 6-level cube (nearest level)."""
    lvl = np.clip((arr.astype(np.int32) + 25) // 51, 0, 5)
    return (lvl[..., 0] * 36 + lvl[..., 1] * 6 + lvl[..., 2]).astype(np.uint8)


def encode_gif(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """List of H×W×3 uint8 frames → animated GIF89a (global 6³ cube
    palette, full-frame images, LZW-compressed). Colors quantize to the
    cube; use cube-level values (0,51,...,255) for lossless round trips."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape[:2]
    pal = _gif_palette()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 colors
    out += pal.tobytes()
    # netscape loop extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_ms // 10) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        idx = _quantize(fr).reshape(-1).tobytes()
        lzw = _lzw_encode(idx, 8)
        out += b"\x08"
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF bytes → list of H×W×3 uint8 frames (global palette,
    full-frame images)."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _x, _y, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
            lflags = payload[pos + 9]
            pos += 10
            fpal = pal
            if lflags & 0x80:
                n = 2 << (lflags & 7)
                fpal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(data), mcs), dtype=np.uint8)
            frames.append(fpal[idx[: fw * fh]].reshape(fh, fw, 3))
        else:
            raise ValueError(f"unexpected GIF block {b0:#x} at {pos}")
    return frames


# ---------------------------------------------------------------------------
# JPEG (baseline DCT, ITU-T T.81): real encode + decode, numpy only.
# Scope: 8-bit, grayscale or YCbCr 4:4:4 (no chroma subsampling), one
# scan, tables CARRIED IN THE FILE (DQT/DHT) like every real JPEG — so
# no dependence on the Annex-K defaults; lossy by quantization, exact
# in dimensions and bounded in pixel error.
# ---------------------------------------------------------------------------


def _zigzag_order() -> list[int]:
    """The 8×8 zigzag scan, generated (diagonal walk), not memorized."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(-1, s - 8), -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        for i in rng:
            j = s - i
            order.append(i * 8 + j)
    return order


_ZZ = _zigzag_order()
_DCT_C = None


def _dct_matrix() -> np.ndarray:
    global _DCT_C
    if _DCT_C is None:
        k = np.arange(8)
        C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
        C[0] *= 1 / np.sqrt(2)
        _DCT_C = C
    return _DCT_C


def _quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Simple monotone quant surface scaled by quality (carried in DQT —
    decoders read it from the file, so no spec default needed)."""
    y, x = np.mgrid[0:8, 0:8]
    base = 6 + (x + y) * (3 if not chroma else 5)
    scale = 50.0 / quality if quality < 50 else (100 - quality) / 50.0
    q = np.clip(np.round(base * max(scale, 0.02)), 1, 255)
    return q.astype(np.int32)


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman: BITS (count per length 1..16) + symbol
    list → {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: fixed table geometry: DC categories 0..11 at 4 bits; AC run/size
#: symbols (EOB, ZRL, and every (run 0..15, size 1..10)) at 9 bits.
_DC_SYMS = list(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_BITS = [0] * 8 + [len(_AC_SYMS)] + [0] * 7


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amp_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1  # one's-complement form


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """H×W (grayscale) or H×W×3 (RGB) uint8 → baseline JPEG bytes."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [arr.astype(np.float64)]
    else:
        f = arr.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
        cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
        comps = [y, cb, cr]
    qt = [_quant_table(quality, False), _quant_table(quality, True)]
    C = _dct_matrix()
    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)

    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = []
    for comp in comps:
        p = np.zeros((bh * 8, bw * 8))
        p[:h, :w] = comp
        p[h:, :w] = comp[h - 1 : h, :]  # edge-extend padding
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p - 128.0)

    bw_out = _BitWriter()
    pred = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, p in enumerate(padded):
                q = qt[0 if ci == 0 else 1]
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = C @ blk @ C.T
                qc = np.round(coef / q).astype(np.int32)
                zz = qc.reshape(-1)[_ZZ]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = _category(diff)
                code, ln = dc_codes[size]
                bw_out.put(code, ln)
                if size:
                    bw_out.put(_amp_bits(diff, size), size)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        if run == 16:
                            code, ln = ac_codes[0xF0]  # ZRL
                            bw_out.put(code, ln)
                            run = 0
                        continue
                    size = _category(v)
                    code, ln = ac_codes[(run << 4) | size]
                    bw_out.put(code, ln)
                    bw_out.put(_amp_bits(v, size), size)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]  # EOB
                    bw_out.put(code, ln)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    for tid, q in enumerate(qt[: 1 if gray else 2]):
        out += seg(0xDB, bytes([tid]) + bytes(int(q.reshape(-1)[z]) for z in _ZZ))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 4:4:4
    out += seg(0xC0, sof)
    for cls, tid, bits, syms in (
        (0, 0, _DC_BITS, _DC_SYMS),
        (1, 0, _AC_BITS, _AC_SYMS),
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms))
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc)) + b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw_out.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read1(self) -> int:
        b = self.data[self.pos]
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            # skip the stuffed 0x00 after a data 0xFF
            if b == 0xFF and self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1
        return v

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read1()
        return v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → H×W (grayscale) or H×W×3 (RGB) uint8.
    Tables come from the file's DQT/DHT; 4:4:4 or single-component only."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps_meta = []
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                tid = body[bpos] & 0x0F
                if body[bpos] >> 4:
                    raise ValueError("16-bit quant tables out of scope")
                tbl = np.zeros(64, dtype=np.int32)
                for i, z in enumerate(_ZZ):
                    tbl[z] = body[bpos + 1 + i]
                qts[tid] = tbl.reshape(8, 8)
                bpos += 65
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                syms = list(body[bpos + 17 : bpos + 17 + n])
                huff[(cls, tid)] = {
                    (length, code): sym
                    for sym, (code, length) in _canonical_codes(bits, syms).items()
                }
                bpos += 17 + n
        elif marker == 0xC0:
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline")
            comps_meta = [
                (body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]) for i in range(nc)
            ]
            for _cid, samp, _qid in comps_meta:
                if samp != 0x11:
                    raise ValueError("JPEG slice covers 4:4:4 only")
            sof = (ih, iw, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only baseline SOF0")
        elif marker == 0xDA:
            ns = body[0]
            scan_tables = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            data_start = pos + 2 + ln
            ih, iw, nc = sof
            bh, bw_ = (ih + 7) // 8, (iw + 7) // 8
            rd = _BitReader(payload[data_start:])

            def read_sym(table: dict) -> int:
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | rd.read1()
                    if (length, code) in table:
                        return table[(length, code)]
                raise ValueError("bad Huffman code")

            def extend(v: int, size: int) -> int:
                return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

            C = _dct_matrix()
            planes = [np.zeros((bh * 8, bw_ * 8)) for _ in range(nc)]
            pred = [0] * nc
            for by in range(bh):
                for bx in range(bw_):
                    for ci in range(nc):
                        dc_t = huff[(0, scan_tables[ci][1] >> 4)]
                        ac_t = huff[(1, scan_tables[ci][1] & 0x0F)]
                        q = qts[comps_meta[ci][2]]
                        zz = np.zeros(64, dtype=np.int32)
                        size = read_sym(dc_t)
                        diff = extend(rd.read(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = read_sym(ac_t)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            zz[k] = extend(rd.read(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZZ] = zz
                        coef = blk.reshape(8, 8) * q
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            C.T @ coef @ C
                        )
            out = [np.clip(p[:ih, :iw] + 128.0, 0, 255) for p in planes]
            if nc == 1:
                return np.round(out[0]).astype(np.uint8)
            y, cb, cr = out
            r = y + 1.402 * (cr - 128)
            g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            b = y + 1.772 * (cb - 128)
            return np.clip(
                np.round(np.stack([r, g, b], axis=-1)), 0, 255
            ).astype(np.uint8)
        pos += 2 + ln
    raise ValueError("no scan data found")


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF): real CONTAINER parsing — box walk + mvhd/tkhd metadata.
# Sample DECODE genuinely needs external codecs (H.264 et al.) and stays
# stubbed; duration/track/dimension extraction is pure box arithmetic.
# ---------------------------------------------------------------------------


def encode_mp4_skeleton(
    duration_ms: int, width: int, height: int, n_tracks: int = 1
) -> bytes:
    """Minimal valid ISO BMFF skeleton: ftyp + moov(mvhd, trak(tkhd)…) +
    empty mdat. Carries real metadata in the spec layout; no samples."""
    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    timescale = 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration_ms)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", n_tracks + 1),  # next track id
    )
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07"  # version 0, enabled|in-movie|in-preview
            + struct.pack(">IIIII", 0, 0, tid, 0, duration_ms)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
        )
        traks += box(b"trak", tkhd)
    return (
        box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
        + box(b"moov", mvhd + traks)
        + box(b"mdat", b"")
    )


def parse_mp4(payload: bytes) -> dict:
    """Walk the box tree; return {duration_ms, timescale, n_tracks,
    width, height} from mvhd/tkhd (version 0 and 1 layouts)."""
    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, pos)
            tag = buf[pos + 4 : pos + 8]
            body_off = pos + 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack_from(">Q", buf, pos + 8)
                body_off = pos + 16
            if size < 8 or pos + size > end:
                raise ValueError(f"bad box size at {pos}")
            yield tag, body_off, pos + size
            pos += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")
    out = {"n_tracks": 0, "width": None, "height": None}
    for tag, off, end in walk(payload, 0, len(payload)):
        if tag != b"moov":
            continue
        for t2, o2, e2 in walk(payload, off, end):
            if t2 == b"mvhd":
                ver = payload[o2]
                if ver == 1:
                    _c, _m, ts, dur = struct.unpack_from(">QQIQ", payload, o2 + 4)
                else:
                    _c, _m, ts, dur = struct.unpack_from(">IIII", payload, o2 + 4)
                out["timescale"] = ts
                out["duration_ms"] = dur * 1000 // ts if ts else 0
            elif t2 == b"trak":
                out["n_tracks"] += 1
                for t3, o3, _e3 in walk(payload, o2, e2):
                    if t3 != b"tkhd":
                        continue
                    ver = payload[o3]
                    base = o3 + 4 + (32 if ver == 1 else 20)
                    w, h = struct.unpack_from(">II", payload, base + 8 + 8 + 36)
                    if w and h:
                        out["width"], out["height"] = w >> 16, h >> 16
    if "duration_ms" not in out:
        raise ValueError("MP4 missing mvhd")
    return out
