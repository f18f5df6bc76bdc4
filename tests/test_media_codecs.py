"""REAL media decode: BMP/PPM/WAV codec round trips, nearest-neighbor
resize, feature extraction, and the Spark real-decode dataflow over
genuinely-encoded payloads (no external codec libraries)."""

from __future__ import annotations

import numpy as np
import pytest

from polardbx_cdc_spark.functions import media_codecs as mc


def test_bmp_round_trip_exact():
    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (5, 7), (16, 33), (31, 2)]:  # odd widths hit row padding
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        back = mc.decode_bmp(mc.encode_bmp(arr))
        assert back.shape == arr.shape
        assert np.array_equal(back, arr)


def test_ppm_pgm_round_trip_exact():
    rng = np.random.RandomState(4)
    rgb = rng.randint(0, 256, (9, 13, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(rgb)), rgb)
    gray = rng.randint(0, 256, (6, 11), dtype=np.uint8)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(gray)), gray)


def test_ppm_header_comments_and_whitespace():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    raw = mc.encode_ppm(rgb)
    # inject a comment line into the header — netpbm allows them
    commented = raw.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(mc.decode_ppm(commented), rgb)


def test_wav_round_trip_exact():
    rng = np.random.RandomState(5)
    mono = rng.randint(-32768, 32767, 1234, dtype=np.int16)
    rate, back = mc.decode_wav(mc.encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(back, mono)
    stereo = rng.randint(-32768, 32767, (500, 2), dtype=np.int16)
    rate, back = mc.decode_wav(mc.encode_wav(stereo, 44100))
    assert rate == 44100 and back.shape == (500, 2)
    assert np.array_equal(back, stereo)


def test_sniff_magic_bytes():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    assert mc.sniff(mc.encode_bmp(arr)) == "bmp"
    assert mc.sniff(mc.encode_ppm(arr)) == "ppm"
    assert mc.sniff(mc.encode_wav(np.zeros(64, dtype=np.int16))) == "wav"
    assert mc.sniff(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) == "png"  # native now
    assert mc.sniff(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"  # native now
    assert mc.sniff(None) is None


def test_resize_nearest_semantics():
    # 2x2 quadrant image upscaled 2x: each quadrant becomes a 2x2 block
    arr = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    up = mc.resize_nearest(arr, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[0, 0], [255, 0, 0])
    assert np.array_equal(up[0, 3], [0, 255, 0])
    assert np.array_equal(up[3, 0], [0, 0, 255])
    # downscale back recovers the original
    assert np.array_equal(mc.resize_nearest(up, 2, 2), arr)


def test_image_features_reflect_content():
    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    f = mc.image_features(red)
    assert f[0] == 8 and f[1] == 8
    assert f[2] == pytest.approx(1.0) and f[3] == 0.0 and f[4] == 0.0
    assert f[6] == pytest.approx(0.0)  # flat image → zero std


def test_audio_features_reflect_content():
    rate = 8000
    t = np.arange(rate)  # one second
    tone = (10000 * np.sin(2 * np.pi * t * 100 / rate)).astype(np.int16)
    f = mc.audio_features(rate, tone)
    assert f[0] == pytest.approx(1.0)  # duration
    assert f[1] == pytest.approx(10000 / 32768 / np.sqrt(2), rel=1e-2)  # rms
    assert f[2] == pytest.approx(2 * 100 / rate, rel=0.1)  # zcr ≈ 2f/fs


def test_spark_real_decode_end_to_end(spark, sf_dir):
    """synth_real_media renders genuine BMP/WAV/PPM bytes inside Spark;
    extract_features_real decodes them for real — image features carry
    true dimensions, audio features true durations, and every synthesized
    payload sniffs as a real format (zero stub fallbacks)."""
    from pyspark.sql import functions as F

    from polardbx_cdc_spark.functions import multimodal
    from polardbx_cdc_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    media = multimodal.synth_real_media(docs).persist()
    try:
        n = media.count()
        assert n == 60
        feats = multimodal.extract_features_real(media)
        rows = {r["media_id"]: r for r in feats.collect()}
        meta = {r["media_id"]: r for r in media.collect()}
        assert len(rows) == n
        for mid, m in meta.items():
            f = rows[mid]["feature"]
            assert mc.sniff(bytes(m["payload"])) is not None
            if m["kind"] == "image":
                assert (int(f[0]), int(f[1])) == (m["width"], m["height"])
            else:
                assert f[0] == pytest.approx(m["duration_ms"] / 1000, abs=0.01)

        # real resize: every image payload comes back as a BMP with the
        # target dimensions, pixel-decoded and resampled
        resized = multimodal.resize_images_real(media, 24, 24)
        for r in resized.collect():
            arr = mc.decode_bmp(bytes(r["payload"]))
            assert arr.shape == (24, 24, 3)
    finally:
        media.unpersist()


def test_png_round_trip_and_filters():
    """PNG codec: RGB + RGBA round trips (encoder uses the Up filter so
    decode exercises reconstruction), CRC enforcement, and decode of a
    document mixing ALL FIVE scanline filters."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from polardbx_cdc_spark.functions import media_codecs as mc

    rng = np.random.default_rng(3)
    for shape in ((9, 5, 3), (7, 11, 4), (1, 1, 4)):
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = mc.encode_png(arr)
        assert mc.sniff(blob) == "png"
        assert np.array_equal(mc.decode_png(blob), arr), shape

    # CRC enforcement: flip a byte inside IDAT
    arr = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    blob = bytearray(mc.encode_png(arr))
    blob[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        mc.decode_png(bytes(blob))

    # hand-built document exercising every filter type 0..4
    h, w, c = 10, 6, 3
    arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y, ft in enumerate(filters):
        row = arr[y].astype(np.int32).reshape(-1)
        line = row.copy()
        if ft == 1:
            for i in range(len(row) - 1, c - 1, -1):
                line[i] = (row[i] - row[i - c]) % 256
        elif ft == 2:
            line = (row - prev) % 256
        elif ft == 3:
            for i in range(len(row)):
                left = row[i - c] if i >= c else 0
                line[i] = (row[i] - ((int(left) + int(prev[i])) >> 1)) % 256
        elif ft == 4:
            for i in range(len(row)):
                left = int(row[i - c]) if i >= c else 0
                ul = int(prev[i - c]) if i >= c else 0
                line[i] = (row[i] - mc._paeth(left, int(prev[i]), ul)) % 256
        raw += bytes([filters[y]]) + bytes(line.astype(np.uint8))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    doc = (mc._PNG_SIG + mc._png_chunk(b"IHDR", ihdr)
           + mc._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + mc._png_chunk(b"IEND", b""))
    assert np.array_equal(mc.decode_png(doc), arr)


def test_gif_lzw_round_trip_and_kwkwk():
    """GIF LZW: multi-frame animated round trip on cube-level colors,
    code-width growth past 511 codes, the KwKwK corner case, and 4096-
    table reset on large inputs."""
    import numpy as np

    from polardbx_cdc_spark.functions import media_codecs as mc

    # KwKwK: 'ababa...' forces code-not-yet-in-table on decode
    data = b"abababababab" * 4
    assert mc._lzw_decode(mc._lzw_encode(data, 8), 8) == data
    # large input: forces width growth and a table reset past 4096 codes
    rng = np.random.default_rng(5)
    big = bytes(rng.integers(0, 256, 100_000, dtype=np.uint8))
    assert mc._lzw_decode(mc._lzw_encode(big, 8), 8) == big

    lv = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)
    frames = [lv[rng.integers(0, 6, (15, 11, 3))] for _ in range(4)]
    back = mc.decode_gif(mc.encode_gif(frames, delay_ms=50))
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    assert mc.sniff(mc.encode_gif(frames)) == "gif"


def test_jpeg_baseline_round_trip_bounds():
    """Baseline JPEG: dimensions exact (incl. non-multiple-of-8 with
    edge-extend padding + crop), flat blocks lossless, smooth gradients
    within tight quantization error, gray + RGB, marker/stuffing layout
    parseable from the file's own DQT/DHT tables."""
    import numpy as np
    import pytest

    from polardbx_cdc_spark.functions import media_codecs as mc

    y, x = np.mgrid[0:13, 0:21]
    img = np.stack([(x * 7) % 256, (y * 5) % 256, ((x + y) * 3) % 256], axis=-1).astype(
        np.uint8
    )
    back = mc.decode_jpeg(mc.encode_jpeg(img, 90))
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 4

    flat = np.full((8, 8, 3), 128, dtype=np.uint8)
    assert np.array_equal(mc.decode_jpeg(mc.encode_jpeg(flat, 85)), flat)

    g = ((x * 3 + y * 2) % 256).astype(np.uint8)[:11, :19]
    bg = mc.decode_jpeg(mc.encode_jpeg(g, 90))
    assert bg.shape == (11, 19)
    assert np.abs(bg.astype(int) - g.astype(int)).max() <= 4

    rng = np.random.default_rng(2)
    noise = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    bn = mc.decode_jpeg(mc.encode_jpeg(noise, 95))
    assert bn.shape == noise.shape
    assert np.abs(bn.astype(int) - noise.astype(int)).mean() < 8  # lossy but close

    blob = mc.encode_jpeg(img, 90)
    assert mc.sniff(blob) == "jpeg"
    with pytest.raises(ValueError, match="no SOI"):
        mc.decode_jpeg(b"nope")


def test_mp4_box_walk_and_metadata():
    """ISO BMFF: skeleton round trip incl. multi-track and 64-bit
    largesize tolerance; rejects non-MP4; sniffs via ftyp."""
    from polardbx_cdc_spark.functions import media_codecs as mc

    blob = mc.encode_mp4_skeleton(12345, 1920, 1080, n_tracks=3)
    assert mc.sniff(blob) == "mp4"
    meta = mc.parse_mp4(blob)
    assert meta["duration_ms"] == 12345 and meta["n_tracks"] == 3
    assert (meta["width"], meta["height"]) == (1920, 1080)
    with pytest.raises(ValueError, match="no ftyp"):
        mc.parse_mp4(b"\x00" * 32)
