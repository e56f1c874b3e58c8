"""Pure-numpy media decoders (round-3): PPM/PGM, BMP, WAV vs byte-level
oracles built independently with struct/stdlib, plus the full mapInPandas
path with use_stub_decoder=False.
"""

import struct
import wave as wave_mod
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.multimodal import (
    _real_decode,
    decode_bmp,
    decode_ppm,
    decode_wav,
    extract_features,
)


def make_ppm(img: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = img.shape
    hdr = b"P6\n"
    if comment:
        hdr += b"# synthetic test image\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + img.astype(np.uint8).tobytes()


def make_pgm(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5 {w} {h} 255\n".encode() + img.astype(np.uint8).tobytes()


def make_bmp(img_rgb: np.ndarray) -> bytes:
    """Bottom-up uncompressed 24-bit BMP with row padding."""
    h, w, _ = img_rgb.shape
    stride = ((w * 3 + 3) // 4) * 4
    raster = bytearray()
    for row in img_rgb[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # BGR
        line += b"\x00" * (stride - len(line))
        raster += line
    pix_off = 14 + 40
    filesize = pix_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", filesize, 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + dib + bytes(raster)


def make_wav(samples_i16: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples_i16.astype("<i2").tobytes())
    return buf.getvalue()


def test_ppm_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(make_ppm(img)), img)
    assert np.array_equal(decode_ppm(make_ppm(img, comment=True)), img)


def test_pgm_roundtrip():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(4, 9), dtype=np.uint8)
    assert np.array_equal(decode_ppm(make_pgm(img)), img)


def test_bmp_roundtrip_with_padding():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(6, 3, 3), dtype=np.uint8)  # stride 12 != 9
    assert np.array_equal(decode_bmp(make_bmp(img)), img)


def test_wav_roundtrip():
    t = np.arange(800)
    sig = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    samples, rate = decode_wav(make_wav(sig, rate=8000))
    assert rate == 8000
    assert samples.shape == (800, 1)
    np.testing.assert_allclose(samples[:, 0], sig / 32768.0, atol=1e-12)


def test_wav_stereo():
    sig = np.column_stack([np.arange(100, dtype=np.int16),
                           -np.arange(100, dtype=np.int16)]).ravel()
    samples, rate = decode_wav(make_wav(sig, rate=16000, channels=2))
    assert samples.shape == (100, 2)
    np.testing.assert_allclose(samples[:, 0], np.arange(100) / 32768.0, atol=1e-12)


def test_real_decode_unknown_raises():
    # MP3 genuinely needs an external decoder — declared unsupported
    with pytest.raises(NotImplementedError, match="compressed/unknown"):
        _real_decode(b"ID3\x03\x00" + b"\x00" * 16, 8)
    # GIF decodes for real since round 5; truncated GIF fails loudly
    with pytest.raises(ValueError):
        _real_decode(b"GIF87a" + b"\x00" * 16, 8)
    # truncated PNG now routes to the real PNG decoder and fails loudly
    with pytest.raises(ValueError, match="missing IHDR"):
        _real_decode(b"\x89PNG\r\n\x1a\n....", 8)


def test_extract_features_real_decoders(spark):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    sig = (np.sin(np.arange(400)) * 10000).astype(np.int16)
    rows = [
        ("m1", "image", bytearray(make_ppm(img)), None),
        ("m2", "image", bytearray(make_bmp(img)), None),
        ("m3", "audio", bytearray(make_wav(sig)), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    out = extract_features(media, dim=8, use_stub_decoder=False)
    got = {r["media_id"]: r for r in out.collect()}
    assert set(got) == {"m1", "m2", "m3"}
    for mid, payload in [("m1", make_ppm(img)), ("m2", make_bmp(img)), ("m3", make_wav(sig))]:
        want = _real_decode(payload, 8)
        np.testing.assert_allclose(got[mid]["feature"], want, rtol=1e-6)
        assert got[mid]["n_bytes"] == len(payload)
    # image features from PPM and BMP of the SAME pixels agree exactly
    np.testing.assert_allclose(got["m1"]["feature"], got["m2"]["feature"], rtol=0)


def test_default_path_decodes_real_formats(spark):
    """With NO flag, PPM/BMP/WAV payloads produce real features (the
    round-3 default flip: real decoder in, stub opt-in)."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(6, 6, 3), dtype=np.uint8)
    sig = (np.cos(np.arange(200)) * 20000).astype(np.int16)
    rows = [
        ("d1", "image", bytearray(make_ppm(img)), None),
        ("d2", "audio", bytearray(make_wav(sig)), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    got = {r["media_id"]: r for r in extract_features(media, dim=8).collect()}
    np.testing.assert_allclose(got["d1"]["feature"], _real_decode(make_ppm(img), 8), rtol=1e-6)
    np.testing.assert_allclose(got["d2"]["feature"], _real_decode(make_wav(sig), 8), rtol=1e-6)


def test_malformed_wav_raises_value_error():
    """Zero-channel / truncated fmt chunks fail as diagnosable ValueErrors,
    not ZeroDivisionError/struct.error inside the worker (ADVICE r3)."""
    import struct as _struct

    from entitylinking_spark.operators.multimodal import decode_wav

    def wav_with_fmt(fmt_body: bytes) -> bytes:
        data_chunk = b"data" + _struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt_body)) + fmt_body + data_chunk
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    zero_ch = _struct.pack("<HHIIHH", 1, 0, 8000, 16000, 2, 16)
    with pytest.raises(ValueError, match="n_channels=0"):
        decode_wav(wav_with_fmt(zero_ch))
    with pytest.raises(ValueError, match="fmt chunk"):
        decode_wav(wav_with_fmt(b"\x01\x00\x01\x00"))  # 4-byte fmt chunk


# ---------------------------------------------------------------------------
# PNG (round 4): independent encoder built from the spec (zlib + filters)
# ---------------------------------------------------------------------------


def make_png(img: np.ndarray, filter_type: int = 0,
             palette: np.ndarray | None = None) -> bytes:
    """Minimal spec-conforming PNG encoder (RFC 2083): 8-bit, one IDAT,
    the SAME filter on every scanline so each filter path is exercised
    deliberately. With `palette`, writes color type 3 and img holds
    indices."""
    import zlib

    if palette is not None:
        h, w = img.shape
        channels, color = 1, 3
        flat = img[:, :, None]
    elif img.ndim == 2:
        h, w = img.shape
        channels, color = 1, 0
        flat = img[:, :, None]
    else:
        h, w, channels = img.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        flat = img
    bpp = channels
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        line = flat[y].astype(np.int32).reshape(-1)
        enc = np.empty_like(line)
        for x in range(len(line)):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw.append(filter_type)
        raw += enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_filters(filter_type, channels):
    from entitylinking_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(filter_type * 10 + channels)
    shape = (7, 5) if channels == 1 else (7, 5, channels)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(make_png(img, filter_type=filter_type))
    np.testing.assert_array_equal(got, img)


def test_png_palette():
    from entitylinking_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(9)
    palette = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(6, 4)).astype(np.uint8)
    got = decode_png(make_png(idx, filter_type=0, palette=palette))
    np.testing.assert_array_equal(got, palette[idx])


def test_png_rejects_unsupported():
    from entitylinking_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")
    # 16-bit depth header
    import zlib as _z
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    body = (struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(Exception, match="not supported|missing"):
        decode_png(b"\x89PNG\r\n\x1a\n" + body)


def test_real_decode_png_default_path(spark):
    """PNG payloads flow through the DEFAULT mapInPandas decode path."""
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, size=(8, 6, 3), dtype=np.uint8)
    payload = make_png(img, filter_type=4)
    media = spark.createDataFrame(
        [("p1", "image", bytearray(payload), None)],
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    got = extract_features(media, dim=8).collect()[0]
    np.testing.assert_allclose(got["feature"], _real_decode(payload, 8), rtol=1e-6)
    # and the feature really is the grayscale segment-mean of the pixels
    gray = img.astype(np.float64).mean(axis=2).ravel() / 255.0
    bounds = np.linspace(0, gray.size, 9).astype(int)
    want = [gray[bounds[i]:bounds[i + 1]].mean() for i in range(8)]
    np.testing.assert_allclose(got["feature"], np.float32(want), rtol=1e-6)


def test_bench_payloads_all_decode():
    """functions/media_synth payload builders (the bench generators) must
    stay decodable by every kernel they exercise."""
    import numpy as np

    from entitylinking_spark.functions.jpeg import decode_jpeg
    from entitylinking_spark.functions.media_synth import bench_payloads
    from entitylinking_spark.operators.multimodal import decode_png

    p = bench_payloads(img_hw=(32, 48), wav_samples=1000)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (32, 48, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(p["ppm"]), img)
    assert np.array_equal(decode_bmp(p["bmp"]), img)
    assert np.array_equal(decode_png(p["png"]), img)
    assert decode_jpeg(p["jpeg"]).shape == (120, 160, 3)
    samples, rate = decode_wav(p["wav"])
    assert samples.shape == (1000, 1) and rate == 8000
