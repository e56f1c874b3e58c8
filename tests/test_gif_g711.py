"""GIF LZW + G.711 WAV decoders (operators/multimodal.py, round 5).

Golden fixtures from an EXTERNAL encoder lineage (same discipline as
test_golden_decoders.py): the GIF bytes and their expected RGB raster
come from JDK 17 javax.imageio; the mu-law/A-law WAV bytes and their
expected linear-PCM expansion come from javax.sound.sampled. An
own-encoder LZW round-trip and spec edge cases complete the matrix.
"""

import base64
import struct

import numpy as np
import pytest

from entitylinking_spark.operators.multimodal import (
    _g711_alaw_expand,
    _g711_ulaw_expand,
    _lzw_decode,
    decode_gif,
    decode_wav,
)

W, H = 13, 7

# javax.imageio GIF encode of index[y][x] = (3x + 5y + (x*y)%7) %% 16
GOLDEN_GIF_B64 = (
    "R0lGODlhDQAHAPMAAAD/ABHyKCLlUDPYeETLoFW+yGax8HekGIiXQJmKaKp9kLtwuMxj4N1WCO5J"
    "MP88WCwAAAAADQAHAEMIXwABDDCQgMEDAQUQLHAQgACBBQsECEhAEQCAAwccKHhAIMEBBgE4JnAA"
    "0sGBBAsaPAgwgIEDAAIIFEjQIMDMBgocCDCQ80GBBQoA+CQQdGiCAAIGLGDQwIGBAwgABAgIADs="
)

# ImageIO's own getRGB readback of that GIF (r,g,b row-major)
GIF_RGB_EXPECT = [
    0, 255, 0, 51, 216, 120, 102, 177, 240, 153, 138, 104, 204, 99, 224,
    255, 60, 88, 34, 229, 80, 85, 190, 200, 136, 151, 64, 187, 112, 184,
    238, 73, 48, 17, 242, 40, 68, 203, 160, 85, 190, 200, 153, 138, 104,
    221, 86, 8, 17, 242, 40, 85, 190, 200, 153, 138, 104, 221, 86, 8, 170,
    125, 144, 238, 73, 48, 34, 229, 80, 102, 177, 240, 170, 125, 144, 238,
    73, 48, 170, 125, 144, 255, 60, 88, 68, 203, 160, 153, 138, 104, 119,
    164, 24, 204, 99, 224, 17, 242, 40, 255, 60, 88, 68, 203, 160, 153, 138,
    104, 238, 73, 48, 204, 99, 224, 17, 242, 40, 255, 60, 88, 85, 190, 200,
    187, 112, 184, 170, 125, 144, 0, 255, 0, 255, 60, 88, 85, 190, 200, 68,
    203, 160, 170, 125, 144, 0, 255, 0, 255, 60, 88, 85, 190, 200, 68, 203,
    160, 68, 203, 160, 187, 112, 184, 187, 112, 184, 34, 229, 80, 34, 229,
    80, 153, 138, 104, 153, 138, 104, 153, 138, 104, 0, 255, 0, 0, 255, 0,
    119, 164, 24, 119, 164, 24, 238, 73, 48, 153, 138, 104, 17, 242, 40, 34,
    229, 80, 51, 216, 120, 187, 112, 184, 204, 99, 224, 221, 86, 8, 238, 73,
    48, 102, 177, 240, 119, 164, 24, 136, 151, 64, 0, 255, 0, 17, 242, 40,
    238, 73, 48, 119, 164, 24, 153, 138, 104, 187, 112, 184, 221, 86, 8,
    255, 60, 88, 17, 242, 40, 51, 216, 120, 204, 99, 224, 238, 73, 48, 0,
    255, 0, 34, 229, 80, 68, 203, 160
]

# 64 frames of deterministic 16-bit PCM fed to the javax.sound companders
PCM_SRC = [
    0, 10634, 19435, 25306, 27579, 26094, 21195, 13667, 4617, -4693, -13014,
    -19277, -22729, -23021, -20239, -14874, -7739, 146, 7702, 13937, 18073,
    19642, 18536, 15007, 9620, 3164, -3460, -9364, -13790, -16208, -16375,
    -14356, -10506, -5409, 207, 5576, 9992, 12906, 13988, 13167, 10626,
    6770, 2165, -2547, -6736, -9864, -11558, -11646, -10182, -7420, -3780,
    221, 4036, 7164, 9216, 9961, 9352, 7523, 4764, 1479, -1873, -4845,
    -7056, -8241
]

ULAW_WAV_B64 = (
    "UklGRmYAAABXQVZFZm10IBIAAAAHAAEAQB8AAEAfAAABAAgAAABkYXRhQAAAAP+ajIeEhouVrS0W"
    "DQkJDBIh7qGUjoyNkpy2Mx0UEA8TGyrqqZyWlJaapb47JRwZGBsiMemvo52cnaKsxkAsIx8="
)

ALAW_WAV_B64 = (
    "UklGRmYAAABXQVZFZm10IBIAAAAGAAEAQB8AAEAfAAABAAgAAABkYXRhQAAAANWxp62vrKG/hwc8"
    "JyMjJjgL3Iu+pKanuLedHzc/Ojo5MQDZgLa8vryxj5UWDzYzMzYJGNiajre2t4iH4mgHDjU="
)

# javax.sound's own expansion of its encoded bytes back to 16-bit PCM
ULAW_DEC_EXPECT = [
    0, 10876, 19836, 24956, 28028, 25980, 20860, 13436, 4604, -4604, -12924,
    -18812, -22908, -22908, -19836, -14972, -7676, 148, 7676, 13948, 17788,
    19836, 18812, 14972, 9852, 3132, -3516, -9340, -13948, -15996, -16764,
    -14460, -10364, -5372, 212, 5628, 9852, 12924, 13948, 12924, 10876,
    6652, 2108, -2492, -6652, -9852, -11388, -11900, -10364, -7420, -3772,
    228, 4092, 7164, 9340, 9852, 9340, 7420, 4860, 1500, -1884, -4860,
    -7164, -8316
]

ALAW_DEC_EXPECT = [
    8, 10496, 18944, 25088, 27136, 26112, 20992, 13568, 4736, -4736, -13056,
    -18944, -23040, -23040, -19968, -15104, -7808, 152, 7808, 14080, 17920,
    19968, 18944, 15104, 9472, 3136, -3392, -9472, -13568, -16128, -16128,
    -14592, -10496, -5504, 200, 5504, 9984, 13056, 14080, 13056, 10496,
    6784, 2112, -2496, -6784, -9984, -11520, -11520, -9984, -7296, -3776,
    216, 4032, 7040, 9472, 9984, 9472, 7552, 4736, 1504, -1888, -4736,
    -7040, -8448
]

# --- golden: external encoder lineage ---------------------------------------


def test_gif_decodes_imageio_golden():
    img = decode_gif(base64.b64decode(GOLDEN_GIF_B64))
    assert img.shape == (H, W, 3)
    expect = np.array(GIF_RGB_EXPECT, dtype=np.uint8).reshape(H, W, 3)
    assert np.array_equal(img, expect)  # lossless: byte-exact


def test_ulaw_wav_matches_javax_expansion():
    samples, rate = decode_wav(base64.b64decode(ULAW_WAV_B64))
    assert rate == 8000 and samples.shape == (64, 1)
    got = np.round(samples[:, 0] * 32768.0).astype(np.int64)
    assert np.array_equal(got, np.array(ULAW_DEC_EXPECT, dtype=np.int64))


def test_alaw_wav_matches_javax_expansion():
    samples, rate = decode_wav(base64.b64decode(ALAW_WAV_B64))
    assert rate == 8000 and samples.shape == (64, 1)
    got = np.round(samples[:, 0] * 32768.0).astype(np.int64)
    assert np.array_equal(got, np.array(ALAW_DEC_EXPECT, dtype=np.int64))


def test_g711_expansion_tracks_source_pcm():
    """Companding is lossy but bounded: G.711 quantization error is at
    most ~1/16 of the sample magnitude (plus a small floor)."""
    src = np.array(PCM_SRC, dtype=np.int64)
    for b64 in (ULAW_WAV_B64, ALAW_WAV_B64):
        got = np.round(decode_wav(base64.b64decode(b64))[0][:, 0] * 32768.0)
        err = np.abs(got - src)
        assert np.all(err <= np.abs(src) / 12.0 + 40.0)


# --- own-encoder LZW round-trip ----------------------------------------------


def _lzw_encode(indices, min_code_size):
    """Independent GIF-LZW encoder (written against the spec, not the
    decoder): emits CLEAR, string codes with width growth, EOI."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    bits, nbits = 0, 0
    out = bytearray()

    def emit(code, size):
        nonlocal bits, nbits
        bits |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8

    emit(clear, code_size)
    cur = b""
    for i in indices:
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], code_size)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = bytes([i])
    if cur:
        emit(table[cur], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


def _build_gif(w, h, indices, palette, min_code_size=4, interlaced=False,
               offset=(0, 0), screen=None):
    sw, sh = screen or (w, h)
    n = len(palette)
    depth = max((n - 1).bit_length(), 1)
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes([r, g, b])
    gct += b"\x00\x00\x00" * ((1 << depth) - n)
    head = (b"GIF89a" + struct.pack("<HH", sw, sh)
            + bytes([0x80 | (depth - 1), 0, 0]) + gct)
    ipacked = 0x40 if interlaced else 0
    desc = b"\x2c" + struct.pack("<HHHH", offset[0], offset[1], w, h) + bytes([ipacked])
    lzw = _lzw_encode(indices, min_code_size)
    blocks = bytearray([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + desc + bytes(blocks) + b"\x3b"


PALETTE = [(i * 16, 255 - i * 8, (i * 37) % 256) for i in range(16)]


def test_lzw_roundtrip_random():
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 16, size=40 * 23, dtype=np.uint8)
    gif = _build_gif(40, 23, idx.tolist(), PALETTE)
    img = decode_gif(gif)
    expect = np.array(PALETTE, dtype=np.uint8)[idx.reshape(23, 40)]
    assert np.array_equal(img, expect)


def test_lzw_roundtrip_repetitive_grows_code_width():
    """Highly repetitive data drives the table past 512 entries so the
    variable code-width growth path is exercised."""
    idx = ([0] * 700 + [1] * 700 + list(range(16)) * 80) * 2
    w, h = 64, len(idx) // 64
    idx = idx[: w * h]
    gif = _build_gif(w, h, idx, PALETTE)
    img = decode_gif(gif)
    expect = np.array(PALETTE, dtype=np.uint8)[
        np.array(idx, dtype=np.uint8).reshape(h, w)
    ]
    assert np.array_equal(img, expect)


def test_gif_interlaced():
    idx = [(x + y) % 16 for y in range(16) for x in range(9)]
    frame = np.array(idx, dtype=np.uint8).reshape(16, 9)
    # paint rows in interlace order: passes 0,8.. / 4,12.. / 2,6.. / 1,3..
    order = (list(range(0, 16, 8)) + list(range(4, 16, 8))
             + list(range(2, 16, 4)) + list(range(1, 16, 2)))
    painted = frame[order].ravel().tolist()
    gif = _build_gif(9, 16, painted, PALETTE, interlaced=True)
    img = decode_gif(gif)
    assert np.array_equal(img, np.array(PALETTE, dtype=np.uint8)[frame])


def test_gif_subframe_placement_and_background():
    idx = [5] * (3 * 2)
    gif = _build_gif(3, 2, idx, PALETTE, offset=(2, 1), screen=(7, 5))
    img = decode_gif(gif)
    pal = np.array(PALETTE, dtype=np.uint8)
    assert img.shape == (5, 7, 3)
    assert np.array_equal(img[1:3, 2:5], np.broadcast_to(pal[5], (2, 3, 3)))
    assert np.array_equal(img[0, 0], pal[0])  # background index 0


def test_gif_error_paths():
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    truncated = _build_gif(6, 6, [1] * 36, PALETTE)[:20]
    with pytest.raises(ValueError):
        decode_gif(truncated)


def test_g711_expanders_cover_all_bytes():
    """Every byte value expands to a sane 16-bit magnitude, sign split at
    the spec bit, and the zero codes map near zero."""
    all_bytes = np.arange(256, dtype=np.uint8)
    for fn, zero_code in ((_g711_ulaw_expand, 0xFF), (_g711_alaw_expand, 0x55)):
        v = fn(all_bytes)
        assert v.min() >= -32768 and v.max() <= 32767
        assert abs(int(fn(np.array([zero_code], dtype=np.uint8))[0])) <= 8
