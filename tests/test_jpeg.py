"""Baseline JPEG decoder (functions/jpeg.py) vs an INDEPENDENT spec-built
encoder: the encoder below is written from T.81 (forward DCT, quantize,
zigzag, huffman with its own fixed-length code tables, byte stuffing,
optional 4:2:0 subsampling and restart markers), so a decoder bug cannot
cancel against an encoder bug — they only meet at the byte format."""

import struct

import numpy as np
import pytest

from entitylinking_spark.functions.jpeg import ZIGZAG, dct2, decode_jpeg

# ---------------------------------------------------------------------------
# minimal spec-conforming encoder (test oracle)
# ---------------------------------------------------------------------------

_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]


def _fixed_table(symbols: list[int], length: int):
    """All codes at one length: counts[length]=n, canonical codes 0..n-1."""
    assert len(symbols) <= (1 << length)
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (length, i) for i, sym in enumerate(symbols)}
    return counts, symbols, codes


_DC_COUNTS, _DC_ORDER, _DC_CODES = _fixed_table(_DC_SYMS, 4)
_AC_COUNTS, _AC_ORDER, _AC_CODES = _fixed_table(_AC_SYMS, 9)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _mag(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    raw = v if v >= 0 else v + (1 << size) - 1
    return size, raw


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int) -> int:
    coefs = dct2(block.astype(np.float64) - 128.0)
    zz = np.round(coefs.reshape(-1)[ZIGZAG] / q).astype(int)
    size, raw = _mag(int(zz[0]) - pred)
    ln, code = _DC_CODES[size]
    bw.write(code, ln)
    bw.write(raw, size)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = _AC_CODES[0xF0]
            bw.write(code, ln)
            run -= 16
        size, raw = _mag(int(zz[k]))
        ln, code = _AC_CODES[(run << 4) | size]
        bw.write(code, ln)
        bw.write(raw, size)
        run = 0
    if run:
        ln, code = _AC_CODES[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _pad_to(img: np.ndarray, mult: int) -> np.ndarray:
    h, w = img.shape
    return np.pad(img, ((0, -h % mult), (0, -w % mult)), mode="edge")


def make_jpeg(img: np.ndarray, qval: int = 1, subsample: str = "444",
              restart_interval: int = 0) -> bytes:
    """Encode gray (h,w) or RGB (h,w,3) as baseline JFIF bytes."""
    q = np.full(64, qval, dtype=np.int32)
    if img.ndim == 2:
        comps = [("Y", img.astype(np.float64), 1, 1)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            hh, ww = (img.shape[0] + 1) // 2 * 2, (img.shape[1] + 1) // 2 * 2
            cb2 = _pad_to(cb, 2).reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            cr2 = _pad_to(cr, 2).reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            comps = [("Y", y, 2, 2), ("Cb", cb2, 1, 1), ("Cr", cr2, 1, 1)]
        else:
            comps = [("Y", y, 1, 1), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
    h, w = img.shape[:2]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + q.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_, _, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_ORDER))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_ORDER))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # pad each plane to its own MCU-aligned size
    planes = []
    for _, plane, ch, cv in comps:
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        planes.append(np.pad(plane, ((0, ph - plane.shape[0]),
                                     (0, pw - plane.shape[1])), mode="edge"))

    bw = _BitWriter()
    preds = [0] * len(comps)
    n_mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            n_mcu += 1
            for ci, (_, _, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                        blk = planes[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(bw, blk, q, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_flat_gray_near_exact():
    img = np.full((16, 16), 130, dtype=np.uint8)
    got = decode_jpeg(make_jpeg(img))
    assert got.shape == (16, 16)
    assert np.abs(got.astype(int) - 130).max() <= 1


def test_gradient_gray_roundtrip_tight():
    y, x = np.mgrid[0:24, 0:40]
    img = ((x * 5 + y * 3) % 256).astype(np.uint8)
    got = decode_jpeg(make_jpeg(img, qval=1))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_random_rgb_444_roundtrip():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(17, 21, 3), dtype=np.uint8)  # non-multiple of 8
    got = decode_jpeg(make_jpeg(img, qval=1))
    assert got.shape == img.shape
    # q=1: error is DCT rounding + color-transform roundtrip only
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4
    assert np.abs(got.astype(float) - img.astype(float)).mean() <= 1.5


def test_coarse_quant_still_close_on_smooth_image():
    y, x = np.mgrid[0:32, 0:32]
    img = np.stack([(x * 3) % 200 + 20, (y * 2) % 180 + 30,
                    ((x + y) * 2) % 160 + 40], axis=2).astype(np.uint8)
    got = decode_jpeg(make_jpeg(img, qval=8))
    assert np.abs(got.astype(float) - img.astype(float)).mean() <= 6.0


def test_420_subsampling():
    rng = np.random.RandomState(7)
    # luma detail, flat chroma: 4:2:0 should be near-lossless here
    base = rng.randint(0, 256, size=(20, 28), dtype=np.uint8)
    img = np.stack([base, base, base], axis=2)  # gray in RGB -> constant chroma
    got = decode_jpeg(make_jpeg(img, qval=1, subsample="420"))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_restart_markers():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 48), dtype=np.uint8)
    plain = decode_jpeg(make_jpeg(img, qval=1))
    with_rst = decode_jpeg(make_jpeg(img, qval=1, restart_interval=2))
    np.testing.assert_array_equal(plain, with_rst)


def test_progressive_rejected():
    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(make_jpeg(img))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_truncation_and_garbage_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    img = np.zeros((8, 8), dtype=np.uint8)
    payload = make_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(payload[:20])  # header only, no SOS


def test_default_media_path_decodes_jpeg():
    from entitylinking_spark.operators.multimodal import _real_decode

    y, x = np.mgrid[0:16, 0:16]
    img = ((x + y) * 7 % 256).astype(np.uint8)
    feat = _real_decode(make_jpeg(img, qval=1), 8)
    gray = decode_jpeg(make_jpeg(img, qval=1)).astype(np.float64).ravel() / 255.0
    bounds = np.linspace(0, gray.size, 9).astype(int)
    want = np.float32([gray[bounds[i]:bounds[i + 1]].mean() for i in range(8)])
    np.testing.assert_allclose(feat, want, rtol=1e-6)
