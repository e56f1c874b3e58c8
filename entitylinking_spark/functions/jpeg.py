"""Baseline JPEG (ITU T.81) decoder in pure stdlib + numpy.

Closes the round-3 "compressed media decode" gap for the dominant
compressed image format without external libraries: marker parse, DQT/DHT
tables, huffman entropy decode with byte unstuffing and restart markers,
dequant + zigzag, float IDCT, chroma upsampling for arbitrary Hi/Vi
sampling factors (4:4:4 / 4:2:2 / 4:2:0), YCbCr -> RGB.

Scope (declared, like the other decoders in operators/multimodal.py):
baseline DCT (SOF0), 8-bit precision, huffman coding. Progressive (SOF2),
arithmetic coding, and 12-bit inputs raise NotImplementedError.

This is the slow-but-correct reference path: entropy decoding is a Python
bit loop (a few ms per small image, O(coefficients)). It runs inside the
mapInPandas batch worker (operators/multimodal.py), where per-payload
Python is the declared execution model for media decode.

Reference behavior target: the reference repo has no media pipeline at
all; this supports the training-data multimodal extension (SURVEY.md
LLM-pipeline operators).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag index -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal DCT-II basis: A @ block @ A.T = DCT, A.T @ coefs @ A = IDCT
_K = np.arange(8)
_DCT_A = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT_A[0, :] = np.sqrt(1 / 8)


def idct2(coefs: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT (float)."""
    return _DCT_A.T @ coefs @ _DCT_A


def dct2(block: np.ndarray) -> np.ndarray:
    """8x8 forward DCT (float) — used by the test encoder."""
    return _DCT_A @ block @ _DCT_A.T


class HuffTable:
    """Canonical JPEG huffman table: (code_length, code) -> symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        # content key for the round-6 LUT cache (_huff_lut): identical DHT
        # segments across payloads (the overwhelmingly common case) build
        # their 2^16-entry decode tables once per process
        self.key = (bytes(counts), bytes(symbols))
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in entropy stream")


class BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG byte
    unstuffing (FF 00 -> FF) and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker reached mid-read: pad with zeros (spec 0-fill)
                    self.pos -= 1
                    b = 0
            self.bits = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_restart(self) -> None:
        """Drop partial bits and consume the RSTn marker."""
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, size: int) -> int:
    """JPEG coefficient sign extension (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Round-6 fast entropy layer (same algorithm, vectorized bit plumbing).
#
# The original scan loop called BitReader.read_bit() once per BIT and
# walked the canonical-code dict once per candidate length — ~25 us per
# Huffman symbol of pure Python. The decode below is per-SYMBOL instead:
# the entropy segment is unstuffed once with numpy, every 16-bit window
# value is precomputed, and each (length, symbol) lookup is one table
# index. Decoded coefficients and the IDCT pipeline are unchanged, so
# pixels are identical (golden external-codec fixtures + round-trip
# tests assert it); throughput measured ~10x (0.55 -> ~6 MB/s payload).
# ---------------------------------------------------------------------------

_W16_POWERS = (1 << np.arange(15, -1, -1)).astype(np.uint32)


def _prescan_entropy(data: bytes, pos: int):
    """Unstuff the entropy-coded segment in one vectorized pass.

    Returns (w16, seg_bit_starts): `w16` is a python list where w16[i] is
    the value of the 16 bits starting at bit i over the CONCATENATED
    restart segments (each segment zero-padded by 8 bytes — the spec's
    0-fill past a marker — so reads that spill past a segment see zeros
    exactly like BitReader's marker handling); `seg_bit_starts[r]` is the
    bit offset where restart segment r begins.
    """
    buf = np.frombuffer(data, dtype=np.uint8, count=len(data) - pos, offset=pos)
    ff = np.nonzero(buf == 0xFF)[0]
    ff = ff[ff + 1 < len(buf)]
    nxt = buf[ff + 1]
    stuffed = nxt == 0x00
    restart = (nxt >= 0xD0) & (nxt <= 0xD7)
    other = ~(stuffed | restart)
    end = int(ff[other][0]) if other.any() else len(buf)
    keep = np.ones(end, dtype=bool)
    st = ff[stuffed]
    keep[st[st < end] + 1] = False
    rs = ff[restart]
    rs = rs[rs < end]
    keep[rs] = False
    rs_next = rs + 1
    keep[rs_next[rs_next < end]] = False
    # clean byte stream + restart boundaries in clean coordinates
    clean = buf[:end][keep]
    clean_pos_of = np.cumsum(keep) - keep.astype(np.int64)  # raw -> clean idx
    seg_byte_starts = [0]
    for r in rs:
        p = int(r) + 2  # first byte after the RSTn marker
        seg_byte_starts.append(int(clean_pos_of[p]) if p < end else len(clean))
    pad = np.zeros(8, dtype=np.uint8)
    pieces = []
    seg_bit_starts = []
    acc_bits = 0
    bounds = seg_byte_starts + [len(clean)]
    for i in range(len(seg_byte_starts)):
        seg = clean[bounds[i]:bounds[i + 1]]
        seg_bit_starts.append(acc_bits)
        pieces.append(seg)
        pieces.append(pad)
        acc_bits += (len(seg) + len(pad)) * 8
    allbytes = np.concatenate(pieces) if pieces else pad
    bits = np.unpackbits(allbytes).astype(np.uint32)
    if len(bits) < 16:
        bits = np.concatenate([bits, np.zeros(16, dtype=np.uint32)])
    from numpy.lib.stride_tricks import sliding_window_view

    w16 = (sliding_window_view(bits, 16) @ _W16_POWERS).tolist()
    return w16, seg_bit_starts


_HUFF_LUT_CACHE: dict = {}


def _huff_lut(table: HuffTable):
    """(lut_len, lut_sym) python lists over all 2^16 window values: the
    canonical code of length L occupies the 2^(16-L) window values whose
    16-bit prefix matches. lut_len 0 = invalid code. Cached per table
    content — building + tolist'ing the 65k-entry tables measured 40% of
    a small-payload decode."""
    hit = _HUFF_LUT_CACHE.get(table.key)
    if hit is not None:
        return hit
    lut_len = np.zeros(65536, dtype=np.uint8)
    lut_sym = np.zeros(65536, dtype=np.uint8)
    for (length, code), sym in table.lookup.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        lut_len[lo:hi] = length
        lut_sym[lo:hi] = sym
    out = (lut_len.tolist(), lut_sym.tolist())
    if len(_HUFF_LUT_CACHE) < 64:  # bounded: 64 tables x ~130k ints
        _HUFF_LUT_CACHE[table.key] = out
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF/JPEG bytes -> (h, w) grayscale or (h, w, 3) RGB uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], HuffTable] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — without this skip, a padded stream would read the
        # real marker byte as part of a bogus segment length (ADVICE r4)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=i + 1
                ).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                htables[(tc, th)] = HuffTable(counts, body[i + 17:i + 17 + n])
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0) JPEG supported, got SOF marker {marker:#x}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "td": tda >> 4, "ta": tda & 0xF})
            return _decode_scan(
                data, pos + 2 + seg_len, frame, scan, qtables, htables,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += 2 + seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # coefficient rows in zigzag order, one per 8x8 block, in loop order
    # (my, mx, by, bx) per component; dequant + zigzag scatter + IDCT +
    # plane assembly run BATCHED after the entropy loop (np.matmul with
    # out= buffers is bit-identical to the per-block idct2 — verified —
    # and ~10x cheaper than per-block numpy calls on this box)
    Zs = {c["id"]: np.zeros((mcus_y * mcus_x * c["v"] * c["h"], 64),
                            dtype=np.int32) for c in scan}
    bidx = {c["id"]: 0 for c in scan}
    # fast entropy layer (see module section above): same decoded symbols
    # and coefficients as the BitReader/HuffTable walk, per-SYMBOL cost.
    w16, seg_starts = _prescan_entropy(data, pos)
    nbits = len(w16)
    luts = {key: _huff_lut(t) for key, t in htables.items()}
    bitpos = 0
    seg_idx = 0
    pred = {c["id"]: 0 for c in scan}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(seg_starts):
                    raise ValueError("expected restart marker")
                bitpos = seg_starts[seg_idx]
                pred = {c["id"]: 0 for c in scan}
            n_mcu += 1
            for c in scan:
                dc_len, dc_sym = luts[(0, c["td"])]
                ac_len, ac_sym = luts[(1, c["ta"])]
                zrows = Zs[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = zrows[bidx[c["id"]]]
                        bidx[c["id"]] += 1
                        if bitpos >= nbits:
                            raise ValueError("truncated entropy stream")
                        wv = w16[bitpos]
                        ln = dc_len[wv]
                        if ln == 0:
                            raise ValueError(
                                "invalid huffman code in entropy stream")
                        bitpos += ln
                        size = dc_sym[wv]
                        if size:
                            if bitpos >= nbits:
                                raise ValueError("truncated entropy stream")
                            diff = _extend(w16[bitpos] >> (16 - size), size)
                            bitpos += size
                        else:
                            diff = 0
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            if bitpos >= nbits:
                                raise ValueError("truncated entropy stream")
                            wv = w16[bitpos]
                            ln = ac_len[wv]
                            if ln == 0:
                                raise ValueError(
                                    "invalid huffman code in entropy stream")
                            bitpos += ln
                            rs = ac_sym[wv]
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            if bitpos >= nbits:
                                raise ValueError("truncated entropy stream")
                            zz[k] = _extend(w16[bitpos] >> (16 - s), s)
                            bitpos += s
                            k += 1
    # batched dequant + zigzag scatter + IDCT + plane assembly (block
    # order is (my, mx, by, bx), so one transpose-reshape rebuilds each
    # plane exactly as the old per-block slice writes did)
    planes = {}
    for c in scan:
        q = qtables[c["tq"]]
        Z = Zs[c["id"]]
        C = np.zeros((len(Z), 64), dtype=np.float64)
        C[:, ZIGZAG] = Z * q
        c3 = C.reshape(-1, 8, 8)
        t = np.empty_like(c3)
        blocks = np.empty_like(c3)
        np.matmul(_DCT_A.T, c3, out=t)
        np.matmul(t, _DCT_A, out=blocks)
        blocks += 128.0
        v_, h_ = c["v"], c["h"]
        planes[c["id"]] = (
            blocks.reshape(mcus_y, mcus_x, v_, h_, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * v_ * 8, mcus_x * h_ * 8)
        )
    # upsample each component to full resolution and crop
    out = []
    for c in scan:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)
