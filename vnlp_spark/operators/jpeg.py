"""Pure-numpy baseline JPEG codec (VERDICT r03 #7).

The container has no Pillow/libjpeg, so — same argument that delivered
the PNG codec (operators/png.py) — the baseline-sequential-DCT subset of
ITU-T T.81 is implemented directly: marker parse, DQT/DHT/SOF0/SOS/DRI,
canonical Huffman decode over the byte-stuffed entropy stream, run-length
AC + differential DC, dequantize, zigzag, 8x8 IDCT as two matrix
multiplies against the orthonormal DCT-II basis, nearest-neighbor chroma
upsampling and JFIF YCbCr->RGB.  Grayscale and 4:4:4 / 4:2:2 / 4:2:0
sampling are supported.  Progressive (SOF2, round-5 #5) decodes too:
spectral-selection bands, successive-approximation DC/AC first and
refinement scans with EOB runs (T.81 §G.2/G.1.2.3), accumulated into a
per-component coefficient store and reconstructed at EOI — validated
against the libjpeg-produced progressive stream shipped with the Spark
distribution (5-scan script with AC successive approximation) and by
the progressive encoder below.  Arithmetic coding and hierarchical
(SOF3+) still raise ``NotImplementedError`` honestly.

The matching encoders (baseline and spectral-selection progressive,
4:4:4 or grayscale, Annex-K tables) exist to build round-trip test
fixtures without any imaging library — mirroring ``png.encode_png``;
progressive and baseline encodes of the same image decode
bit-identically, pinning the two decode paths to each other.

Reference parity note: the VNLP reference has no image path at all; this
module serves the multimodal column contract in SURVEY §"LLM-data-
pipeline operators" (decode_image in operators/multimodal.py).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II basis: X = A @ x  (x spatial column)
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16)
_A *= np.sqrt(2.0 / 8.0)
_A[0, :] *= 1.0 / np.sqrt(2.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T

# Annex K.1/K.2 quantization tables (luminance / chrominance), natural order
K_LUM_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
K_CHR_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16], huffval)
K_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
K_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
K_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
K_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def is_jpeg(payload: bytes) -> bool:
    return bool(payload) and payload[:2] == b"\xff\xd8"


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman per T.81 Annex C: (code_length -> codes in
    symbol order).  Decoding walks length-by-length with the numeric
    min/max code trick (fast enough, no tree allocation)."""

    def __init__(self, bits: List[int], huffval: List[int]):
        self.minc = [0] * 17
        self.maxc = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.minc[ln] = code
            n = bits[ln - 1]
            code += n
            k += n
            self.maxc[ln] = code - 1 if n else -1
            code <<= 1
        self.huffval = huffval

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxc[ln] >= 0 and code <= self.maxc[ln]:
                return self.huffval[self.valptr[ln] + code - self.minc[ln]]
        raise ValueError("corrupt JPEG: invalid Huffman code")


class _BitReader:
    """Entropy-stream bit reader with 0xFF00 byte-unstuffing; stops at
    any real marker (leaves position ON the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # a real marker: back up and signal end-of-data
                    self.pos -= 1
                    raise ValueError("corrupt JPEG: hit marker mid-block")
            self.buf = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1: map the t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array (h, w) grayscale or (h, w, 3)
    RGB.  Raises ``NotImplementedError`` for progressive / arithmetic /
    12-bit streams and ``ValueError`` for corrupt data."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG (missing SOI)")
    data = payload
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffTable] = {}
    huff_ac: Dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    out = None
    prog_coefs = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[pos:pos + 2], "big")
        body = data[pos + 2: pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i:i + 64], dtype=np.uint8
                                        ).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i:i + 128], dtype=">u2"
                                        ).astype(np.int64)
                    i += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1: i + 17])
                nsym = sum(bits)
                vals = list(body[i + 17: i + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                # persistent DCT-coefficient store, filled scan by scan
                # (zigzag order per block); reconstructed at EOI
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                prog_coefs = [
                    np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                             dtype=np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) DCT "
                "are supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    (i, x) for i, x in enumerate(frame["comps"])
                    if x["id"] == cid)
                scan.append({**comp[1], "ci": comp[0],
                             "dc": tt >> 4, "ac": tt & 0xF})
            entropy_start = pos + seg_len
            if frame.get("progressive"):
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                pos = _decode_scan_progressive(
                    data, entropy_start, frame, scan, prog_coefs,
                    huff_dc, huff_ac, restart_interval,
                    ss, se, ahal >> 4, ahal & 0xF)
            else:
                out, pos = _decode_scan(data, entropy_start, frame, scan,
                                        qt, huff_dc, huff_ac,
                                        restart_interval)
            continue  # pos already advanced past the scan
        pos += seg_len

    if frame is not None and frame.get("progressive") and prog_coefs:
        return _reconstruct_progressive(frame, prog_coefs, qt)
    if out is None:
        raise ValueError("corrupt JPEG: no scan decoded")
    return out


def _skip_to_marker(data: bytes, p: int) -> int:
    """Advance past entropy bytes to the next real marker (not a stuffed
    0xFF00 and not an RSTn, which live inside the entropy stream)."""
    while p + 1 < len(data) and not (
            data[p] == 0xFF and data[p + 1] != 0x00
            and not 0xD0 <= data[p + 1] <= 0xD7):
        p += 1
    return p


def _decode_scan_progressive(data, pos, frame, scan, coefs, huff_dc,
                             huff_ac, restart_interval, ss, se, ah, al
                             ) -> int:
    """One progressive scan (ITU-T T.81 §G.2): spectral selection band
    [ss, se] at successive-approximation bit position ``al`` (``ah`` is
    the previous position, 0 for a first scan).  Updates the persistent
    per-component zigzag coefficient store ``coefs`` in place and
    returns the stream position after the scan's entropy data.

    DC scans (ss == 0) may be interleaved in MCU order; AC scans carry
    exactly one component in block-raster order over that component's
    own (non-MCU-padded) block grid.  EOB runs (EOBn codes) span blocks
    within an AC scan; the refinement path applies correction bits to
    every nonzero-history coefficient it crosses (§G.1.2.3).
    """
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(data, pos)
    p1 = 1 << al

    def restart(idx, state):
        if restart_interval and idx and idx % restart_interval == 0:
            br.align()
            q = br.pos
            if q + 1 < len(data) and data[q] == 0xFF and \
                    0xD0 <= data[q + 1] <= 0xD7:
                br.pos = q + 2
            state["pred"] = [0] * len(scan)
            state["eobrun"] = 0

    state = {"pred": [0] * len(scan), "eobrun": 0}

    if ss == 0:  # DC scan (first or refinement), possibly interleaved
        if se != 0:
            raise ValueError("corrupt JPEG: DC scan with Se != 0")

        def dc_one(blk, si):
            if ah == 0:
                t = huff_dc[scan[si]["dc"]].decode(br)
                diff = _extend(br.receive(t), t)
                state["pred"][si] += diff
                blk[0] = state["pred"][si] << al
            elif br.bit():
                blk[0] |= p1

        if len(scan) > 1:  # interleaved, MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    restart(my * mcus_x + mx, state)
                    for si, c in enumerate(scan):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_one(coefs[c["ci"]][my * c["v"] + by,
                                                      mx * c["h"] + bx],
                                       si)
        else:  # non-interleaved: the component's own block grid
            c = scan[0]
            cw = (w * c["h"] + hmax - 1) // hmax
            ch = (h * c["v"] + vmax - 1) // vmax
            for yb in range((ch + 7) // 8):
                for xb in range((cw + 7) // 8):
                    restart(yb * ((cw + 7) // 8) + xb, state)
                    dc_one(coefs[c["ci"]][yb, xb], 0)
        return _skip_to_marker(data, br.pos)

    # AC scan: exactly one component, raster order over its block grid
    if len(scan) != 1:
        raise ValueError("corrupt JPEG: interleaved AC progressive scan")
    c = scan[0]
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    nbx = (cw + 7) // 8
    nby = (ch + 7) // 8
    ac = huff_ac[c["ac"]]
    store = coefs[c["ci"]]
    bi = 0
    for yb in range(nby):
        for xb in range(nbx):
            restart(bi, state)
            bi += 1
            blk = store[yb, xb]
            if ah == 0:  # first scan for this band
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    continue
                k = ss
                while k <= se:
                    rs = ac.decode(br)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += br.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("corrupt JPEG: band overflow")
                    blk[k] = _extend(br.receive(s), s) << al
                    k += 1
            else:  # refinement scan (§G.1.2.3)
                k = ss
                if state["eobrun"] == 0:
                    while k <= se:
                        rs = ac.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r < 15:
                                state["eobrun"] = (1 << r)
                                if r:
                                    state["eobrun"] += br.receive(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise ValueError(
                                    "corrupt JPEG: bad refinement size")
                            val = p1 if br.bit() else -p1
                        while k <= se:
                            if blk[k] != 0:
                                if br.bit() and not blk[k] & p1:
                                    blk[k] += p1 if blk[k] > 0 else -p1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if state["eobrun"] > 0:
                    # correction bits for nonzero-history coefficients in
                    # the REMAINING band only — positions before k were
                    # already refined by the loop above
                    for kk in range(k, se + 1):
                        if blk[kk] != 0:
                            if br.bit() and not blk[kk] & p1:
                                blk[kk] += p1 if blk[kk] > 0 else -p1
                    state["eobrun"] -= 1
    return _skip_to_marker(data, br.pos)


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficients and
    assemble the frame exactly like the baseline path."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        store = coefs[ci]
        nby, nbx = store.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        q = qt[c["tq"]]
        for yb in range(nby):
            for xb in range(nbx):
                cf = np.zeros(64, dtype=np.float64)
                cf[ZIGZAG] = store[yb, xb]
                plane[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] = _idct2(
                    cf.reshape(8, 8) * q)
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 128.0, 0, 255).astype(np.uint8)
    if len(full) == 3:
        y = full[0] + 128.0
        cb, cr = full[1], full[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        return np.clip(np.stack([r, g, b], axis=-1), 0, 255
                       ).astype(np.uint8)
    raise NotImplementedError(f"{len(full)}-component JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> Tuple[np.ndarray, int]:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = []
    for c in scan:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align()
                # expect RSTn marker
                p = br.pos
                if p + 1 < len(data) and data[p] == 0xFF and \
                        0xD0 <= data[p + 1] <= 0xD7:
                    br.pos = p + 2
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(br, huff_dc[c["dc"]],
                                              huff_ac[c["ac"]],
                                              qt[c["tq"]], pred, ci)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1

    # upsample to full frame grid, crop, color-convert
    full = []
    for ci, c in enumerate(scan):
        sy, sx = vmax // c["v"], hmax // c["h"]
        p = planes[ci]
        if sy > 1 or sx > 1:
            p = np.repeat(np.repeat(p, sy, axis=0), sx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        img = np.clip(full[0] + 128.0, 0, 255).astype(np.uint8)
    elif len(full) == 3:
        y = full[0] + 128.0
        cb = full[1]
        cr = full[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        img = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    else:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    # skip to next marker after the entropy data
    p = br.pos
    while p + 1 < len(data) and not (data[p] == 0xFF and data[p + 1] != 0x00
                                     and not 0xD0 <= data[p + 1] <= 0xD7):
        p += 1
    return img, p


def _decode_block(br, dct, act, q, pred, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    t = dct.decode(br)
    diff = _extend(br.receive(t), t)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC index overflow")
        zz[k] = _extend(br.receive(s), s)
        k += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[ZIGZAG] = zz
    return _idct2(coeffs.reshape(8, 8) * q)


# --------------------------------------------------------------------------
# encoder (baseline, grayscale or 4:4:4 — fixture generation + round-trip)
# --------------------------------------------------------------------------


class _HuffEncoder:
    def __init__(self, bits, huffval):
        self.code: Dict[int, Tuple[int, int]] = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.code[huffval[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255)


def _blocks_of(plane: np.ndarray):
    ph = (plane.shape[0] + 7) // 8 * 8
    pw = (plane.shape[1] + 7) // 8 * 8
    padded = np.zeros((ph, pw))
    padded[:plane.shape[0], :plane.shape[1]] = plane
    # edge-replicate padding avoids ringing at borders
    padded[plane.shape[0]:, :plane.shape[1]] = plane[-1:, :]
    padded[:plane.shape[0], plane.shape[1]:] = plane[:, -1:]
    padded[plane.shape[0]:, plane.shape[1]:] = plane[-1, -1]
    for y in range(0, ph, 8):
        for x in range(0, pw, 8):
            yield padded[y:y + 8, x:x + 8]


def encode_jpeg(img: np.ndarray, quality: int = 85,
                progressive: bool = False) -> bytes:
    """uint8 (h, w) or (h, w, 3) -> JFIF bytes (grayscale or 4:4:4
    YCbCr, Annex-K tables scaled by ``quality``).  ``progressive=True``
    emits a spectral-selection SOF2 stream (DC scan + two AC band scans
    per component) — the decoder-validation twin of the progressive
    decode path, mirroring how the baseline encoder validates the
    baseline decoder without any imaging library."""
    if progressive:
        return _encode_progressive(np.asarray(img), quality)
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _quality_scale(K_LUM_QUANT, quality).reshape(8, 8).astype(np.float64)
    qc = _quality_scale(K_CHR_QUANT, quality).reshape(8, 8).astype(np.float64)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"

    def seg(marker, body):
        out.extend(marker)
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    zz_y = qy.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    seg(b"\xff\xdb", b"\x00" + zz_y)
    if not gray:
        zz_c = qc.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        seg(b"\xff\xdb", b"\x01" + zz_c)

    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    seg(b"\xff\xc0", sof)

    for tc_th, (bits, vals) in ((0x00, K_DC_LUM), (0x10, K_AC_LUM)):
        seg(b"\xff\xc4", bytes([tc_th]) + bytes(bits) + bytes(vals))
    if not gray:
        for tc_th, (bits, vals) in ((0x01, K_DC_CHR), (0x11, K_AC_CHR)):
            seg(b"\xff\xc4", bytes([tc_th]) + bytes(bits) + bytes(vals))

    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += b"\x00\x3f\x00"
    seg(b"\xff\xda", sos)

    bw = _BitWriter()
    dc_l, ac_l = _HuffEncoder(*K_DC_LUM), _HuffEncoder(*K_AC_LUM)
    if gray:
        planes = [(img.astype(np.float64) - 128.0, qy, dc_l, ac_l)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        dc_c, ac_c = _HuffEncoder(*K_DC_CHR), _HuffEncoder(*K_AC_CHR)
        planes = [(y, qy, dc_l, ac_l), (cb, qc, dc_c, ac_c),
                  (cr, qc, dc_c, ac_c)]
    # 4:4:4: MCU = one block per component, interleaved
    blocks_per = [list(_blocks_of(p)) for p, _, _, _ in planes]
    preds = [0] * len(planes)
    n_blocks = len(blocks_per[0])
    for bi in range(n_blocks):
        for ci, (_, q, dce, ace) in enumerate(planes):
            _encode_single_block(bw, blocks_per[ci][bi], q, dce, ace, preds, ci)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_progressive(img: np.ndarray, quality: int) -> bytes:
    """Spectral-selection progressive encoder (SOF2): one interleaved DC
    scan (Ss=0 Se=0 Al=0) followed by two AC band scans per component
    (Ss=1..5, Ss=6..63) in raster order with per-block EOB0 — the legal
    minimal scan script, exercising the progressive decoder's band
    bookkeeping and EOB handling against ground-truth pixels."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _quality_scale(K_LUM_QUANT, quality).reshape(8, 8).astype(np.float64)
    qc = _quality_scale(K_CHR_QUANT, quality).reshape(8, 8).astype(np.float64)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"

    def seg(marker, body):
        out.extend(marker)
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    seg(b"\xff\xdb", b"\x00" + qy.reshape(-1)[ZIGZAG].astype(np.uint8
                                                            ).tobytes())
    if not gray:
        seg(b"\xff\xdb", b"\x01" + qc.reshape(-1)[ZIGZAG].astype(
            np.uint8).tobytes())

    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    seg(b"\xff\xc2", sof)

    for tc_th, (bits, vals) in ((0x00, K_DC_LUM), (0x10, K_AC_LUM)):
        seg(b"\xff\xc4", bytes([tc_th]) + bytes(bits) + bytes(vals))
    if not gray:
        for tc_th, (bits, vals) in ((0x01, K_DC_CHR), (0x11, K_AC_CHR)):
            seg(b"\xff\xc4", bytes([tc_th]) + bytes(bits) + bytes(vals))

    dc_l, ac_l = _HuffEncoder(*K_DC_LUM), _HuffEncoder(*K_AC_LUM)
    if gray:
        planes = [(img.astype(np.float64) - 128.0, qy, dc_l, ac_l)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        dc_c, ac_c = _HuffEncoder(*K_DC_CHR), _HuffEncoder(*K_AC_CHR)
        planes = [(y, qy, dc_l, ac_l), (cb, qc, dc_c, ac_c),
                  (cr, qc, dc_c, ac_c)]

    # quantized zigzag coefficients per component per block
    comp_zz = []
    for p, q, _, _ in planes:
        comp_zz.append([
            np.round(_dct2(blk) / q).astype(np.int64).reshape(-1)[ZIGZAG]
            for blk in _blocks_of(p)
        ])
    n_blocks = len(comp_zz[0])

    # scan 1: interleaved DC, Ss=0 Se=0 Ah=0 Al=0
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += b"\x00\x00\x00"
    seg(b"\xff\xda", sos)
    bw = _BitWriter()
    preds = [0] * len(planes)
    for bi in range(n_blocks):
        for ci, (_, _, dce, _) in enumerate(planes):
            zz = comp_zz[ci][bi]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            t = int(abs(diff)).bit_length()
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            code, ln = dce.code[t]
            bw.write(code, ln)
            if t:
                bw.write(mag & ((1 << t) - 1), t)
    bw.flush()
    out += bw.out

    # AC band scans, one component at a time
    for ci, (_, _, _, ace) in enumerate(planes):
        for ss, se in ((1, 5), (6, 63)):
            sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11,
                         ss, se, 0x00])
            seg(b"\xff\xda", sos)
            bw = _BitWriter()
            for bi in range(n_blocks):
                zz = comp_zz[ci][bi]
                nz = [k for k in range(ss, se + 1) if zz[k]]
                if not nz:
                    code, ln = ace.code[0x00]  # EOB0
                    bw.write(code, ln)
                    continue
                last_nz = nz[-1]
                run = 0
                for k in range(ss, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ace.code[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    t = int(abs(v)).bit_length()
                    mag = v if v > 0 else v + (1 << t) - 1
                    code, ln = ace.code[(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(mag & ((1 << t) - 1), t)
                    run = 0
                if last_nz < se:
                    code, ln = ace.code[0x00]
                    bw.write(code, ln)
            bw.flush()
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def _encode_single_block(bw, block, q, dc_enc, ac_enc, preds, ci):
    coeffs = _dct2(block)
    zz = np.round(coeffs / q).astype(np.int64).reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - preds[ci]
    preds[ci] = int(zz[0])
    t = int(abs(diff)).bit_length()
    mag = diff if diff >= 0 else diff + (1 << t) - 1
    code, ln = dc_enc.code[t]
    bw.write(code, ln)
    if t:
        bw.write(mag & ((1 << t) - 1), t)
    run = 0
    nz = [k for k in range(1, 64) if zz[k]]
    last_nz = nz[-1] if nz else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, ln = ac_enc.code[0x00]  # EOB
            bw.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc.code[0xF0]
            bw.write(code, ln)
            run -= 16
        t = int(abs(v)).bit_length()
        mag = v if v > 0 else v + (1 << t) - 1
        code, ln = ac_enc.code[(run << 4) | t]
        bw.write(code, ln)
        bw.write(mag & ((1 << t) - 1), t)
        run = 0
    else:
        if last_nz == 63:
            pass  # block ended exactly on a nonzero coefficient
