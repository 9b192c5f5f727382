"""Minimal in-tree baseline JPEG codec (pure stdlib + numpy).

Decoder: baseline sequential DCT (SOF0/SOF1) AND progressive (SOF2 —
spectral selection, successive approximation, DC/AC refinement scans,
EOB runs; round 5), 8-bit, grayscale or YCbCr with 4:4:4 / 4:2:2 /
4:2:0 subsampling, restart markers. The remaining exotic SOFs
(lossless, arithmetic, hierarchical) raise ValueError — the multimodal
layer flags those payloads decoded=False instead of faking a decode
(the honest-stub discipline of pngcodec/bmpcodec).

Encoders: baseline (encode_jpeg) and progressive
(encode_jpeg_progressive), both 4:4:4, Annex-K quantization tables
(quality-scaled) and Annex-K Huffman tables. Progressive scans are a
REORDERING of the same quantized coefficients, so
decode(progressive(x)) == decode(baseline(x)) bit-for-bit at equal
quality — the cross-check that keeps the two coders honest against
each other (pinned in tests).

This is the test-scale twin of PIL/libjpeg on a real cluster; the
mapInPandas plumbing above it is identical either way. Reference
parity note: the reference repo handles opaque upstream attachment
payloads (userCode/xlsx/dag.py:56-76); codecs are beyond its scope —
this exists for the multimodal feature-extraction operators the target
engine adds.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# ---- zigzag ----------------------------------------------------------
def _zigzag() -> list[tuple[int, int]]:
    out = []
    for d in range(15):
        rs = range(max(0, d - 7), min(d, 7) + 1)
        for r in (rs if d % 2 == 1 else reversed(list(rs))):
            out.append((r, d - r))
    return out


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# ---- Annex K tables --------------------------------------------------
_QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_QT_CHR = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# ---- DCT -------------------------------------------------------------
def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


# ---- canonical Huffman -----------------------------------------------
def _build_encode(bits, vals):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits, vals):
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ====================================================== decoder ======
class _BitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing, RSTn handling,
    EOI stop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.restart_hit = False

    def _next_byte(self) -> int | None:
        d = self.data
        while self.pos < len(d):
            b = d[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            if self.pos >= len(d):
                return None
            m = d[self.pos]
            self.pos += 1
            if m == 0x00:
                return 0xFF
            if 0xD0 <= m <= 0xD7:  # restart marker
                self.restart_hit = True
                self.acc = 0
                self.n = 0
                continue
            return None  # EOI or any other marker: end of scan
        return None

    def read_bit(self) -> int:
        if self.n == 0:
            b = self._next_byte()
            if b is None:
                raise EOFError("scan data exhausted")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _planes_to_rgb(comps, planes, H, W, hmax, vmax) -> np.ndarray:
    """Upsample component planes to full resolution, crop, and color
    convert (shared by the baseline and progressive decoders)."""
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:H, :W])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First real marker (not stuffing, not RSTn) at or after pos."""
    pos = max(pos, 0)
    while pos + 1 < len(data):
        if (
            data[pos] == 0xFF
            and data[pos + 1] != 0x00
            and not (0xD0 <= data[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return len(data)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """-> HxWx3 uint8 RGB (grayscale replicated). Baseline (SOF0/1)
    and progressive (SOF2: spectral selection + successive
    approximation, DC and AC refinement scans, EOBRUN) both decode."""
    if not payload.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    H = W = 0
    restart_interval = 0
    progressive = False
    coefs: dict[int, np.ndarray] = {}
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = t
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            H, W = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if progressive:
                coefs = _alloc_coefs(comps, H, W)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker {marker:#x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            nc = seg[0]
            scan_comps = []
            for i in range(nc):
                cid, tbl = seg[1 + 2 * i], seg[2 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tbl >> 4
                        c["ac"] = tbl & 0xF
                        scan_comps.append(c)
            pos += seglen
            if not progressive:
                return _decode_scan(
                    data, pos, comps, qt, huff, H, W, restart_interval
                )
            ss, se, ahal = seg[1 + 2 * nc], seg[2 + 2 * nc], seg[3 + 2 * nc]
            end = _decode_prog_scan(
                data, pos, scan_comps, coefs, huff, H, W,
                comps, ss, se, ahal >> 4, ahal & 0xF, restart_interval,
            )
            pos = _next_marker_pos(data, end - 2)
            continue
        pos += seglen
    if progressive and comps and H:
        return _reconstruct_progressive(comps, coefs, qt, H, W)
    raise ValueError("no SOS segment found")


# ============================================ progressive decoding ===
def _comp_geometry(comps, H, W):
    """(hmax, vmax, mcux, mcuy, per-comp full-image block dims).

    Interleaved scans walk MCUs (each MCU holds h*v blocks per comp,
    padded to MCU multiples); non-interleaved scans walk the comp's own
    block raster: ceil(ceil(dim*h/hmax)/8) per A.2.2."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    dims = {}
    for c in comps:
        cw = -(-(W * c["h"]) // hmax)
        ch = -(-(H * c["v"]) // vmax)
        dims[c["id"]] = (-(-ch // 8), -(-cw // 8))
    return hmax, vmax, mcux, mcuy, dims


def _alloc_coefs(comps, H, W) -> dict[int, np.ndarray]:
    """Per-component coefficient accumulator [by, bx, 64] (zigzag),
    padded to MCU multiples so interleaved DC scans can write their
    padding blocks without bounds checks."""
    hmax, vmax, mcux, mcuy, _dims = _comp_geometry(comps, H, W)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }


def _decode_prog_scan(
    data, pos, scan_comps, coefs, huff, H, W, all_comps,
    ss, se, ah, al, dri,
) -> int:
    """One progressive SOS's entropy data into the coefficient
    accumulators. Returns the reader's end position (the caller
    re-finds the next marker from there)."""
    br = _BitReader(data, pos)
    hmax, vmax, mcux, mcuy, dims = _comp_geometry(all_comps, H, W)
    if ss == 0:  # DC scan: interleaved over the scan's components
        preds = {c["id"]: 0 for c in scan_comps}
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and unit and unit % dri == 0:
                    br.n = 0
                    preds = {c["id"]: 0 for c in scan_comps}
                    br.restart_hit = False
                unit += 1
                for c in scan_comps:
                    arr = coefs[c["id"]]
                    for v in range(c["v"]):
                        for h in range(c["h"]):
                            by, bx = my * c["v"] + v, mx * c["h"] + h
                            if ah == 0:  # first scan
                                s = br.decode_symbol(huff[(0, c["dc"])])
                                diff = _extend(br.read_bits(s), s) if s else 0
                                preds[c["id"]] += diff
                                arr[by, bx, 0] = preds[c["id"]] << al
                            else:  # refinement: one bit per block
                                if br.read_bit():
                                    arr[by, bx, 0] |= 1 << al
        return br.pos
    # AC scans: exactly one component, non-interleaved block raster
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must have one component")
    c = scan_comps[0]
    arr = coefs[c["id"]]
    nby, nbx = dims[c["id"]]
    act = huff[(1, c["ac"])]
    eobrun = 0
    unit = 0
    for by in range(nby):
        for bx in range(nbx):
            if dri and unit and unit % dri == 0:
                br.n = 0
                eobrun = 0
                br.restart_hit = False
            unit += 1
            blk = arr[by, bx]
            if ah == 0:  # AC first scan
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.decode_symbol(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow in band")
                    blk[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # AC refinement scan
                p1, m1 = 1 << al, -1 << al
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.decode_symbol(act)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise ValueError(
                                    "refinement scan size must be 1"
                                )
                            val = p1 if br.read_bit() else m1
                        while k <= se:
                            if blk[k] != 0:
                                if br.read_bit():
                                    if (blk[k] & p1) == 0:
                                        blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if r == 0:
                                    if val:
                                        blk[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            if br.read_bit():
                                if (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return br.pos


def _reconstruct_progressive(comps, coefs, qt, H, W) -> np.ndarray:
    hmax, vmax, mcux, mcuy, _dims = _comp_geometry(comps, H, W)
    planes = {}
    for c in comps:
        arr = coefs[c["id"]]
        nby, nbx = arr.shape[:2]
        q = qt[c["tq"]]
        plane = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                block = np.zeros((8, 8))
                block[_ZZ_ROWS, _ZZ_COLS] = arr[by, bx]
                block *= q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ block @ _DCT + 128.0
                )
        planes[c["id"]] = plane
    return _planes_to_rgb(comps, planes, H, W, hmax, vmax)


def _decode_scan(data, pos, comps, qt, huff, H, W, dri) -> np.ndarray:
    if not comps or H == 0 or W == 0:
        raise ValueError("SOS before SOF")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                # restart: the reader byte-aligns at the marker; reset
                # the DC predictors here
                br.n = 0
                preds = {c["id"]: 0 for c in comps}
                br.restart_hit = False
            mcu_count += 1
            for c in comps:
                dct = huff[(0, c["dc"])]
                act = huff[(1, c["ac"])]
                q = qt[c["tq"]]
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.decode_symbol(dct)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        block = np.zeros((8, 8))
                        block[_ZZ_ROWS, _ZZ_COLS] = zz
                        block *= q
                        px = _DCT.T @ block @ _DCT + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + h) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
    return _planes_to_rgb(comps, planes, H, W, hmax, vmax)


# ====================================================== encoder ======
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(bw, block, qtab, dc_codes, ac_codes, pred):
    d = _DCT @ (block - 128.0) @ _DCT.T
    zz = np.round(d / qtab)[_ZZ_ROWS, _ZZ_COLS].astype(np.int64)
    diff = int(zz[0]) - pred
    size = int(abs(diff)).bit_length()
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = int(abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> baseline JPEG, 4:4:4."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    H, W = arr.shape[:2]
    qlum = _quality_scale(_QT_LUM, quality)
    qchr = _quality_scale(_QT_CHR, quality)
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    out = bytearray(JPEG_MAGIC)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq, tab in ((0, qlum),) + (() if gray else ((1, qchr),)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tab[r, c]) for r, c in _ZZ)
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, H, W, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    tables = [(0x00, _DC_LUM_BITS, _DC_LUM_VALS), (0x10, _AC_LUM_BITS, _AC_LUM_VALS)]
    if not gray:
        tables += [
            (0x01, _DC_CHR_BITS, _DC_CHR_VALS),
            (0x11, _AC_CHR_BITS, _AC_CHR_VALS),
        ]
    for tid, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l, ac_l = _build_encode(_DC_LUM_BITS, _DC_LUM_VALS), _build_encode(
        _AC_LUM_BITS, _AC_LUM_VALS
    )
    dc_c, ac_c = _build_encode(_DC_CHR_BITS, _DC_CHR_VALS), _build_encode(
        _AC_CHR_BITS, _AC_CHR_VALS
    )
    bw = _BitWriter()
    preds = [0] * nc
    by = -(-H // 8)
    bx = -(-W // 8)
    padded = []
    for p in planes:
        pp = np.empty((by * 8, bx * 8))
        pp[:H, :W] = p
        pp[H:, :W] = p[-1:, :]  # edge-extend padding
        pp[:, W:] = pp[:, W - 1 : W]
        padded.append(pp)
    for yb in range(by):
        for xb in range(bx):
            for i, p in enumerate(padded):
                block = p[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                qtab = qlum if i == 0 else qchr
                dcc = dc_l if i == 0 else dc_c
                acc = ac_l if i == 0 else ac_c
                preds[i] = _encode_block(bw, block, qtab, dcc, acc, preds[i])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ============================================ progressive encoder ===
def _quantized_coefs(arr: np.ndarray, quality: int):
    """Quantized zigzag coefficient arrays per component [by, bx, 64]
    — the SAME values the baseline encoder entropy-codes, which is why
    progressive decode must equal baseline decode bit-for-bit at equal
    quality (the round-trip cross-check in tests)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    H, W = arr.shape[:2]
    qlum = _quality_scale(_QT_LUM, quality)
    qchr = _quality_scale(_QT_CHR, quality)
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    by, bx = -(-H // 8), -(-W // 8)
    coefs = []
    for i, p in enumerate(planes):
        pp = np.empty((by * 8, bx * 8))
        pp[:H, :W] = p
        pp[H:, :W] = p[-1:, :]
        pp[:, W:] = pp[:, W - 1 : W]
        qtab = qlum if i == 0 else qchr
        out = np.zeros((by, bx, 64), dtype=np.int32)
        for yb in range(by):
            for xb in range(bx):
                block = pp[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                d = _DCT @ (block - 128.0) @ _DCT.T
                out[yb, xb] = np.round(d / qtab)[_ZZ_ROWS, _ZZ_COLS].astype(
                    np.int32
                )
        coefs.append(out)
    return coefs, gray, H, W, qlum, qchr


class _ProgACEmitter:
    """EOBRUN + buffered-correction-bit state for one AC scan (the
    spec's successive-approximation entropy coder, Annex G)."""

    # the STANDARD AC Huffman tables define only EOB0 (0x00) — the
    # EOBn long-run symbols need custom tables — so runs are capped at
    # length 1: every end-of-band block emits its own EOB0. Costs some
    # compression, keeps the stream decodable by any conforming reader.
    MAX_EOBRUN = 1

    def __init__(self, bw, ac_codes):
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.be: list[int] = []  # correction bits riding the EOB run

    def sym(self, s):
        code, ln = self.ac[s]
        self.bw.write(code, ln)

    def flush_eob(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            for b in self.be:
                self.bw.write(b, 1)
            self.be = []


def _encode_ac_first(em, blk, ss, se, al):
    t = [0] * 64
    any_nz = False
    for k in range(ss, se + 1):
        v = int(blk[k])
        t[k] = (abs(v) >> al) * (1 if v >= 0 else -1)
        any_nz = any_nz or t[k] != 0
    if not any_nz:
        em.eobrun += 1
        if em.eobrun >= em.MAX_EOBRUN:
            em.flush_eob()
        return
    em.flush_eob()
    r = 0
    last_nz = max(k for k in range(ss, se + 1) if t[k] != 0)
    for k in range(ss, se + 1):
        v = t[k]
        if v == 0:
            r += 1
            continue
        while r > 15:
            em.sym(0xF0)
            r -= 16
        s = abs(v).bit_length()
        em.sym((r << 4) | s)
        em.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
        if k == last_nz and k < se:
            em.eobrun += 1
            if em.eobrun >= em.MAX_EOBRUN:
                em.flush_eob()
            break


def _encode_ac_refine(em, blk, ss, se, al):
    absv = [0] * 64
    eob = 0
    for k in range(ss, se + 1):
        absv[k] = abs(int(blk[k])) >> al
        if absv[k] == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            em.flush_eob()
            em.sym(0xF0)
            r -= 16
            for b in br:
                em.bw.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        em.flush_eob()
        em.sym((r << 4) | 1)
        em.bw.write(0 if int(blk[k]) < 0 else 1, 1)
        for b in br:
            em.bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        em.eobrun += 1
        em.be.extend(br)
        if em.eobrun >= em.MAX_EOBRUN:
            em.flush_eob()


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> PROGRESSIVE JPEG (SOF2,
    4:4:4): spectral selection (DC scan, split AC bands) AND successive
    approximation (DC Al=1->0 refine; AC first scans at Al>0 with
    refinement scans down to 0) — every scan type the decoder handles.
    Entropy-codes the exact coefficients the baseline encoder would, so
    decode(progressive) == decode(baseline) bit-for-bit at the same
    quality."""
    coefs, gray, H, W, qlum, qchr = _quantized_coefs(arr, quality)
    nc = 1 if gray else 3
    by, bx = coefs[0].shape[:2]

    out = bytearray(JPEG_MAGIC)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq, tab in ((0, qlum),) + (() if gray else ((1, qchr),)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tab[r, c]) for r, c in _ZZ)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, H, W, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    tables = [(0x00, _DC_LUM_BITS, _DC_LUM_VALS), (0x10, _AC_LUM_BITS, _AC_LUM_VALS)]
    if not gray:
        tables += [
            (0x01, _DC_CHR_BITS, _DC_CHR_VALS),
            (0x11, _AC_CHR_BITS, _AC_CHR_VALS),
        ]
    for tid, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid])
        out += bytes(bits) + bytes(vals)

    dc_l = _build_encode(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _build_encode(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _build_encode(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _build_encode(_AC_CHR_BITS, _AC_CHR_VALS)

    def sos_header(comp_ids, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for i in comp_ids:
            hdr += bytes([i + 1, 0x00 if i == 0 else 0x11])
        return hdr + bytes([ss, se, (ah << 4) | al])

    def dc_scan(al, refine):
        nonlocal out
        out += sos_header(list(range(nc)), 0, 0, 1 if refine else 0, al)
        bw = _BitWriter()
        preds = [0] * nc
        for yb in range(by):
            for xb in range(bx):
                for i in range(nc):
                    coef0 = int(coefs[i][yb, xb, 0])
                    if refine:
                        bw.write((coef0 >> al) & 1, 1)
                        continue
                    v = coef0 >> al  # arithmetic shift per Annex G
                    diff = v - preds[i]
                    preds[i] = v
                    s = abs(diff).bit_length()
                    code, ln = (dc_l if i == 0 else dc_c)[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
        bw.flush()
        out += bw.out

    def ac_scan(comp, ss, se, ah, al):
        nonlocal out
        out += sos_header([comp], ss, se, ah, al)
        bw = _BitWriter()
        em = _ProgACEmitter(bw, ac_l if comp == 0 else ac_c)
        for yb in range(by):
            for xb in range(bx):
                blk = coefs[comp][yb, xb]
                if ah == 0:
                    _encode_ac_first(em, blk, ss, se, al)
                else:
                    _encode_ac_refine(em, blk, ss, se, al)
        em.flush_eob()
        bw.flush()
        out += bw.out

    dc_scan(1, refine=False)
    if gray:
        ac_scan(0, 1, 5, 0, 2)
        ac_scan(0, 6, 63, 0, 2)
        ac_scan(0, 1, 63, 2, 1)
        dc_scan(0, refine=True)
        ac_scan(0, 1, 63, 1, 0)
    else:
        ac_scan(0, 1, 5, 0, 2)
        ac_scan(0, 6, 63, 0, 2)
        ac_scan(1, 1, 63, 0, 1)
        ac_scan(2, 1, 63, 0, 1)
        ac_scan(0, 1, 63, 2, 1)
        dc_scan(0, refine=True)
        ac_scan(0, 1, 63, 1, 0)
        ac_scan(1, 1, 63, 1, 0)
        ac_scan(2, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_info(payload: bytes) -> dict:
    """Marker-scan metadata without entropy decode: dimensions,
    component count and whether the scan is baseline or progressive."""
    if not payload.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            h, w = struct.unpack(">HH", payload[pos + 3 : pos + 7])
            return {
                "width": w,
                "height": h,
                "components": payload[pos + 7],
                "progressive": marker == 0xC2,
            }
        pos += seglen
    raise ValueError("JPEG missing SOF header")
