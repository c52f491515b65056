"""Baseline JPEG (JFIF) codec in pure numpy + stdlib — no codec libraries.

This upgrades the last honestly-stubbed image format to REAL: the decoder
handles any 8-bit baseline-sequential huffman-coded JFIF stream (SOF0; gray
or YCbCr with arbitrary sampling factors incl. 4:4:4/4:2:2/4:2:0; restart
markers), and the encoder emits standards-compliant 4:4:4 baseline files.
Both sides follow ITU-T T.81: Annex K quantization tables with IJG quality
scaling, the Annex F entropy coding (DC size categories + AC run/size with
ZRL/EOB, ones'-complement magnitude bits), byte stuffing, and canonical
Huffman tables declared in DHT. The encoder's tables are deliberately
simple-but-valid canonical sets (every DC category at 4 bits; the 256 AC
symbols at 9/10 bits) — files are larger than libjpeg's but fully
standard: the decoder builds its tables from whatever DHT declares, so it
decodes optimized third-party baseline files too.

The heavy math is vectorized across blocks: the 2D DCT-II/IDCT are two
einsum contractions against the orthonormal 8×8 DCT matrix for ALL blocks
of a component at once; quant/dequant/zigzag are single fancy-index ops.
Only the entropy coder walks symbols in Python (inherent — variable-length
codes serialize), matching the PNG codec's cost profile.

Reference parity: none — the reference engine (myrtakis/macrobase) has no
binary image handling; this belongs to the build brief's multimodal
contract, like operators/image.py's PPM/PNG codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants (ITU-T T.81) ------------------------------------------------


def _zigzag_pairs() -> list[tuple[int, int]]:
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1)]
        if s % 2 == 0:
            diag.reverse()
        order += [(i, j) for (i, j) in diag if i < 8 and j < 8]
    return order


#: zigzag position k -> flat (row-major) index, and its inverse
ZIGZAG = np.array([i * 8 + j for i, j in _zigzag_pairs()], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (luminance / chrominance)
QUANT_LUMA = np.array(
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
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
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
    dtype=np.float64,
)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex K table, clipped to
    [1, 255] (baseline requires 8-bit table entries)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    return np.clip(np.floor((table * scale + 50) / 100), 1, 255)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_C = _dct_matrix()

# Encoder-side canonical Huffman tables: valid-but-simple. DC: the 12 size
# categories all get 4-bit codes (12 ≤ 15 usable; the all-ones code is never
# assigned by canonical generation). AC: 255 symbols at 9 bits + 1 at 10
# (a BITS entry is one byte, so 256 can't all sit at one length).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_VALS = list(range(256))


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 Annex C canonical generation."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


# ---- color transforms (JFIF / BT.601 full-range) ---------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[
        ..., 2
    ].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ---- block helpers ----------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-pad a 2D plane to 8-multiples and return (nblocks, 8, 8) in
    raster block order plus the block-grid shape."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _from_blocks(blocks: np.ndarray, bh: int, bw: int) -> np.ndarray:
    return blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


# ---- bit I/O with byte stuffing ---------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def get(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _magnitude_bits(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: (size category, ones'-complement magnitude bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---- encoder ----------------------------------------------------------------


def encode_jpeg(img: np.ndarray, quality: int = 90, restart_interval: int = 0) -> bytes:
    """uint8 image → baseline JFIF bytes (SOF0). (h, w, 3) RGB encodes as
    4:4:4 YCbCr; (h, w) grayscale encodes as a single-component scan."""
    gray = img.ndim == 2
    nc = 1 if gray else 3
    h, w = img.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    ycc = (
        img.astype(np.float64)[..., None]
        if gray
        else _rgb_to_ycbcr(img.astype(np.float64))
    )

    comp_zz: list[np.ndarray] = []
    for ci in range(nc):
        qt = ql if ci == 0 else qc
        blocks, _, _ = _to_blocks(ycc[..., ci] - 128.0)
        coef = np.einsum("ij,bjk,lk->bil", _C, blocks, _C)
        q = np.round(coef / qt).astype(np.int32)
        # baseline magnitude bounds (T.81 table F.1/F.2)
        np.clip(q, -1023, 1023, out=q)
        comp_zz.append(q.reshape(-1, 64)[:, ZIGZAG])

    wtr = _BitWriter()
    preds = [0] * nc
    nblocks = comp_zz[0].shape[0]
    rst = 0
    for b in range(nblocks):
        if restart_interval and b and b % restart_interval == 0:
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * nc
        for ci in range(nc):
            zz = comp_zz[ci][b]
            dc = int(zz[0])
            size, bits = _magnitude_bits(dc - preds[ci])
            preds[ci] = dc
            code, length = _DC_CODES[size]
            wtr.put(code, length)
            if size:
                wtr.put(bits, size)
            nz = np.flatnonzero(zz[1:])
            prev = 0
            for k in nz:
                run = int(k) - prev
                while run >= 16:
                    c, ln = _AC_CODES[0xF0]  # ZRL
                    wtr.put(c, ln)
                    run -= 16
                size, bits = _magnitude_bits(int(zz[1 + k]))
                c, ln = _AC_CODES[(run << 4) | size]
                wtr.put(c, ln)
                wtr.put(bits, size)
                prev = int(k) + 1
            if prev != 63:
                c, ln = _AC_CODES[0x00]  # EOB
                wtr.put(c, ln)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(
            0xDB, bytes([tid]) + bytes(int(v) for v in table.reshape(64)[ZIGZAG])
        )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    comp_specs = bytes([1, 0x11, 0])  # Y: id 1, 1x1 sampling, quant table 0
    scan_specs = bytes([1, 0x00])
    if not gray:
        comp_specs += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
        scan_specs += bytes([2, 0x11, 3, 0x11])
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([nc]) + comp_specs)
    sos = seg(0xDA, bytes([nc]) + scan_specs + bytes([0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    tables = dqt(0, ql) + dht(0, 0, _DC_BITS, _DC_VALS) + dht(1, 0, _AC_BITS, _AC_VALS)
    if not gray:
        tables += (
            dqt(1, qc)
            + dht(0, 1, _DC_BITS, _DC_VALS)
            + dht(1, 1, _AC_BITS, _AC_VALS)
        )
    return (
        b"\xff\xd8"
        + app0
        + tables
        + sof
        + dri
        + sos
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


# ---- decoder ----------------------------------------------------------------


class _HuffTable:
    """Canonical decode via the T.81 F.2.2.3 mincode/maxcode walk."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, rdr: _BitReader) -> int:
        code = rdr.get(1)
        for length in range(1, 17):
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
            code = (code << 1) | rdr.get(1)
        raise ValueError("invalid huffman code")


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """De-stuff the entropy-coded segment starting at `pos`, splitting at
    restart markers; returns (intervals, position of the terminating
    marker's 0xFF)."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        j = data.find(b"\xff", i)
        if j < 0:
            raise ValueError("unterminated entropy segment")
        cur += data[i:j]
        if j + 1 >= n:
            raise ValueError("truncated at marker")
        m = data[j + 1]
        if m == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= m <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            intervals.append(bytes(cur))
            return intervals, j
    raise ValueError("unterminated entropy segment")


def decode_jpeg(raw: bytes) -> np.ndarray | None:
    """Baseline JFIF → (h, w, 3) uint8 RGB; None on corruption or an
    unsupported coding process (progressive/arithmetic/12-bit)."""
    try:
        return _decode_jpeg(raw)
    except (ValueError, struct.error, IndexError, KeyError, ZeroDivisionError):
        return None


def _decode_jpeg(raw: bytes) -> np.ndarray | None:
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    i = 2
    intervals: list[bytes] | None = None
    scan: list[dict] = []
    while i < len(raw):
        if raw[i] != 0xFF:
            raise ValueError("marker expected")
        m = raw[i + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        (ln,) = struct.unpack(">H", raw[i + 2 : i + 4])
        payload = raw[i + 4 : i + 2 + ln]
        if len(payload) != ln - 2:
            raise ValueError("truncated segment")
        if m == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64)
                t[ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                p += 65
        elif m == 0xC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                htabs[(cls, tid)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif m == 0xC0 or m == 0xC1:
            if payload[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline coding process")
        elif m == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload)
        elif m == 0xDA:
            ns = payload[0]
            scan = []
            for s in range(ns):
                cid, tt = payload[1 + 2 * s : 3 + 2 * s]
                matching = [c for c in comps if c["id"] == cid]
                if not matching:
                    raise ValueError("SOS references a component id absent from SOF")
                comp = matching[0]
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0xF})
            intervals, i = _split_entropy(raw, i + 2 + ln)
            continue
        i += 2 + ln
    if not comps or intervals is None or not h or not w:
        return None

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcus = mcux * mcuy
    per_mcu = sum(c["h"] * c["v"] for c in scan)
    coefs = [
        np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.float64) for c in scan
    ]

    mcu = 0
    for seg_i, data in enumerate(intervals):
        rdr = _BitReader(data)
        preds = [0] * len(scan)
        end = min(n_mcus, mcu + restart_interval) if restart_interval else n_mcus
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for si, c in enumerate(scan):
                dct = htabs[(0, c["dc"])]
                act = htabs[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        size = dct.decode(rdr)
                        if size > 11:
                            raise ValueError("bad DC size")
                        preds[si] += _extend(rdr.get(size), size) if size else 0
                        zz[0] = preds[si]
                        k = 1
                        while k < 64:
                            rs = act.decode(rdr)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rdr.get(s), s)
                            k += 1
                        row = (my * c["v"] + by) * (mcux * c["h"]) + mx * c["h"] + bx
                        coefs[si][row] = zz
            mcu += 1
        if restart_interval and seg_i < len(intervals) - 1 and mcu >= n_mcus:
            raise ValueError("extra restart intervals")
    if mcu != n_mcus:
        raise ValueError("MCU shortfall")

    planes = []
    for si, c in enumerate(scan):
        qt = qtabs[c["tq"]]
        blocks = (coefs[si][:, UNZIGZAG]).reshape(-1, 8, 8) * qt
        pix = np.einsum("ji,bjk,kl->bil", _C, blocks, _C) + 128.0
        plane = _from_blocks(pix, mcuy * c["v"], mcux * c["h"])
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        return None
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
