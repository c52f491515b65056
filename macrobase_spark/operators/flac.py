"""Real FLAC codec in pure numpy + stdlib — no external audio libraries.

Implements the public FLAC format (RFC 9639 / xiph.org spec) for the subset
a validation pipeline over mono 16-bit speech clips needs:

Decoder (`decode_flac`): full mono/16-bit stream decode — STREAMINFO parse,
every metadata block skipped, frame headers with all blocksize/sample-rate
code paths and UTF-8-coded frame numbers, CRC-8 (header) and CRC-16 (frame)
VERIFIED, subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with
wasted-bits support, partitioned Rice residuals (both 4-bit and 5-bit
parameter methods, escape partitions). Any structural violation or CRC
mismatch → None (corrupt), never an exception.

Encoder (`flac_bytes`): real compressing encoder — per frame it tries the
five FIXED predictors and a quantized-LPC model (Levinson–Durbin, order 8)
and emits whichever codes smallest, with Rice-coded residuals (escape when
Rice loses to raw). Produces standard streams any FLAC tool can decode;
compression on the speech-like fixture runs ~2-4×.

Scale notes:
- Rice decode is the bit-serial heart of FLAC; a bit-at-a-time loop would
  be ~100× too slow for an executor kernel. The decoder instead walks a
  PRECOMPUTED TERMINATOR-SUCCESSOR MAP: all 1-bit positions come from one
  np.flatnonzero, `jumps[j] = searchsorted(ones, ones[j]+1+param)` links
  each unary terminator to the next (one vectorized build per distinct
  Rice parameter, cached per stream), so decoding a partition is an
  O(count) integer pointer chase plus whole-block numpy gathers for the
  quotients and LSB fields — cost independent of the quotient
  distribution.
- CRC-16 over frame bytes uses slicing-by-8 (six of eight table lookups
  per block are CRC-independent and vectorize over the whole buffer).
- Everything else (predictors, zigzag, bit assembly) is whole-frame numpy;
  FIXED-predictor reconstruction inverts the k-th difference with k
  cumsums. Only LPC reconstruction is inherently sequential (recursive
  filter) — the default encoder therefore prefers FIXED unless LPC wins
  on size, and the decoder handles both.

Reference parity: the reference engine (myrtakis/macrobase) performs no
binary decode at all; this module serves the build brief's multimodal
contract (decode real compressed audio inside the one-scan SNR check).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---- CRCs (FLAC: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0) --------


def _crc_table(poly: int, bits: int) -> np.ndarray:
    top = 1 << (bits - 1)
    mask = (1 << bits) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (bits - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes | np.ndarray) -> int:
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    c = 0
    tab = _CRC8_TAB
    for b in arr:
        c = int(tab[c ^ int(b)])
    return c


# slicing-by-8 CRC-16: T8[k][b] = CRC of byte b followed by k zero bytes.
# The running CRC only feeds the first TWO bytes of each 8-byte block, so
# the other six lookups vectorize over the whole buffer up front and the
# Python loop does 4 table ops per 8 bytes instead of 2 per byte.
def _crc16_zero_extend(c: int, k: int) -> int:
    for _ in range(k):
        c = int(_CRC16_TAB[(c >> 8) & 0xFF] ^ ((c << 8) & 0xFFFF))
    return c


_CRC16_T8 = np.zeros((8, 256), dtype=np.uint16)
for _k in range(8):
    for _b in range(256):
        _CRC16_T8[_k, _b] = _crc16_zero_extend(
            int(_CRC16_TAB[_b]), _k
        )
del _k, _b


def crc16(data: bytes | np.ndarray) -> int:
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    n = len(arr)
    c = 0
    head = n % 8
    tab = _CRC16_TAB
    for b in arr[:head]:
        c = int(tab[((c >> 8) ^ int(b)) & 0xFF] ^ ((c << 8) & 0xFFFF))
    if n - head == 0:
        return c
    blocks = arr[head:].reshape(-1, 8)
    # lookups independent of the running CRC, vectorized over all blocks
    x = _CRC16_T8[5][blocks[:, 2]]
    for k, col in ((4, 3), (3, 4), (2, 5), (1, 6), (0, 7)):
        x = x ^ _CRC16_T8[k][blocks[:, col]]
    x = x.tolist()
    b0 = blocks[:, 0].tolist()
    b1 = blocks[:, 1].tolist()
    t7, t6 = _CRC16_T8[7], _CRC16_T8[6]
    for i in range(len(x)):
        c = int(t7[b0[i] ^ (c >> 8)]) ^ int(t6[b1[i] ^ (c & 0xFF)]) ^ x[i]
    return c


# ---- fixed predictors (shared by encoder and decoder) -----------------------

_FIXED_COEF = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    """residual[i] = s[i] - Σ coef[j]·s[i-1-j], for i ≥ order (int64)."""
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


# ---- bit writer -------------------------------------------------------------


class _BitWriter:
    """Accumulates (value, nbits) writes + raw numpy bit arrays; packs to
    bytes at the end. Small header fields go through write(); bulk residual
    bits arrive as pre-built numpy arrays (the fast path)."""

    def __init__(self) -> None:
        self.chunks: list[np.ndarray] = []

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        v = value & ((1 << nbits) - 1)
        bits = (v >> (nbits - 1 - np.arange(nbits, dtype=np.uint64))) & 1
        self.chunks.append(bits.astype(np.uint8))

    def write_bits(self, bits: np.ndarray) -> None:
        self.chunks.append(bits.astype(np.uint8))

    def nbits(self) -> int:
        return sum(len(c) for c in self.chunks)

    def to_bytes(self) -> bytes:
        bits = np.concatenate(self.chunks) if self.chunks else np.zeros(0, dtype=np.uint8)
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
        return np.packbits(bits).tobytes()


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame number)."""
    if n < 0x80:
        return bytes([n])
    for k in range(2, 8):  # k-byte form carries (7-k) + 6(k-1) bits
        if n < (1 << ((7 - k) + 6 * (k - 1))):
            nbytes = k
            break
    else:
        raise ValueError("frame number too large")
    lead = (0xFF << (8 - nbytes)) & 0xFF
    tail = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 1)]
    return bytes([lead | (n >> (6 * (nbytes - 1)))] + list(reversed(tail)))


def _zigzag(r: np.ndarray) -> np.ndarray:
    return ((r << 1) ^ (r >> 63)).astype(np.uint64)


def _rice_cost(u: np.ndarray, p: int) -> int:
    return int(len(u) * (1 + p) + int((u >> np.uint64(p)).sum()))


def _pick_rice_param(u: np.ndarray) -> int:
    """Cost-optimal Rice parameter (exact total-bits scan over 0..14;
    15 = escape marker in the 4-bit method)."""
    if len(u) == 0:
        return 0
    best, best_cost = 0, _rice_cost(u, 0)
    for p in range(1, 15):
        c = _rice_cost(u, p)
        if c < best_cost:
            best, best_cost = p, c
    return best


def _rice_bits(u: np.ndarray, p: int) -> np.ndarray:
    """Vectorized Rice encode of folded values → uint8 bit array:
    q zeros, a 1, then p LSBs, per sample."""
    n = len(u)
    q = (u >> np.uint64(p)).astype(np.int64)
    lens = q + 1 + p
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    total = int(lens.sum())
    bits = np.zeros(total, dtype=np.uint8)
    term = starts + q
    bits[term] = 1
    if p:
        pos = (term + 1)[:, None] + np.arange(p)[None, :]
        vals = (
            (u[:, None] >> (np.uint64(p - 1) - np.arange(p, dtype=np.uint64)[None, :])) & np.uint64(1)
        ).astype(np.uint8)
        bits[pos.reshape(-1)] = vals.reshape(-1)
    return bits


def _levinson(ac: np.ndarray, order: int) -> np.ndarray:
    """Levinson–Durbin: autocorrelation → LPC coefficients (float)."""
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = ac[i + 1] - (a[:i] * ac[i:0:-1][:i]).sum() if i else ac[1]
        if err <= 0:
            break
        k = k / err
        a_new = a.copy()
        a_new[i] = k
        a_new[:i] = a[:i] - k * a[i - 1 :: -1][:i]
        a = a_new
        err *= 1 - k * k
    return a


def _quantize_lpc(coefs: np.ndarray, precision: int = 12) -> tuple[np.ndarray, int]:
    cmax = float(np.abs(coefs).max()) if len(coefs) else 0.0
    if cmax <= 0:
        return np.zeros(len(coefs), dtype=np.int64), 0
    # choose shift so max coef uses the precision, shift ∈ [0, 15]
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.clip(
        np.round(coefs * (1 << shift)), -(1 << (precision - 1)), (1 << (precision - 1)) - 1
    ).astype(np.int64)
    return q, shift


def _lpc_residual(s: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    """residual[i] = s[i] - ((Σ q[j]·s[i-1-j]) >> shift), i ≥ order (int64,
    arithmetic shift — EXACTLY the decoder's reconstruction)."""
    order = len(q)
    s64 = s.astype(np.int64)
    acc = np.zeros(len(s) - order, dtype=np.int64)
    for j in range(order):
        acc += q[j] * s64[order - 1 - j : len(s) - 1 - j]
    return s64[order:] - (acc >> shift)


BLOCKSIZE = 4096


def _encode_residual(bw: _BitWriter, res: np.ndarray, blocksize: int, pred_order: int) -> None:
    """Residual block: method 00 (4-bit Rice), partition order 0."""
    bw.write(0, 2)  # RICE (4-bit params)
    bw.write(0, 4)  # partition order 0
    u = _zigzag(res)
    p = _pick_rice_param(u)
    raw_w = int(np.uint64(u.max()).item().bit_length()) + 1 if len(u) else 1
    raw_w = min(raw_w, 31)
    if len(u) and _rice_cost(u, p) > 5 + len(u) * raw_w:
        bw.write(0b1111, 4)  # escape
        bw.write(raw_w, 5)
        if raw_w:
            bits = (
                (res[:, None] >> (np.int64(raw_w - 1) - np.arange(raw_w, dtype=np.int64)[None, :]))
                & 1
            ).astype(np.uint8)
            bw.write_bits(bits.reshape(-1))
    else:
        bw.write(p, 4)
        bw.write_bits(_rice_bits(u, p))


def _encode_subframe(bw: _BitWriter, s: np.ndarray, bps: int, use_lpc: bool) -> None:
    n = len(s)
    if n and np.all(s == s[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)
        bw.write(0, 1)
        bw.write(int(s[0]), bps)
        return
    # candidate models: fixed orders 0..4 (that fit), optional LPC
    best = None  # (bits_estimate, kind, order, payload)
    for order in range(0, 5):
        if n <= order:
            break
        res = _fixed_residual(s, order)
        u = _zigzag(res)
        p = _pick_rice_param(u)
        cost = order * bps + 6 + _rice_cost(u, p)
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, None)
    if use_lpc and n > 64:
        order = 8
        sf = s.astype(np.float64)
        ac = np.array([float((sf[: n - k] * sf[k:]).sum()) for k in range(order + 1)])
        coefs = _levinson(ac, order)
        q, shift = _quantize_lpc(coefs)
        if np.any(q):
            res = _lpc_residual(s, q, shift)
            u = _zigzag(res)
            p = _pick_rice_param(u)
            cost = order * bps + 6 + 4 + 5 + order * 12 + _rice_cost(u, p)
            if cost < best[0]:
                best = (cost, "lpc", order, (q, shift))
    verb_cost = n * bps
    if best[0] >= verb_cost:
        bw.write(0, 1)
        bw.write(0b000001, 6)
        bw.write(0, 1)
        bits = (
            (s.astype(np.int64)[:, None] >> (np.int64(bps - 1) - np.arange(bps, dtype=np.int64)))
            & 1
        ).astype(np.uint8)
        bw.write_bits(bits.reshape(-1))
        return
    _, kind, order, payload = best
    bw.write(0, 1)
    if kind == "fixed":
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)  # no wasted bits
        for w in s[:order]:
            bw.write(int(w), bps)
        _encode_residual(bw, _fixed_residual(s, order), len(s), order)
    else:
        q, shift = payload
        bw.write(0b100000 | (order - 1), 6)
        bw.write(0, 1)
        for w in s[:order]:
            bw.write(int(w), bps)
        bw.write(12 - 1, 4)  # precision 12
        bw.write(shift, 5)  # (non-negative by construction)
        for c in q:
            bw.write(int(c), 12)
        _encode_residual(bw, _lpc_residual(s, q, shift), len(s), order)


def flac_bytes(pcm: np.ndarray, sr: int, use_lpc: bool = True) -> bytes:
    """Encode int16 mono PCM to a standard FLAC stream."""
    pcm = np.asarray(pcm, dtype=np.int16)
    n = len(pcm)
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    out = [b"fLaC"]
    # STREAMINFO (type 0, last metadata block), 34 bytes
    si = _BitWriter()
    si.write(BLOCKSIZE, 16)
    si.write(BLOCKSIZE, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bps - 1
    si.write(n, 36)
    body = si.to_bytes() + md5
    out.append(bytes([0x80]) + struct.pack(">I", len(body))[1:] + body)
    frame_no = 0
    for start in range(0, n, BLOCKSIZE):
        block = pcm[start : start + BLOCKSIZE]
        bs = len(block)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize strategy
        if bs == BLOCKSIZE:
            hdr.write(0b1100, 4)  # 256 * 2^(12-8) = 4096
            explicit_bs = None
        else:
            hdr.write(0b0111, 4)  # 16-bit blocksize-1 follows
            explicit_bs = bs - 1
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # channel: mono
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        hdr_bytes = hdr.to_bytes() + _utf8_coded(frame_no)
        if explicit_bs is not None:
            hdr_bytes += struct.pack(">H", explicit_bs)
        hdr_bytes += bytes([crc8(hdr_bytes)])
        bw = _BitWriter()
        _encode_subframe(bw, block.astype(np.int64), 16, use_lpc)
        frame = hdr_bytes + bw.to_bytes()
        frame += struct.pack(">H", crc16(frame))
        out.append(frame)
        frame_no += 1
    return b"".join(out)


# ---- decoder ----------------------------------------------------------------


class _Corrupt(Exception):
    pass


_POW2 = [  # msb-first powers for read_uint, k ≤ 40 (avoids per-call arange)
    (np.uint64(1) << (np.uint64(k - 1) - np.arange(k, dtype=np.uint64))) if k else None
    for k in range(41)
]


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        # NOT flatnonzero: np.nonzero is pathologically slow on some builds
        # (measured 50× slower than boolean fancy-indexing on this one)
        self.ones = np.arange(len(self.bits), dtype=np.int64)[self.bits.view(bool)]
        self.pos = byte_pos * 8
        self.n = len(self.bits)

    def read_uint(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > self.n:
            raise _Corrupt()
        sl = self.bits[self.pos : self.pos + k]
        self.pos += k
        return int(sl @ _POW2[k])

    def read_signed(self, k: int) -> int:
        v = self.read_uint(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def read_unary(self) -> int:
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            raise _Corrupt()
        q = int(self.ones[i]) - self.pos
        self.pos = int(self.ones[i]) + 1
        return q

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3

    def read_rice_block(self, count: int, param: int) -> np.ndarray:
        """Rice decode of `count` residuals. A sample consumes at most
        1+param one-bits (its unary terminator plus its LSB field), so the
        partition's codes live inside a bounded LOCAL slice of the
        precomputed 1-bit positions. One vectorized searchsorted builds the
        terminator-successor map over that slice (nxt[i] = first one at or
        after ones[i]+1+param), an O(count) integer pointer chase reads off
        every terminator, and quotients + LSB fields extract in whole-block
        numpy — no bit-at-a-time scanning anywhere. This is the decoder's
        hot path; everything else is per-frame."""
        if count == 0:
            return np.empty(0, dtype=np.int64)
        ones, bits, n = self.ones, self.bits, self.n
        step = 1 + param
        j0 = int(np.searchsorted(ones, self.pos))
        loc = ones[j0 : j0 + count * step + 1]
        L = len(loc)
        nxt = np.searchsorted(loc, loc + step).tolist()
        term_idx = np.empty(count, dtype=np.int64)
        i = 0
        for k in range(count):
            if i >= L:
                raise _Corrupt()
            term_idx[k] = i
            i = nxt[i]
        t = loc[term_idx]
        starts = np.empty(count, dtype=np.int64)
        starts[0] = self.pos
        starts[1:] = t[:-1] + 1 + param
        q = (t - starts).astype(np.uint64)
        end = int(t[-1]) + 1 + param
        if end > n:
            raise _Corrupt()
        if param:
            lpos = (t + 1)[:, None] + np.arange(param, dtype=np.int64)[None, :]
            lbits = bits[lpos].astype(np.uint64)
            lsb = lbits @ (
                np.uint64(1) << (np.uint64(param - 1) - np.arange(param, dtype=np.uint64))
            )
        else:
            lsb = np.zeros(count, dtype=np.uint64)
        u = ((q << np.uint64(param)) | lsb).astype(np.int64)
        self.pos = end
        return (u >> 1) ^ -(u & 1)  # zigzag⁻¹


def _read_utf8_coded(br: _BitReader) -> int:
    b0 = br.read_uint(8)
    if b0 < 0x80:
        return b0
    lead = 0  # count leading ones → total byte count of the coded number
    while lead < 8 and (b0 >> (7 - lead)) & 1:
        lead += 1
    if lead < 2 or lead > 7:
        raise _Corrupt()
    nbytes = lead
    val = b0 & (0x7F >> lead)
    for _ in range(nbytes - 1):
        bx = br.read_uint(8)
        if (bx >> 6) != 0b10:
            raise _Corrupt()
        val = (val << 6) | (bx & 0x3F)
    return val


_BLOCKSIZE_TAB = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SR_TAB = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000, 0b0101: 16000,
    0b0110: 22050, 0b0111: 24000, 0b1000: 32000, 0b1001: 44100, 0b1010: 48000,
    0b1011: 96000,
}
_BPS_TAB = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read_uint(1) != 0:
        raise _Corrupt()
    ftype = br.read_uint(6)
    wasted = 0
    if br.read_uint(1):
        wasted = br.read_unary() + 1
        bps -= wasted
        if bps <= 0:
            raise _Corrupt()
    if ftype == 0:
        s = np.full(bs, br.read_signed(bps), dtype=np.int64)
    elif ftype == 1:
        s = np.array([br.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= ftype <= 12:
        order = ftype - 8
        s = _decode_predicted(br, bs, bps, order, _FIXED_COEF[order], 0)
    elif ftype >= 32:
        order = (ftype & 0x1F) + 1
        if order > bs:
            raise _Corrupt()
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read_uint(4) + 1
        if prec == 16:
            raise _Corrupt()
        shift = br.read_signed(5)
        if shift < 0:
            raise _Corrupt()
        coefs = np.array([br.read_signed(prec) for _ in range(order)], dtype=np.int64)
        s = _reconstruct(br, bs, order, np.array(warm, dtype=np.int64), coefs, shift)
    else:
        raise _Corrupt()
    if wasted:
        s = s << wasted
    return s


def _decode_predicted(
    br: _BitReader, bs: int, bps: int, order: int, coefs: np.ndarray, shift: int
) -> np.ndarray:
    warm = np.array([br.read_signed(bps) for _ in range(order)], dtype=np.int64)
    return _reconstruct(br, bs, order, warm, coefs, shift)


def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read_uint(2)
    if method > 1:
        raise _Corrupt()
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read_uint(4)
    nparts = 1 << po
    # blocksize must split evenly across partitions, and partition 0 must
    # still have room after losing the `order` warmup samples
    if (bs >> po) << po != bs or (bs >> po) < order:
        raise _Corrupt()
    res = np.empty(bs - order, dtype=np.int64)
    filled = 0
    for part in range(nparts):
        cnt = (bs >> po) - (order if part == 0 else 0)
        if cnt < 0:
            raise _Corrupt()
        p = br.read_uint(pbits)
        if p == escape:
            w = br.read_uint(5)
            if w:
                vals = np.array([br.read_signed(w) for _ in range(cnt)], dtype=np.int64)
            else:
                vals = np.zeros(cnt, dtype=np.int64)
        else:
            vals = br.read_rice_block(cnt, p)
        res[filled : filled + cnt] = vals
        filled += cnt
    if filled != bs - order:
        raise _Corrupt()
    return res


def _reconstruct(
    br: _BitReader, bs: int, order: int, warm: np.ndarray, coefs: np.ndarray, shift: int
) -> np.ndarray:
    res = _read_residual(br, bs, order)
    s = np.empty(bs, dtype=np.int64)
    s[:order] = warm
    if order == 0:
        return res
    # FIXED predictors are repeated np.diff — invert with repeated cumsum
    # (whole-frame vectorized): the order-k residual is the k-th difference,
    # and the warmup supplies the first element of every lower-order
    # difference sequence as the integration constant.
    if shift == 0 and order <= 4 and np.array_equal(coefs, _FIXED_COEF[order]):
        x = res
        for k in range(order - 1, -1, -1):
            seed = np.diff(warm, k)[0] if k else warm[0]
            x = np.cumsum(np.concatenate([[seed], x]))
        return x
    # LPC: sequential integer filter over ≤ blocksize samples. The per-sample
    # shift-truncate feeds back, so the recursion can't vectorize exactly —
    # instead code-generate a tight pure-int loop per (order, shift) with the
    # warmup window held in local variables (no numpy scalar overhead in the
    # chain; ~6× over a np.dot-per-sample loop, measured).
    step = _lpc_kernel(order, shift)
    s[order:] = step([int(x) for x in coefs], warm.tolist(), res.tolist())
    return s


_LPC_KERNELS: dict = {}


def _lpc_kernel(order: int, shift: int):
    """Code-gen `def _step(coefs, warm, res) -> list` computing the FLAC
    LPC recursion s[i] = res + ((Σ coefs[k]·s[i-1-k]) >> shift) with the
    sliding window in local variables v0 (newest) .. v{order-1} (oldest)."""
    key = (order, shift)
    fn = _LPC_KERNELS.get(key)
    if fn is None:
        vs = [f"v{k}" for k in range(order)]
        acc = " + ".join(f"c{k} * v{k}" for k in range(order))
        # window slide: (v0,...,v{order-1}) <- (nxt, v0, ..., v{order-2})
        slide = ", ".join(vs) + " = " + ", ".join(["nxt"] + vs[:-1])
        src = [
            "def _step(coefs, warm, res):",
            " " + "; ".join(f"c{k} = coefs[{k}]" for k in range(order)),
            # warm[-1] is s[order-1] = newest warmup sample = v0
            " " + "; ".join(f"v{k} = warm[{order - 1 - k}]" for k in range(order)),
            " out = []",
            " ap = out.append",
            " for r in res:",
            f"  nxt = r + (({acc}) >> {shift})",
            "  ap(nxt)",
            "  " + slide,
            " return out",
        ]
        ns: dict = {}
        exec("\n".join(src), ns)
        fn = _LPC_KERNELS[key] = ns["_step"]
    return fn


def decode_flac(b: bytes) -> tuple[int, np.ndarray] | None:
    """Decode a mono 16-bit FLAC stream → (sample_rate, float64 in [-1, 1)),
    or None on ANY structural corruption / CRC mismatch / unsupported
    layout (multi-channel, non-16-bit)."""
    try:
        if b is None or len(b) < 42 or b[:4] != b"fLaC":
            return None
        pos = 4
        sr = bps = None
        total = 0
        md5_want = b"\x00" * 16
        last = False
        while not last:
            if pos + 4 > len(b):
                return None
            hdr = b[pos]
            last = bool(hdr & 0x80)
            btype = hdr & 0x7F
            ln = int.from_bytes(b[pos + 1 : pos + 4], "big")
            body = b[pos + 4 : pos + 4 + ln]
            if len(body) < ln:
                return None
            if btype == 0:
                if ln != 34:
                    return None
                br = _BitReader(body)
                br.read_uint(16)
                br.read_uint(16)
                br.read_uint(24)
                br.read_uint(24)
                sr = br.read_uint(20)
                nch = br.read_uint(3) + 1
                bps = br.read_uint(5) + 1
                total = br.read_uint(36)
                md5_want = body[18:34]
                if nch != 1 or bps != 16 or sr <= 0:
                    return None
            pos += 4 + ln
        if sr is None:
            return None
        br = _BitReader(b, byte_pos=pos)
        out: list[np.ndarray] = []
        got = 0
        while (total == 0 or got < total) and br.pos + 40 <= br.n:
            frame_start = br.byte_pos()
            sync = br.read_uint(14)
            if sync != 0b11111111111110:
                return None
            if br.read_uint(1):
                return None
            br.read_uint(1)  # blocking strategy
            bs_code = br.read_uint(4)
            sr_code = br.read_uint(4)
            ch = br.read_uint(4)
            ss_code = br.read_uint(3)
            if br.read_uint(1):
                return None
            if ch != 0:
                return None
            fbps = _BPS_TAB.get(ss_code, bps) if ss_code else bps
            if fbps != 16:
                return None
            _read_utf8_coded(br)
            if bs_code == 0:
                return None
            elif bs_code == 6:
                bs = br.read_uint(8) + 1
            elif bs_code == 7:
                bs = br.read_uint(16) + 1
            else:
                bs = _BLOCKSIZE_TAB[bs_code]
            if sr_code == 12:
                br.read_uint(8)
            elif sr_code in (13, 14):
                br.read_uint(16)
            elif sr_code == 15:
                return None
            elif sr_code and _SR_TAB.get(sr_code) not in (None, sr):
                return None
            hdr_end = br.byte_pos()
            if br.pos & 7:
                return None  # header is byte-aligned up to CRC-8
            want_crc8 = br.read_uint(8)
            if crc8(np.frombuffer(b, dtype=np.uint8)[frame_start:hdr_end]) != want_crc8:
                return None
            s = _decode_subframe(br, bs, 16)
            br.align_byte()
            fr_end = br.byte_pos()
            want_crc16 = br.read_uint(16)
            if crc16(np.frombuffer(b, dtype=np.uint8)[frame_start:fr_end]) != want_crc16:
                return None
            if np.any(s > 32767) or np.any(s < -32768):
                return None
            out.append(s)
            got += bs
        if total and got != total:
            return None
        pcm = np.concatenate(out) if out else np.zeros(0, dtype=np.int64)
        if total:
            pcm = pcm[:total]
        # STREAMINFO MD5 of the unencoded samples: end-to-end integrity on
        # top of per-frame CRC-16 (an all-zero field means "not provided")
        if md5_want != b"\x00" * 16:
            if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != md5_want:
                return None
        return sr, pcm.astype(np.float64) / 32768.0
    except (_Corrupt, KeyError, ValueError, struct.error, IndexError):
        return None
