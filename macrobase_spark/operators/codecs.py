"""Real compressed-audio codecs in pure numpy: G.711 mu-law / A-law and
IMA ADPCM (DVI4). These are genuine wire formats — G.711 is the telephony
codec (8-bit log-companded PCM, 2:1), IMA ADPCM the classic 4-bit
delta codec (4:1) carried in standard WAV containers (format tags 0x07,
0x06, 0x11) — and all three decode without external libraries, upgrading
the audio path's compressed decode from honest stub to real (the audio
mirror of the stdlib PNG codec in operators/image.py). mp3/flac/opus stay
stubbed: MDCT/rice-LPC decoders need codec libraries the runtime lacks.

Vectorization contract (the 100 TB point): G.711 is a 256-entry table
lookup — one fancy-index per Arrow batch. IMA ADPCM is sample-sequential
*within* a block but blocks are independent by design (each block header
restates predictor+index), so the kernels below vectorize across BLOCKS:
every block of every clip in a batch decodes in lock-step, one numpy step
per nibble position — sequential length is the block size (~505 samples),
not the clip or the batch.

Reference scope note: the reference engine (myrtakis/macrobase) has no
binary audio at all — this module serves the build brief's multimodal
contract (BASELINE input_hint: audio clip bytes + codec column).
"""

from __future__ import annotations

import numpy as np

# -- G.711 mu-law ------------------------------------------------------------

_BIAS = 0x84  # 132
_CLIP = 32635


def _mulaw_decode_table() -> np.ndarray:
    """256-entry mu-law byte -> int16 table (ITU-T G.711 expansion)."""
    u = ~np.arange(256, dtype=np.uint8)
    sign = (u >> 7) & 1
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant.astype(np.int32) << 3) + _BIAS) << exp) - _BIAS
    return np.where(sign == 1, -mag, mag).astype(np.int16)


_MULAW_TABLE = _mulaw_decode_table()


def encode_mulaw(pcm: np.ndarray) -> bytes:
    """int16 PCM -> one mu-law byte per sample (vectorized compression)."""
    x = pcm.astype(np.int32)
    sign = (x < 0).astype(np.uint8)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # exponent = MSB position of mag>>7, in 0..7
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    code = ~((sign << 7) | (exp.astype(np.uint8) << 4) | mant.astype(np.uint8))
    return code.astype(np.uint8).tobytes()


def decode_mulaw(raw: bytes) -> np.ndarray:
    """mu-law bytes -> float64 in [-1, 1)."""
    codes = np.frombuffer(raw, dtype=np.uint8)
    return _MULAW_TABLE[codes].astype(np.float64) / 32768.0


# -- G.711 A-law -------------------------------------------------------------


def _alaw_decode_table() -> np.ndarray:
    """256-entry A-law byte -> int16 table (ITU-T G.711 expansion; sign bit
    SET after the 0x55 XOR means POSITIVE — the CCITT reference
    convention)."""
    a = np.arange(256, dtype=np.uint8) ^ 0x55
    sign = (a >> 7) & 1
    exp = (a >> 4) & 7
    mant = (a & 0x0F).astype(np.int32)
    t = (mant << 4) + np.where(exp == 0, 8, 0x108)
    mag = np.where(exp <= 1, t, t << (exp - 1))
    return np.where(sign == 1, mag, -mag).astype(np.int16)


_ALAW_TABLE = _alaw_decode_table()

_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def encode_alaw(pcm: np.ndarray) -> bytes:
    """int16 PCM -> one A-law byte per sample (CCITT linear2alaw,
    vectorized): 13-bit magnitude, ones'-complement negatives, segment
    search, 0x55 toggle folded into the sign mask."""
    x13 = pcm.astype(np.int32) >> 3  # arithmetic shift: 16 -> 13 bit
    mask = np.where(x13 >= 0, 0xD5, 0x55).astype(np.int32)
    mag = np.where(x13 >= 0, x13, -x13 - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag).clip(0, 7).astype(np.int32)
    mant = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    code = ((seg << 4) | mant) ^ mask
    return code.astype(np.uint8).tobytes()


def decode_alaw(raw: bytes) -> np.ndarray:
    """A-law bytes -> float64 in [-1, 1)."""
    codes = np.frombuffer(raw, dtype=np.uint8)
    return _ALAW_TABLE[codes].astype(np.float64) / 32768.0


# -- IMA ADPCM (DVI4 / WAV format tag 0x11, mono) ----------------------------

IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: np.ndarray, index: np.ndarray, code: np.ndarray):
    """One IMA update, vectorized over blocks: given nibble `code`, returns
    (new_pred, new_index). The shared kernel of encode and decode."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(code & 1, step >> 2, 0)
    diff = diff + np.where(code & 2, step >> 1, 0)
    diff = diff + np.where(code & 4, step, 0)
    pred = np.where(code & 8, pred - diff, pred + diff).clip(-32768, 32767)
    index = (index + IMA_INDEX_TABLE[code & 7]).clip(0, 88)
    return pred, index


def ima_adpcm_decode_blocks(
    nibbles: np.ndarray, preds: np.ndarray, idxs: np.ndarray
) -> np.ndarray:
    """Decode a (blocks, samples_per_block-1) nibble matrix given each
    block's header predictor/index. Returns (blocks, samples_per_block)
    int32 — column 0 is the header predictor (it IS the first sample in
    the WAV tag-0x11 layout). One numpy step per nibble position,
    vectorized over every block in the batch."""
    n_blocks, n_nib = nibbles.shape
    out = np.empty((n_blocks, n_nib + 1), dtype=np.int32)
    pred = preds.astype(np.int32).copy()
    index = idxs.astype(np.int32).clip(0, 88).copy()
    out[:, 0] = pred
    for s in range(n_nib):
        pred, index = _ima_step(pred, index, nibbles[:, s])
        out[:, s + 1] = pred
    return out


def ima_adpcm_encode_blocks(samples: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode a (blocks, samples_per_block) int16 matrix. Returns
    (nibbles (blocks, spb-1), header predictors, header indexes). The
    header predictor is sample 0 verbatim; the start index is chosen from
    the first delta's magnitude (any start index is VALID IMA — decoders
    adapt — this one just converges fast). Vectorized over blocks."""
    samples = samples.astype(np.int32)
    n_blocks, spb = samples.shape
    pred = samples[:, 0].copy()
    first_delta = np.abs(samples[:, 1] - samples[:, 0]) if spb > 1 else np.zeros(n_blocks)
    index = np.searchsorted(IMA_STEP_TABLE, first_delta).clip(0, 88).astype(np.int32)
    idx0 = index.copy()
    nibbles = np.empty((n_blocks, spb - 1), dtype=np.uint8)
    for s in range(1, spb):
        step = IMA_STEP_TABLE[index]
        diff = samples[:, s] - pred
        code = np.where(diff < 0, 8, 0).astype(np.int32)
        ad = np.abs(diff)
        c4 = ad >= step
        ad = ad - np.where(c4, step, 0)
        c2 = ad >= (step >> 1)
        ad = ad - np.where(c2, step >> 1, 0)
        c1 = ad >= (step >> 2)
        code = code | (c4 << 2) | (c2 << 1) | c1.astype(np.int32)
        nibbles[:, s - 1] = code
        pred, index = _ima_step(pred, index, code)
    return nibbles, samples[:, 0].astype(np.int16), idx0


def pack_nibbles(nib: np.ndarray) -> np.ndarray:
    """(blocks, 2k) nibble matrix -> (blocks, k) bytes, low nibble first
    (the WAV IMA byte order)."""
    lo = nib[:, 0::2].astype(np.uint8)
    hi = nib[:, 1::2].astype(np.uint8)
    return lo | (hi << 4)


def unpack_nibbles(bytes_mat: np.ndarray) -> np.ndarray:
    """(blocks, k) bytes -> (blocks, 2k) nibbles, low nibble first."""
    out = np.empty((bytes_mat.shape[0], bytes_mat.shape[1] * 2), dtype=np.uint8)
    out[:, 0::2] = bytes_mat & 0x0F
    out[:, 1::2] = bytes_mat >> 4
    return out
