"""Zipf-distributed key generator — replica of the reference's genzipf
(reference: src/datagen/genzipf.c).

Pipeline (bit-exact when driven by the glibc-rand replica):
  1. alphabet = random permutation of 1..alphabet_size, Fisher-Yates with
     ``k = i * rand() / RAND_MAX`` (integer division; genzipf.c:28-53),
  2. cumulative-probability LUT ``lut[i-1] = (sum 1/j^z, j<=i) / scale``
     (genzipf.c:60-92),
  3. each draw: r = rand()/RAND_MAX, binary search the LUT, emit
     alphabet[pos] (genzipf.c:97-159).

The LUT construction and the per-draw binary search are vectorized with
NumPy (``np.searchsorted``); only the rand() stream itself is sequential and
comes from the shared GlibcRand state so draw order matches the C code.
"""

from __future__ import annotations

import numpy as np

from .c_rng import RAND_MAX, GlibcRand


def _native():
    try:
        from . import native

        return native if native.available() else None
    except Exception:
        return None


def gen_alphabet(size: int, rng: GlibcRand) -> np.ndarray:
    """Random permutation of 1..size, exactly as genzipf.c:28-53."""
    alphabet = np.arange(1, size + 1, dtype=np.int64)
    if size <= 1:
        return alphabet
    nat = _native()
    if nat is not None and size >= 65536:
        nat.alphabet_shuffle(alphabet, rng)
        return alphabet
    draws = rng.rand_array(size - 1)
    # k = (unsigned long) i * rand() / RAND_MAX with C integer division
    for idx, i in enumerate(range(size - 1, 0, -1)):
        k = (i * int(draws[idx])) // RAND_MAX
        alphabet[i], alphabet[k] = alphabet[k], alphabet[i]
    return alphabet


def gen_zipf_lut(zipf_factor: float, alphabet_size: int) -> np.ndarray:
    """Cumulative Zipf LUT (genzipf.c:60-92)."""
    weights = 1.0 / np.power(np.arange(1, alphabet_size + 1, dtype=np.float64), zipf_factor)
    csum = np.cumsum(weights)
    return csum / csum[-1]


def gen_zipf(
    stream_size: int,
    alphabet_size: int,
    zipf_factor: float,
    rng: GlibcRand,
) -> np.ndarray:
    """Zipf-distributed int32 keys, bit-exact vs the reference generator.

    The reference does a manual binary search whose result equals the
    smallest index with lut[pos] >= r, i.e. ``np.searchsorted(lut, r,
    side='left')`` (genzipf.c:120-146; lut values are distinct and
    increasing, and r <= 1.0 = lut[-1] so pos is always in range).
    """
    alphabet = gen_alphabet(alphabet_size, rng)
    lut = gen_zipf_lut(zipf_factor, alphabet_size)
    nat = _native()
    if nat is not None and stream_size >= 65536:
        return nat.zipf_fill(lut, alphabet, stream_size, rng)
    draws = rng.rand_array(stream_size).astype(np.float64) / float(RAND_MAX)
    pos = np.searchsorted(lut, draws, side="left")
    pos = np.minimum(pos, alphabet_size - 1)
    return alphabet[pos].astype(np.int32)
