"""Bit-exact replica of glibc's ``rand()`` (TYPE_3 additive-feedback generator).

The reference engine seeds glibc ``srand()`` and draws from ``rand()`` for
Knuth shuffles, non-unique key generation and the Zipf generator
(reference: src/datagen/generator.c:22,29-35,59 and src/datagen/genzipf.c).
To reproduce its workloads bit-for-bit we re-implement the exact generator:

* state table of 34 int32 words seeded with a Park-Miller LCG,
* additive lagged-Fibonacci recurrence r[i] = r[i-3] + r[i-31] (mod 2^32),
* the first 310 outputs are discarded, each output is ``r >> 1``.

A NumPy block implementation is provided here; ``avx_sort_merge_joins_tpu.datagen.native``
wraps the same algorithm in C for large streams (1.6B draws for the scale
configs), keeping identical output.
"""

from __future__ import annotations

import numpy as np

RAND_MAX = 2147483647  # glibc RAND_MAX = 2^31 - 1

_LAG_SHORT = 3
_LAG_LONG = 31
_WARMUP = 310


def _seed_table(seed: int) -> np.ndarray:
    """Initial 34-word state table, exactly as glibc __initstate_r."""
    seed = seed & 0xFFFFFFFF
    if seed == 0:
        seed = 1
    r = np.zeros(34, dtype=np.int64)
    r[0] = np.int64(np.int32(seed))
    for i in range(1, 31):
        # hi/lo decomposition of 16807 * r[i-1] % 2147483647 without overflow,
        # exactly as glibc computes it (may yield the value 2147483647 - x form)
        prev = int(r[i - 1])
        hi = prev // 127773
        lo = prev % 127773
        word = 16807 * lo - 2836 * hi
        if word < 0:
            word += 2147483647
        r[i] = word
    r[31] = r[0]
    r[32] = r[1]
    r[33] = r[2]
    return r.astype(np.uint32)


class GlibcRand:
    """Sequential-compatible glibc rand() stream with vectorized block fill."""

    def __init__(self, seed: int):
        self.seed(seed)

    def seed(self, seed: int) -> None:
        table = _seed_table(seed)
        # Ring buffer over the last 31 values is all the state we need.
        self._hist = table[3:34].astype(np.uint32)  # r[3..33]; r[33] is newest
        # Discard warm-up outputs.
        self._fill(_WARMUP)

    def _fill(self, n: int) -> np.ndarray:
        """Generate n raw recurrence words (before >>1), updating state."""
        hist = self._hist
        out = np.empty(n + _LAG_LONG, dtype=np.uint32)
        out[:_LAG_LONG] = hist
        # r[i] = r[i-3] + r[i-31]: elements within a stride of 3 are
        # independent, so fill in waves of 3.
        i = _LAG_LONG
        end = n + _LAG_LONG
        while i < end:
            m = min(_LAG_SHORT, end - i)
            out[i : i + m] = out[i - _LAG_SHORT : i - _LAG_SHORT + m] + out[i - _LAG_LONG : i - _LAG_LONG + m]
            i += m
        self._hist = out[-_LAG_LONG:].copy()
        return out[_LAG_LONG:]

    def rand(self) -> int:
        """One glibc rand() draw in [0, RAND_MAX]."""
        return int(self._fill(1)[0] >> 1)

    def rand_array(self, n: int) -> np.ndarray:
        """n glibc rand() draws as int64 array in [0, RAND_MAX]."""
        return (self._fill(n) >> np.uint32(1)).astype(np.int64)


def rand_range(rng: GlibcRand, n: int) -> int:
    """RAND_RANGE(N) = (double)rand() / (RAND_MAX + 1) * N (generator.c:22)."""
    return int(float(rng.rand()) / float(RAND_MAX + 1) * n)
