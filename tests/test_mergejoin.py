"""Merge-join tests: match counts validated against the NumPy oracle
sum_k cntR(k)*cntS(k) — the semantics of the reference's duplicate-aware
merge_join (reference: src/joins/joincommon.c:239-312)."""

import numpy as np
import jax.numpy as jnp
import pytest

from avx_sort_merge_joins_tpu.ops import mergejoin as MJ
from avx_sort_merge_joins_tpu.ops import sort as S


def _count(rk, sk, tile_rows=8):
    nR, nS = len(rk), len(sk)
    rks, _ = S.sort(jnp.asarray(rk), jnp.zeros(nR, jnp.int32), nR,
                    block_rows=8, tile_rows=tile_rows)
    sks, _ = S.sort_descending(jnp.asarray(sk), jnp.zeros(nS, jnp.int32), nS,
                               block_rows=8, tile_rows=tile_rows)
    stats = MJ.merge_join_count(rks, sks, nR, nS, tile_rows)
    return MJ.finish_count(stats, tile_rows)


@pytest.mark.parametrize("nR,nS,lo,hi", [
    (5000, 8000, 0, 500),      # many duplicates both sides
    (4096, 4096, 0, 10**6),    # sparse matches
    (3000, 9000, 0, 10),       # extreme duplication
    (1000, 1000, -500, 500),   # negative keys
])
def test_count_vs_oracle(rng, nR, nS, lo, hi):
    rk = rng.integers(lo, hi, nR).astype(np.int32)
    sk = rng.integers(lo, hi, nS).astype(np.int32)
    assert _count(rk, sk) == MJ.merge_join_count_numpy(rk, sk)


def test_count_pk_fk(rng):
    # default-workload invariant: R = unique 1..n, S fk -> matches == |S|
    n = 10000
    rk = rng.permutation(np.arange(1, n + 1)).astype(np.int32)
    sk = rng.integers(1, n + 1, 3 * n).astype(np.int32)
    assert _count(rk, sk) == 3 * n


def test_count_no_matches(rng):
    rk = rng.integers(0, 1000, 2000).astype(np.int32)
    sk = rng.integers(5000, 6000, 2000).astype(np.int32)
    assert _count(rk, sk) == 0


def test_count_all_equal():
    rk = np.full(300, 42, np.int32)
    sk = np.full(500, 42, np.int32)
    assert _count(rk, sk) == 300 * 500


def test_xla_baseline_counter(rng):
    rk = np.sort(rng.integers(0, 100, 1000)).astype(np.int32)
    sk = np.sort(rng.integers(0, 100, 1500)).astype(np.int32)
    got = int(MJ.merge_join_count_xla(jnp.asarray(rk), jnp.asarray(sk), 1000, 1500))
    assert got == MJ.merge_join_count_numpy(rk, sk)
