"""m-way join tests (the reference validates joins via Results = |S| on
pk/fk workloads plus sortedness checks; we add a numpy count oracle —
reference: src/joins/sortmergejoin_multiway.c, joincommon.c:487-501)."""

import numpy as np
import pytest

from avx_sort_merge_joins_tpu.types import Relation
from avx_sort_merge_joins_tpu.models.mway import sortmergejoin_multiway
from avx_sort_merge_joins_tpu.ops.mergejoin import merge_join_count_numpy


def _rel(keys, rng):
    return Relation.from_numpy(
        keys, rng.integers(0, 1000, len(keys)).astype(np.int32))


def test_mway_pk_fk(rng):
    nR, nS = 50_000, 70_000
    rk = rng.permutation(np.arange(1, nR + 1)).astype(np.int32)
    sk = rng.integers(1, nR + 1, nS).astype(np.int32)
    res = sortmergejoin_multiway(_rel(rk, rng), _rel(sk, rng))
    assert res.totalresults == merge_join_count_numpy(rk, sk) == nS


def test_mway_nonunique(rng):
    nR, nS = 30_000, 30_000
    rk = rng.integers(1, 5_000, nR).astype(np.int32)
    sk = rng.integers(1, 5_000, nS).astype(np.int32)
    res = sortmergejoin_multiway(_rel(rk, rng), _rel(sk, rng))
    assert res.totalresults == merge_join_count_numpy(rk, sk)


@pytest.mark.parametrize("fanin", [2, 8])
def test_mway_fanin_variants(rng, fanin):
    nR = nS = 40_000
    rk = rng.permutation(np.arange(1, nR + 1)).astype(np.int32)
    sk = rng.permutation(np.arange(1, nS + 1)).astype(np.int32)
    res = sortmergejoin_multiway(_rel(rk, rng), _rel(sk, rng), fanin=fanin)
    assert res.totalresults == nS


def test_mway_negative_keys(rng):
    """The fork's motivating bug: negative keys mis-sorted under double
    compare (reference: src/run.log:531-551).  Native int32 compares must
    handle them exactly."""
    nR = nS = 20_000
    rk = rng.integers(-(2**28), 2**28, nR).astype(np.int32)
    sk = rng.integers(-(2**28), 2**28, nS).astype(np.int32)
    res = sortmergejoin_multiway(_rel(rk, rng), _rel(sk, rng))
    assert res.totalresults == merge_join_count_numpy(rk, sk)


def test_mway_count2_variant(rng, monkeypatch):
    """SMJ_COUNT2=1 routes the count through merge_levels_2runs + the
    4-way-select kernel (the round-4 fused-last-level A/B surface —
    measured slower, kept as a documented knob; PLAN r4).  Must stay
    EXACT on nonunique keys: sizes chosen so both compositions stop at
    two runs with a ragged second run."""
    nR, nS = 150_000, 90_000  # > 1 block (block 512 = 64K), non-pow2
    rk = rng.integers(1, 9_000, nR).astype(np.int32)
    sk = rng.integers(1, 9_000, nS).astype(np.int32)
    want = merge_join_count_numpy(rk, sk)
    monkeypatch.setenv("SMJ_COUNT2", "1")
    res = sortmergejoin_multiway(_rel(rk, rng), _rel(sk, rng))
    assert res.totalresults == want
    monkeypatch.setenv("SMJ_COUNT2", "0")
    res0 = sortmergejoin_multiway(_rel(rk, rng), _rel(sk, rng))
    assert res0.totalresults == want


def test_mway_prefetch_knobs_off(rng, monkeypatch):
    """SMJ_COUNT_PREFETCH=0 / SMJ_LEAF_PREFETCH=0 select the
    single-buffered kernel variants (the A/B foils of PLAN r3/r4) — they
    must stay exact, not just the defaults.  One joint run covers the
    leaf-window path (multiwaymerge) and the count-window path
    (mergejoin) together."""
    monkeypatch.setenv("SMJ_COUNT_PREFETCH", "0")
    monkeypatch.setenv("SMJ_LEAF_PREFETCH", "0")
    nR, nS = 140_000, 100_000
    rk = rng.integers(1, 7_000, nR).astype(np.int32)
    sk = rng.integers(1, 7_000, nS).astype(np.int32)
    res = sortmergejoin_multiway(_rel(rk, rng), _rel(sk, rng))
    assert res.totalresults == merge_join_count_numpy(rk, sk)
