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


def _fused_layout(keys_sorted, tile_rows):
    """(rows,128) ascending layout with the fused kernel's spare rows."""
    n = len(keys_sorted)
    rows = -(-n // 128) + tile_rows + 8
    kf = np.full(rows * 128, 2**31 - 1, np.int32)
    kf[:n] = keys_sorted
    return jnp.asarray(kf.reshape(rows, 128))


def test_fused_count_limb_overflow_detected():
    """Both-sides-hot key with cntR*cntS >= 2^29: the fused kernel must
    raise the overflow flag (never return a silently wrapped count) —
    the reference's scalar loops are exact for all inputs
    (joincommon.c:260-305)."""
    n = 1 << 15  # 2^15 * 2^15 = 2^30 matches on one key
    rk = np.full(n, 7, np.int32)
    sk = np.full(n, 7, np.int32)
    stats = MJ.merge_join_count_fused(_fused_layout(rk, 128),
                                      _fused_layout(sk, 128), n, n, 128)
    with pytest.raises(MJ.CountLimbOverflow):
        MJ.finish_count_fused(stats)


def test_fused_count_below_limb_limit_exact():
    """Just below the invariant: 2^14 * 2^14 = 2^28 < 2^29 stays exact and
    unflagged."""
    n = 1 << 14
    rk = np.full(n, 7, np.int32)
    sk = np.full(n, 7, np.int32)
    stats = MJ.merge_join_count_fused(_fused_layout(rk, 128),
                                      _fused_layout(sk, 128), n, n, 128)
    assert MJ.finish_count_fused(stats) == n * n


def test_mway_model_overflow_fallback():
    """The m-way model returns the exact count through the wide fallback
    when the fused kernel overflows."""
    from avx_sort_merge_joins_tpu.models.mway import sortmergejoin_multiway
    from avx_sort_merge_joins_tpu.types import Relation

    n = 1 << 15
    R = Relation.from_numpy(np.full(n, 7, np.int32))
    Sr = Relation.from_numpy(np.full(n, 7, np.int32))
    res = sortmergejoin_multiway(R, Sr, block_rows=128, tile_rows=128)
    assert res.totalresults == n * n


def test_fused_count_tile_larger_than_layout_spare(rng):
    """Count tile 256 over layouts built with only tile-128 spare (the
    low-mwaybufsize m-way combination): the wrapper must pad the missing
    spare rows — without it the end-clamped window DMA reads past the
    VMEM scratch and merges garbage."""
    n = 80000  # big enough that ensure_min_rows alone cannot mask the
    # missing spare (live rows must exceed WIN - spare = 384)
    rk = np.sort(rng.integers(1, 30000, n).astype(np.int32))
    sk = np.sort(rng.integers(1, 30000, n).astype(np.int32))
    expected = MJ.merge_join_count_numpy(rk, sk)
    stats = MJ.merge_join_count_fused(_fused_layout(rk, 128),
                                      _fused_layout(sk, 128), n, n, 256)
    assert MJ.finish_count_fused(stats) == expected


def test_fused64_count_tile_larger_than_layout_spare(rng):
    """Same spare-vs-tile mismatch through the KEY_8B plane kernel: its
    single-buffered window load derives the lane skip from the unclamped
    cursor, so an engaged clamp misaligns whole rows unless the wrapper
    guarantees the spare."""
    from avx_sort_merge_joins_tpu.ops import join64

    nR, nS = 20000, 30000
    rk = rng.integers(1, 8000, nR).astype(np.int32)
    sk = rng.integers(1, 8000, nS).astype(np.int32)
    (rh, rl), (sh, sl) = (join64.split64(np.sort(rk.astype(np.int64))),
                          join64.split64(np.sort(sk.astype(np.int64))))

    def layout(plane, tile_rows):
        m = len(plane)
        rows = -(-m // 128) + tile_rows + 8
        f = np.full(rows * 128, 2**31 - 1, np.int32)
        f[:m] = plane
        return jnp.asarray(f.reshape(rows, 128))

    stats = MJ.merge_join_count_fused64(
        layout(rh, 128), layout(rl, 128), layout(sh, 128), layout(sl, 128),
        nR, nS, tile_rows=256)
    assert MJ.finish_count_fused(stats) == MJ.merge_join_count_numpy(
        np.sort(rk), np.sort(sk))
