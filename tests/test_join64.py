"""KEY_8B (int64 key) mode tests — the reference's --enable-key8B forces
the scalar paths (main.c:871-877); here the plane-split sort runs on the
Pallas pair network and the count uses the XLA rank reduction."""

import numpy as np
import jax.numpy as jnp

from avx_sort_merge_joins_tpu.ops import join64


def test_split_roundtrip(rng):
    k = rng.integers(-(2**62), 2**62, 10000).astype(np.int64)
    hi, lo = join64.split64(k)
    np.testing.assert_array_equal(join64.join64(hi, lo), k)


def test_plane_order_matches_int64(rng):
    k = rng.integers(-(2**62), 2**62, 20000).astype(np.int64)
    hi, lo = join64.split64(k)
    order = np.lexsort((lo, hi))
    np.testing.assert_array_equal(k[order], np.sort(k, kind="stable"))


def test_sort64(rng):
    n = 50000
    k = rng.integers(-(2**62), 2**62, n).astype(np.int64)
    hi, lo = join64.split64(k)
    shi, slo = join64.sort64(jnp.asarray(hi), jnp.asarray(lo), n)
    got = join64.join64(np.asarray(shi), np.asarray(slo))
    np.testing.assert_array_equal(got, np.sort(k))


def test_widen32_order_and_roundtrip(rng):
    """widen32 must agree with the host split64 of the int64-widened
    values (the KEY_8B storage widening, types.h:23-29)."""
    k32 = rng.integers(-(2**31) + 2, 2**31 - 2, 30000).astype(np.int32)
    hi, lo = join64.widen32(jnp.asarray(k32))
    ehi, elo = join64.split64(k32.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(hi), ehi)
    np.testing.assert_array_equal(np.asarray(lo), elo)


def test_key8b_join_count_end_to_end(rng):
    """The full KEY_8B ENGINE pipeline (widen -> Pallas plane sort ->
    fused plane-lex count kernel) against the numpy oracle, nonunique
    keys."""
    nR, nS = 30000, 45000
    rk = rng.integers(1, 8000, nR).astype(np.int32)
    sk = rng.integers(1, 8000, nS).astype(np.int32)
    (rhi, rlo), (shi, slo), limbs, ovf = join64.key8b_join_count(
        jnp.asarray(rk), jnp.asarray(sk), nR, nS, recover_s=True)
    assert int(ovf) == 0
    assert join64.finish_count64(limbs) == join64.merge_join_count_numpy64(
        rk.astype(np.int64), sk.astype(np.int64))
    # the sorted planes really are the Pallas sort's output
    got = join64.join64(np.asarray(rhi), np.asarray(rlo))
    np.testing.assert_array_equal(got, np.sort(rk.astype(np.int64)))
    # S sorts through the NOT-plane (negated) layout; the returned planes
    # must still be ascending original order
    got_s = join64.join64(np.asarray(shi), np.asarray(slo))
    np.testing.assert_array_equal(got_s, np.sort(sk.astype(np.int64)))


def test_key8b_scalar_sort_path(rng):
    nR, nS = 10000, 15000
    rk = rng.permutation(np.arange(1, nR + 1)).astype(np.int32)
    sk = rng.integers(1, nR + 1, nS).astype(np.int32)
    _, _, limbs, ovf = join64.key8b_join_count(
        jnp.asarray(rk), jnp.asarray(sk), nR, nS, pallas_sort=False)
    assert int(ovf) == 0
    assert join64.finish_count64(limbs) == nS


def test_fused64_wide_keys_vs_oracle(rng):
    """The fused plane-lex kernel on genuinely 64-bit keys (hi plane
    carries real entropy, duplicates straddle tile boundaries)."""
    from avx_sort_merge_joins_tpu.ops import mergejoin

    nR, nS = 40000, 50000
    pool = rng.integers(-(2**40), 2**40, 5000).astype(np.int64)
    rk = pool[rng.integers(0, 5000, nR)]
    sk = pool[rng.integers(0, 5000, nS)]
    rhi, rlo = join64.split64(np.sort(rk))
    shi, slo = join64.split64(np.sort(sk))

    def layout(hi, lo, n):
        from avx_sort_merge_joins_tpu.ops import sort as so
        from avx_sort_merge_joins_tpu.ops.bitonic import KEY_POS_INF, LANES
        rows = so.padded_rows(n, 512, 256)
        h = jnp.full((rows * LANES,), KEY_POS_INF, jnp.int32).at[:n]\
            .set(jnp.asarray(hi))
        l = jnp.full((rows * LANES,), KEY_POS_INF, jnp.int32).at[:n]\
            .set(jnp.asarray(lo))
        return h.reshape(rows, LANES), l.reshape(rows, LANES)

    rh2, rl2 = layout(rhi, rlo, nR)
    sh2, sl2 = layout(shi, slo, nS)
    stats = mergejoin.merge_join_count_fused64(rh2, rl2, sh2, sl2, nR, nS)
    got = mergejoin.finish_count_fused(stats)
    want = join64.merge_join_count_numpy64(rk, sk)
    assert got == want

    # s_negated parity: the same count through the NOT-plane layout
    # (~S planes sorted ascending = S descending; back-to-front windows)
    snot = np.sort(sk)[::-1]  # descending originals
    nh, nl = join64.split64(snot)
    sh2n, sl2n = layout(np.invert(nh), np.invert(nl), nS)
    stats_n = mergejoin.merge_join_count_fused64(
        rh2, rl2, sh2n, sl2n, nR, nS, s_negated=True)
    assert mergejoin.finish_count_fused(stats_n) == want


def test_count64_vs_oracle(rng):
    nR, nS = 20000, 30000
    rk = rng.integers(0, 2**40, nR).astype(np.int64)
    sk = np.concatenate([rk[rng.integers(0, nR, nS - 1000)],
                         rng.integers(0, 2**40, 1000)]).astype(np.int64)
    rhi, rlo = join64.split64(rk)
    shi, slo = join64.split64(sk)
    got = int(join64.merge_join_count_xla64(
        jnp.asarray(rhi), jnp.asarray(rlo),
        jnp.asarray(shi), jnp.asarray(slo), nR, nS))
    assert got == join64.merge_join_count_numpy64(rk, sk)


def test_finish_count64_no_int32_wrap():
    """Counts >= 2^31 must combine exactly: hi=3 would wrap (hi << 30) in
    device int32 (the bug this helper replaces) — host Python ints don't."""
    assert join64.finish_count64(np.array([3, 7], np.int32)) == 3 * 2**30 + 7
    assert join64.finish_count64(np.array([8, 0], np.int32)) == 2**33


def test_fused64_edge_sizes(rng):
    """Tiny/odd sizes through the fused plane-lex kernel in BOTH window
    modes and both S layouts: single partial tile (pair-loop overshoot),
    exactly one tile, one-past-a-tile, asymmetric tiny sides.  The
    sentinel-repair lesson (PLAN r2) says boundary arithmetic bugs hide
    at exactly these shapes."""
    from avx_sort_merge_joins_tpu.ops import mergejoin
    from avx_sort_merge_joins_tpu.ops import sort as so
    from avx_sort_merge_joins_tpu.ops.bitonic import KEY_POS_INF, LANES

    tile = 128
    T = tile * LANES

    def layout_planes(hi, lo, n):
        rows = so.padded_rows(max(n, 1), 128, 128)
        h = jnp.full((rows * LANES,), KEY_POS_INF, jnp.int32).at[:n]\
            .set(jnp.asarray(hi))
        l = jnp.full((rows * LANES,), KEY_POS_INF, jnp.int32).at[:n]\
            .set(jnp.asarray(lo))
        return h.reshape(rows, LANES), l.reshape(rows, LANES)

    def layout(vals64, n):
        return layout_planes(*join64.split64(np.sort(vals64)), n)

    def layout_not(vals64, n):
        nh, nl = join64.split64(np.sort(vals64)[::-1])
        return layout_planes(np.invert(nh), np.invert(nl), n)

    for nR, nS in [(1, 1), (5, 3), (T - 1, 7), (T, T), (T + 1, T - 1),
                   (2 * T + 3, 11)]:
        rk = rng.integers(0, 50, nR).astype(np.int64)
        sk = rng.integers(0, 50, nS).astype(np.int64)
        want = join64.merge_join_count_numpy64(rk, sk)
        rh2, rl2 = layout(rk, nR)
        for prefetch in (False, True):
            sh2, sl2 = layout(sk, nS)
            stats = mergejoin.merge_join_count_fused64(
                rh2, rl2, sh2, sl2, nR, nS, tile_rows=tile,
                prefetch=prefetch)
            got = mergejoin.finish_count_fused(stats)
            assert got == want, (nR, nS, prefetch, got, want)
            snh2, snl2 = layout_not(sk, nS)
            stats_n = mergejoin.merge_join_count_fused64(
                rh2, rl2, snh2, snl2, nR, nS, tile_rows=tile,
                prefetch=prefetch, s_negated=True)
            got_n = mergejoin.finish_count_fused(stats_n)
            assert got_n == want, (nR, nS, prefetch, "neg", got_n, want)
