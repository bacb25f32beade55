"""Sort operator tests — randomized property tests against oracles, the
strategy of the reference's check_avxsort suite (reference:
tests/check_avxsort.c: random + pre-sorted inputs, is_sorted postcondition;
we additionally verify the exact (key,payload) pairing against np.lexsort)."""

import numpy as np
import pytest
import jax.numpy as jnp

from avx_sort_merge_joins_tpu.ops import sort as S
from avx_sort_merge_joins_tpu.ops import bitonic


def _check(n, k, p, block_rows=8, tile_rows=8):
    ks, ps = S.sort(jnp.asarray(k), jnp.asarray(p), n,
                    block_rows=block_rows, tile_rows=tile_rows)
    order = np.lexsort((p, k))
    np.testing.assert_array_equal(np.asarray(ks), k[order])
    np.testing.assert_array_equal(np.asarray(ps), p[order])


@pytest.mark.parametrize("n", [1024, 4096, 16384, 5000, 33000])
def test_sort_random(rng, n):
    k = rng.integers(-(2**31) + 2, 2**31 - 2, n).astype(np.int32)
    p = rng.integers(0, 2**30, n).astype(np.int32)
    _check(n, k, p)


def test_sort_presorted_and_reverse(rng):
    n = 12000
    k = np.sort(rng.integers(0, 1 << 20, n)).astype(np.int32)
    p = np.arange(n, dtype=np.int32)
    _check(n, k, p)
    _check(n, k[::-1].copy(), p)


def test_sort_many_duplicates(rng):
    n = 16000
    k = rng.integers(0, 8, n).astype(np.int32)  # heavy duplication
    p = rng.permutation(n).astype(np.int32)
    _check(n, k, p)


def test_sort_all_equal():
    n = 8192
    k = np.full(n, 7, np.int32)
    p = np.arange(n, dtype=np.int32)[::-1].copy()
    _check(n, k, p)


def test_sort_single_block():
    # n <= one block: no merge passes at all
    n = 900
    rng = np.random.default_rng(3)
    k = rng.integers(-100, 100, n).astype(np.int32)
    p = np.arange(n, dtype=np.int32)
    _check(n, k, p)


def test_sort_negative_keys(rng):
    # the fork's motivating failure: negative keys under double-compare
    # (reference src/run.log:531-551) — int32 compares must be exact
    n = 12345
    k = rng.integers(-(2**31) + 2, 0, n).astype(np.int32)
    p = np.arange(n, dtype=np.int32)
    _check(n, k, p)


def test_sort_descending_option():
    # descending full sort used by the merge-join S-side
    n = 6000
    rng = np.random.default_rng(4)
    k = rng.integers(-1000, 1000, n).astype(np.int32)
    p = np.arange(n, dtype=np.int32)
    ks, ps = S.sort_descending(jnp.asarray(k), jnp.asarray(p), n,
                               block_rows=8, tile_rows=8)
    order = np.lexsort((p, k))[::-1]
    np.testing.assert_array_equal(np.asarray(ks), k[order])
    np.testing.assert_array_equal(np.asarray(ps), p[order])


def test_bitonic_tile_network(rng):
    # bitonic_sort on a single flat tile, both directions
    import jax
    k = rng.integers(-50, 50, 1024).astype(np.int32).reshape(8, 128)
    p = rng.integers(0, 100, 1024).astype(np.int32).reshape(8, 128)
    for desc in [False, True]:
        ks, ps = jax.jit(lambda a, b: bitonic.bitonic_sort(a, b, desc))(k, p)
        flat_k = np.asarray(ks).reshape(-1)
        flat_p = np.asarray(ps).reshape(-1)
        order = np.lexsort((p.reshape(-1), k.reshape(-1)))
        if desc:
            order = order[::-1]
        np.testing.assert_array_equal(flat_k, k.reshape(-1)[order])
        np.testing.assert_array_equal(flat_p, p.reshape(-1)[order])


def test_sort_xla_baseline(rng):
    n = 5000
    k = rng.integers(-1000, 1000, n).astype(np.int32)
    p = rng.permutation(n).astype(np.int32)
    ks, ps = S.sort_xla(jnp.asarray(k), jnp.asarray(p))
    order = np.lexsort((p, k))
    np.testing.assert_array_equal(np.asarray(ks), k[order])
