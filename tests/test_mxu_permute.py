"""MXU one-hot primitive tests: exact histograms at the reference's full
radix-bit grid (partitioning-bench.sh bits 2..16) and exact int32
permutations — validated against numpy/XLA oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from avx_sort_merge_joins_tpu.ops import mxu_permute as mx
from avx_sort_merge_joins_tpu.ops import partition as pt


@pytest.mark.parametrize("bits", [2, 5, 7, 8, 10, 12, 14, 16])
def test_onehot_hist_exact(rng, bits):
    n = 200_000
    fanout = 1 << bits
    pid = rng.integers(0, fanout, n).astype(np.int32)
    got = np.asarray(mx.onehot_hist(jnp.asarray(pid), fanout))
    exp = np.bincount(pid, minlength=fanout).astype(np.int32)
    np.testing.assert_array_equal(got, exp)


def test_onehot_hist_chunked(rng):
    """Above the f32-exact chunk the scan path must still be exact."""
    n = (1 << 22) + 12345  # crosses one chunk boundary
    fanout = 1 << 10
    pid = rng.integers(0, fanout, n).astype(np.int32)
    got = np.asarray(mx.onehot_hist(jnp.asarray(pid), fanout))
    exp = np.bincount(pid, minlength=fanout).astype(np.int32)
    np.testing.assert_array_equal(got, exp)


def test_onehot_hist_chunked_small_fanout(rng):
    """Regression: with fanout <= 128 the scan path's pad value (fanout)
    wraps to lo == 0; pads must NOT be miscounted into bucket 0."""
    n = (1 << 22) + 999  # crosses one chunk boundary -> pads exist
    fanout = 64
    pid = rng.integers(0, fanout, n).astype(np.int32)
    got = np.asarray(mx.onehot_hist(jnp.asarray(pid), fanout))
    exp = np.bincount(pid, minlength=fanout).astype(np.int32)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("bits", [4, 10, 14])
def test_radix_hist_mxu_vs_xla(rng, bits):
    n = 100_000
    keys = rng.integers(1, 2**26, n).astype(np.int32)
    got = np.asarray(pt.radix_hist_mxu(jnp.asarray(keys), bits))
    exp = np.asarray(pt.radix_hist_xla(jnp.asarray(keys), bits))
    np.testing.assert_array_equal(got, exp)


def test_radix_hist_any_dispatch(rng):
    n = 512 * 128 * 2
    keys = rng.integers(1, 2**26, n).astype(np.int32)
    k2 = jnp.asarray(keys.reshape(-1, 128))
    for bits in (4, 12):
        got = np.asarray(pt.radix_hist_any(k2, bits))
        exp = np.asarray(pt.radix_hist_xla(jnp.asarray(keys), bits))
        np.testing.assert_array_equal(got, exp)


def test_permute_lanes_exact(rng):
    """Exact int32 gather through byte-split one-hot matmuls, including
    negative values and the full 32-bit range."""
    rows, L = 64, 128
    x = rng.integers(-2**31, 2**31 - 1, (rows, L), dtype=np.int64)\
        .astype(np.int32)
    idx = np.stack([rng.permutation(L) for _ in range(rows)])\
        .astype(np.int32)
    got = np.asarray(mx.permute_lanes(jnp.asarray(x), jnp.asarray(idx)))
    exp = np.take_along_axis(x, idx, axis=1)
    np.testing.assert_array_equal(got, exp)


def test_permute_lanes_gather_dups(rng):
    """idx need not be a permutation — arbitrary gather with duplicates."""
    rows, L = 32, 128
    x = rng.integers(-10**9, 10**9, (rows, L)).astype(np.int32)
    idx = rng.integers(0, L, (rows, L)).astype(np.int32)
    got = np.asarray(mx.permute_lanes(jnp.asarray(x), jnp.asarray(idx)))
    exp = np.take_along_axis(x, idx, axis=1)
    np.testing.assert_array_equal(got, exp)


def test_onehot_hist_exact_past_f32_integer_range():
    """A single bucket past 2^24 counts: the cross-chunk accumulator must
    be int32 — a float32 running sum silently loses integers there (f32
    ulp > 1), which broke the module's 'all paths bit-exact' contract."""
    import jax.numpy as jnp

    n = (1 << 24) + 21
    h = mx.onehot_hist(jnp.full((n,), 7, jnp.int32), 256)
    assert int(h[7]) == n
    assert int(h.sum()) == n
