"""Radix partitioning tests — the analog of the reference's partitioning
suite (reference: tests/check_partitioning.c: optimized variants validated
partition-by-partition against the naive radix_cluster plus alignment
assertions on partition starts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avx_sort_merge_joins_tpu.ops import partition as pt


@pytest.mark.parametrize("nbits,shift", [(7, 0), (4, 3), (2, 0)])
def test_radix_hist_matches_xla(rng, nbits, shift):
    n = 128 * 128
    keys = rng.integers(1, 2**20, n).astype(np.int32)
    h = np.asarray(pt.radix_hist(jnp.asarray(keys.reshape(-1, 128)),
                                 nbits, shift)).sum(axis=0)
    hx = np.asarray(pt.radix_hist_xla(jnp.asarray(keys), nbits, shift))
    np.testing.assert_array_equal(h, hx)
    assert h.sum() == n


def test_hash_bit_modulo_bias():
    """The (K-1) bias of HASH_BIT_MODULO (partition.c:29): key 1 lands in
    partition 0, key fanout lands in partition fanout-1."""
    keys = jnp.asarray([1, 2, 128, 129], dtype=jnp.int32)
    pid = np.asarray(pt.partition_ids(keys, 7))
    np.testing.assert_array_equal(pid, [0, 1, 127, 0])


@pytest.mark.parametrize("nbits", [2, 7])
def test_partition_relation_vs_oracle(rng, nbits):
    n = 128 * 128
    keys = rng.integers(1, 2**20, n).astype(np.int32)
    pays = np.arange(n, dtype=np.int32)
    pk, pp, off, sz = jax.jit(
        lambda k, p: pt.partition_relation(k, p, nbits)
    )(jnp.asarray(keys), jnp.asarray(pays))
    pk, pp, off, sz = map(np.asarray, (pk, pp, off, sz))
    ok_, op_, osz = pt.radix_cluster_numpy(keys, pays, nbits)
    np.testing.assert_array_equal(sz, osz)
    pos = 0
    for p_ in range(1 << nbits):
        np.testing.assert_array_equal(pk[off[p_]:off[p_] + sz[p_]],
                                      ok_[pos:pos + osz[p_]])
        np.testing.assert_array_equal(pp[off[p_]:off[p_] + sz[p_]],
                                      op_[pos:pos + osz[p_]])
        assert off[p_] % 128 == 0, "partition starts must be tile-aligned"
        pos += osz[p_]
