"""2-way merge facade tests (reference: tests/check_merge.c validates all
merge kernel variants element-wise against qsort)."""

import numpy as np
import jax.numpy as jnp
import pytest

from avx_sort_merge_joins_tpu.ops import merge as mg


@pytest.mark.parametrize("na,nb", [(20000, 20000), (16384, 9000), (5, 40000)])
def test_merge_tuples_vs_oracle(rng, na, nb):
    ka = np.sort(rng.integers(-(2**30), 2**30, na).astype(np.int32))
    kb = np.sort(rng.integers(-(2**30), 2**30, nb).astype(np.int32))
    pa = rng.integers(0, 100, na).astype(np.int32)
    pb = rng.integers(0, 100, nb).astype(np.int32)
    # sort payload within equal keys to match lex semantics
    oa = np.lexsort((pa, ka)); ka, pa = ka[oa], pa[oa]
    ob = np.lexsort((pb, kb)); kb, pb = kb[ob], pb[ob]
    gk, gp = mg.merge_tuples(jnp.asarray(ka), jnp.asarray(pa),
                             jnp.asarray(kb), jnp.asarray(pb))
    ek, ep = mg.merge_numpy(ka, pa, kb, pb)
    np.testing.assert_array_equal(np.asarray(gk), ek)
    np.testing.assert_array_equal(np.asarray(gp), ep)


def test_merge_keys_only(rng):
    na = nb = 16384
    ka = np.sort(rng.integers(-(2**30), 2**30, na).astype(np.int32))
    kb = np.sort(rng.integers(-(2**30), 2**30, nb).astype(np.int32))
    gk, gp = mg.merge_tuples(jnp.asarray(ka), None, jnp.asarray(kb), None)
    assert gp is None
    np.testing.assert_array_equal(np.asarray(gk),
                                  np.sort(np.concatenate([ka, kb])))


def test_scalar_merge(rng):
    na, nb = 1000, 2000
    ka = np.sort(rng.integers(0, 10**6, na).astype(np.int32))
    kb = np.sort(rng.integers(0, 10**6, nb).astype(np.int32))
    pa = np.arange(na, dtype=np.int32)
    pb = np.arange(nb, dtype=np.int32)
    gk, gp = mg.scalar_merge_tuples(jnp.asarray(ka), jnp.asarray(pa),
                                    jnp.asarray(kb), jnp.asarray(pb))
    ek, ep = mg.merge_numpy(ka, pa, kb, pb)
    np.testing.assert_array_equal(np.asarray(gk), ek)
