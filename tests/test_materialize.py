"""Materialization tests — the reference emits <S-key, S-RID> per match
(joincommon.c:272-284) and persists R.tbl/S.tbl/Out.tbl under
--enable-materialize/--enable-persist (generator.c:200-213)."""

import numpy as np
import jax.numpy as jnp

from avx_sort_merge_joins_tpu.ops import materialize as mat
from avx_sort_merge_joins_tpu.models.mway import sortmergejoin_multiway
from avx_sort_merge_joins_tpu.types import JoinConfig, Relation


def test_materialize_matches_oracle(rng):
    nR, nS = 5000, 8000
    rk = np.sort(rng.choice(20000, nR, replace=False).astype(np.int32))
    sk = np.sort(rng.integers(0, 20000, nS).astype(np.int32))
    sp = rng.integers(0, 10**6, nS).astype(np.int32)
    ok, op, om, nm = mat.materialize_matches(
        jnp.asarray(rk), nR, jnp.asarray(sk), jnp.asarray(sp), nS)
    nm = int(nm)
    mask = np.isin(sk, rk)
    np.testing.assert_array_equal(np.asarray(ok)[:nm], sk[mask])
    np.testing.assert_array_equal(np.asarray(op)[:nm], sp[mask])
    assert np.all(np.asarray(om)[:nm] == 1)  # pk R


def test_mway_materialize_join(rng):
    nR, nS = 20000, 30000
    rk = rng.permutation(np.arange(1, nR + 1)).astype(np.int32)
    sk = rng.integers(1, nR + 1, nS).astype(np.int32)
    sp = np.arange(5, 5 + nS, dtype=np.int32)
    R = Relation.from_numpy(rk, np.arange(nR, dtype=np.int32))
    S = Relation.from_numpy(sk, sp)
    res = sortmergejoin_multiway(R, S, JoinConfig(materialize=True))
    assert res.totalresults == nS  # fk S: every tuple matches
    out = res.resultlist[0].results
    gk, gp = out.to_numpy()
    order = np.lexsort((sp, sk))
    np.testing.assert_array_equal(gk, sk[order])
    np.testing.assert_array_equal(gp, sp[order])
