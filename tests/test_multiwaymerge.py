"""Multiway (k-way FIFO-tree) merge tests — the analog of the reference's
multi-way merge suite (reference: tests/check_merge.c:79-171, random fan-in
and chunk sizes validated for count and sortedness vs oracles)."""

import numpy as np
import jax.numpy as jnp
import pytest

from avx_sort_merge_joins_tpu.ops import multiwaymerge as mw

TILE_ROWS = 128
STRIDE = 128  # rows per run slot


def _make_runs(rng, lens, stride=STRIDE):
    nruns = len(lens)
    rows = nruns * stride + TILE_ROWS + 8
    k = np.full((rows * 128,), 2**31 - 1, np.int32)
    p = np.zeros_like(k)
    for i, l in enumerate(lens):
        k[i * stride * 128:i * stride * 128 + l] = np.sort(
            rng.integers(-(2**30), 2**30, l).astype(np.int32))
        p[i * stride * 128:i * stride * 128 + l] = rng.integers(
            0, 1000, l).astype(np.int32)
    return k.reshape(rows, 128), p.reshape(rows, 128)


def _expected(k, lens, stride=STRIDE):
    flat = k.reshape(-1)
    parts = [flat[i * stride * 128:i * stride * 128 + l]
             for i, l in enumerate(lens)]
    return np.sort(np.concatenate(parts), kind="stable")


@pytest.mark.parametrize("fanin,lens", [
    (2, [16384, 16384]),
    (2, [16384, 9000]),
    (4, [16384, 16384, 10000, 7000]),
    (8, [16384] * 8),
    (4, [16384, 0, 5, 16384]),          # empty + tiny runs
    (16, [2048] * 16),                   # fan-in 16, short runs
])
def test_multiway_merge_sorted(rng, fanin, lens):
    k, p = _make_runs(rng, lens)
    ok, op, nl = mw.multiway_merge(jnp.asarray(k), jnp.asarray(p), lens,
                                   STRIDE, fanin, TILE_ROWS)
    total = sum(lens)
    got = np.asarray(ok).reshape(-1)[:total]
    assert nl[0] == total
    np.testing.assert_array_equal(got, _expected(k, lens))


def test_multiway_merge_two_groups(rng):
    lens = [16384, 12000, 16384, 500]
    k, p = _make_runs(rng, lens)
    ok, op, nl = mw.multiway_merge(jnp.asarray(k), jnp.asarray(p), lens,
                                   STRIDE, 2, TILE_ROWS)
    flat = np.asarray(ok).reshape(-1)
    for g in range(2):
        total = lens[2 * g] + lens[2 * g + 1]
        got = flat[g * 2 * STRIDE * 128:][:total]
        parts = [k.reshape(-1)[i * STRIDE * 128:i * STRIDE * 128 + l]
                 for i, l in enumerate(lens) if i // 2 == g]
        np.testing.assert_array_equal(got, np.sort(np.concatenate(parts)))
        assert nl[g] == total


def test_multiway_merge_payload_pairing(rng):
    """Key-payload pairing must survive the merge (lex order on ties)."""
    lens = [8192, 8192]
    nruns = len(lens)
    rows = nruns * STRIDE + TILE_ROWS + 8
    k = np.full((rows * 128,), 2**31 - 1, np.int32)
    p = np.zeros_like(k)
    for i, l in enumerate(lens):
        kk = np.sort(rng.integers(0, 50, l).astype(np.int32))  # many dups
        pp = rng.permutation(l).astype(np.int32)
        order = np.lexsort((pp, kk))
        k[i * STRIDE * 128:i * STRIDE * 128 + l] = kk[order]
        p[i * STRIDE * 128:i * STRIDE * 128 + l] = pp[order]
    ok, op, _ = mw.multiway_merge(jnp.asarray(k.reshape(rows, 128)),
                                  jnp.asarray(p.reshape(rows, 128)),
                                  lens, STRIDE, 2, TILE_ROWS)
    total = sum(lens)
    gk = np.asarray(ok).reshape(-1)[:total]
    gp = np.asarray(op).reshape(-1)[:total]
    allk = np.concatenate([k[i * STRIDE * 128:i * STRIDE * 128 + l]
                           for i, l in enumerate(lens)])
    allp = np.concatenate([p[i * STRIDE * 128:i * STRIDE * 128 + l]
                           for i, l in enumerate(lens)])
    order = np.lexsort((allp, allk))
    np.testing.assert_array_equal(gk, allk[order])
    np.testing.assert_array_equal(gp, allp[order])


@pytest.mark.parametrize("n,fanin", [(100_000, 4), (300_000, 16), (40_000, 8)])
def test_multiway_sort(rng, n, fanin):
    k = rng.integers(-(2**30), 2**30, n).astype(np.int32)
    p = np.arange(n, dtype=np.int32)
    ks, ps = mw.multiway_sort(jnp.asarray(k), jnp.asarray(p), n, fanin=fanin)
    order = np.lexsort((p, k))
    np.testing.assert_array_equal(np.asarray(ks), k[order])
    np.testing.assert_array_equal(np.asarray(ps), p[order])
