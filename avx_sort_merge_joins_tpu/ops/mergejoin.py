"""Merge-join over sorted relations — the TPU analog of the reference's
scalar merge_join (reference: src/joins/joincommon.c:239-312), whose
semantics are: matches = sum over keys k of cntR(k) * cntS(k), with
duplicate-aware nested advancement.

A two-pointer scan is hostile to TPU, and gathers/searchsorted are slow, so
we count via a **rank-reduction identity** over tag-merges:

  Let M  = merge of R and S keys where ties order R before S,
      M' = merge where ties order S before R.
  For an R element with R-rank r at merged position m (in M) and m' (in M'):
      m  = r + |{s in S : key_s <  key_r}|   (R-first ties)
      m' = r + |{s in S : key_s <= key_r}|   (R-last ties)
  so its match count cntS(key_r) = m' - m, and summing over R elements:

      matches = sum_{p} p * [M'[p] from R]  -  sum_{p} p * [M[p] from R]

  — two merges of (key, source-flag) pairs plus position-weighted mask
  reductions.  No gathers, no scatters, no data-dependent scans; the merges
  reuse the streaming bitonic merge kernel.

Position sums overflow int32, so the reduction returns per-tile
(count, local position sum) pairs that are combined in int64 off-device
(or in an exact float path for in-jit use when |R|+|S| < 2^24 tiles).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import sort as sort_ops
from .bitonic import KEY_NEG_INF, KEY_POS_INF, LANES


def _tag_merge(rk, sk_desc, nR: int, nS: int, tile_rows: int, r_flag: int, s_flag: int):
    """Merge R keys (ascending) with S keys (descending layout) where the
    source flag rides in the payload slot and breaks ties.  Returns merged
    (keys, flags) as a flat 2D array of ceil((nR+nS)/T)*T elements."""
    rows_r = sort_ops.cdiv(nR, LANES)
    rows_s = sort_ops.cdiv(nS, LANES)
    stride = max(rows_r, rows_s) + tile_rows  # region stride in rows, +spare
    cap_rows = 2 * stride + tile_rows + 8
    cap = cap_rows * LANES
    kf = jnp.full((cap,), KEY_POS_INF, jnp.int32)
    pf = jnp.zeros((cap,), jnp.int32)
    kf = kf.at[:nR].set(rk[:nR])
    pf = pf.at[:nR].set(jnp.int32(r_flag))
    s0 = stride * LANES
    kf = kf.at[s0 : s0 + nS].set(sk_desc[:nS])
    pf = pf.at[s0 : s0 + nS].set(jnp.int32(s_flag))
    ok, of, _ = sort_ops.merge_pass(
        kf.reshape(cap_rows, LANES), pf.reshape(cap_rows, LANES),
        [nR, nS], stride, tile_rows
    )
    return ok, of


def _position_stats(flags2d, total: int, r_flag_value: int, tile_rows: int):
    """Per-tile (count of R-flag positions, sum of local positions) over the
    first ceil(total/T)*T merged elements."""
    T = tile_rows * LANES
    n_tiles = sort_ops.cdiv(total, T)
    f = flags2d.reshape(-1)[: n_tiles * T].reshape(n_tiles, T)
    local = jnp.arange(T, dtype=jnp.int32)[None, :]
    glob_ok = (jnp.arange(n_tiles, dtype=jnp.int32)[:, None] * T + local) < total
    mask = (f == r_flag_value) & glob_ok
    counts = jnp.sum(mask.astype(jnp.int32), axis=1)
    sums = jnp.sum(jnp.where(mask, local, 0), axis=1)
    return counts, sums


def _combine_host(counts, sums, tile_rows: int) -> int:
    T = tile_rows * LANES
    c = np.asarray(counts, dtype=np.int64)
    s = np.asarray(sums, dtype=np.int64)
    t = np.arange(c.shape[0], dtype=np.int64)
    return int(np.sum(s + c * t * T))


def merge_join_count(
    rk_sorted,
    sk_sorted_desc,
    nR: int,
    nS: int,
    tile_rows: int = sort_ops.TILE_ROWS_DEFAULT,
):
    """Count equi-join matches between R (keys ascending) and S (keys in
    descending layout, as produced by sort(..., descending=True)).

    Returns per-tile device stats (countsA, sumsA, countsB, sumsB); combine
    with :func:`finish_count` (host, exact int64).
    """
    total = nR + nS
    # M: R before S on ties  -> flag order (R=0, S=1)
    mk, mf = _tag_merge(rk_sorted, sk_sorted_desc, nR, nS, tile_rows, 0, 1)
    ca, sa = _position_stats(mf, total, 0, tile_rows)
    # M': S before R on ties -> flag order (S=0, R=1)
    mk2, mf2 = _tag_merge(rk_sorted, sk_sorted_desc, nR, nS, tile_rows, 1, 0)
    cb, sb = _position_stats(mf2, total, 1, tile_rows)
    return ca, sa, cb, sb


def finish_count(stats, tile_rows: int = sort_ops.TILE_ROWS_DEFAULT) -> int:
    ca, sa, cb, sb = stats
    return _combine_host(cb, sb, tile_rows) - _combine_host(ca, sa, tile_rows)


def _tag_merge_mw(rk, sk, nR: int, nS: int, tile_rows: int, r_flag: int,
                  s_flag: int):
    """Tag-merge via the 2-way FIFO-tree kernel: both inputs ascending
    (as produced by multiway_sort), flags ride in the payload slot and
    break ties."""
    from . import multiwaymerge as mw

    rows_r = sort_ops.cdiv(nR, LANES)
    rows_s = sort_ops.cdiv(nS, LANES)
    stride = ((max(rows_r, rows_s) + tile_rows) // tile_rows + 1) * tile_rows
    cap_rows = 2 * stride + tile_rows + 8
    cap = cap_rows * LANES
    kf = jnp.full((cap,), KEY_POS_INF, jnp.int32)
    pf = jnp.zeros((cap,), jnp.int32)
    kf = kf.at[:nR].set(rk[:nR])
    pf = pf.at[:nR].set(jnp.int32(r_flag))
    s0 = stride * LANES
    kf = kf.at[s0:s0 + nS].set(sk[:nS])
    pf = pf.at[s0:s0 + nS].set(jnp.int32(s_flag))
    ok, of, _ = mw.multiway_merge(
        kf.reshape(cap_rows, LANES), pf.reshape(cap_rows, LANES),
        [nR, nS], stride, 2, tile_rows)
    return ok, of


def merge_join_count_asc(rk_sorted, sk_sorted, nR: int, nS: int,
                         tile_rows: int = sort_ops.TILE_ROWS_DEFAULT):
    """As :func:`merge_join_count` but with BOTH inputs ascending (the m-way
    path, where runs come out of multiway_sort).  Same rank-reduction
    identity; combine with :func:`finish_count`."""
    total = nR + nS
    mk, mf = _tag_merge_mw(rk_sorted, sk_sorted, nR, nS, tile_rows, 0, 1)
    ca, sa = _position_stats(mf, total, 0, tile_rows)
    mk2, mf2 = _tag_merge_mw(rk_sorted, sk_sorted, nR, nS, tile_rows, 1, 0)
    cb, sb = _position_stats(mf2, total, 1, tile_rows)
    return ca, sa, cb, sb


def merge_join_count_xla(rk_sorted, sk_sorted, nR: int, nS: int) -> jnp.ndarray:
    """Oracle counter via one XLA sort of tagged keys + cumsum (exact for
    matches < 2^31).  Used in tests and as the 'scalar merge join'."""
    keys = jnp.concatenate([rk_sorted[:nR], sk_sorted[:nS]])
    flags = jnp.concatenate(
        [jnp.zeros(nR, jnp.int32), jnp.ones(nS, jnp.int32)]
    )
    mk, mf = jax.lax.sort((keys, flags), num_keys=2)
    # For each position, rank among same-flag prefix:
    s_prefix = jnp.cumsum(mf)  # number of S elements at positions <= p
    pos = jnp.arange(nR + nS, dtype=jnp.int32)
    # R elements (flag 0) sit before S on equal keys; for each R element,
    # # of S with key < k = s_prefix at its position.  For ss_right we flip
    # the flag polarity.
    lt_counts = jnp.sum(jnp.where(mf == 0, s_prefix, 0))
    mk2, mf2 = jax.lax.sort((keys, 1 - flags), num_keys=2)
    r_mask = mf2 == 1
    s_prefix2 = jnp.cumsum(1 - mf2)
    le_counts = jnp.sum(jnp.where(r_mask, s_prefix2, 0))
    return le_counts - lt_counts


def merge_join_count_numpy(rkeys: np.ndarray, skeys: np.ndarray) -> int:
    """NumPy reference oracle: sum_k cntR(k)*cntS(k)."""
    rk, rc = np.unique(rkeys, return_counts=True)
    sk, sc = np.unique(skeys, return_counts=True)
    inter, ri, si = np.intersect1d(rk, sk, assume_unique=True, return_indices=True)
    return int(np.sum(rc[ri].astype(np.int64) * sc[si].astype(np.int64)))
