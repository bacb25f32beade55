"""Distributed materializing join ON THE ENGINE: Pallas payload-carrying
sort, equi-depth splitters, k-way merge, and streaming persist.

The reference's threads materialize the matching S tuple per match pair
inside the same engine that counts (reference: src/joins/joincommon.c:266-289
under JOIN_MATERIALIZE).  This path mirrors the distributed m-way count
pipeline tuple-for-tuple, with payloads riding along:

  phase 1+2  — per-chip Pallas ``multiway_sort(keys, payloads)`` of the
               local (key, payload) shard (dist_mway._local_sorted_pair_2d),
  splitters  — the SAME pooled-quantile equi-depth splitters as the count
               path (dist_mway._equidepth_bounds), so Zipf-skewed
               workloads balance without overflow retries,
  exchange   — contiguous sorted-slice range exchange of key AND payload
               buckets (all_to_all over ICI; hierarchical two-stage form
               on 2-D ('host','chip') meshes),
  phase 3    — per-chip k-way FIFO-tree merge of the received (key,
               payload) runs (dist_mway._merge_received_pair),
  phase 4    — per-chip <S-key, S-payload> materialization with physical
               dup-R expansion (ops.materialize),
  persist    — optional STREAMING append: each chip's bounded output
               chunk flushes through csrc/tblio.cc ``tbl_append`` before
               the next chip's is fetched, so the full join output never
               exists in host memory (the reference writes whole buffers,
               generator.c:200-213; at 128M-row outputs over the ~12 MB/s
               axon host link a host-assembled copy is unusable).

Chips own disjoint key ranges, so per-chip outputs concatenate to the
exact multiset of reference output tuples.
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding

from ..ops import materialize as mat, sort as sort_ops
from ..ops.bitonic import KEY_POS_INF, LANES
from ..utils import cache
from . import exchange as ex
from .dist_mway import (_equidepth_bounds, _local_sorted_2d,
                        _local_sorted_pair_2d, _merge_received,
                        _merge_received_pair, _mesh_platform,
                        _slice_buckets, _slice_buckets_pair)
from .mesh import (AXIS, HOST_AXIS, flat_axes, flat_spec, host_shape,
                   is_2d, make_mesh)

# retries taken by the most recent dist_join_materialize call (0 = the
# equi-depth splitters balanced the workload on the first attempt — the
# observable for the no-overflow-retry acceptance test)
LAST_RETRIES = 0


@functools.lru_cache(maxsize=2)
def _materialize_fn(mesh: Mesh, n_chips: int, cap_r: int, cap_s: int,
                    cap_out: int, block_rows: int, tile_rows: int,
                    fanin: int, use_pallas: bool, hier, interp: bool,
                    env: tuple = ()):
    """Cached jitted shard_map pipeline for dist_join_materialize
    (rebuilding it per call re-traced the whole distributed program on
    every invocation)."""
    from jax import shard_map

    axes = flat_axes(mesh)
    spec = flat_spec(mesh)

    def exch(bflat, cap):
        if hier is not None:
            H, C = hier
            return ex.exchange_hier(bflat, cap, H, C, HOST_AXIS, AXIS)
        return jax.lax.all_to_all(bflat, AXIS, 0, 0, tiled=True)

    def shard_fn(rk, sk, sp, nvr, nvs):
        rk, sk, sp = rk[0], sk[0], sp[0]
        nvr, nvs = nvr[0], nvs[0]
        # phase 1+2: per-chip Pallas sorts — R keys-only (the output is
        # <S-key, S-payload>; R payloads never travel, halving R traffic),
        # S as a (key, payload) pair sort
        r2 = _local_sorted_2d(rk, rk.shape[0], block_rows, tile_rows,
                              fanin, use_pallas)
        s2, sp2 = _local_sorted_pair_2d(sk, sp, sk.shape[0], block_rows,
                                        tile_rows, fanin, use_pallas)
        # skew-aware equi-depth splitters (same as the count path)
        bounds = _equidepth_bounds(r2, s2, nvr, nvs, n_chips, axes)
        brk, rc, ovr = _slice_buckets(r2, nvr, bounds, n_chips, cap_r)
        bsk, bsp, sc, ovs = _slice_buckets_pair(s2, sp2, nvs, bounds,
                                                n_chips, cap_s)
        grk = exch(brk, cap_r)
        gsk, gsp = exch(bsk, cap_s), exch(bsp, cap_s)
        grc = exch(rc, 1)
        gsc = exch(sc, 1)
        # phase 3: k-way merge of received runs (R keys-only, S pairs)
        mr2, tr = _merge_received(grk, grc, n_chips, cap_r,
                                  tile_rows, fanin, use_pallas)
        ms2, msp2, ts = _merge_received_pair(gsk, gsp, gsc, n_chips, cap_s,
                                             tile_rows, fanin, use_pallas)
        # sentinel repair: the k-way merge writes only ceil(total/T) output
        # tiles, so slots past the live prefix hold leftover garbage — the
        # R column must be +inf there (searchsorted needs a fully sorted
        # array) and the S column must take the S pad sentinel (so junk
        # can never match R's +inf pads)
        rks = mr2.reshape(-1)
        sks = ms2.reshape(-1)
        sps = msp2.reshape(-1)
        ridx = jnp.arange(rks.shape[0], dtype=jnp.int32)
        rks = jnp.where(ridx < tr, rks, KEY_POS_INF)
        sidx = jnp.arange(sks.shape[0], dtype=jnp.int32)
        sks = jnp.where(sidx < ts, sks, ex.S_PAD_KEY)
        # phase 4: materialize matched S tuples + physical dup-R expansion
        ok, op, om, nm = mat.materialize_matches(rks, rks.shape[0],
                                                 sks, sps, sks.shape[0])
        ek, ep, total = mat.expand_matches(ok, op, om, nm, cap_out)
        out_ov = jnp.maximum(total - cap_out, 0)
        return (ek.reshape(1, -1), ep.reshape(1, -1),
                total.reshape(1), (ovr + ovs + out_ov).reshape(1))


    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec,) * 5,
        out_specs=(spec,) * 4,
        check_vma=False,  # pallas_call outputs carry no vma annotations
    ))


def dist_join_materialize(rkeys, rpayloads, skeys, spayloads,
                          n_r: int, n_s: int,
                          mesh: Optional[Mesh] = None, slack: float = 2.0,
                          out_slack: float = 2.0,
                          block_rows: int = 256, tile_rows: int = 128,
                          fanin: int = 16,
                          use_pallas: Optional[bool] = None,
                          stream_to: Optional[str] = None,
                          _retries: int = 0):
    """Materialized distributed equi-join over a chip mesh.

    Returns ``(out_keys, out_payloads, count, overflow)``: host numpy
    columns of all matched <S-key, S-payload> tuples (one row per match
    pair, physical dup-R expansion), the match count, and the
    exchange/output overflow (0 when slack sufficed; auto-retried with
    doubled slack otherwise).

    ``stream_to``: path of an Out.tbl to STREAM per-chip chunks into
    (appended in chip order); the returned columns are then None and host
    memory stays bounded by one chip's padded output.
    """
    global LAST_RETRIES
    if fanin < 2 or fanin & (fanin - 1):
        raise ValueError(
            f"fanin must be a power of two >= 2, got {fanin} (the k-way "
            "merge kernel's group math requires it)")
    mesh = mesh or make_mesh()
    if use_pallas is None:
        use_pallas = _mesh_platform(mesh) == "tpu"
    interp = _mesh_platform(mesh) != "tpu"
    n_chips = int(np.prod(list(mesh.shape.values())))
    hier = host_shape(mesh) if is_2d(mesh) else None
    spec = flat_spec(mesh)
    shard_r = -(-n_r // n_chips)
    shard_s = -(-n_s // n_chips)
    tile_elems = tile_rows * LANES

    cap_r = ex.bucket_cap(shard_r, n_chips, slack, tile_elems)
    cap_s = ex.bucket_cap(shard_s, n_chips, slack, tile_elems)
    # static per-chip output capacity: received-S capacity × expansion slack
    cap_out = max(128, int(np.ceil(n_chips * cap_s * out_slack / 128)) * 128)

    # R payloads are NEVER shipped: the output is <S-key, S-payload>
    # rows, so only R keys participate — at 128M rows over the ~12 MB/s
    # axon host link the dead 512 MB transfer cost tens of seconds/call
    rk = ex.pad_column(rkeys[:n_r], shard_r * n_chips, KEY_POS_INF)
    sk = ex.pad_column(skeys[:n_s], shard_s * n_chips, KEY_POS_INF)
    sp = ex.pad_column(spayloads[:n_s], shard_s * n_chips, KEY_POS_INF)
    nv_r = ex.valid_counts(n_r, shard_r, n_chips)
    nv_s = ex.valid_counts(n_s, shard_s, n_chips)

    sharded = NamedSharding(mesh, spec)
    fn = _materialize_fn(mesh, n_chips, cap_r, cap_s, cap_out, block_rows,
                         tile_rows, fanin, use_pallas, hier, interp,
                         cache.prefetch_env_key())
    with sort_ops.force_interpret(interp):
        ek, ep, totals, overflow = fn(
            jax.device_put(rk.reshape(n_chips, shard_r), sharded),
            jax.device_put(sk.reshape(n_chips, shard_s), sharded),
            jax.device_put(sp.reshape(n_chips, shard_s), sharded),
            jax.device_put(jnp.asarray(nv_r), sharded),
            jax.device_put(jnp.asarray(nv_s), sharded),
        )
    ov = int(np.asarray(overflow).sum())
    if ov > 0 and slack < 16.0:
        return dist_join_materialize(rkeys, rpayloads, skeys, spayloads,
                                     n_r, n_s, mesh, slack * 2,
                                     out_slack * 2, block_rows, tile_rows,
                                     fanin, use_pallas, stream_to,
                                     _retries + 1)
    LAST_RETRIES = _retries
    totals = np.asarray(totals)
    if stream_to is not None:
        # streaming persist: fetch + flush ONE chip's chunk at a time —
        # host memory stays O(cap_out), not O(total output)
        from ..datagen import append_rows

        open(stream_to, "w").close()  # truncate
        for c in range(n_chips):
            t = int(totals[c])
            if t == 0:
                continue
            append_rows(stream_to, np.asarray(ek[c])[:t],
                        np.asarray(ep[c])[:t])
        return None, None, int(totals.sum()), ov
    ek = np.asarray(ek)
    ep = np.asarray(ep)
    ks = np.concatenate([ek[c, : totals[c]] for c in range(n_chips)])
    ps = np.concatenate([ep[c, : totals[c]] for c in range(n_chips)])
    return ks, ps, int(totals.sum()), ov
