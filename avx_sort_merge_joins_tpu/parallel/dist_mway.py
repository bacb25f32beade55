"""Distributed m-way join: sort-first exchange of sorted runs.

The faithful multi-chip realization of the reference's m-way phases
(reference: src/joins/sortmergejoin_multiway.c): each thread sorts its
local partitions, then every thread gathers one partition's sorted runs
from ALL threads (the cross-NUMA remote reads of threadrelchunks,
:504-518) and multi-way-merges them through the cache-resident FIFO tree.
On TPU:

  phase 1+2  — per-chip keys-only Pallas multiway_sort of the local shard
               (partition+sort of the reference collapse: the sorted run
               IS range-partitionable by slicing),
  exchange   — every chip's contribution to chip d is one CONTIGUOUS slice
               of its sorted run (range splitters from pmin/pmax), so the
               exchange is dynamic-slice → pad → all_to_all over ICI — no
               scatter anywhere,
  phase 3    — per-chip k-way FIFO-tree merge of the n_chips received
               sorted runs (one pass — the avx_multiway_merge analog),
  phase 4    — fused zero-write merge-join count; global count = host sum
               of per-chip counts (disjoint key ranges).

Skew note: equal-range splitters assume roughly uniform keys (the
reference's radix partition makes the same assumption); the padded bucket
capacity carries a slack factor and overflow is detected, never silent.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import mergejoin, multiwaymerge as mw, sort as sort_ops
from ..ops.bitonic import KEY_POS_INF, LANES
from ..types import NumaStrategy
from .exchange import valid_counts as exchange_valid_counts
from .mesh import AXIS, chips_per_host_of, make_mesh, shuffle_order


def _mesh_platform(mesh):
    """Platform of the mesh's devices (may differ from the default
    backend, e.g. a CPU dryrun mesh under a TPU default)."""
    return np.asarray(mesh.devices).flat[0].platform


def _local_sorted_2d(keys, n_cap: int, block_rows: int, tile_rows: int,
                     fanin: int, use_pallas: bool):
    """Sort a local shard (padded with +inf) ascending; returns the padded
    (rows,128) layout."""
    if use_pallas:
        k2, _ = mw.multiway_sort(keys, None, n_cap, block_rows, tile_rows,
                                 fanin, return_2d=True)
        return k2
    ks = jax.lax.sort((keys[:n_cap],), num_keys=1)[0]
    rows = sort_ops.padded_rows(n_cap, block_rows, tile_rows)
    kf = jnp.full((rows * LANES,), KEY_POS_INF, jnp.int32)
    kf = kf.at[:n_cap].set(ks)
    return kf.reshape(rows, LANES)


def _slice_buckets(k2, n_valid, bounds, n_chips: int, cap: int):
    """Cut a sorted padded column into per-destination contiguous buckets.

    bucket d = keys in [bounds[d], bounds[d+1]) — a contiguous slice of the
    sorted run located with vectorized rank counts (no gathers/scatters).
    Returns ((n_chips*cap,) padded keys, (n_chips,) counts, overflow).
    """
    flat = k2.reshape(-1)
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    valid = idx < n_valid
    kv = jnp.where(valid, flat, KEY_POS_INF)
    # tail padding so dynamic_slice never clamps (start <= n_valid <= size)
    kv = jnp.concatenate([kv, jnp.full((cap,), KEY_POS_INF, jnp.int32)])

    # rank of each splitter = #keys < bound  (O(n_chips) masked reductions)
    starts = [jnp.int32(0)]
    for d in range(1, n_chips):
        starts.append(jnp.sum((kv < bounds[d]).astype(jnp.int32)))
    starts.append(n_valid.astype(jnp.int32))

    bk = jnp.full((n_chips, cap), KEY_POS_INF, jnp.int32)
    counts = []
    overflow = jnp.int32(0)
    for d in range(n_chips):
        ln = starts[d + 1] - starts[d]
        overflow = overflow + jnp.maximum(ln - cap, 0)
        sl = jax.lax.dynamic_slice(kv, (starts[d],), (cap,))
        lane = jnp.arange(cap, dtype=jnp.int32)
        sl = jnp.where(lane < ln, sl, KEY_POS_INF)
        bk = bk.at[d].set(sl)
        counts.append(jnp.minimum(ln, cap))
    return bk.reshape(-1), jnp.stack(counts), overflow


def _merge_received(rk_flat, counts, n_chips: int, cap: int,
                    tile_rows: int, fanin: int, use_pallas: bool):
    """K-way merge the received sorted runs into one padded sorted column.
    Returns (merged2d, total)."""
    total = jnp.sum(counts)
    if not use_pallas:
        ks = jax.lax.sort((rk_flat,), num_keys=1)[0]
        rows = rk_flat.shape[0] // LANES
        pad_rows = tile_rows + 8
        k2 = jnp.concatenate(
            [ks.reshape(rows, LANES),
             jnp.full((pad_rows, LANES), KEY_POS_INF, jnp.int32)], axis=0)
        return k2, total
    stride = cap // LANES
    assert cap % (tile_rows * LANES) == 0, "bucket cap must be whole tiles"
    rows = n_chips * stride
    pad_rows = tile_rows + 8
    # pad run count to a power of two with empty runs
    nruns = n_chips if n_chips & (n_chips - 1) == 0 else \
        1 << (n_chips - 1).bit_length()
    extra = nruns - n_chips
    k2 = jnp.concatenate(
        [rk_flat.reshape(rows, LANES),
         jnp.full((extra * stride + pad_rows, LANES), KEY_POS_INF,
                  jnp.int32)], axis=0)
    lens = jnp.concatenate([counts.astype(jnp.int32),
                            jnp.zeros(extra, jnp.int32)])
    while nruns > 1:
        w = min(max(2, fanin), nruns)
        k2, _, lens = mw.multiway_merge(k2, None, lens, stride, w, tile_rows)
        stride *= w
        nruns //= w
    return k2, total


def _equidepth_bounds(r2, s2, nvr, nvs, n_chips: int):
    """Skew-aware equi-depth splitters: each chip contributes local
    quantiles of its sorted runs; the pooled, sorted samples yield
    balanced bounds even under Zipf skew — the TPU answer to the
    reference's uniform radix-bit assumption (heavy single keys still
    land whole on one chip; the slack factor + overflow check guard)."""
    nq = 16  # quantiles per relation per chip
    rflat = r2.reshape(-1)
    sflat = s2.reshape(-1)
    qs = []
    for j in range(nq):
        pos_r = jnp.minimum((nvr * j) // nq, jnp.maximum(nvr - 1, 0))
        pos_s = jnp.minimum((nvs * j) // nq, jnp.maximum(nvs - 1, 0))
        qs.append(jax.lax.dynamic_slice(rflat, (pos_r,), (1,)))
        qs.append(jax.lax.dynamic_slice(sflat, (pos_s,), (1,)))
    samples = jax.lax.all_gather(jnp.concatenate(qs), AXIS).reshape(-1)
    samples = jax.lax.sort((samples,), num_keys=1)[0]
    ns = samples.shape[0]
    bounds = [jnp.int32(-(2**31) + 1)]
    for d in range(1, n_chips):
        bounds.append(samples[(ns * d) // n_chips])
    return bounds


def _exchange(bflat, n_chips: int, cap: int, schedule):
    """Deliver bucket d of every chip to chip d.

    ``schedule=None`` uses one fused all_to_all; otherwise it is a host
    list of rotation offsets (from :func:`..parallel.mesh.shuffle_order` —
    the NEXT/RING/RANDOM orders of numa_shuffle.c:55-85) realized as
    collective_permute rounds, which XLA's scheduler can overlap with
    surrounding compute (the ICI analog of the reference overlapping
    remote reads with merging).
    """
    if schedule is None:
        return jax.lax.all_to_all(bflat, AXIS, 0, 0, tiled=True)
    b2 = bflat.reshape(n_chips, cap)
    me = jax.lax.axis_index(AXIS)
    out = jnp.zeros_like(b2)
    naxis = n_chips
    for off in schedule:
        off = int(off)
        if off == 0:
            # own bucket stays local
            piece = jnp.take(b2, me % n_chips, axis=0,
                             indices_are_sorted=False)
            src = me
        else:
            # chip x sends bucket[(x+off) mod n] to chip (x+off) mod n
            perm = [(x, (x + off) % naxis) for x in range(naxis)]
            dest = (me + off) % n_chips
            piece = jnp.take(b2, dest, axis=0)
            piece = jax.lax.ppermute(piece, AXIS, perm)
            src = (me - off) % n_chips
        out = jax.lax.dynamic_update_slice(out, piece[None, :],
                                           (src, jnp.int32(0)))
    return out.reshape(-1)


def dist_mway_join_count(rkeys, skeys, n_r: int, n_s: int,
                         mesh: Optional[Mesh] = None, slack: float = 2.0,
                         block_rows: int = 256, tile_rows: int = 128,
                         fanin: int = 16,
                         use_pallas: Optional[bool] = None,
                         numa_strategy: Optional[str] = None,
                         pre_sharded: bool = False):
    """Distributed m-way equi-join match count over a 1-D chip mesh.

    Returns (count, overflow) host ints; overflow must be 0 (raise slack).
    ``use_pallas=None`` auto-selects: Pallas kernels on TPU, XLA baseline
    elsewhere (the CPU-mesh dryrun path).

    ``pre_sharded``: rkeys/skeys are already (n_chips, shard) device
    arrays laid out with this mesh's sharding (the workload-A scale tier,
    parallel.scale — 1.6B-tuple relations never exist on the host or on
    any single chip); sizes must then divide evenly by n_chips.
    """
    mesh = mesh or make_mesh()
    if use_pallas is None:
        use_pallas = _mesh_platform(mesh) == "tpu"
    # pallas kernels interpret off-TPU regardless of pipeline choice
    interp = _mesh_platform(mesh) != "tpu"
    n_chips = int(np.prod(list(mesh.shape.values())))
    schedule = None
    if numa_strategy is not None and numa_strategy != NumaStrategy.NEXT:
        # RING strides by the mesh's real host granularity (the reference
        # derives threads-per-region from libnuma, numa_shuffle.c:80)
        schedule = shuffle_order(numa_strategy, n_chips,
                                 chips_per_host_of(mesh)).tolist()
    elif numa_strategy == NumaStrategy.NEXT:
        schedule = list(range(n_chips))
    shard_r = -(-n_r // n_chips)
    shard_s = -(-n_s // n_chips)
    tile_elems = tile_rows * LANES

    def cap_of(shard):
        want = int(shard / n_chips * slack)
        return max(tile_elems, -(-want // tile_elems) * tile_elems)

    cap_r = cap_of(shard_r)
    cap_s = cap_of(shard_s)

    nv_r = exchange_valid_counts(n_r, shard_r, n_chips)
    nv_s = exchange_valid_counts(n_s, shard_s, n_chips)
    sharded = NamedSharding(mesh, P(AXIS))
    if pre_sharded:
        assert rkeys.shape == (n_chips, shard_r), rkeys.shape
        assert skeys.shape == (n_chips, shard_s), skeys.shape
        rk_dev, sk_dev = rkeys, skeys
    else:
        def pad_to(x, total):
            x = jnp.asarray(x, jnp.int32)
            out = jnp.full((total,), KEY_POS_INF, jnp.int32)
            return out.at[: x.shape[0]].set(x)

        rk = pad_to(rkeys[:n_r], shard_r * n_chips)
        sk = pad_to(skeys[:n_s], shard_s * n_chips)
        rk_dev = jax.device_put(rk.reshape(n_chips, shard_r), sharded)
        sk_dev = jax.device_put(sk.reshape(n_chips, shard_s), sharded)

    def shard_fn(rk, sk, nvr, nvs):
        rk, sk = rk[0], sk[0]
        nvr, nvs = nvr[0], nvs[0]
        # phase 1+2: local sort (pads sort to the +inf end)
        r2 = _local_sorted_2d(rk, rk.shape[0], block_rows, tile_rows, fanin,
                              use_pallas)
        s2 = _local_sorted_2d(sk, sk.shape[0], block_rows, tile_rows, fanin,
                              use_pallas)
        bounds = _equidepth_bounds(r2, s2, nvr, nvs, n_chips)
        # exchange of contiguous sorted slices
        brk, rc, ovr = _slice_buckets(r2, nvr, bounds, n_chips, cap_r)
        bsk, sc, ovs = _slice_buckets(s2, nvs, bounds, n_chips, cap_s)
        grk = _exchange(brk, n_chips, cap_r, schedule)
        gsk = _exchange(bsk, n_chips, cap_s, schedule)
        grc = jax.lax.all_to_all(rc, AXIS, 0, 0, tiled=True)
        gsc = jax.lax.all_to_all(sc, AXIS, 0, 0, tiled=True)
        # phase 3: k-way merge of received runs
        mr2, tr = _merge_received(grk, grc, n_chips, cap_r, tile_rows,
                                  fanin, use_pallas)
        ms2, ts = _merge_received(gsk, gsc, n_chips, cap_s, tile_rows,
                                  fanin, use_pallas)
        # phase 4: fused count over the owned key range (limbs recombined
        # host-side in int64)
        stats = mergejoin.merge_join_count_fused(
            mr2, ms2, tr, ts, tile_rows, interpret=interp)
        return stats.reshape(1, 3), (ovr + ovs).reshape(1)

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS),) * 4,
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    ))  # noqa: E501  (jax.shard_map, jax>=0.8)
    with sort_ops.force_interpret(interp):
        stats, overflow = fn(
            rk_dev, sk_dev,
            jax.device_put(jnp.asarray(nv_r), sharded),
            jax.device_put(jnp.asarray(nv_s), sharded),
        )
    stats = np.asarray(stats, dtype=np.int64)
    if int(stats[:, 2].sum()):
        raise mergejoin.CountLimbOverflow(
            "per-segment cntR*cntS >= 2^29 on some chip of the "
            "distributed m-way count")
    count = int(((stats[:, 0] << 30) + stats[:, 1]).sum())
    ov = int(np.asarray(overflow).sum())
    if ov > 0 and slack < 16.0:
        # extreme skew overflowed a bucket: retry with doubled capacity
        # (the reference's fixed RELATION_PADDING has no such safety net)
        return dist_mway_join_count(rkeys, skeys, n_r, n_s, mesh, slack * 2,
                  block_rows, tile_rows, fanin, use_pallas, numa_strategy,
                  pre_sharded)
    return count, ov


def dist_mway_join_phased(rkeys, skeys, n_r: int, n_s: int,
                          mesh: Optional[Mesh] = None, slack: float = 2.0,
                          block_rows: int = 256, tile_rows: int = 128,
                          fanin: int = 16,
                          use_pallas: Optional[bool] = None,
                          numa_strategy: Optional[str] = None):
    """Distributed m-way count with PER-PHASE timing: three separately
    dispatched shard_map programs (local sort | exchange + k-way merge |
    fused count) with a device sync between each, so multi-chip runs
    report the reference's SORT / MERGE1 / MJOIN record columns
    (joincommon.c:175-196) instead of one opaque total.

    Returns ``(count, overflow, phases)`` where phases maps
    sort/merge1/mergejoin/total to seconds.  The fused single-dispatch
    path (:func:`dist_mway_join_count`) stays the throughput surface —
    the phase syncs cost two extra dispatch round-trips.
    """
    import time as _time

    mesh = mesh or make_mesh()
    if use_pallas is None:
        use_pallas = _mesh_platform(mesh) == "tpu"
    interp = _mesh_platform(mesh) != "tpu"
    n_chips = int(np.prod(list(mesh.shape.values())))
    schedule = None
    if numa_strategy is not None and numa_strategy != NumaStrategy.NEXT:
        schedule = shuffle_order(numa_strategy, n_chips,
                                 chips_per_host_of(mesh)).tolist()
    shard_r = -(-n_r // n_chips)
    shard_s = -(-n_s // n_chips)
    tile_elems = tile_rows * LANES

    def cap_of(shard):
        want = int(shard / n_chips * slack)
        return max(tile_elems, -(-want // tile_elems) * tile_elems)

    cap_r, cap_s = cap_of(shard_r), cap_of(shard_s)
    nv_r = exchange_valid_counts(n_r, shard_r, n_chips)
    nv_s = exchange_valid_counts(n_s, shard_s, n_chips)
    sharded = NamedSharding(mesh, P(AXIS))

    def pad_to(x, total):
        x = jnp.asarray(x, jnp.int32)
        out = jnp.full((total,), KEY_POS_INF, jnp.int32)
        return out.at[: x.shape[0]].set(x)

    rk_dev = jax.device_put(
        pad_to(rkeys[:n_r], shard_r * n_chips).reshape(n_chips, shard_r),
        sharded)
    sk_dev = jax.device_put(
        pad_to(skeys[:n_s], shard_s * n_chips).reshape(n_chips, shard_s),
        sharded)
    nvr_dev = jax.device_put(jnp.asarray(nv_r), sharded)
    nvs_dev = jax.device_put(jnp.asarray(nv_s), sharded)

    def sort_fn(rk, sk):
        rk, sk = rk[0], sk[0]
        r2 = _local_sorted_2d(rk, rk.shape[0], block_rows, tile_rows, fanin,
                              use_pallas)
        s2 = _local_sorted_2d(sk, sk.shape[0], block_rows, tile_rows, fanin,
                              use_pallas)
        return r2[None], s2[None]

    def exmerge_fn(r2, s2, nvr, nvs):
        r2, s2 = r2[0], s2[0]
        nvr, nvs = nvr[0], nvs[0]
        bounds = _equidepth_bounds(r2, s2, nvr, nvs, n_chips)
        brk, rc, ovr = _slice_buckets(r2, nvr, bounds, n_chips, cap_r)
        bsk, sc, ovs = _slice_buckets(s2, nvs, bounds, n_chips, cap_s)
        grk = _exchange(brk, n_chips, cap_r, schedule)
        gsk = _exchange(bsk, n_chips, cap_s, schedule)
        grc = jax.lax.all_to_all(rc, AXIS, 0, 0, tiled=True)
        gsc = jax.lax.all_to_all(sc, AXIS, 0, 0, tiled=True)
        mr2, tr = _merge_received(grk, grc, n_chips, cap_r, tile_rows,
                                  fanin, use_pallas)
        ms2, ts = _merge_received(gsk, gsc, n_chips, cap_s, tile_rows,
                                  fanin, use_pallas)
        return (mr2[None], ms2[None], tr.reshape(1), ts.reshape(1),
                (ovr + ovs).reshape(1))

    def count_fn(mr2, ms2, tr, ts):
        stats = mergejoin.merge_join_count_fused(
            mr2[0], ms2[0], tr[0], ts[0], tile_rows, interpret=interp)
        return stats.reshape(1, 3)

    def smap(f, n_in, n_out):
        return jax.jit(shard_map(
            f, mesh=mesh, in_specs=(P(AXIS),) * n_in,
            out_specs=tuple([P(AXIS)] * n_out) if n_out > 1 else P(AXIS),
            check_vma=False))

    def sync(x):
        for leaf in jax.tree_util.tree_leaves(x):
            float(jnp.sum(leaf.reshape(-1)[:1]))

    phases = {}
    with sort_ops.force_interpret(interp):
        t0 = _time.perf_counter()
        r2, s2 = smap(sort_fn, 2, 2)(rk_dev, sk_dev)
        sync((r2, s2))
        phases["sort"] = _time.perf_counter() - t0
        t1 = _time.perf_counter()
        mr2, ms2, tr, ts, ov = smap(exmerge_fn, 4, 5)(r2, s2, nvr_dev,
                                                      nvs_dev)
        sync((mr2, ms2))
        phases["merge1"] = _time.perf_counter() - t1
        t2 = _time.perf_counter()
        stats = smap(count_fn, 4, 1)(mr2, ms2, tr, ts)
        sync(stats)
        phases["mergejoin"] = _time.perf_counter() - t2
    phases["total"] = phases["sort"] + phases["merge1"] + phases["mergejoin"]
    stats = np.asarray(stats, dtype=np.int64)
    if int(stats[:, 2].sum()):
        raise mergejoin.CountLimbOverflow(
            "per-segment cntR*cntS >= 2^29 on some chip of the "
            "distributed m-way count")
    count = int(((stats[:, 0] << 30) + stats[:, 1]).sum())
    ov = int(np.asarray(ov).sum())
    if ov > 0 and slack < 16.0:
        return dist_mway_join_phased(rkeys, skeys, n_r, n_s, mesh, slack * 2,
                                     block_rows, tile_rows, fanin,
                                     use_pallas, numa_strategy)
    return count, ov, phases
