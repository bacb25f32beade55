"""Radix partitioning — histogram, offsets, and padded partition layout.

The TPU redesign of the reference's partitioning operator
(reference: src/partition/partition.c): hash ``HASH_BIT_MODULO(K, MASK,
NBITS) = ((K-1) & MASK) >> NBITS`` (partition.c:29 — note the K-1 bias),
two-scan histogram+scatter (`radix_cluster`, :93-149), software-managed
cache-line buffers with streaming stores (`radix_cluster_optimized`,
:152-219), and cache-line-aligned partition starts
(`partition_relation_optimized`'s ALIGN_NUMTUPLES padding, :329-354).

TPU design notes.  Random scatter is architecturally wrong on a TPU (no
per-lane stores; HBM wants contiguous 512-byte bursts), so the scatter step
is re-expressed as a **stable grouping sort on the partition id** — the
XLA variadic sort places whole tuples contiguously per partition in one
fused pass, which is the closest TPU analog of the reference's
software-managed buffer flushes (both stage tuples until a contiguous burst
can be written).  The histogram is a real Pallas kernel: per-tile counts via
lane-rotation one-hot reduction, fanout chunked by the 128-lane width.
The m-way/m-pass joins themselves never materialize partitions on TPU —
block sort + multiway merge subsumes the partition phase — so this module
serves (a) `bench_partitioning` parity, (b) skew statistics for mpsm,
(c) the distributed exchange's bucket histogram.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sort as sort_ops
from .bitonic import LANES

HIST_TILE_ROWS = 512  # 64K tuples per histogram grid step


def hash_bit_modulo(keys, mask: int, nbits: int):
    """((K-1) & MASK) >> NBITS — reference partition.c:29."""
    return jax.lax.shift_right_logical(
        (keys - 1) & jnp.int32(mask), jnp.int32(nbits)
    )


def partition_ids(keys, nradixbits: int, bitshift: int = 0):
    """Partition id of each key for fanout 2**nradixbits starting at bit
    ``bitshift`` (the joins compute bitshift from the key range so the radix
    bits sit just below the top, sortmergejoin_multiway.c:372-376)."""
    fanout = 1 << nradixbits
    mask = (fanout - 1) << bitshift
    return hash_bit_modulo(keys, mask, bitshift)


# --------------------------------------------------------------------------
# Pallas histogram kernel
# --------------------------------------------------------------------------

def _hist_kernel(pid_ref, out_ref, *, fanout: int):
    """Per-tile histogram of partition ids in [0, fanout).

    Counts are produced lane-parallel: chunk c covers pids
    [c*128, (c+1)*128); for each lane rotation s, ``roll(pid, s) == lane``
    marks elements whose pid lands on this lane, so summing over rotations
    and rows yields the in-chunk histogram with no scatter — the VPU analog
    of the reference's scalar count loop (partition.c:105-110).
    """
    pid = pid_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, pid.shape, 1)
    nchunks = (fanout + LANES - 1) // LANES
    for c in range(nchunks):
        base = c * LANES
        acc = jnp.zeros((1, LANES), jnp.int32)
        rel = pid - base
        for s in range(LANES):
            rot = pltpu.roll(rel, s, 1) if jax.default_backend() == "tpu" \
                else jnp.roll(rel, s, 1)
            acc = acc + jnp.sum((rot == lane).astype(jnp.int32), axis=0,
                                keepdims=True)
        # the minor-most output block must be 8 sublanes tall — broadcast
        # the counts row (callers read every 8th row)
        out_ref[:, pl.ds(base, LANES)] = jnp.broadcast_to(acc, (8, LANES))


def radix_hist(keys2d, nradixbits: int, bitshift: int = 0):
    """Histogram over partition ids: returns (ntiles, fanout) per-tile counts
    (sum along axis 0 for the global histogram — kept per-tile so callers can
    derive per-chunk scatter offsets, the 2D layout of partition.c:99-117)."""
    fanout = 1 << nradixbits
    rows = keys2d.shape[0]
    tile = min(HIST_TILE_ROWS, rows)
    assert rows % tile == 0
    ntiles = rows // tile
    pid = partition_ids(keys2d, nradixbits, bitshift)
    fpad = max(fanout, LANES)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, fanout=fanout),
        out_shape=jax.ShapeDtypeStruct((ntiles * 8, fpad), jnp.int32),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, fpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=sort_ops._interpret(),
        compiler_params=pltpu.CompilerParams(
            # the unrolled rotation loop keeps several tile temporaries live
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(pid)
    return out[::8, :fanout]


def radix_hist_xla(keys, nradixbits: int, bitshift: int = 0):
    """One-pass XLA histogram (scatter-add) — correctness baseline."""
    pid = partition_ids(keys, nradixbits, bitshift)
    return jnp.zeros((1 << nradixbits,), jnp.int32).at[pid].add(1)


def radix_hist_mxu(keys, nradixbits: int, bitshift: int = 0):
    """High-fanout histogram on the MXU: the rank-2 one-hot matmul
    (ops.mxu_permute.onehot_hist).  The lane-rotation Pallas kernel
    unrolls fanout/128 x 128 rolls and falls off a compile cliff past
    2^7; the matmul form covers the reference's full bits 2..16 grid
    (scripts/partitioning-bench.sh) in one code path.  Exact (see
    mxu_permute docstring).  Returns the (fanout,) global histogram."""
    from . import mxu_permute

    pid = partition_ids(keys, nradixbits, bitshift)
    return mxu_permute.onehot_hist(pid, 1 << nradixbits)


def radix_hist_any(keys2d, nradixbits: int, bitshift: int = 0):
    """Global histogram at any fanout: the roll-based Pallas kernel below
    2^8 (measured best there), the MXU one-hot form above."""
    if nradixbits <= 7:
        return jnp.sum(radix_hist(keys2d, nradixbits, bitshift), axis=0)
    return radix_hist_mxu(keys2d, nradixbits, bitshift)


# --------------------------------------------------------------------------
# full partition
# --------------------------------------------------------------------------

def partition_relation(keys, payloads, nradixbits: int, bitshift: int = 0,
                       align: int = LANES):
    """Partition a column pair into fanout contiguous, padded partitions.

    Returns ``(pkeys, ppayloads, offsets, sizes)``: partition p occupies
    ``pkeys[offsets[p] : offsets[p] + sizes[p]]``; starts are aligned to
    ``align`` tuples with junk between partitions, mirroring the reference's
    cache-line-aligned layout (partition.c:329-354).  Grouping runs as one
    stable XLA sort on the partition id (see module docstring).

    Capacity note: offsets are data-dependent, so the padded output size is
    the worst case n + fanout*align (static shape under jit).

    PERFORMANCE GUARD: this full-partition surface is XLA-scatter-backed,
    and one random-access scatter pass costs ~998 ms at 128M on v5e (PLAN
    round-2 feasibility study) — 4x a full multiway sort.  It exists for
    the partitioning BENCH surface (partition.c parity; the bench labels
    it scatter-bound) and small inputs only; no join pipeline calls it
    (the m-way block decomposition replaces physical partitioning at zero
    HBM cost, models/mway.py).  The assert keeps future callers honest.
    """
    fanout = 1 << nradixbits
    n = keys.shape[0]
    assert n <= 64_000_000, (
        "partition_relation is XLA-scatter-backed (~128 Melem/s on v5e) "
        "and must not be routed into large join pipelines; see PLAN "
        "round-2 radix feasibility study")
    pid = partition_ids(keys, nradixbits, bitshift)
    idx = jnp.arange(n, dtype=jnp.int32)
    spid, _, ks, ps = jax.lax.sort((pid, idx, keys, payloads), num_keys=2)
    sizes = jnp.zeros((fanout,), jnp.int32).at[spid].add(1)
    padded = ((sizes + align - 1) // align) * align
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(sizes)[:-1].astype(jnp.int32)])
    target = offsets[spid] + (idx - start[spid])
    cap = n + fanout * align
    pk = jnp.zeros((cap,), keys.dtype).at[target].set(ks, mode="drop")
    pp = jnp.zeros((cap,), payloads.dtype).at[target].set(ps, mode="drop")
    return pk, pp, offsets, sizes


def radix_cluster_numpy(keys: np.ndarray, payloads: np.ndarray,
                        nradixbits: int, bitshift: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NumPy oracle of the naive radix_cluster (partition.c:93-149):
    contiguous unpadded partitions in id order, stable within partitions.
    Returns (keys, payloads, sizes)."""
    fanout = 1 << nradixbits
    mask = (fanout - 1) << bitshift
    pid = (((keys.astype(np.int64) - 1) & mask) >> bitshift).astype(np.int64)
    order = np.argsort(pid, kind="stable")
    sizes = np.bincount(pid, minlength=fanout).astype(np.int32)
    return keys[order], payloads[order], sizes
