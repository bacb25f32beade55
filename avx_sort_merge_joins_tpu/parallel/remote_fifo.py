"""Remote-DMA FIFO-leaf merge scaffold — the cross-chip analog of the
reference's readmerge phase, which READS remote NUMA memory THROUGH the
multiway merge instead of bulk-copying it first (reference:
src/merge/avx_multiwaymerge.c:605-728 readmerge_parallel_decomposed;
src/joins/sortmergejoin_multiway.c:494-518 gathers runs from all threads
in shuffle order).

TPU has no remote *reads*: `pltpu.make_async_remote_copy` is a PUSH (the
source device sends to a destination buffer + semaphore pair).  The
remote-pull therefore inverts into a chunked producer/consumer pipeline:

  * every chip PUSHES its bucket-for-d to chip d in fixed-size chunks,
    walking destinations in the shuffle-schedule order;
  * chip d's k-way merge kernel treats each source's landing strip as a
    leaf whose windows become readable chunk-by-chunk: before a leaf
    window crosses into chunk j, the kernel waits the (src, j) receive
    semaphore — by then earlier chunks have long arrived, so the waits
    are free in steady state and the ICI transfer hides entirely behind
    the merge (the literal readmerge overlap).

STATUS: dark behind ``SMJ_REMOTE_DMA=1``.  This host only exposes ONE
physical TPU chip through the axon tunnel, and Pallas interpret mode has
no remote-DMA emulation, so the kernel pair below compiles nowhere we
can run it.  Everything that does NOT need the DMA primitive — the chunk
schedule, the landing-strip layout, the leaf wait points — is factored
into pure functions and unit-tested (tests/test_remote_fifo.py).

TEST PLAN (when >1 chip exists):
  1. 2-chip smoke: push_buckets on both chips with chunk_elems = cap (one
     chunk per run); assert landing strips equal the all_to_all layout
     (`exchange._exchange` oracle) — validates addressing + semaphores.
  2. chunk granularity sweep: chunk_elems in {T, 2T, 4T}; same equality.
  3. merge overlap: replace dist_mway's bulk exchange with
     push + remote_leaf_merge on a 4-chip slice; assert exact counts on
     the uniform/ragged/zipf workloads of tests/test_dist.py.
  4. perf: time bulk-exchange-then-merge vs push+merge at 128M/chip; the
     push variant must hide >= 80% of the measured all_to_all time.
  5. failure injection: undersized landing strip must trip the overflow
     check (never a silent wrap), mirroring the bucket-overflow tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


def remote_dma_enabled() -> bool:
    """The dark-launch flag: the chunked remote-push pipeline is only
    reachable when explicitly requested AND more than one real TPU chip
    is attached (neither holds on the single-chip axon bench host)."""
    return os.environ.get("SMJ_REMOTE_DMA", "0") == "1"


@dataclass(frozen=True)
class ChunkPush:
    """One scheduled push: chunk ``chunk`` of my bucket for ``dst``."""
    round: int
    dst: int
    chunk: int
    start: int    # element offset within my bucket for dst
    size: int     # elements in this chunk (last chunk may be short)


def push_schedule(n_chips: int, me: int, bucket_lens, chunk_elems: int,
                  order=None) -> List[ChunkPush]:
    """The source side's deterministic push order.

    Walks destinations in ``order`` (a shuffle_order offset list; default
    NEXT) chunk-major: round r pushes chunk r of every bucket that still
    has data — so every destination's EARLIEST chunks arrive first and
    its merge can start after round 0 (the backpressure-free analog of
    readmerge's half-full refill rule, avx_multiwaymerge.c:234-242).
    Pure host logic — unit-tested without any device.
    """
    if order is None:
        order = list(range(n_chips))
    plan: List[ChunkPush] = []
    nchunks = [max(0, -(-int(bucket_lens[d]) // chunk_elems))
               for d in range(n_chips)]
    max_chunks = max(nchunks) if nchunks else 0
    for r in range(max_chunks):
        for off in order:
            d = (me + off) % n_chips
            if r < nchunks[d]:
                start = r * chunk_elems
                size = min(chunk_elems, int(bucket_lens[d]) - start)
                plan.append(ChunkPush(r, d, r, start, size))
    return plan


def landing_layout(n_chips: int, cap: int, chunk_elems: int
                   ) -> Tuple[int, int]:
    """(strip_elems, chunks_per_strip) of the receiver's landing buffer:
    source s's strip occupies [s*strip_elems, (s+1)*strip_elems), chunk j
    at strip offset j*chunk_elems — identical to the bulk exchange's
    received-run layout so the merge kernel's leaf indexing is unchanged."""
    assert cap % chunk_elems == 0, "cap must be whole chunks"
    return cap, cap // chunk_elems


def leaf_wait_chunk(consumed_elem: int, window_elems: int,
                    chunk_elems: int) -> int:
    """Index of the last chunk a leaf window read touches: the merge
    kernel must have waited receive semaphores [0 .. this] for that
    source before loading.  Pure; property-tested against window spans."""
    return (consumed_elem + window_elems - 1) // chunk_elems


def expected_sem_waits(total_windows: int, window_elems: int,
                      chunk_elems: int) -> List[int]:
    """For a leaf consuming ``total_windows`` windows sequentially, the
    chunk index each window load must wait for — the monotone wait
    sequence the kernel's fori carries (one SMEM scalar per leaf)."""
    return [leaf_wait_chunk(w * window_elems, window_elems, chunk_elems)
            for w in range(total_windows)]


def _remote_push_pallas(bucket_hbm, counts_smem, dst_landing_hbm,
                        send_sem, recv_sems, me: int, n_chips: int,
                        cap: int, chunk_elems: int):
    """DARK: the source-side push loop as Pallas TPU code.

    For each scheduled (dst, chunk): one
    ``pltpu.make_async_remote_copy(src.at[chunk], landing.at[me, chunk],
    send_sem, recv_sems.at[me], device_id=dst)`` — the receiver's merge
    waits ``recv_sems[src]`` per chunk.  Compiles only on multi-chip
    topologies; excluded from single-chip/interpret builds (see module
    docstring TEST PLAN).
    """
    import jax.numpy as jnp  # noqa: F401  (kept local: dark path)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = push_schedule(n_chips, me,
                         [cap] * n_chips,  # static worst case; short
                         chunk_elems)      # chunks clamp via counts_smem
    for p in plan:
        row0 = (p.dst * cap + p.start) // 128
        rows = -(-p.size // 128)
        copy = pltpu.make_async_remote_copy(
            bucket_hbm.at[pl.ds(row0, rows), :],
            dst_landing_hbm.at[pl.ds((me * cap + p.start) // 128, rows), :],
            send_sem, recv_sems.at[me],
            device_id=p.dst, device_id_type=pltpu.DeviceIdType.LOGICAL)
        copy.start()
    # the caller's epilogue waits send_sem to drain before kernel exit
    return len(plan)
