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

STATUS (round 4): the receiver side EXISTS and is EXECUTABLE TODAY via
arrival emulation.  The chunk-gated FIFO-tree merge
(:func:`chunk_gated_merge`, kernel: ops/multiwaymerge._mwaymerge_kernel
``gate="emulated"``) gates each leaf's availability on a per-(source,
chunk)
arrival-round schedule — the merge consumes exactly the delivered
prefixes, backpressures on undelivered chunks, records the per-leaf
chunk-wait counters the real kernel would issue, and raises a violation
flag if the gating arithmetic would ever read past a delivered prefix.
``dist_mway.dist_mway_join_count(..., remote_pull="emulate")`` runs the
whole distributed m-way join through it on the CPU mesh (tests/
test_remote_fifo.py + test_dist.py cover uniform/ragged/zipf workloads
and adversarial schedules).

The REAL push+pull pair (``gate="remote"`` + :func:`_remote_pull_kernel`)
stays dark behind ``SMJ_REMOTE_DMA=1``: this host exposes ONE physical
TPU chip through the axon tunnel, so multi-chip remote DMA cannot
execute here.  Its wait arithmetic is the SAME code path the emulated
kernel exercises (``_leaf_gate``), so the untested surface is reduced to
the DMA descriptors themselves.

TEST PLAN (when >1 chip exists):
  1. 2-chip smoke: _remote_pull_kernel with chunk_elems = cap (one chunk
     per run); assert landing strips equal the all_to_all layout
     (`exchange._exchange` oracle) — validates addressing + semaphores.
  2. chunk granularity sweep: chunk_elems in {T, 2T, 4T}; same equality.
  3. merge overlap: dist_mway remote_pull="dma" on a 4-chip slice; exact
     counts on the uniform/ragged/zipf workloads of tests/test_dist.py
     (the emulated twin of this test already passes).
  4. perf: time bulk-exchange-then-merge vs push+merge at 128M/chip; the
     push variant must hide >= 80% of the measured all_to_all time.
  5. failure injection: undersized landing strip must trip the overflow
     check (never a silent wrap), mirroring the bucket-overflow tests.
  6. descriptor-queue pressure: workload-A shape (8 chips x 25+ chunks
     per strip = 200+ pushes/chip) with window sweep
     SMJ_REMOTE_WINDOW in {4, 8, 32, total}; every setting must stay
     exact and the device must never report descriptor exhaustion — the
     K-outstanding send window (see `_remote_pull_kernel` phase A) is
     the bounded-refill analog of the reference's half-full rule
     (avx_multiwaymerge.c:234-242), and ICI drains sends ~50x faster
     than the VPU merges (ROOFLINE.md), so small windows should cost
     ~nothing; record the measured knee.
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


def arrival_schedule(n_src: int, chunks_per_strip: int, rate: int = 1,
                     order=None) -> np.ndarray:
    """(n_src, chunks_per_strip) arrival-round table for the EMULATED
    receiver: chunk j of source s arrives at merge round
    ``j * n_src * rate + pos(s) * rate`` — the receiver-side view of
    :func:`push_schedule`'s chunk-major walk (all chunk-0 pushes land
    before any chunk-1 push; within a round sources land in ``order``).
    ``rate`` scales how many merge rounds one push round spans (rate 0 =
    everything pre-delivered, i.e. the bulk exchange).  Rows are
    non-decreasing, as :func:`chunk_gated_merge` requires."""
    if order is None:
        order = list(range(n_src))
    assert sorted(order) == list(range(n_src)), \
        "order must be a permutation of range(n_src)"
    pos = {s: i for i, s in enumerate(order)}
    out = np.zeros((n_src, chunks_per_strip), dtype=np.int32)
    for s in range(n_src):
        for j in range(chunks_per_strip):
            out[s, j] = (j * n_src + pos[s]) * rate
    return out


def pick_chunk_elems(cap: int, tile_elems: int, n_src: int,
                     max_entries: int = 512) -> int:
    """Largest-granularity chunk size (whole tiles, dividing ``cap``) that
    keeps the (n_src, chunks_per_strip) schedule within the SMEM budget.
    Small caps get one-tile chunks; huge caps coarsen."""
    assert cap % tile_elems == 0
    tiles = cap // tile_elems
    max_chunks = max(1, min(tiles, max_entries // n_src))
    per = -(-tiles // max_chunks)
    while tiles % per:
        per += 1
    return per * tile_elems


def chunk_gated_merge(keys2d, lens, stride_rows: int, chunk_elems: int,
                      arrive_rounds, tile_rows: int = 128,
                      interpret: bool | None = None):
    """Receiver-side k-way merge of W landing strips whose data arrives
    chunk-by-chunk — the EXECUTABLE (arrival-emulated) form of the
    remote-pull merge (reference: avx_multiwaymerge.c:605-728 readmerge
    reads remote NUMA runs THROUGH the merge;
    sortmergejoin_multiway.c:504-518 gathers runs in shuffle order).

    ``keys2d``      — (W*stride_rows + spare, 128) landing buffer: source
                      s's strip at rows [s*stride_rows, ...), ascending,
                      ``lens[s]`` valid elements (the bulk-exchange
                      layout — landing_layout above).
    ``arrive_rounds`` — (W, max_chunks) int32: merge round at which chunk
                      j of source s becomes readable (rows non-decreasing;
                      :func:`arrival_schedule` builds the push-schedule-
                      shaped one).  All-zeros = bulk-delivered.
    Returns ``(merged2d, waited, violation)``: the merged ascending
    column (run 0 of the layout), the per-leaf chunk-wait counters the
    real kernel would have issued (compare against
    :func:`expected_sem_waits` / ceil(len/chunk)), and the gating-
    violation flag (nonzero = the merge would have read past a delivered
    prefix — must be 0).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops import multiwaymerge as mw, sort as sort_ops
    from ..ops.bitonic import LANES

    if interpret is None:
        interpret = sort_ops._interpret()
    arrive = np.asarray(arrive_rounds, dtype=np.int32)
    W, max_chunks = arrive.shape
    assert W >= 2 and (W & (W - 1)) == 0, "pad sources to a power of two"
    assert W * max_chunks <= 512, "SMEM schedule budget (uniform mode " \
        "does not apply: arrival tables are inherently per-chunk)"
    assert np.all(np.diff(arrive, axis=1) >= 0), \
        "arrival rounds must be non-decreasing per source"
    assert stride_rows % tile_rows == 0
    assert chunk_elems % LANES == 0
    assert (stride_rows * LANES) % chunk_elems == 0, \
        "strips must hold whole chunks (landing_layout)"
    assert (stride_rows * LANES) // chunk_elems <= max_chunks
    lens_arr = jnp.asarray(lens, jnp.int32)
    assert lens_arr.shape[0] == W
    nnodes = W - 1
    kshape = jax.ShapeDtypeStruct(keys2d.shape, keys2d.dtype)
    win = pltpu.VMEM((tile_rows + 8, LANES), jnp.int32)
    fifo = pltpu.VMEM((nnodes, (mw.FIFO_TILES + 1) * tile_rows, LANES),
                      jnp.int32)
    stage = pltpu.VMEM((tile_rows, LANES), jnp.int32)
    merged, wstats = pl.pallas_call(
        functools.partial(
            mw._mwaymerge_kernel, fanin=W, stride_rows=stride_rows,
            tile_rows=tile_rows, keys_only=True, uniform=False,
            gate="emulated", chunk_elems=chunk_elems,
            max_chunks=max_chunks),
        out_shape=(kshape, jax.ShapeDtypeStruct((1, W + 1), jnp.int32)),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[fifo, win, win, stage,
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )(lens_arr, jnp.asarray(arrive, jnp.int32), keys2d)
    return merged, wstats[0, :W], wstats[0, W]


def push_window() -> int:
    """In-flight bound on outstanding push descriptors per chip (the
    SMJ_REMOTE_WINDOW knob).  Unbounded issue exhausts the DMA descriptor
    queue at workload-A scale (8 chips x 25+ chunks/strip = 200+
    outstanding remote copies); the reference's own refill rule is
    bounded (avx_multiwaymerge.c:234-242).  32 in-flight chunks keep one
    full push round (8 chips) plus deep lookahead active while ICI —
    ~50x faster than the VPU-bound merge — drains the tail."""
    return max(1, int(os.environ.get("SMJ_REMOTE_WINDOW", "32")))


def _remote_pull_kernel(meta_ref, lens_ref, bucket_hbm, landing_hbm,
                        merged_hbm, wout, fk, wk, wk2, rk_s, insem, outsem,
                        send_sem, recv_sems, *, n_chips: int, cap: int,
                        chunk_elems: int, tile_rows: int,
                        window: int | None = None):
    """DARK (SMJ_REMOTE_DMA): the real push+pull pair as ONE Pallas kernel
    per chip — phase A pushes my buckets to every destination chunk-major
    (the :func:`push_schedule` walk) under a K-outstanding sliding window
    (descriptor i waits the send of descriptor i-K before issuing, so at
    most K remote copies are ever in flight — the bounded-refill analog
    of the reference's half-full rule, avx_multiwaymerge.c:234-242, and
    the fix for descriptor-queue exhaustion at workload-A scale); phase B
    runs the chunk-gated FIFO-tree merge over my landing strips with
    ``gate="remote"`` (leaf waits block on the (src, chunk) receive
    descriptors — the SAME ``_leaf_gate`` arithmetic the emulated tests
    pin); phase C drains the last min(K, total) send waits.  All pushes
    are FULL chunks (slack junk is masked by the receiver's avail
    counts), so every descriptor's byte count is static and identical —
    which is also what makes the windowed wait sound: waiting with a
    RECONSTRUCTED descriptor for slot i-K unblocks on any completed send
    of the same byte count, and sends complete in issue order on a
    single queue.

    Overlap note: phase A now paces at ICI drain rate instead of
    returning immediately, but ICI moves these bytes ~50x faster than
    the VPU-bound merge consumes them (ROOFLINE.md), so the serialized
    prefix costs ~2% — measured properly in TEST PLAN step 6.

    ``meta_ref[0]`` = my device index (host-side axis_index — Pallas has
    no collective-axis view); ``lens_ref`` = my RECEIVED counts (the
    small count all_to_all runs before this kernel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import jax.numpy as jnp

    from ..ops import multiwaymerge as mw
    from ..ops.bitonic import LANES

    me = meta_ref[0]
    strip_rows = cap // LANES
    chunk_rows = chunk_elems // LANES
    chunks_per_strip = cap // chunk_elems
    total = chunks_per_strip * n_chips
    K = min(window if window is not None else push_window(), total)

    def _push_descr(i):
        # descriptor i = chunk j to the off-th destination of the NEXT
        # walk: my bucket-for-dst chunk j → dst's landing strip for me
        j, off = divmod(i, n_chips)
        dst = jnp.remainder(me + off, n_chips)
        src_row = dst * strip_rows + j * chunk_rows
        dst_row = me * strip_rows + j * chunk_rows
        return pltpu.make_async_remote_copy(
            bucket_hbm.at[pl.ds(src_row, chunk_rows), :],
            landing_hbm.at[pl.ds(dst_row, chunk_rows), :],
            send_sem, recv_sems.at[me],
            device_id=dst, device_id_type=pltpu.DeviceIdType.LOGICAL)

    # phase A: chunk-major push walk (round r sends chunk r to every
    # destination in NEXT order, so earliest chunks of every strip land
    # first and the merge's warmup leaves unblock after one round),
    # K-outstanding: issue i only after send i-K completed
    for i in range(total):
        if i >= K:
            _push_descr(i - K).wait_send()
        _push_descr(i).start()

    # phase B: the chunk-gated tree merge over the landing strips
    mw._mwaymerge_kernel(
        lens_ref, landing_hbm, merged_hbm, wout, fk, wk, wk2, rk_s,
        insem, outsem, recv_sems,
        fanin=n_chips, stride_rows=strip_rows, tile_rows=tile_rows,
        keys_only=True, uniform=False, gate="remote",
        chunk_elems=chunk_elems, max_chunks=chunks_per_strip)

    # phase C: drain the still-outstanding tail of the send window
    for i in range(max(0, total - K), total):
        _push_descr(i).wait_send()


def remote_pull_exchange_merge(bucket_flat, recv_counts, me, n_chips: int,
                               cap: int, chunk_elems: int,
                               tile_rows: int = 128):
    """DARK (SMJ_REMOTE_DMA): shard_map-local entry for the real
    push+pull.  ``bucket_flat`` is my (n_chips*cap,) padded bucket column
    (the `_slice_buckets` layout), ``recv_counts`` my (n_chips,) received
    counts (exchange them with a small all_to_all first), ``me`` the
    axis index.  Returns (merged2d, waited, violation-placeholder).
    Compiles only on real multi-chip TPU topologies — see the module
    docstring STATUS."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops import multiwaymerge as mw
    from ..ops.bitonic import LANES

    assert n_chips >= 2 and (n_chips & (n_chips - 1)) == 0
    assert cap % chunk_elems == 0 and chunk_elems % LANES == 0
    strip_rows = cap // LANES
    assert strip_rows % tile_rows == 0
    pad_rows = tile_rows + 8
    rows = n_chips * strip_rows + pad_rows
    nnodes = n_chips - 1
    win = pltpu.VMEM((tile_rows + 8, LANES), jnp.int32)
    fifo = pltpu.VMEM((nnodes, (mw.FIFO_TILES + 1) * tile_rows, LANES),
                      jnp.int32)
    stage = pltpu.VMEM((tile_rows, LANES), jnp.int32)
    b2 = bucket_flat.reshape(n_chips * strip_rows, LANES)
    b2 = jnp.concatenate(
        [b2, jnp.full((pad_rows, LANES), 2**31 - 1, jnp.int32)], axis=0)
    landing, merged, wstats = pl.pallas_call(
        functools.partial(
            _remote_pull_kernel, n_chips=n_chips, cap=cap,
            chunk_elems=chunk_elems, tile_rows=tile_rows),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_chips + 1), jnp.int32)),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[fifo, win, win, stage,
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((n_chips,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(me, jnp.int32).reshape(1),
      jnp.asarray(recv_counts, jnp.int32), b2)
    del landing
    return merged, wstats[0, :n_chips], wstats[0, n_chips]
