"""K-way merge of sorted runs through a VMEM-resident FIFO tree.

The TPU redesign of the reference's cache-resident multi-way merge tree
(reference: src/merge/avx_multiwaymerge.c — ring-buffer FIFO nodes carved
out of a shared L3 buffer, heap-layout tree, half-full backpressure,
merge16 bitonic kernels).  One Pallas program merges W sorted HBM runs into
one output run while reading every element from HBM exactly once and
writing it exactly once — this is what makes merging bandwidth-optimal vs
log2(W) pairwise passes.

Design mapping:

* tree          — heap layout: internal nodes 0..W-2, leaves are the W
                  input runs (node m's children are 2m+1, 2m+2; child index
                  >= W-1 denotes input run child-(W-1)), mirroring the
                  reference's node numbering (avx_multiwaymerge.c:285-287).
* FIFO          — per internal node, a VMEM ring of C=2 output tiles plus a
                  mirrored first tile so windows never wrap (the analog of
                  the reference's modulo-free ring decomposition,
                  avx_multiwaymerge.c:17-23,340-341).
* merge kernel  — per fire, select the T smallest of the two children's
                  T-element head windows with one elementwise min/max over
                  A and lane/row-reversed B (a bitonic first stage), then a
                  log2(T)-stage bitonic merge — the merge16kernel analog
                  (avx_multiwaymerge.c:342-471).
* backpressure  — a node fires when it has one tile of space and each child
                  has a full window or is exhausted
                  (avx_multiwaymerge.c:292-295's half-full rule).
* schedule      — bottom-up static node sweep per round inside a fori_loop;
                  after the log2(W)-round warmup the root emits one tile per
                  round, so the trip count is static: rounds =
                  ceil(N/T) + log2(W).

Run lengths are dynamic (SMEM); capacities/strides are static.  Pad slots
carry +inf sentinels and consumption clamping keeps counts exact.

``payloads=None`` selects the keys-only network (count-only join
pipelines): every VMEM/HBM touch halves, which is the dominant cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bitonic
from .bitonic import KEY_POS_INF, LANES
from . import sort as sort_ops

FIFO_TILES = 2  # ring capacity in output tiles (C)


_flip = bitonic.flip_flat


def _select_merge(ak, ap, bk, bp):
    """Merge two ascending T-element windows: returns the sorted lower half
    (k, p) and how many elements were consumed from A (``ap``/``bp`` may be
    None for keys-only).

    concat(A asc, reverse(B) desc) is bitonic; its first compare-exchange
    stage at distance T is the elementwise lex-min of A and reverse(B), and
    the A-side wins ties (le), matching the reference merge kernels' stream
    preference.  A full bitonic merge then sorts the lower half ascending.
    """
    bk_r = _flip(bk)
    if ap is None:
        le = ak <= bk_r
        hp = None
    else:
        bp_r = _flip(bp)
        _, le = bitonic.lex_lt_le(ak, ap, bk_r, bp_r)
        hp = jnp.where(le, ap, bp_r)
    hk = jnp.where(le, ak, bk_r)
    consumed_a = jnp.sum(le.astype(jnp.int32))
    mk, mp = bitonic.bitonic_merge(hk, hp, ascending=True)
    return mk, mp, consumed_a


def _mwaymerge_kernel(
    lens_ref, *refs,
    fanin: int, stride_rows: int, tile_rows: int, keys_only: bool,
    uniform: bool, leaf_prefetch: bool = False,
    gate: str | None = None, chunk_elems: int = 0, max_chunks: int = 0,
):
    arrive_ref = recv_sems = wout = None
    if gate == "emulated":
        # receiver-side chunk-gated merge (remote_fifo): leaf data becomes
        # readable chunk-by-chunk per an arrival-round schedule — a leaf is
        # ready only when its DELIVERED prefix holds a full window (or is
        # complete), so the tree backpressures on arrival exactly like the
        # real remote-push receiver blocks on its recv semaphores
        # (reference: avx_multiwaymerge.c:605-728 readmerge reads remote
        # NUMA runs through the merge).  Extra refs: the (W, max_chunks)
        # SMEM arrival-round table and a (1, W+1) SMEM output recording
        # the per-leaf chunk-wait counters + a gating-violation flag.
        (arrive_ref, k_hbm, ok_hbm, wout, fk, wk, wk2, rk_s, insem,
         outsem) = refs
        p_hbm = op_hbm = fp = wp = wp2 = rp_s = None
        leaf_prefetch = False
    elif gate == "remote":
        # the REAL receiver (dark behind SMJ_REMOTE_DMA): leaves are the
        # landing strips peers push into; before a leaf window's valid
        # span crosses into chunk j the kernel waits the (src, chunk)
        # receive-DMA descriptors [waited .. j].  Availability is
        # optimistic (run_len - consumed) — the blocking waits are the
        # synchronization, as in the reference's remote reads.
        (k_hbm, ok_hbm, wout, fk, wk, wk2, rk_s, insem, outsem,
         recv_sems) = refs
        p_hbm = op_hbm = fp = wp = wp2 = rp_s = None
        leaf_prefetch = False
    elif keys_only and leaf_prefetch:
        (k_hbm, ok_hbm, fk, wk, wk2, rk_s, insem, outsem,
         lb, lsem, lstate) = refs
        p_hbm = op_hbm = fp = wp = wp2 = rp_s = None
    elif keys_only:
        (k_hbm, ok_hbm, fk, wk, wk2, rk_s, insem, outsem) = refs
        p_hbm = op_hbm = fp = wp = wp2 = rp_s = None
    else:
        (k_hbm, p_hbm, ok_hbm, op_hbm, fk, fp,
         wk, wp, wk2, wp2, rk_s, rp_s, insem, outsem) = refs
        leaf_prefetch = False
    W = fanin
    nnodes = W - 1
    T = tile_rows * LANES
    CAP = FIFO_TILES * T
    g = pl.program_id(0)
    run0 = g * W
    WINR = 2 * tile_rows + 8  # leaf prefetch window rows

    if uniform:
        # run lengths follow the sort composition's formula: run r holds
        # clip(total - r*span, 0, span) tuples — no SMEM lens array (which
        # would not scale to thousands of runs)
        total_all = lens_ref[0]
        span = lens_ref[1]

        def run_len(r):
            return jnp.clip(total_all - (run0 + r) * span, 0, span)
    else:
        def run_len(r):
            return lens_ref[run0 + r]

    # leaf span: internal node m covers a contiguous range of runs; compute
    # statically by walking the heap.
    def leaf_span(m):
        span_ = [m]
        runs = []
        while span_:
            c = span_.pop()
            if c >= nnodes:
                runs.append(c - nnodes)
            else:
                span_.append(2 * c + 1)
                span_.append(2 * c + 2)
        return min(runs), max(runs)

    sub_len = []
    for m in range(nnodes):
        lo, hi = leaf_span(m)
        if uniform:
            s = jnp.clip(total_all - (run0 + lo) * span, 0,
                         (hi - lo + 1) * span)
        else:
            s = jnp.int32(0)
            for r in range(lo, hi + 1):
                s = s + lens_ref[run0 + r]
        sub_len.append(s)

    out_base_rows = run0 * stride_rows

    # ----- chunk-arrival gating (the remote-pull receiver) -------------
    if gate is not None:
        assert keys_only and chunk_elems > 0 and max_chunks > 0
        assert chunk_elems % LANES == 0
        chunk_rows = chunk_elems // LANES

    if gate == "emulated":
        def delivered_chunks(r, rnd):
            """Chunks of run r whose (emulated) arrival round has passed.
            The schedule rows must be non-decreasing (wrapper asserts)."""
            d = jnp.int32(0)
            for j in range(max_chunks):
                d = d + (arrive_ref[r, j] <= rnd).astype(jnp.int32)
            return d

    if gate == "remote":
        def _wait_chunk_arrivals(r, frm, to):
            """Block until chunks [frm, to) of source r's landing strip
            have arrived: one receive-descriptor wait per chunk (every
            push is a full chunk_rows x 128 tile set, so the descriptor
            byte counts match the sender's — remote_fifo pushes whole
            chunks and lets the avail masks hide the slack junk)."""
            def _w(j, acc):
                row = r * stride_rows + j * chunk_rows
                pltpu.make_async_remote_copy(
                    k_hbm.at[pl.ds(row, chunk_rows), :],
                    k_hbm.at[pl.ds(row, chunk_rows), :],
                    insem.at[0], recv_sems.at[r],
                    device_id=jnp.int32(0),
                    device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()
                return acc

            jax.lax.fori_loop(frm, to, _w, 0)

    def _leaf_gate(c, consumed, waited, viol, rnd):
        """Gate a leaf child's upcoming window load on chunk arrival.

        Computes the chunk index the window's VALID span reaches
        (``leaf_wait_chunk`` in remote_fifo — the kernel-side twin of the
        pure, unit-tested host function) and either blocks on the receive
        descriptors (real mode) or checks the emulated delivered prefix
        (violation flag — a regression guard on the gating arithmetic).
        Returns updated (waited, viol).  ``c - nnodes`` is static: every
        fire_node instantiation is unrolled per node.
        """
        r = c - nnodes
        ln = run_len(r)
        use = jnp.minimum(ln - consumed[c], jnp.int32(T))
        need1 = jnp.where(use > 0,
                          (consumed[c] + use - 1) // chunk_elems + 1, 0)
        if gate == "remote":
            _wait_chunk_arrivals(r, waited[r], need1)
        else:
            deliv = delivered_chunks(r, rnd)
            viol = viol | jnp.where((use > 0) & (need1 > deliv), 1, 0)
        waited = tuple(jnp.maximum(w, need1) if i == r else w
                       for i, w in enumerate(waited))
        return waited, viol

    # ----- leaf-window prefetch machinery (keys-only fast path) --------
    # Leaf HBM windows are DOUBLE-WIDE (2T+8 rows) and REFILLED by a
    # fori over leaves with dynamic DMA-semaphore indexing at the END of
    # each round, so the next round's leaf reads hit VMEM with the DMA
    # having had a full round of flight (PLAN round-1 prototype measured
    # +6.5%; the fori + SMEM-state formulation keeps the conditional DMA
    # code ONE body instead of W unrolled pl.when blocks — the compile
    # explosion that reverted the prototype).  SMEM state rows:
    # lstate[0,c] = buffered base element, [1,c] = DMA pending flag,
    # [2,c] = mirror of consumed[leaf c] (the refill loop needs dynamic
    # indexing; the authoritative tuple allows only static indices).
    def _leaf_start_dma(c, elem):
        """Start the 2T window DMA for leaf c at the row floor of
        ``elem``; returns the clamped base element."""
        row = elem // LANES
        row = jnp.clip(row, 0, k_hbm.shape[0] - WINR)
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(row, WINR), :], lb.at[c], lsem.at[c]).start()
        return row * LANES

    def _leaf_wait_dma(c):
        row = lstate[0, c] // LANES
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(row, WINR), :], lb.at[c], lsem.at[c]).wait()

    if leaf_prefetch:
        def _init_leaf(c, carry):
            elem = (run0 + c) * (stride_rows * LANES)
            lstate[0, c] = _leaf_start_dma(c, elem)
            lstate[1, c] = jnp.int32(1)
            lstate[2, c] = jnp.int32(0)
            return carry

        jax.lax.fori_loop(0, W, _init_leaf, 0)
        lstate[3, 0] = jnp.int32(0)  # root output slot pending flags
        lstate[3, 1] = jnp.int32(0)

    def child_avail(c, produced, consumed, rnd=None):
        """(available elements, ready?) of child c.  A run child is always
        ready (fully materialized in HBM); a FIFO child is ready when it
        holds a full window or has produced everything it ever will — the
        reference's half-full/done backpressure rule
        (avx_multiwaymerge.c:292-295).  Under emulated chunk gating a run
        child is only as available as its delivered prefix — not-yet-
        arrived leaves backpressure their ancestors exactly like a
        starved FIFO."""
        if c >= nnodes:  # an input run: always fully produced
            ln = run_len(c - nnodes)
            if gate == "emulated":
                deliv = jnp.minimum(
                    delivered_chunks(c - nnodes, rnd) * chunk_elems, ln)
                avail = deliv - consumed[c]
                return avail, (avail >= T) | (deliv >= ln)
            return ln - consumed[c], jnp.bool_(True)
        avail = produced[c] - consumed[c]
        return avail, (avail >= T) | (produced[c] >= sub_len[c])

    def load_child_window(c, consumed, wkbuf, wpbuf):
        """Return (keys, payloads) ascending T-window of child c's head."""
        if c >= nnodes and leaf_prefetch:
            run = c - nnodes  # static
            e = consumed[c]
            elem = (run0 + run) * stride_rows * LANES + e

            @pl.when(lstate[1, run] == 1)
            def _():
                _leaf_wait_dma(run)
                lstate[1, run] = jnp.int32(0)

            off = elem - lstate[0, run]
            rowoff, skip = off // LANES, off % LANES
            # zero-length padding runs sit past the physical array: their
            # clamped base leaves rowoff out of range — clamp; the junk is
            # fully masked by avail == 0 downstream
            rowoff = jnp.clip(rowoff, 0, tile_rows)
            win = lb[run, pl.ds(rowoff, tile_rows + 8), :]
            return bitonic.shift_flat(win, skip)[:tile_rows], None
        if c >= nnodes:
            run = c - nnodes
            e = consumed[c]
            elem = (run0 + run) * stride_rows * LANES + e
            row, skip = elem // LANES, elem % LANES
            # padding runs (len 0) can sit past the physical array — clamp
            # the window start; masked junk never enters the merge
            row = jnp.minimum(row, k_hbm.shape[0] - (tile_rows + 8))
            cp1 = pltpu.make_async_copy(
                k_hbm.at[pl.ds(row, tile_rows + 8), :], wkbuf, insem.at[0])
            cp1.start()
            if not keys_only:
                cp2 = pltpu.make_async_copy(
                    p_hbm.at[pl.ds(row, tile_rows + 8), :], wpbuf,
                    insem.at[1])
                cp2.start()
                cp1.wait(); cp2.wait()
                p = bitonic.shift_flat(wpbuf[:], skip)[:tile_rows]
            else:
                cp1.wait()
                p = None
            k = bitonic.shift_flat(wkbuf[:], skip)[:tile_rows]
        else:
            e = consumed[c]
            pos = jnp.remainder(e, CAP)
            row, skip = pos // LANES, pos % LANES
            kwin = fk[c, pl.ds(row, tile_rows + 1), :]
            k = bitonic.shift_flat(kwin, skip)[:tile_rows]
            if keys_only:
                p = None
            else:
                pwin = fp[c, pl.ds(row, tile_rows + 1), :]
                p = bitonic.shift_flat(pwin, skip)[:tile_rows]
        return k, p

    def mask_invalid(k, p, avail):
        fidx = bitonic.flat_index(k.shape)
        bad = fidx >= avail
        return (jnp.where(bad, KEY_POS_INF, k),
                None if p is None else jnp.where(bad, KEY_POS_INF, p))

    def fire_node(m, produced, consumed, waited, viol, rnd):
        cl, cr = 2 * m + 1, 2 * m + 2
        avail_l, _ = child_avail(cl, produced, consumed, rnd)
        avail_r, _ = child_avail(cr, produced, consumed, rnd)
        if gate is not None and cl >= nnodes:
            waited, viol = _leaf_gate(cl, consumed, waited, viol, rnd)
        if gate is not None and cr >= nnodes:
            waited, viol = _leaf_gate(cr, consumed, waited, viol, rnd)
        ak, ap = load_child_window(cl, consumed, wk, wp)
        bk, bp = load_child_window(cr, consumed, wk2, wp2)
        ak, ap = mask_invalid(ak, ap, avail_l)
        bk, bp = mask_invalid(bk, bp, avail_r)
        mk, mp, cons_a = _select_merge(ak, ap, bk, bp)
        inc_l = jnp.minimum(cons_a, avail_l)
        inc_r = jnp.minimum(T - cons_a, avail_r)
        if m == 0 and leaf_prefetch:
            # root: DOUBLE-BUFFERED output stage — the DMA of fire k is
            # waited at fire k+2 (same slot), so it has a full root
            # period of flight (the round-1 prototype's other half).
            # lstate[3, s] = slot-s DMA pending, [4, s] = its dest row.
            slot = jnp.remainder(produced[0] // T, 2)
            row = pl.multiple_of(slot * tile_rows, tile_rows)

            @pl.when(lstate[3, slot] == 1)
            def _():
                pltpu.make_async_copy(
                    rk_s.at[pl.ds(row, tile_rows), :],
                    ok_hbm.at[pl.ds(lstate[4, slot], tile_rows), :],
                    outsem.at[slot]).wait()

            rk_s[pl.ds(row, tile_rows), :] = mk
            orow = out_base_rows + (produced[0] // LANES)
            pltpu.make_async_copy(
                rk_s.at[pl.ds(row, tile_rows), :],
                ok_hbm.at[pl.ds(orow, tile_rows), :],
                outsem.at[slot]).start()
            lstate[3, slot] = jnp.int32(1)
            lstate[4, slot] = orow
        elif m == 0:
            # root: stage and DMA to the output HBM region
            rk_s[:] = mk
            orow = out_base_rows + (produced[0] // LANES)
            o1 = pltpu.make_async_copy(
                rk_s, ok_hbm.at[pl.ds(orow, tile_rows), :], outsem.at[0])
            o1.start()
            if not keys_only:
                rp_s[:] = mp
                o2 = pltpu.make_async_copy(
                    rp_s, op_hbm.at[pl.ds(orow, tile_rows), :], outsem.at[1])
                o2.start(); o1.wait(); o2.wait()
            else:
                o1.wait()
        else:
            slot = jnp.remainder(produced[m] // T, FIFO_TILES)
            # tile-aligned dynamic start: without the multiple_of hint
            # Mosaic emits full realignment code on this per-fire store
            row = pl.multiple_of(slot * tile_rows, tile_rows)
            fk[m, pl.ds(row, tile_rows), :] = mk
            if not keys_only:
                fp[m, pl.ds(row, tile_rows), :] = mp
            # mirror tile 0 so element-granular windows never wrap

            @pl.when(slot == 0)
            def _():
                fk[m, pl.ds(FIFO_TILES * tile_rows, tile_rows), :] = mk
                if not keys_only:
                    fp[m, pl.ds(FIFO_TILES * tile_rows, tile_rows), :] = mp

        inc_out = jnp.minimum(jnp.int32(T), sub_len[m] - produced[m])
        # state lives as tuples of scalars (SREGs) — all indices are static
        produced = tuple(
            p + inc_out if i == m else p for i, p in enumerate(produced))
        consumed = tuple(
            c + inc_l if i == cl else (c + inc_r if i == cr else c)
            for i, c in enumerate(consumed))
        if leaf_prefetch:
            # mirror leaf consumption into SMEM for the dynamic refill loop
            if cl >= nnodes:
                lstate[2, cl - nnodes] = consumed[cl]
            if cr >= nnodes:
                lstate[2, cr - nnodes] = consumed[cr]
        return produced, consumed, waited, viol

    def round_body(rnd, carry):
        produced, consumed, waited, viol = carry
        for m in range(nnodes - 1, -1, -1):
            cl, cr = 2 * m + 1, 2 * m + 2
            al, rl = child_avail(cl, produced, consumed, rnd)
            ar, rr = child_avail(cr, produced, consumed, rnd)
            ready = rl & rr
            space = (produced[m] - consumed[m]) <= (FIFO_TILES - 1) * T \
                if m != 0 else True
            want = produced[m] < sub_len[m]
            fire = ready & want & space

            def do(c):
                return fire_node(m, c[0], c[1], c[2], c[3], rnd)

            def skip(c):
                return c

            produced, consumed, waited, viol = jax.lax.cond(
                fire, do, skip, (produced, consumed, waited, viol))
        if leaf_prefetch:
            # refill drained leaf windows for the NEXT round: one fori
            # body with dynamic (c-indexed) buffers/semaphores — the DMA
            # gets the whole next round's sweep as flight time
            def _refill(c, carry):
                e = lstate[2, c]
                elem = (run0 + c) * (stride_rows * LANES) + e

                @pl.when((lstate[1, c] == 0)
                         & (elem - lstate[0, c] >= LANES))
                def _():
                    lstate[0, c] = _leaf_start_dma(c, elem)
                    lstate[1, c] = jnp.int32(1)

                return carry

            jax.lax.fori_loop(0, W, _refill, 0)
        return produced, consumed, waited, viol

    logw = max(1, W - 1).bit_length()
    # trip count from the group's actual total (sub_len[0] is an SMEM read,
    # so the bound is dynamic): ceil(total/T) root fires + warmup rounds
    rounds = (sub_len[0] + T - 1) // T + logw + 2
    if gate == "emulated":
        # arrival stalls extend the schedule: after the last arrival round
        # every leaf is fully delivered and the merge progresses at the
        # ungated rate, so (last arrival) + (ungated rounds) bounds it
        mx = jnp.int32(0)
        for r in range(W):
            for j in range(max_chunks):
                mx = jnp.maximum(mx, arrive_ref[r, j])
        rounds = rounds + mx
    produced0 = tuple(jnp.int32(0) for _ in range(nnodes))
    consumed0 = tuple(jnp.int32(0) for _ in range(2 * nnodes + 1))
    waited0 = tuple(jnp.int32(0) for _ in range(W)) if gate else ()
    final = jax.lax.fori_loop(
        0, rounds, round_body,
        (produced0, consumed0, waited0, jnp.int32(0)))
    if gate is not None:
        _, _, waitedF, violF = final
        for r in range(W):
            wout[0, r] = waitedF[r]
        wout[0, W] = violF
    if leaf_prefetch:
        # drain still-pending leaf DMAs (semaphores must be zero at exit)
        def _drain(c, carry):
            @pl.when(lstate[1, c] == 1)
            def _():
                _leaf_wait_dma(c)
                lstate[1, c] = jnp.int32(0)

            return carry

        jax.lax.fori_loop(0, W, _drain, 0)
        # drain the last root output DMAs (one per slot may be in flight)
        for s in (0, 1):
            @pl.when(lstate[3, s] == 1)
            def _(s=s):
                pltpu.make_async_copy(
                    rk_s.at[pl.ds(s * tile_rows, tile_rows), :],
                    ok_hbm.at[pl.ds(lstate[4, s], tile_rows), :],
                    outsem.at[s]).wait()
                lstate[3, s] = jnp.int32(0)


def multiway_merge(keys2d, payloads2d, lens, stride_rows: int,
                   fanin: int, tile_rows: int = sort_ops.TILE_ROWS_DEFAULT,
                   uniform_lens=None, leaf_prefetch=None):
    """Merge groups of ``fanin`` consecutive ascending runs, each run i at
    rows [i*stride_rows, ...) with logical length lens[i].

    Returns (keys2d, payloads2d, new_lens): merged run g spans rows
    [g*fanin*stride_rows, ...) with length sum(lens in group).  The analog of
    avx_multiway_merge (avx_multiwaymerge.c:199-338).  ``payloads2d=None``
    runs the keys-only network (second return is None).

    ``lens`` may be a traced jnp int32 vector (dynamic run lengths, e.g.
    post-exchange in the distributed join) — its length must then already
    be a multiple of fanin, and new_lens is returned as a jnp vector.

    ``uniform_lens=(nruns, total, span)`` replaces the lens array with the
    sort composition's formula len(r) = clip(total - r*span, 0, span) —
    only two SMEM scalars regardless of run count (a lens array at
    thousands of runs exceeds the SMEM budget).  ``lens`` is then ignored.
    """
    assert fanin >= 2 and (fanin & (fanin - 1)) == 0
    assert stride_rows % tile_rows == 0, (
        "group output region must be whole output tiles")
    uniform = uniform_lens is not None
    dynamic_lens = False
    if uniform:
        nruns, total, span = uniform_lens
        ngroups = -(-nruns // fanin)
        lens_arr = jnp.asarray(np.asarray([total, span], dtype=np.int32))
        new_lens = [max(0, min(total - g * fanin * span, fanin * span))
                    for g in range(ngroups)]
    else:
        dynamic_lens = not isinstance(lens, (list, tuple))
        if dynamic_lens:
            assert lens.shape[0] % fanin == 0
            ngroups = lens.shape[0] // fanin
            lens_arr = lens.astype(jnp.int32)
        else:
            lens = list(lens)
            while len(lens) % fanin != 0:
                lens.append(0)
            ngroups = len(lens) // fanin
            lens_arr = jnp.asarray(np.asarray(lens, dtype=np.int32))
    nnodes = fanin - 1
    keys_only = payloads2d is None
    if leaf_prefetch is None:
        import os
        leaf_prefetch = os.environ.get("SMJ_LEAF_PREFETCH", "1") == "1"
    leaf_prefetch = bool(leaf_prefetch) and keys_only
    kshape = jax.ShapeDtypeStruct(keys2d.shape, keys2d.dtype)
    win = pltpu.VMEM((tile_rows + 8, LANES), jnp.int32)
    fifo = pltpu.VMEM((nnodes, (FIFO_TILES + 1) * tile_rows, LANES), jnp.int32)
    stage = pltpu.VMEM((tile_rows, LANES), jnp.int32)
    if keys_only:
        out_shape = kshape
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY)]
        # prefetch mode double-buffers the root output stage
        root_stage = pltpu.VMEM(
            ((2 if leaf_prefetch else 1) * tile_rows, LANES), jnp.int32)
        scratch = [fifo, win, win, root_stage,
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
        if leaf_prefetch:
            scratch += [
                pltpu.VMEM((fanin, 2 * tile_rows + 8, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((fanin,)),
                pltpu.SMEM((5, max(2, fanin)), jnp.int32),
            ]
        operands = (lens_arr, keys2d)
    else:
        out_shape = (kshape,
                     jax.ShapeDtypeStruct(payloads2d.shape, payloads2d.dtype))
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY)]
        scratch = [fifo, fifo, win, win, win, win, stage, stage,
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
        operands = (lens_arr, keys2d, payloads2d)
    out = pl.pallas_call(
        functools.partial(_mwaymerge_kernel, fanin=fanin,
                          stride_rows=stride_rows, tile_rows=tile_rows,
                          keys_only=keys_only, uniform=uniform,
                          leaf_prefetch=leaf_prefetch),
        out_shape=out_shape,
        grid=(ngroups,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=sort_ops._interpret(),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # FIFO scratch can exceed the default 16 MiB scoped-vmem limit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*operands)
    if not uniform:
        if dynamic_lens:
            new_lens = jnp.sum(lens_arr.reshape(ngroups, fanin), axis=1)
        else:
            new_lens = [sum(lens[g * fanin:(g + 1) * fanin])
                        for g in range(ngroups)]
    if keys_only:
        return out, None, new_lens
    return out[0], out[1], new_lens


def scalar_multiway_merge(runs):
    """Host-side k-way merge oracle — the analog of the reference's three
    scalar tree variants (scalar_multiwaymerge.c: _decomposed/_modulo/
    _bitand differ only in ring-buffer index arithmetic, which has no
    analog here; one heap merge stands in for all three).  ``runs`` is a
    list of sorted (keys, payloads) numpy pairs; returns merged pair."""
    import heapq

    ks = np.concatenate([r[0] for r in runs]) if runs else np.zeros(0, np.int32)
    ps = np.concatenate([r[1] for r in runs]) if runs else np.zeros(0, np.int32)
    merged = heapq.merge(*[
        zip(np.asarray(r[0]).tolist(), np.asarray(r[1]).tolist())
        for r in runs
    ])
    pairs = list(merged)
    if not pairs:
        return ks[:0], ps[:0]
    k, p = zip(*pairs)
    return np.asarray(k, np.int32), np.asarray(p, np.int32)



def sort_blocks_phase(keys, payloads, n: int,
                      block_rows: int = sort_ops.BLOCK_ROWS_DEFAULT,
                      tile_rows: int = sort_ops.TILE_ROWS_DEFAULT):
    """Phase 1 of the multiway sort: pad/reshape and Pallas-sort each
    block_rows*128 block ascending (the in-cache AVX sort of partitions,
    sortmergejoin_multiway.c:388-460).  Returns (k2, p2)."""
    keys_only = payloads is None
    rows = sort_ops.padded_rows(n, block_rows, tile_rows)
    cap = rows * LANES
    # all blocks sort ascending, so +inf pads sort to the junk end everywhere
    kf = jnp.full((cap,), KEY_POS_INF, jnp.int32).at[:n].set(keys[:n])
    k2 = kf.reshape(rows, LANES)
    if keys_only:
        p2 = None
    else:
        pf = jnp.full((cap,), KEY_POS_INF, jnp.int32).at[:n].set(payloads[:n])
        p2 = pf.reshape(rows, LANES)
    nblocks = max(1, sort_ops.cdiv(n, block_rows * LANES))
    sort_rows = nblocks * block_rows
    ks, ps = sort_ops.sort_blocks(k2[:sort_rows],
                                  None if keys_only else p2[:sort_rows],
                                  block_rows, alternating=False)
    ks = jnp.concatenate([ks, k2[sort_rows:]], axis=0)
    if not keys_only:
        ps = jnp.concatenate([ps, p2[sort_rows:]], axis=0)
    return ks, ps


def merge_levels(n: int, block_rows: int, fanin: int):
    """Static (stride, span, nruns, w) schedule of the k-way merge levels
    for an n-tuple multiway sort — host metadata for per-phase dispatch."""
    nruns = max(1, sort_ops.cdiv(n, block_rows * LANES))
    stride, span = block_rows, block_rows * LANES
    levels = []
    while nruns > 1:
        w = min(fanin, 1 << (nruns - 1).bit_length())
        levels.append((stride, span, nruns, w))
        stride *= w
        span *= w
        nruns = -(-nruns // w)
    return levels


def merge_levels_2runs(n: int, block_rows: int, fanin: int):
    """Level schedule that stops at TWO runs instead of one — the final
    pairwise merge is deleted and its work absorbed by the 4-way-select
    count kernel (mergejoin.merge_join_count_fused2), saving one tree
    traversal per element (the last log2 of the composition).  Returns
    ``(levels, final_stride_rows, final_nruns)`` with final_nruns in
    {1, 2} (1 = single-block input; caller uses the 1-run count)."""
    nruns = max(1, sort_ops.cdiv(n, block_rows * LANES))
    stride, span = block_rows, block_rows * LANES
    levels = []
    while nruns > 2:
        w = min(fanin, 1 << (nruns - 1).bit_length())
        if w >= nruns:
            # would finish at 1 run: halve the fan-in so TWO groups remain
            w = max(2, (1 << (nruns - 1).bit_length()) // 2)
        levels.append((stride, span, nruns, w))
        stride *= w
        span *= w
        nruns = -(-nruns // w)
    return levels, stride, nruns


def merge_level(ks, ps, n: int, level, tile_rows: int):
    """One k-way merge level over the uniform-lens layout."""
    stride, span, nruns, w = level
    ks, ps, _ = multiway_merge(ks, ps, None, stride, w, tile_rows,
                               uniform_lens=(nruns, n, span))
    return ks, ps


def multiway_sort(keys, payloads, n: int | None = None,
                  block_rows: int = sort_ops.BLOCK_ROWS_DEFAULT,
                  tile_rows: int = sort_ops.TILE_ROWS_DEFAULT,
                  fanin: int = 16, return_2d: bool = False):
    """Full sort via block sort + log_fanin(#blocks) multiway merge passes —
    the analog of avxsortmultiway_tuples (avxsort_multiway.c:96-152), which
    sorts cache-sized blocks then k-way-merges them in one pass instead of
    log2 pairwise passes.  Returns 1-D (keys, payloads) of length n
    (payloads=None sorts keys only and returns None payloads).
    """
    keys_only = payloads is None
    if n is None:
        n = int(keys.shape[0])
    ks, ps = sort_blocks_phase(keys, payloads, n, block_rows, tile_rows)
    for level in merge_levels(n, block_rows, fanin):
        ks, ps = merge_level(ks, ps, n, level, tile_rows)
    if return_2d:
        # padded (rows,128) layouts with the spare window tile intact —
        # directly consumable by the streaming count/merge kernels
        return ks, ps
    if keys_only:
        return ks.reshape(-1)[:n], None
    return ks.reshape(-1)[:n], ps.reshape(-1)[:n]
