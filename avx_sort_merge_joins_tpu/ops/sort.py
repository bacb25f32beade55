"""Out-of-cache sort: Pallas block sort + streaming merge passes.

The TPU-native redesign of the reference's avxsort operator
(reference: src/avxsort/avxsort.c — L2-block sort then pairwise
merge16_varlen passes, avxsort.c:86-200):

* ``sort_blocks`` — one Pallas program bitonic-sorts a VMEM-resident block
  of BLOCK_ROWS*128 tuples (the analog of avxsort_block's 16K-tuple L2
  blocks, avxsort.c:16-18).  Blocks alternate ascending/descending by block
  index so that every later merge consumes an (asc, desc) pair — a bitonic
  concatenation — with **no reversal step anywhere** (the reference instead
  pays explicit REVERSE shuffles, avxcommon.h:69-75).
* ``merge_pass`` — one Pallas program merges one (asc, desc) run pair into
  a run of twice the length, streaming through VMEM windows: per output
  tile of T tuples it DMAs one T+128-element window from each run's
  consuming end, aligns them to the element-granular cursors with dynamic
  lane rotates, takes the lower/upper half of the first bitonic stage, and
  finishes with a log2(T)-stage bitonic merge.  Cursor advancement uses the
  merge-path identity consumed_a = |{i : A[i] <= B_window[i]}| so the
  kernel needs no host-side split computation and no gathers.  Runs may
  have arbitrary ("varlen") logical lengths — the analog of
  merge16_varlen (avxsort_core.h:904-1056) — with INT32_MAX/MIN sentinels
  standing in for the reference's masked tails.
* ``sort`` — the composition, plus ``sort_xla`` (jax.lax.sort) as the
  "scalar sort" correctness/perf baseline (reference: src/scalarsort/).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bitonic
from .bitonic import KEY_NEG_INF, KEY_POS_INF, LANES

BLOCK_ROWS_DEFAULT = 128  # 16384 tuples per block-sort program
TILE_ROWS_DEFAULT = 128   # 16384 tuples per merge output tile (best measured DMA/compute balance)


_INTERPRET_OVERRIDE: Optional[bool] = None


def _interpret() -> bool:
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


class force_interpret:
    """Trace-time override of the Pallas interpret-mode choice.

    The default tracks the DEFAULT backend, but distributed joins execute
    on an explicit mesh whose platform may differ (the CPU-mesh dryrun
    under a TPU default backend): wrap the jit invocation that traces the
    kernels so every pallas_call inside bakes the mesh's mode."""

    def __init__(self, value: bool):
        self.value = value

    def __enter__(self):
        global _INTERPRET_OVERRIDE
        self._old = _INTERPRET_OVERRIDE
        _INTERPRET_OVERRIDE = self.value
        return self

    def __exit__(self, *exc):
        global _INTERPRET_OVERRIDE
        _INTERPRET_OVERRIDE = self._old
        return False


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# block sort
# --------------------------------------------------------------------------

def _block_sort_kernel(k_ref, p_ref, ok_ref, op_ref, *, alternating: bool,
                       flip: bool):
    if alternating:
        desc = jnp.logical_xor((pl.program_id(0) % 2) == 1, flip)
    else:
        desc = flip
    k, p = bitonic.bitonic_sort(k_ref[:], p_ref[:], desc)
    ok_ref[:] = k
    op_ref[:] = p


def _block_sort_kernel_keys(k_ref, ok_ref, *, alternating: bool, flip: bool):
    if alternating:
        desc = jnp.logical_xor((pl.program_id(0) % 2) == 1, flip)
    else:
        desc = flip
    k, _ = bitonic.bitonic_sort(k_ref[:], None, desc)
    ok_ref[:] = k


def sort_blocks(keys2d, payloads2d, block_rows: int, alternating: bool = True,
                flip: bool = False):
    """Sort each block of block_rows*128 tuples; even blocks ascending, odd
    descending (when alternating); ``flip`` mirrors every direction (for
    descending full sorts).  ``payloads2d=None`` sorts keys only (halved
    VMEM traffic; second return is None)."""
    rows = keys2d.shape[0]
    assert rows % block_rows == 0
    nblocks = rows // block_rows
    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # big blocks (>= 1024 rows = 512 KiB/column) need more scoped VMEM than
    # the 16 MiB default for the network's live temporaries
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(16, 16 * (block_rows // 256)) * 1024 * 1024)
    if payloads2d is None:
        ok = pl.pallas_call(
            functools.partial(_block_sort_kernel_keys,
                              alternating=alternating, flip=flip),
            out_shape=jax.ShapeDtypeStruct(keys2d.shape, keys2d.dtype),
            grid=(nblocks,),
            in_specs=[spec],
            out_specs=spec,
            interpret=_interpret(),
            compiler_params=params,
        )(keys2d)
        return ok, None
    return pl.pallas_call(
        functools.partial(_block_sort_kernel, alternating=alternating,
                          flip=flip),
        out_shape=(
            jax.ShapeDtypeStruct(keys2d.shape, keys2d.dtype),
            jax.ShapeDtypeStruct(payloads2d.shape, payloads2d.dtype),
        ),
        grid=(nblocks,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=_interpret(),
        compiler_params=params,
    )(keys2d, payloads2d)


# --------------------------------------------------------------------------
# merge pass
# --------------------------------------------------------------------------

def _merge_pair_body(
    j, run_len, k_hbm, p_hbm, ok_hbm, op_hbm,
    wak, wap, wbk, wbp, rk, rp, insem, outsem,
    *, stride_rows: int, tile_rows: int, ascending: bool, swap: bool = False,
    b_asc: bool = False,
):
    """Merge run pair (2j, 2j+1) in direction `ascending` (static).

    The body consumes stream A as the ascending run and B as the descending
    run; under a flipped (mirrored) sort the pair layout is (desc, asc), so
    ``swap`` exchanges the roles.  ``run_len(i)`` gives run i's length.

    ``b_asc``: run B is stored ASCENDING too (runs received from an
    exchange are all ascending) — its windows load from the mirrored end
    and get lane-reversed in VMEM, after which the bitonic-pair logic is
    unchanged.  This is the kernel behind the distributed m-pass's first
    merge pass (the reference merges all-ascending remote runs pairwise,
    sortmergejoin_multipass.c:410-619)."""
    T = tile_rows * LANES
    ia = 2 * j + (1 if swap else 0)
    ib = 2 * j + (0 if swap else 1)
    la = run_len(ia)
    lb = run_len(ib)
    base_a = ia * stride_rows             # rows (ascending run)
    base_b = ib * stride_rows             # rows (descending run)
    out_base = 2 * j * stride_rows
    ntiles = (la + lb + T - 1) // T
    fidx = bitonic.flat_index((tile_rows, LANES))

    def load(dst, src_hbm, row, sem):
        # DMA lengths must be whole sublane tiles (multiples of 8 rows);
        # unaligned start rows are fine.  Virtual (zero-length) padding runs
        # can sit past the physical array — clamp; their windows are fully
        # masked downstream.
        row = jnp.clip(row, 0, src_hbm.shape[0] - (tile_rows + 8))
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(row, tile_rows + 8), :], dst, sem
        )
        cp.start()
        return cp

    keys_only = p_hbm is None

    def tile_body(t, carry):
        ea, eb = carry
        if ascending:
            # A consumed from its front (smallest first), B (desc) from its back
            a_elem = base_a * LANES + ea
            b_start = (base_b * LANES + eb) if b_asc \
                else (base_b * LANES + lb - eb - T)
        else:
            # A (asc) consumed from its back (largest first), B from its front
            a_elem = base_a * LANES + la - ea - T
            b_start = (base_b * LANES + lb - eb - T) if b_asc \
                else (base_b * LANES + eb)
        car, skip_a = a_elem // LANES, a_elem % LANES
        cbr, skip_b = b_start // LANES, b_start % LANES
        d1 = load(wak, k_hbm, car, insem.at[0])
        d3 = load(wbk, k_hbm, cbr, insem.at[2])
        if not keys_only:
            d2 = load(wap, p_hbm, car, insem.at[1])
            d4 = load(wbp, p_hbm, cbr, insem.at[3])
        d1.wait(); d3.wait()
        if not keys_only:
            d2.wait(); d4.wait()

        ak = bitonic.shift_flat(wak[:], skip_a)[:tile_rows]
        bk = bitonic.shift_flat(wbk[:], skip_b)[:tile_rows]
        if not keys_only:
            ap = bitonic.shift_flat(wap[:], skip_a)[:tile_rows]
            bp = bitonic.shift_flat(wbp[:], skip_b)[:tile_rows]
        if b_asc:
            # lane-reverse the ascending B window into the descending
            # layout the bitonic-pair selection expects; the validity
            # masks below already address post-reversal positions
            bk = bitonic.flip_flat(bk)
            if not keys_only:
                bp = bitonic.flip_flat(bp)

        avail_a = la - ea
        avail_b = lb - eb
        if ascending:
            # invalid tails lose the min selection
            ak = jnp.where(fidx >= avail_a, KEY_POS_INF, ak)
            bk = jnp.where(fidx < T - avail_b, KEY_POS_INF, bk)
            if keys_only:
                le = ak <= bk
            else:
                ap = jnp.where(fidx >= avail_a, KEY_POS_INF, ap)
                bp = jnp.where(fidx < T - avail_b, KEY_POS_INF, bp)
                # first bitonic stage of concat(A asc, B desc): lower half
                _, le = bitonic.lex_lt_le(ak, ap, bk, bp)
            hk = jnp.where(le, ak, bk)
            hp = None if keys_only else jnp.where(le, ap, bp)
            consumed_a = jnp.sum(le.astype(jnp.int32))
        else:
            # invalid heads lose the max selection
            ak = jnp.where(fidx < T - avail_a, KEY_NEG_INF, ak)
            bk = jnp.where(fidx >= avail_b, KEY_NEG_INF, bk)
            if keys_only:
                keep_a = ak >= bk
            else:
                ap = jnp.where(fidx < T - avail_a, KEY_NEG_INF, ap)
                bp = jnp.where(fidx >= avail_b, KEY_NEG_INF, bp)
                # first bitonic stage of concat(A asc, B desc): upper half
                lt, _ = bitonic.lex_lt_le(ak, ap, bk, bp)
                keep_a = jnp.logical_not(lt)  # a >= b
            hk = jnp.where(keep_a, ak, bk)
            hp = None if keys_only else jnp.where(keep_a, ap, bp)
            consumed_a = jnp.sum(keep_a.astype(jnp.int32))

        mk, mp = bitonic.bitonic_merge(hk, hp, ascending=ascending)
        rk[:] = mk
        orow = out_base + t * tile_rows
        o1 = pltpu.make_async_copy(rk, ok_hbm.at[pl.ds(orow, tile_rows), :], outsem.at[0])
        o1.start()
        if not keys_only:
            rp[:] = mp
            o2 = pltpu.make_async_copy(rp, op_hbm.at[pl.ds(orow, tile_rows), :], outsem.at[1])
            o2.start()
        o1.wait()
        if not keys_only:
            o2.wait()
        return ea + consumed_a, eb + (T - consumed_a)

    jax.lax.fori_loop(0, ntiles, tile_body, (jnp.int32(0), jnp.int32(0)))


def _merge_pass_kernel(lens_ref, k_hbm, p_hbm, ok_hbm, op_hbm,
                       wak, wap, wbk, wbp, rk, rp, insem, outsem,
                       *, stride_rows: int, tile_rows: int, flip: bool,
                       uniform: bool = False, b_asc: bool = False):
    j = pl.program_id(0)
    if uniform:
        def run_len(i):
            return jnp.clip(lens_ref[0] - i * lens_ref[1], 0, lens_ref[1])
    else:
        def run_len(i):
            return lens_ref[i]
    args = (j, run_len, k_hbm, p_hbm, ok_hbm, op_hbm,
            wak, wap, wbk, wbp, rk, rp, insem, outsem)
    # output run j sorts ascending iff (j even) XOR flip; under flip the
    # input pair is (desc, asc) so the A/B roles swap.
    even = (j % 2 == 0) if not flip else (j % 2 == 1)

    @pl.when(even)
    def _():
        _merge_pair_body(*args, stride_rows=stride_rows, tile_rows=tile_rows,
                         ascending=True, swap=flip, b_asc=b_asc)

    @pl.when(jnp.logical_not(even))
    def _():
        _merge_pair_body(*args, stride_rows=stride_rows, tile_rows=tile_rows,
                         ascending=False, swap=flip, b_asc=b_asc)


def merge_pass(keys2d, payloads2d, lens, stride_rows: int,
               tile_rows: int = TILE_ROWS_DEFAULT, flip: bool = False,
               uniform_lens=None, b_asc: bool = False,
               interpret: Optional[bool] = None):
    """One pass of pairwise (asc, desc) -> alternating-direction run merges.

    ``lens`` are the logical run lengths in tuples — static Python ints, or
    a traced int32 vector (distributed paths whose run lengths come off the
    exchange); run i occupies rows [i*stride_rows, (i+1)*stride_rows).
    Returns the new (keys, payloads) arrays and the merged lens
    (list or traced vector, matching the input).

    ``uniform_lens=(nruns, total, span)`` replaces the per-run SMEM array
    with the sort-composition formula len(r) = clip(total - r*span, 0,
    span) — two SMEM scalars regardless of run count (thousands of runs
    would blow the SMEM budget at 128M+ tuples).

    ``b_asc``: both input runs of every pair are ascending (first pass over
    exchange-received runs); later passes use the default bitonic layout.
    """
    traced_lens = uniform_lens is None and not isinstance(lens, (list, tuple))
    if uniform_lens is not None:
        nruns, total, span = uniform_lens
        npairs = -(-nruns // 2)
        lens_arr = jnp.asarray(np.asarray([total, span], dtype=np.int32))
        new_lens = [max(0, min(total - g * 2 * span, 2 * span))
                    for g in range(npairs)]
    elif traced_lens:
        lens_arr = jnp.asarray(lens, jnp.int32)
        assert lens_arr.shape[0] % 2 == 0, "pad traced lens to even run count"
        npairs = lens_arr.shape[0] // 2
        new_lens = lens_arr[0::2] + lens_arr[1::2]
    else:
        lens = list(lens)
        if len(lens) % 2 == 1:
            lens.append(0)
        npairs = len(lens) // 2
        lens_arr = jnp.asarray(np.asarray(lens, dtype=np.int32))
    if interpret is None:
        interpret = _interpret()
    keys_only = payloads2d is None
    if keys_only:
        def kernel(lens_ref, k_hbm, ok_hbm, wak, wbk, rk, insem, outsem):
            _merge_pass_kernel(
                lens_ref, k_hbm, None, ok_hbm, None,
                wak, None, wbk, None, rk, None, insem, outsem,
                stride_rows=stride_rows, tile_rows=tile_rows, flip=flip,
                uniform=uniform_lens is not None, b_asc=b_asc)

        ok = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(keys2d.shape, keys2d.dtype),
            grid=(npairs,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((tile_rows + 8, LANES), jnp.int32),
                pltpu.VMEM((tile_rows + 8, LANES), jnp.int32),
                pltpu.VMEM((tile_rows, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(lens_arr, keys2d)
        op = None
    else:
        ok, op = pl.pallas_call(
            functools.partial(_merge_pass_kernel, stride_rows=stride_rows,
                              tile_rows=tile_rows, flip=flip,
                              uniform=uniform_lens is not None, b_asc=b_asc),
            out_shape=(
                jax.ShapeDtypeStruct(keys2d.shape, keys2d.dtype),
                jax.ShapeDtypeStruct(payloads2d.shape, payloads2d.dtype),
            ),
            grid=(npairs,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((tile_rows + 8, LANES), jnp.int32),
                pltpu.VMEM((tile_rows + 8, LANES), jnp.int32),
                pltpu.VMEM((tile_rows + 8, LANES), jnp.int32),
                pltpu.VMEM((tile_rows + 8, LANES), jnp.int32),
                pltpu.VMEM((tile_rows, LANES), jnp.int32),
                pltpu.VMEM((tile_rows, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(lens_arr, keys2d, payloads2d)
    if uniform_lens is None and not traced_lens:
        new_lens = [lens[2 * i] + lens[2 * i + 1] for i in range(npairs)]
    return ok, op, new_lens


# --------------------------------------------------------------------------
# composition
# --------------------------------------------------------------------------

def padded_rows(n: int, block_rows: int = BLOCK_ROWS_DEFAULT,
                tile_rows: int = TILE_ROWS_DEFAULT) -> int:
    """Device rows needed to sort n tuples (one spare window tile at the end
    for the +1-row DMA overreach of the merge kernel)."""
    nblocks = max(1, cdiv(n, block_rows * LANES))
    return nblocks * block_rows + tile_rows + 8


def prepare(keys, payloads, n: int, block_rows: int = BLOCK_ROWS_DEFAULT,
            tile_rows: int = TILE_ROWS_DEFAULT, flip: bool = False):
    """Pad/reshape 1D columns to the sort's (rows, 128) layout.

    Padding keys take the sentinel that sorts to the junk end of the last
    block given its direction (+inf for ascending even blocks, -inf for
    descending odd blocks; mirrored when flip)."""
    rows = padded_rows(n, block_rows, tile_rows)
    nblocks = max(1, cdiv(n, block_rows * LANES))
    last_desc = ((nblocks - 1) % 2 == 1) != flip
    sent = KEY_NEG_INF if last_desc else KEY_POS_INF
    cap = rows * LANES
    k = jnp.full((cap,), sent, jnp.int32).at[:n].set(keys[:n])
    if payloads is None:  # keys-only layout (halved traffic downstream)
        return k.reshape(rows, LANES), None
    p = jnp.full((cap,), sent, jnp.int32).at[:n].set(payloads[:n])
    return k.reshape(rows, LANES), p.reshape(rows, LANES)


def sort2d(keys2d, payloads2d, n: int, block_rows: int = BLOCK_ROWS_DEFAULT,
           tile_rows: int = TILE_ROWS_DEFAULT, flip: bool = False):
    """Sort n logical tuples living in prepare()-layout 2D columns.

    Returns (keys2d, payloads2d) with rows [0, ceil(n/128)) sorted (ascending,
    or descending when flip) in flat row-major order (junk beyond n).
    """
    nblocks = max(1, cdiv(n, block_rows * LANES))
    sort_rows = nblocks * block_rows
    ks = keys2d[:sort_rows]
    ps = payloads2d[:sort_rows]
    ks, ps = sort_blocks(ks, ps, block_rows, alternating=nblocks > 1, flip=flip)
    stride = block_rows
    span = block_rows * LANES
    nruns = nblocks
    # merge kernel may read/write one spare tile past the last run
    ks = jnp.concatenate([ks, keys2d[sort_rows:]], axis=0)
    ps = jnp.concatenate([ps, payloads2d[sort_rows:]], axis=0)
    while nruns > 1:
        ks, ps, lens = merge_pass(ks, ps, None, stride, tile_rows, flip=flip,
                                  uniform_lens=(nruns, n, span))
        stride *= 2
        span *= 2
        nruns = len(lens)
    return ks, ps


def sort(keys, payloads, n: Optional[int] = None,
         block_rows: int = BLOCK_ROWS_DEFAULT,
         tile_rows: int = TILE_ROWS_DEFAULT, flip: bool = False):
    """Sort 1D (keys, payloads) columns by (key, payload); returns 1D arrays
    of length n.  The TPU analog of avxsort_tuples (avxsort.h:36-44)."""
    if n is None:
        n = int(keys.shape[0])
    k2, p2 = prepare(keys, payloads, n, block_rows, tile_rows, flip=flip)
    k2, p2 = sort2d(k2, p2, n, block_rows, tile_rows, flip=flip)
    return k2.reshape(-1)[:n], p2.reshape(-1)[:n]


def sort_descending(keys, payloads, n: Optional[int] = None,
                    block_rows: int = BLOCK_ROWS_DEFAULT,
                    tile_rows: int = TILE_ROWS_DEFAULT):
    """Full descending sort (used for the S side of the tag-merge join)."""
    return sort(keys, payloads, n, block_rows, tile_rows, flip=True)


def sort_xla(keys, payloads):
    """Baseline via XLA's comparison sort — the 'scalarsort' analog
    (reference: src/scalarsort/scalarsort.c)."""
    return jax.lax.sort((keys, payloads), num_keys=2)


def two_run_layout(ka, kb, na: int, nb: int, tile_rows: int,
                   rounded_stride: bool, pa=None, pb=None,
                   payload_fill: int = 0):
    """Build the padded two-run (rows, 128) layout shared by the 2-way
    merge entry points: run A at row 0, run B at ``stride`` rows, +inf
    key sentinels everywhere else, ``tile_rows + 8`` spare rows at the
    end (the merge kernels' window-overreach contract, see padded_rows).

    ``rounded_stride`` rounds the stride up to a tile multiple (required
    by the FIFO-tree kernel's stride % tile_rows == 0 invariant; the
    streaming merge_pass kernel takes any stride).  ``pa``/``pb`` fill a
    payload plane (arrays, or scalars for flag tagging); None for
    keys-only.  Returns (keys2d, payloads2d_or_None, stride_rows).
    """
    from .bitonic import KEY_POS_INF, LANES

    stride = max(cdiv(na, LANES), cdiv(nb, LANES)) + tile_rows
    if rounded_stride:
        stride = (stride // tile_rows + 1) * tile_rows
    cap_rows = 2 * stride + tile_rows + 8
    cap = cap_rows * LANES
    kf = jnp.full((cap,), KEY_POS_INF, jnp.int32)
    kf = kf.at[:na].set(ka[:na])
    s0 = stride * LANES
    kf = kf.at[s0:s0 + nb].set(kb[:nb])
    pf = None
    if pa is not None:
        pf = jnp.full((cap,), payload_fill, jnp.int32)
        pf = pf.at[:na].set(pa if jnp.ndim(pa) == 0 else pa[:na])
        pf = pf.at[s0:s0 + nb].set(pb if jnp.ndim(pb) == 0 else pb[:nb])
        pf = pf.reshape(cap_rows, LANES)
    return kf.reshape(cap_rows, LANES), pf, stride
