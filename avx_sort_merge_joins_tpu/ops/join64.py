"""64-bit-key joins — the KEY_8B mode.

The reference's --enable-key8B switches to 16-byte tuples with int64 keys
(reference: src/types.h:23-29) and **forces the scalar sort/merge paths**
because the AVX kernels only handle 8-byte tuples (main.c:871-877).  The
TPU analog mirrors that split exactly: 64-bit keys travel as two int32
planes (hi, bias-flipped lo — order-preserving under (hi, lo) lex compare
without x64 mode) through the XLA baseline ("scalar") path, while the
Pallas networks remain the 32-bit fast path.

The pair sort itself also runs on the Pallas network: lex (key, payload) =
(hi, lo_biased) is exactly the existing two-column network, so
``sort64`` is vectorized; only the flag-carrying join count uses XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import multiwaymerge as mw

LO_BIAS = np.int32(-(2**31))  # xor flips the sign bit: unsigned -> signed order


def split64(keys64: np.ndarray):
    """Host-side split of int64 keys into order-preserving int32 planes."""
    keys64 = np.asarray(keys64, np.int64)
    hi = (keys64 >> 32).astype(np.int32)
    lo = (keys64 & 0xFFFFFFFF).astype(np.uint32).astype(np.int64)
    lo_biased = (lo - 2**31).astype(np.int32)
    return hi, lo_biased


def join64(hi: np.ndarray, lo_biased: np.ndarray) -> np.ndarray:
    """Inverse of split64 (host-side)."""
    lo = (lo_biased.astype(np.int64) + 2**31).astype(np.uint64)
    return (hi.astype(np.int64) << 32) | lo.astype(np.int64)


def sort64(hi, lo_biased, n: int | None = None, fanin: int = 16,
           return_2d: bool = False):
    """Sort int64 keys given as planes, via the Pallas pair network
    (lex (hi, lo) == int64 order).  Returns sorted (hi, lo_biased);
    ``return_2d`` keeps the padded (rows,128) layouts consumable by the
    fused KEY_8B count kernel."""
    return mw.multiway_sort(hi, lo_biased, n, fanin=fanin,
                            return_2d=return_2d)


def widen32(keys):
    """Widen device int32 keys to order-preserving (hi, lo_biased) int64
    planes — the KEY_8B layout for the reference's workloads, whose key
    VALUES are identical under KEY_4B/KEY_8B (types.h:23-29 only widens
    the storage): hi = sign extension, lo_biased = unsigned-low ^ signbit.
    All int32 ops; no jax x64 mode anywhere."""
    hi = jax.lax.shift_right_arithmetic(keys, jnp.int32(31))
    lo_biased = keys ^ jnp.int32(-(2**31))
    return hi, lo_biased


def key8b_join_count(rkeys, skeys, nR: int, nS: int, fanin: int = 16,
                     pallas_sort: bool = True, recover_s: bool = False):
    """End-to-end KEY_8B count join on int32-valued key streams widened
    to 64-bit planes: Pallas plane-pair multiway sort + the fused
    plane-lex count kernel (both beyond the reference — its KEY_8B build
    ERRORS unless --scalarsort/--scalarmerge and then counts through the
    scalar merge_join, main.c:871-877).  ``pallas_sort=False`` takes the
    forced-scalar analog end to end (XLA plane sort + tag-sort count).
    Returns (sorted_r_planes, sorted_s_planes, count_limbs, ovf) — combine
    the base-2^30 limbs with :func:`finish_count64` (host, exact) — so
    callers can phase-time sort vs count.  On the Pallas path S planes
    come back in the NOT layout (S descending) unless ``recover_s=True``
    converts them to ascending original order (two O(nS) flips — opt-in
    so the count-only CLI path doesn't pay for outputs it discards)."""
    from . import mergejoin

    rhi, rlo = widen32(jnp.asarray(rkeys[:nR], jnp.int32))
    shi, slo = widen32(jnp.asarray(skeys[:nS], jnp.int32))
    if pallas_sort:
        rh2, rl2 = sort64(rhi, rlo, nR, fanin, return_2d=True)
        # S sorts as BITWISE-NOT planes (ascending NOT-lex = descending
        # original): the fused count then reads S windows back-to-front
        # with one ~ per plane instead of two 14-stage flips per tile
        # (the plane-pair analog of the m-way model's negated-S trick)
        sh2, sl2 = sort64(~shi, ~slo, nS, fanin, return_2d=True)
        stats = mergejoin.merge_join_count_fused64(
            rh2, rl2, sh2, sl2, nR, nS, s_negated=True)
        # the count comes back as base-2^30 limbs [hi, lo]: recombining
        # on device in int32 would wrap for totals >= 2^31 even with
        # every per-segment product < 2^29 (hi >= 2 overflows hi << 30),
        # and x64 is disabled — combine host-side via finish_count64,
        # exactly like finish_count_fused.  Callers must reject ovf != 0
        limbs = stats[0, :2]
        rhi = rh2.reshape(-1)[:nR]
        rlo = rl2.reshape(-1)[:nR]
        # S planes come back in the NOT layout (ascending NOT-lex = S
        # descending).  ``recover_s`` converts to ascending original
        # order — S_asc[j] = ~S'_asc[nS-1-j] — at the cost of two O(nS)
        # flip passes, so it is OPT-IN: the CLI path discards the planes
        # and must not pay for (un-DCE-able) jit outputs it never reads.
        shi = sh2.reshape(-1)[:nS]
        slo = sl2.reshape(-1)[:nS]
        if recover_s:
            shi = jnp.flip(~shi)
            slo = jnp.flip(~slo)
        return (rhi, rlo), (shi, slo), limbs, stats[0, 2]
    rhi, rlo = jax.lax.sort((rhi, rlo), num_keys=2)
    shi, slo = jax.lax.sort((shi, slo), num_keys=2)
    cnt = merge_join_count_xla64(rhi, rlo, shi, slo, nR, nS)
    limbs = jnp.stack([cnt >> 30, cnt & jnp.int32(2**30 - 1)])
    return (rhi, rlo), (shi, slo), limbs, jnp.int32(0)


def finish_count64(limbs) -> int:
    """Host-side exact combine of the base-2^30 count limbs returned by
    :func:`key8b_join_count` (Python ints never wrap)."""
    import numpy as np

    a = np.asarray(limbs)
    return (int(a[0]) << 30) + int(a[1])


def merge_join_count_xla64(rhi, rlo, shi, slo, nR: int, nS: int):
    """Match count over 64-bit keys via the tag-sort rank reduction
    (the scalar merge-join analog for KEY_8B).  Exact for counts < 2^31.
    """
    hi = jnp.concatenate([rhi[:nR], shi[:nS]])
    lo = jnp.concatenate([rlo[:nR], slo[:nS]])
    flags = jnp.concatenate([jnp.zeros(nR, jnp.int32),
                             jnp.ones(nS, jnp.int32)])
    _, _, mf = jax.lax.sort((hi, lo, flags), num_keys=3)
    s_prefix = jnp.cumsum(mf)
    lt_counts = jnp.sum(jnp.where(mf == 0, s_prefix, 0))
    _, _, mf2 = jax.lax.sort((hi, lo, 1 - flags), num_keys=3)
    s_prefix2 = jnp.cumsum(1 - mf2)
    le_counts = jnp.sum(jnp.where(mf2 == 1, s_prefix2, 0))
    return le_counts - lt_counts


def merge_join_count_numpy64(rkeys64: np.ndarray, skeys64: np.ndarray) -> int:
    rk, rc = np.unique(rkeys64, return_counts=True)
    sk, sc = np.unique(skeys64, return_counts=True)
    _, ri, si = np.intersect1d(rk, sk, assume_unique=True,
                               return_indices=True)
    return int(np.sum(rc[ri].astype(np.int64) * sc[si].astype(np.int64)))
