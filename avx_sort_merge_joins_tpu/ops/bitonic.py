"""Bitonic compare-exchange networks over VMEM tiles.

The TPU-native analog of the reference's register-level bitonic macros
(reference: src/avxsort/avxcommon.h BITONIC4/8/16, avxsort_core.h
inregister_sort_keyval32): key/payload column pairs laid out as row-major
``(R, 128)`` int32 tiles (flat element i lives at ``(i // 128, i % 128)``).

* lane-distance exchanges (d < 128) use hardware lane rotates
  (``pltpu.roll``) — the analog of AVX shuffles,
* sublane/row-distance exchanges (d >= 128) use sublane reshapes,
* directions are encoded as boolean masks so ascending/descending networks
  (needed for the reversal-free alternating-run merge sort) cost the same.

All functions are pure jnp/pallas-compatible and usable both inside Pallas
kernels and under interpret mode on CPU.

Keys compare lexicographically as (key, payload), matching the reference's
single int64 compare of {key hi32, payload lo32} tuples (src/types.h:48-54)
for non-negative payloads.  INT32_MAX / INT32_MIN are reserved as +inf/-inf
padding sentinels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

LANES = 128
KEY_POS_INF = np.int32(2**31 - 1)
KEY_NEG_INF = np.int32(-(2**31))


def _roll(x, shift, axis):
    """Lane/sublane rotate that works both compiled (Mosaic) and interpreted.
    Both pltpu.roll and jnp.roll use out[i] = x[i - shift]."""
    if jax.default_backend() == "tpu":
        return pltpu.roll(x, shift, axis)
    return jnp.roll(x, shift, axis)


def lex_lt_le(ka, pa, kb, pb):
    """(a < b, a <= b) for (key, payload) lexicographic order."""
    keq = ka == kb
    klt = ka < kb
    lt = klt | (keq & (pa < pb))
    le = klt | (keq & (pa <= pb))
    return lt, le


def flat_index(shape):
    """Flat element index of a row-major (R, 128) tile."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row * LANES + lane


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def cmpex(k, p, d, asc):
    """One compare-exchange substage at flat distance d (power of two).

    ``asc`` is a boolean array broadcastable to k.shape (True = the element
    pair containing this position sorts ascending).  Pairs are (i, i+d) for
    i with bit d clear, as in the textbook bitonic network.

    ``p`` may be None for keys-only networks (count-only join pipelines):
    this halves the VMEM traffic per substage, the dominant cost.
    """
    if d < LANES:
        lane = _lane_iota(k.shape)
        lo = (lane & d) == 0
        kv_up = _roll(k, LANES - d, 1)  # value from lane+d
        kv_dn = _roll(k, d, 1)          # value from lane-d
        kv = jnp.where(lo, kv_up, kv_dn)
        if p is None:
            # keys-only: one min/max pair replaces the lex-compare + keep
            # logic (ties keep identical values on both sides)
            want_min = jnp.logical_not(jnp.logical_xor(lo, asc))
            return (jnp.where(want_min, jnp.minimum(k, kv),
                              jnp.maximum(k, kv)), None)
        pv_up = _roll(p, LANES - d, 1)
        pv_dn = _roll(p, d, 1)
        pv = jnp.where(lo, pv_up, pv_dn)
        lt, le = lex_lt_le(k, p, kv, pv)
        role_lo = jnp.logical_not(jnp.logical_xor(lo, asc))
        keep = (role_lo & le) | (jnp.logical_not(role_lo) & jnp.logical_not(lt))
        return jnp.where(keep, k, kv), jnp.where(keep, p, pv)

    dr = d // LANES
    r = k.shape[0]
    shape4 = (r // (2 * dr), 2, dr, LANES)
    k3 = k.reshape(shape4)
    if isinstance(asc, bool):
        asc0 = asc
    else:
        asc0 = asc.reshape(shape4)[:, 0]
    if p is None:
        le01 = k3[:, 0] <= k3[:, 1]
    else:
        p3 = p.reshape(shape4)
        _, le01 = lex_lt_le(k3[:, 0], p3[:, 0], k3[:, 1], p3[:, 1])
    # keep element 0 in the low slot iff (e0 <= e1) == ascending
    c0 = jnp.logical_not(jnp.logical_xor(le01, asc0))
    k_lo = jnp.where(c0, k3[:, 0], k3[:, 1])
    k_hi = jnp.where(c0, k3[:, 1], k3[:, 0])
    k = jnp.concatenate([k_lo[:, None], k_hi[:, None]], axis=1).reshape(r, LANES)
    if p is None:
        return k, None
    p_lo = jnp.where(c0, p3[:, 0], p3[:, 1])
    p_hi = jnp.where(c0, p3[:, 1], p3[:, 0])
    p = jnp.concatenate([p_lo[:, None], p_hi[:, None]], axis=1).reshape(r, LANES)
    return k, p


def bitonic_merge(k, p, ascending=True):
    """Merge a bitonic (R,128) flat sequence into sorted order.

    log2(n)+1 compare-exchange substages, uniform direction — the analog of
    the reference's BITONIC_MERGE4/8/16 register trees (avxcommon.h:126-183).
    """
    n = k.shape[0] * LANES
    d = n // 2
    while d >= 1:
        k, p = cmpex(k, p, d, ascending)
        d //= 2
    return k, p


def bitonic_sort(k, p, descending):
    """Full bitonic sort network on a flat (R,128) tile.

    ``descending`` may be a traced bool scalar: direction masks are XOR'd
    with it, so alternating-direction blocks (even blocks ascending, odd
    descending) are free — this replaces the reference's separate
    ascending-only networks + explicit REVERSE lane reversals
    (avxcommon.h:69-75).
    """
    n = k.shape[0] * LANES
    logn = n.bit_length() - 1
    assert 1 << logn == n, "tile size must be a power of two"
    idx = flat_index(k.shape)
    static_dir = isinstance(descending, (bool, np.bool_))
    for kk in range(1, logn + 1):
        asc = ((idx >> kk) & 1) == 0
        if static_dir:
            if descending:
                asc = jnp.logical_not(asc)
        else:
            asc = jnp.logical_xor(asc, descending)
        d = 1 << (kk - 1)
        while d >= 1:
            k, p = cmpex(k, p, d, asc)
            d //= 2
    return k, p


def cmpex_tagged(k, f, d, asc):
    """Compare-exchange at flat distance d where the comparator decision is
    made on KEYS ONLY and the tag array ``f`` follows the same swap.

    For tie keys the decision is arbitrary — the merged key order is
    unaffected (equal values), and any consistent pair swap preserves the
    tag MULTISET within each equal-key segment, which is all the segmented
    count reduction consumes.  This replaces the full lex (key, tag)
    comparator chain (lex_lt_le) with one key compare per substage.
    """
    if d < LANES:
        lane = _lane_iota(k.shape)
        lo = (lane & d) == 0
        kv = jnp.where(lo, _roll(k, LANES - d, 1), _roll(k, d, 1))
        fv = jnp.where(lo, _roll(f, LANES - d, 1), _roll(f, d, 1))
        role_lo = jnp.logical_not(jnp.logical_xor(lo, asc))
        # mask algebra, not a select of i1 vectors (Mosaic can't truncate
        # i8→i1 selects); ties keep own (k, f) on BOTH sides of the pair so
        # the tag movement stays a permutation
        keep = (role_lo & (k <= kv)) | (jnp.logical_not(role_lo) & (k >= kv))
        return jnp.where(keep, k, kv), jnp.where(keep, f, fv)
    dr = d // LANES
    r = k.shape[0]
    shape4 = (r // (2 * dr), 2, dr, LANES)
    k3 = k.reshape(shape4)
    f3 = f.reshape(shape4)
    asc0 = asc if isinstance(asc, bool) else asc.reshape(shape4)[:, 0]
    # keep element 0 low iff (e0 <= e1) == ascending (ties keep position)
    c0 = jnp.logical_not(jnp.logical_xor(k3[:, 0] <= k3[:, 1], asc0))
    k_lo = jnp.where(c0, k3[:, 0], k3[:, 1])
    k_hi = jnp.where(c0, k3[:, 1], k3[:, 0])
    f_lo = jnp.where(c0, f3[:, 0], f3[:, 1])
    f_hi = jnp.where(c0, f3[:, 1], f3[:, 0])
    k = jnp.concatenate([k_lo[:, None], k_hi[:, None]], axis=1).reshape(r, LANES)
    f = jnp.concatenate([f_lo[:, None], f_hi[:, None]], axis=1).reshape(r, LANES)
    return k, f


def _lex2_le(hi, lo, hiv, lov):
    """(hi, lo) <= (hiv, lov) plane-pair lex compare (int64 order on
    order-preserving planes, see ops.join64)."""
    return (hi < hiv) | ((hi == hiv) & (lo <= lov))


def cmpex_tagged2(khi, klo, f, d, asc):
    """Compare-exchange at flat distance d on a TWO-PLANE (hi, lo) key
    with a tag riding along — the KEY_8B form of :func:`cmpex_tagged`
    (comparators decide on the plane-pair lex order; all three arrays
    move together, so tag multisets per 64-bit-key segment are
    preserved)."""
    if d < LANES:
        lane = _lane_iota(khi.shape)
        lo_pos = (lane & d) == 0

        def pick(x):
            return jnp.where(lo_pos, _roll(x, LANES - d, 1), _roll(x, d, 1))

        hv, lv, fv = pick(khi), pick(klo), pick(f)
        role_lo = jnp.logical_not(jnp.logical_xor(lo_pos, asc))
        le = _lex2_le(khi, klo, hv, lv)
        ge = _lex2_le(hv, lv, khi, klo)
        keep = (role_lo & le) | (jnp.logical_not(role_lo) & ge)
        return (jnp.where(keep, khi, hv), jnp.where(keep, klo, lv),
                jnp.where(keep, f, fv))
    dr = d // LANES
    r = khi.shape[0]
    shape4 = (r // (2 * dr), 2, dr, LANES)
    h3, l3, f3 = (x.reshape(shape4) for x in (khi, klo, f))
    asc0 = asc if isinstance(asc, bool) else asc.reshape(shape4)[:, 0]
    le01 = _lex2_le(h3[:, 0], l3[:, 0], h3[:, 1], l3[:, 1])
    c0 = jnp.logical_not(jnp.logical_xor(le01, asc0))

    def mix(x3):
        xl = jnp.where(c0, x3[:, 0], x3[:, 1])
        xh = jnp.where(c0, x3[:, 1], x3[:, 0])
        return jnp.concatenate([xl[:, None], xh[:, None]],
                               axis=1).reshape(r, LANES)

    return mix(h3), mix(l3), mix(f3)


def bitonic_merge_tagged2(khi, klo, f, ascending=True):
    """Bitonic merge of a flat bitonic two-plane (hi, lo) key sequence
    with a tag array (KEY_8B count path)."""
    n = khi.shape[0] * LANES
    d = n // 2
    while d >= 1:
        khi, klo, f = cmpex_tagged2(khi, klo, f, d, ascending)
        d //= 2
    return khi, klo, f


def bitonic_merge_tagged(k, f, ascending=True):
    """Bitonic merge of a flat (R,128) bitonic key sequence with a tag
    array riding along on key-only comparator decisions (see
    :func:`cmpex_tagged`): keys come out sorted; tags come out permuted
    within equal-key segments (multisets preserved)."""
    n = k.shape[0] * LANES
    d = n // 2
    while d >= 1:
        k, f = cmpex_tagged(k, f, d, ascending)
        d //= 2
    return k, f


def flip_flat(x):
    """Full flat reversal of a row-major (R,128) tile: out[i] = x[N-1-i].

    The REVERSE analog (avxcommon.h:69-75).  Mosaic has no `rev`
    primitive, but N-1-i = XOR of every index bit, and an XOR-with-bit-b
    exchange is two rotates and a select — log2(N) such stages compose the
    reversal (lane bits via lane rolls, row bits via sublane rolls).
    """
    if jax.default_backend() != "tpu":
        return jnp.flip(x, (0, 1))
    r = x.shape[0]
    assert r & (r - 1) == 0, "flip_flat needs a power-of-two row count"
    lane = _lane_iota(x.shape)
    b = 1
    while b < LANES:
        up = pltpu.roll(x, LANES - b, 1)  # x[lane+b]
        dn = pltpu.roll(x, b, 1)          # x[lane-b]
        x = jnp.where((lane & b) == 0, up, dn)
        b *= 2
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    b = 1
    while b < r:
        up = pltpu.roll(x, r - b, 0)
        dn = pltpu.roll(x, b, 0)
        x = jnp.where((row & b) == 0, up, dn)
        b *= 2
    return x


def shift_right_flat(x, d: int, fill=None):
    """Right-shift a row-major (R,128) tile by a static power-of-two d flat
    elements: out[i] = x[i-d]; positions i < d receive ``fill`` (default:
    wrapped garbage — callers mask).  Used by segmented scans."""
    r = x.shape[0]
    if d >= LANES:
        assert d % LANES == 0
        y = _roll(x, d // LANES, 0)
    else:
        lane = _lane_iota(x.shape)
        ys = _roll(x, d, 1)                # lane right-rotate by d
        xr1 = _roll(x, 1, 0)               # rows shifted down by one
        yb = _roll(xr1, d, 1)
        y = jnp.where(lane >= d, ys, yb)
    if fill is not None:
        y = jnp.where(flat_index(x.shape) < d, fill, y)
    return y


def shift_flat(x, s):
    """Left-shift a row-major (R,128) tile by s in [0,128) flat elements:
    out flat[i] = x flat[i + s]; the trailing s elements are garbage
    (callers mask them).  Used to align DMA'd 128-aligned windows to
    element-granular stream cursors."""
    r = x.shape[0]
    lane = _lane_iota(x.shape)
    sh = jnp.mod(LANES - s, LANES)
    ys = _roll(x, sh, 1)               # lane left-rotate by s
    xr1 = _roll(x, r - 1, 0)           # rows shifted up by one
    yb = _roll(xr1, sh, 1)
    return jnp.where(lane < LANES - s, ys, yb)
