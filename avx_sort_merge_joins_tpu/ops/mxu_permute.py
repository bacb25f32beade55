"""MXU one-hot primitives: exact histograms and permutations as matmuls.

The TPU has no scatter and no per-lane stores, so the reference's
histogram/scatter partitioning idioms (reference:
src/partition/partition.c:93-219) need a different execution engine at
high fanout: the MXU.  A 0/1 one-hot matrix times a value vector IS a
gather/permutation, and summing one-hots IS a histogram — both run as
dense matmuls on the systolic array at rates the VPU cannot touch.

Exactness notes (all paths are bit-exact):

* histograms — 0/1 bf16 inputs are exact, MXU accumulates in f32, and
  per-call counts stay below 2^24 (callers chunk above that), so every
  count is an exact f32 integer.
* permutations of int32 — split each value into two 16-bit halves; a
  one-hot matmul moves each half exactly in f32 (magnitudes < 2^16), and
  the halves recombine to the original int32 (PLAN's "2x16-bit fp32-exact
  halves" trick).

The histogram uses a rank-2 decomposition of the bucket id
(``pid = hi*128 + lo``): counting (hi, lo) co-occurrence as Oh^T @ Ol
yields the FULL fanout-F histogram from two <=128-wide one-hots — F/128 x
128 compare-ops per tile instead of the F unrolled lane rotations that
made the Pallas roll-based kernel impossible past fanout 2^7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# per-call element cap that keeps f32 accumulation exact (< 2^24 counts)
_EXACT_CHUNK = 1 << 22


def _one_hot(x, width: int):
    """(n,) int32 in [0, width) -> (n, width) bf16 0/1."""
    return (x[:, None] == jnp.arange(width, dtype=jnp.int32)[None, :]
            ).astype(jnp.bfloat16)


def onehot_hist(pid, fanout: int):
    """Exact histogram of ``pid`` (any shape, values in [0, fanout)) via
    the rank-2 one-hot matmul.  Returns (fanout,) int32.

    For fanout <= 128 the hi plane is constant and the matmul degenerates
    to a column sum — still one MXU/VPU pass, no unrolling anywhere.
    """
    flat = pid.reshape(-1)
    n = flat.shape[0]
    h = max(1, fanout // 128)
    w = min(fanout, 128)
    assert h * w == fanout, "fanout must be a power of two"

    def chunk_hist(c):
        lo = c & jnp.int32(w - 1)
        ol = _one_hot(lo, w)
        if h == 1:
            # pads (value == fanout) wrap to lo == 0 when w == fanout; mask
            # them out so they are not miscounted into bucket 0
            ol = ol * (c < fanout)[:, None].astype(jnp.bfloat16)
            return jnp.sum(ol.astype(jnp.float32), axis=0).reshape(1, w)
        hi = c >> 7
        oh = _one_hot(hi, h)
        return jax.lax.dot_general(
            oh, ol, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if n <= _EXACT_CHUNK:
        acc = chunk_hist(flat).astype(jnp.int32)
    else:
        pad = (-n) % _EXACT_CHUNK
        flat = jnp.concatenate(
            [flat, jnp.full((pad,), fanout, jnp.int32)])  # never matches
        chunks = flat.reshape(-1, _EXACT_CHUNK)

        # the running accumulator must be int32: each CHUNK's f32 counts
        # are exact (< 2^22), but a bucket's running f32 SUM silently
        # loses integers past 2^24 (f32 ulp > 1) — summing in f32 gave
        # hist[7] = 2^24+20 instead of 2^24+21 on a constant stream
        def body(acc, c):
            return acc + chunk_hist(c).astype(jnp.int32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((h, w), jnp.int32), chunks)
    return acc.reshape(fanout)


def permute_lanes(x, idx):
    """Exact batched int32 gather y[r, j] = x[r, idx[r, j]] via one-hot
    matmuls — the MXU replacement for per-lane gathers (which Mosaic has
    no instruction for).  ``x``/``idx`` are (rows, L) with L <= 128.

    Used as the building block for tile-local reorderings (radix scatter
    within a lane group, transposes of irregular layouts).
    """
    rows, L = x.shape
    onehot = (idx[:, :, None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.bfloat16)
    # byte split keeps every bf16 input and f32 product/sum exact (bf16
    # holds integers <= 256 exactly; one-hot rows have a single 1)
    xu = x.astype(jnp.uint32)
    hh, hl = (xu >> 24) & 255, (xu >> 16) & 255
    lh, ll = (xu >> 8) & 255, xu & 255

    def mm(vals):
        return jax.lax.dot_general(
            onehot, vals.astype(jnp.bfloat16)[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0]

    yhh, yhl = mm(hh), mm(hl)
    ylh, yll = mm(lh), mm(ll)
    y = (yhh.astype(jnp.uint32) << 24) | (yhl.astype(jnp.uint32) << 16) | \
        (ylh.astype(jnp.uint32) << 8) | yll.astype(jnp.uint32)
    return y.astype(jnp.int32)
