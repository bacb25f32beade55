"""2-way merge façade — the analog of the reference's merge operator API
(reference: src/merge/merge.c avx_merge_tuples/avx_merge_int64 +
scalar_merge_* dispatch; note its eqlen fast path is permanently disabled
upstream due to a known overwrite bug, merge.c:123-128).

On TPU there is no aligned/unaligned dichotomy (tiles are always aligned),
so a single kernel path serves both; the "scalar" variants map to
jax.lax.sort of the concatenation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import multiwaymerge as mw, sort as sort_ops
from .bitonic import KEY_POS_INF, LANES


def merge_tuples(ka, pa, kb, pb, na: int | None = None,
                 nb: int | None = None,
                 tile_rows: int = sort_ops.TILE_ROWS_DEFAULT):
    """Merge two sorted (keys, payloads) columns into one sorted pair —
    avx_merge_tuples (merge.h:38-50).  ``pa``/``pb`` may be None for
    keys-only merging (avx_merge_int64's closest analog)."""
    na = int(ka.shape[0]) if na is None else na
    nb = int(kb.shape[0]) if nb is None else nb
    keys_only = pa is None
    kf, pf, stride = sort_ops.two_run_layout(
        ka, kb, na, nb, tile_rows, rounded_stride=True, pa=pa, pb=pb,
        payload_fill=KEY_POS_INF)
    ok, op, _ = mw.multiway_merge(kf, pf, [na, nb], stride, 2, tile_rows)
    n = na + nb
    if keys_only:
        return ok.reshape(-1)[:n], None
    return ok.reshape(-1)[:n], op.reshape(-1)[:n]


def scalar_merge_tuples(ka, pa, kb, pb, na: int | None = None,
                        nb: int | None = None):
    """XLA baseline merge — scalar_merge_tuples (merge.h:66-78)."""
    na = int(ka.shape[0]) if na is None else na
    nb = int(kb.shape[0]) if nb is None else nb
    k = jnp.concatenate([ka[:na], kb[:nb]])
    p = jnp.concatenate([pa[:na], pb[:nb]])
    return jax.lax.sort((k, p), num_keys=2)


def merge_numpy(ka, pa, kb, pb):
    """NumPy oracle (the qsort-validated expectation of check_merge.c)."""
    k = np.concatenate([ka, kb])
    p = np.concatenate([pa, pb])
    order = np.lexsort((p, k))
    return k[order], p[order]
