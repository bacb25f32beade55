"""mpsm join (Albutiu et al., PVLDB'12 — "Massively Parallel Sort-Merge
joins in main memory multi-core database systems").

The reference registers mpsm but ships only a stub that warns and exits
(reference: src/joins/sortmergejoin_mpsm.c:38-45); the BASELINE configs
require a real implementation, so this one follows the paper's structure
as the reference's experiment scripts exercise it:

  * R is globally range-partitioned (on TPU: histogram-derived equi-depth
    splitters so Zipf skew balances; cross-chip form uses the all_to_all
    exchange) and each worker fully sorts its owned R range.
  * S is only sorted LOCALLY per worker — never repartitioned (MPSM's
    defining trade: no S shuffle, at the price of every R range scanning
    all S runs).
  * Join: each worker merge-joins its sorted R range against every
    worker's sorted S run.

Single-chip realization: "workers" degenerate to ``nchunks`` independent
S chunks; R is sorted once; the join phase runs one tag-merge count of R
against each sorted S chunk and sums the counts — R is re-read per chunk,
which is exactly MPSM's scan-all-S-runs cost shape.
"""

from __future__ import annotations

import functools

import jax

from ..types import JoinConfig, JoinResult, Relation
from ..ops import mergejoin, multiwaymerge as mw, sort as sort_ops
from . import common

NCHUNKS_DEFAULT = 4


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _mpsm_sort(rk, sk, nR: int, nS: int, nchunks: int, fanin: int,
               block_rows: int, tile_rows: int):
    """Phase 1+2: sort R fully, sort each S chunk locally (S runs are never
    merged globally — MPSM's defining trade)."""
    rks, _ = mw.multiway_sort(rk, None, nR, block_rows, tile_rows, fanin,
                              return_2d=True)
    chunk = -(-nS // nchunks)
    schunks = []
    for c in range(nchunks):
        lo = c * chunk
        ln = min(chunk, nS - lo)
        if ln <= 0:
            break
        sks, _ = mw.multiway_sort(sk[lo:lo + ln], None, ln,
                                  block_rows, tile_rows, fanin,
                                  return_2d=True)
        schunks.append(sks)
    return rks, schunks


def sortmergejoin_mpsm(R: Relation, S: Relation,
                       config: JoinConfig | None = None,
                       nchunks: int = NCHUNKS_DEFAULT,
                       fanin: int = 16,
                       block_rows: int = sort_ops.BLOCK_ROWS_DEFAULT,
                       tile_rows: int = sort_ops.TILE_ROWS_DEFAULT
                       ) -> JoinResult:
    config = config or JoinConfig()
    nR, nS = R.num_tuples, S.num_tuples
    chunk = -(-nS // nchunks)

    def sort_phase(_):
        return _mpsm_sort(R.keys, S.keys,
                          nR, nS, nchunks, fanin, block_rows, tile_rows)

    @functools.partial(jax.jit, static_argnums=(2,))
    def count1(rks, sks, ln):
        return mergejoin.merge_join_count_fused(rks, sks, nR, ln, tile_rows)

    def join_phase(st):
        rks, schunks = st
        stats = []
        for c, sks in enumerate(schunks):
            ln = min(chunk, nS - c * chunk)
            stats.append(count1(rks, sks, ln))
        return stats

    stats_list, timings = common.run_phases({"sort": sort_phase,
                                             "mergejoin": join_phase})
    try:
        matches = sum(mergejoin.finish_count_fused(s) for s in stats_list)
    except mergejoin.CountLimbOverflow:
        import numpy as np
        from ..utils.log import warn
        warn("count-kernel limb overflow; recounting through the exact "
             "wide path")
        matches = mergejoin.merge_join_count_numpy(
            np.asarray(R.keys[:nR]), np.asarray(S.keys[:nS]))
    result = common.make_result(matches, nR, nS, timings)
    levels = len(mw.merge_levels(nR, block_rows, fanin)) + 1
    levels_s = len(mw.merge_levels(chunk, block_rows, fanin)) + 1
    nchunks_live = min(nchunks, -(-nS // max(1, chunk)))
    result.bytes_moved = {
        "sort": 2 * 4 * (nR * levels + nS * levels_s),
        # every S chunk join re-reads all of R (the scan-all-runs shape)
        "mergejoin": 4 * (nR * nchunks_live + nS),
    }
    return result
