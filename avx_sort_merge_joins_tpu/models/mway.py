"""m-way sort-merge join, single chip — the flagship algorithm.

The TPU redesign of the reference's m-way join
(reference: src/joins/sortmergejoin_multiway.c): radix-partition →
in-cache sort → ONE multi-way merge through a cache-resident FIFO tree →
merge join.  On TPU the phases map to:

  "sort"  — Pallas block sort of VMEM-resident blocks, all ascending
            (= the in-cache AVX sort of partitions, :388-460),
  "merge" — log_fanin(#blocks) passes of the VMEM FIFO-tree multiway merge
            kernel (= avx_multiway_merge over the shared L3 buffer,
            :463-556); with fanin ≥ #blocks this is ONE pass, which is
            what makes m-way bandwidth-optimal vs m-pass's log2 passes,
  "join"  — tag-merge rank-reduction match count (= scalar merge_join,
            joincommon.c:239-312) through the same 2-way kernel.

The reference's partitioning phase exists to split work across threads and
bound merge fan-in; on a single chip the block decomposition plays that
role, so no physical partition pass is needed (zero extra HBM traffic).
"""

from __future__ import annotations

import functools

import jax

from ..types import JoinConfig, JoinResult, Relation
from ..ops import mergejoin, multiwaymerge as mw, sort as sort_ops
from . import common

FANIN_DEFAULT = 16


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _mway_device(rk, rp, sk, sp, nR: int, nS: int, fanin: int,
                 block_rows: int, tile_rows: int):
    rks, rps = mw.multiway_sort(rk, rp, nR, block_rows, tile_rows, fanin,
                                return_2d=True)
    sks, sps = mw.multiway_sort(sk, sp, nS, block_rows, tile_rows, fanin,
                                return_2d=True)
    stats = mergejoin.merge_join_count_fused(rks, sks, nR, nS, tile_rows)
    return rks, rps, sks, sps, stats


def sortmergejoin_multiway(R: Relation, S: Relation,
                           config: JoinConfig | None = None,
                           fanin: int = FANIN_DEFAULT,
                           block_rows: int = sort_ops.BLOCK_ROWS_DEFAULT,
                           tile_rows: int = sort_ops.TILE_ROWS_DEFAULT
                           ) -> JoinResult:
    config = config or JoinConfig()
    nR, nS = R.num_tuples, S.num_tuples

    def pipeline(_):
        return _mway_device(R.keys, R.payloads, S.keys, S.payloads,
                            nR, nS, fanin, block_rows, tile_rows)

    (rks, rps, sks, sps, stats), timings = common.run_phases(
        {"sortmerge": pipeline})
    matches = mergejoin.finish_count_fused(stats)
    return common.make_result(matches, nR, nS, timings)
