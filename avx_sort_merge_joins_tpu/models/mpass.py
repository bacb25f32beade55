"""m-pass sort-merge join, single chip.

The TPU redesign of the reference's m-pass algorithm
(reference: src/joins/sortmergejoin_multipass.c): radix-partition → in-cache
sort → multi-pass pairwise merging → merge join.  On one chip the NUMA
partitioning phase has no analog (there is a single HBM domain), so the
pipeline is:

  phase "sort"  — Pallas block sort into alternating-direction runs
                  (= the reference's in-cache AVX sort of partitions),
  phase "merge" — log2(#runs) pairwise streaming merge passes
                  (= mpass_fullmultipassmerge_phase's log-halving loop,
                  sortmergejoin_multipass.c:621-708),
  phase "join"  — tag-merge rank-reduction match count
                  (= scalar merge_join, joincommon.c:239-312).

R is sorted ascending and S descending so the join-phase tag merges consume
an (asc, desc) bitonic pair directly.
"""

from __future__ import annotations

import functools

import jax

from ..types import JoinConfig, JoinResult, Relation
from ..ops import mergejoin, sort as sort_ops
from . import common


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _mpass_device(rk, rp, sk, sp, nR: int, nS: int, block_rows: int, tile_rows: int):
    rks, rps = sort_ops.sort(rk, rp, nR, block_rows, tile_rows)
    sks, sps = sort_ops.sort_descending(sk, sp, nS, block_rows, tile_rows)
    stats = mergejoin.merge_join_count(rks, sks, nR, nS, tile_rows)
    return rks, rps, sks, sps, stats


def sortmergejoin_multipass(R: Relation, S: Relation,
                            config: JoinConfig | None = None,
                            block_rows: int = sort_ops.BLOCK_ROWS_DEFAULT,
                            tile_rows: int = sort_ops.TILE_ROWS_DEFAULT) -> JoinResult:
    config = config or JoinConfig()
    nR, nS = R.num_tuples, S.num_tuples

    out = {}

    def pipeline(_):
        return _mpass_device(R.keys, R.payloads, S.keys, S.payloads,
                             nR, nS, block_rows, tile_rows)

    (rks, rps, sks, sps, stats), timings = common.run_phases({"sortmerge": pipeline})
    matches = mergejoin.finish_count(stats, tile_rows)
    return common.make_result(matches, nR, nS, timings)
