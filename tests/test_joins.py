"""End-to-end join tests on reference workloads — validated by the
`Results = |S|` invariant of the default pk-fk workloads (reference:
README:246-258) and by the NumPy oracle for skewed/nonunique ones."""

import numpy as np
import pytest

from avx_sort_merge_joins_tpu.datagen import (
    create_relation_fk,
    create_relation_nonunique,
    create_relation_zipf,
    parallel_create_relation,
    seed_generator,
)
from avx_sort_merge_joins_tpu.models.mpass import sortmergejoin_multipass
from avx_sort_merge_joins_tpu.ops import mergejoin as MJ


def test_mpass_pk_fk_equal_sizes():
    seed_generator(42)
    R = parallel_create_relation(16384, 16384, 2)
    S = create_relation_fk(16384, 16384)
    res = sortmergejoin_multipass(R, S, block_rows=8, tile_rows=8)
    assert res.totalresults == 16384


def test_mpass_pk_fk_larger_s():
    seed_generator(7)
    R = parallel_create_relation(6000, 6000, 4)
    S = create_relation_fk(20000, 6000)
    res = sortmergejoin_multipass(R, S, block_rows=8, tile_rows=8)
    assert res.totalresults == 20000


def test_mpass_zipf_skew():
    seed_generator(9)
    R = parallel_create_relation(5000, 5000, 1)
    S = create_relation_zipf(12000, 5000, 0.75)
    res = sortmergejoin_multipass(R, S, block_rows=8, tile_rows=8)
    # R is a full permutation of 1..5000 and zipf keys are in [1,5000]
    assert res.totalresults == 12000


def test_mpass_nonunique_oracle():
    seed_generator(11)
    R = create_relation_nonunique(8000, 2000)
    S = create_relation_nonunique(12000, 2000)
    res = sortmergejoin_multipass(R, S, block_rows=8, tile_rows=8)
    rk, _ = R.to_numpy()
    sk, _ = S.to_numpy()
    assert res.totalresults == MJ.merge_join_count_numpy(rk, sk)


def test_mpass_phase_stats_present():
    seed_generator(1)
    R = parallel_create_relation(4096, 4096, 1)
    S = create_relation_fk(4096, 4096)
    res = sortmergejoin_multipass(R, S, block_rows=8, tile_rows=8)
    assert "total" in res.phases and res.throughput > 0
