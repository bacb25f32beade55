"""Remote-DMA FIFO-leaf scaffold: schedule/layout unit tests (the
interpret-testable half; the DMA kernel itself is dark — see the module
docstring's TEST PLAN for the >1-chip validation sequence)."""

import numpy as np
import pytest

from avx_sort_merge_joins_tpu.parallel import remote_fifo as rf


def test_push_schedule_chunk_major_and_complete():
    lens = [100, 0, 250, 64]
    plan = rf.push_schedule(4, me=1, bucket_lens=lens, chunk_elems=64)
    # every byte of every bucket is pushed exactly once
    seen = {d: [] for d in range(4)}
    for p in plan:
        seen[p.dst].append((p.start, p.size))
    for d, ln in enumerate(lens):
        spans = sorted(seen[d])
        total = sum(s for _, s in spans)
        assert total == ln, d
        pos = 0
        for st, sz in spans:
            assert st == pos
            pos += sz
    # chunk-major: all chunk-0 pushes precede any chunk-1 push
    rounds = [p.round for p in plan]
    assert rounds == sorted(rounds)
    first_c1 = next(i for i, p in enumerate(plan) if p.chunk == 1)
    assert all(p.chunk == 0 for p in plan[:first_c1])


def test_push_schedule_respects_order():
    order = [2, 0, 3, 1]
    plan = rf.push_schedule(4, me=0, bucket_lens=[64] * 4, chunk_elems=64)
    plan_o = rf.push_schedule(4, me=0, bucket_lens=[64] * 4,
                              chunk_elems=64, order=order)
    assert [p.dst for p in plan] == [0, 1, 2, 3]
    assert [p.dst for p in plan_o] == [2, 0, 3, 1]


def test_landing_layout_matches_bulk_exchange():
    strip, nch = rf.landing_layout(8, cap=1024, chunk_elems=256)
    assert strip == 1024 and nch == 4
    with pytest.raises(AssertionError):
        rf.landing_layout(8, cap=1000, chunk_elems=256)


def test_leaf_wait_chunks_monotone_and_sufficient():
    chunk, win = 4096, 16384 + 128  # window spans multiple chunks
    waits = rf.expected_sem_waits(10, win, chunk)
    assert waits == sorted(waits)
    for w, c in enumerate(waits):
        last_elem = w * win + win - 1
        assert c * chunk + chunk > last_elem  # waited chunk covers window
        assert (c - 1) * chunk + chunk <= last_elem + chunk  # not wasteful


def test_remote_dma_dark_by_default(monkeypatch):
    monkeypatch.delenv("SMJ_REMOTE_DMA", raising=False)
    assert not rf.remote_dma_enabled()
    monkeypatch.setenv("SMJ_REMOTE_DMA", "1")
    assert rf.remote_dma_enabled()
