"""Observability utilities (the rdtsc/PCM analogs)."""

import numpy as np

from avx_sort_merge_joins_tpu.utils import profiling


def test_phase_timer_report():
    t = profiling.PhaseTimer()
    with t.phase("sort"):
        sum(range(1000))
    with t.phase("join"):
        sum(range(1000))
    rep = t.report(ntuples=1000)
    assert "sort" in rep and "join" in rep
    assert "TUPLES-PER-SECOND" in rep


def test_bytes_moved_roofline():
    bm = profiling.BytesMoved()
    bm.add("sort", profiling.BytesMoved.sort_bytes(1 << 20, passes=3,
                                                   keys_only=True))
    rep = bm.roofline_report({"sort": 0.001}, bandwidth_gbps=567.0)
    assert "ROOFLINE" in rep and "sort" in rep


def test_sync_returns_value():
    import jax.numpy as jnp

    x = jnp.arange(8)
    assert profiling.sync(x) is x
