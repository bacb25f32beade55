"""Shared join runner — the analog of the reference's joincommon layer
(reference: src/joins/joincommon.c): phase orchestration, timing stats and
result assembly.  Thread spawning/pinning/barriers are replaced by jit
program boundaries (single chip) or shard_map meshes (multi chip, see
avx_sort_merge_joins_tpu.parallel)."""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..types import JoinResult


def _sync(x):
    """Force device completion (block_until_ready is unreliable through the
    axon tunnel; a scalar transfer is not)."""
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            float(jnp.sum(leaf.reshape(-1)[:1]))
    return x


def run_phases(phases: Dict[str, Callable], sync: bool = True):
    """Run named phase thunks, timing each (the analog of the per-phase
    cycle stats printed by joincommon.c:175-196).  Each thunk receives the
    previous thunk's result."""
    timings = {}
    result = None
    t_total = time.perf_counter()
    for name, fn in phases.items():
        t0 = time.perf_counter()
        result = fn(result)
        if sync:
            _sync(result)
        timings[name] = time.perf_counter() - t0
    timings["total"] = time.perf_counter() - t_total
    return result, timings


def make_result(matches: int, nR: int, nS: int, timings: Dict[str, float]) -> JoinResult:
    total = timings.get("total", sum(v for k, v in timings.items() if k != "total"))
    tput = (nR + nS) / total if total > 0 else 0.0
    return JoinResult(
        totalresults=int(matches),
        resultlist=[],
        phases=timings,
        throughput=tput,
    )
