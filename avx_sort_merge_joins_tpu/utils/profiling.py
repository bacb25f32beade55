"""Observability — phase timing, bytes-moved accounting, rooflines.

The TPU analog of the reference's two profiling mechanisms
(reference: src/util/rdtsc.h cycle timers around each join phase printed by
joincommon.c:175-196, and the Intel PCM hardware-counter wrapper
src/util/perf_counters.c bracketed around phases when
--enable-perfcounters).  On TPU:

* wall/phase timing — ``PhaseTimer`` (device-synced via a scalar transfer,
  reliable through the axon tunnel where block_until_ready is not),
* hardware counters — ``jax.profiler`` traces (use :func:`trace` as a
  context manager and inspect with TensorBoard/xprof),
* rooflines — the reference measures merge vs memcpy and partition vs
  histogram+memcpy speed-of-light baselines
  (multiwaymergebench.c:178-221, partition.c:387-436); here
  :func:`measure_copy_bandwidth` measures the achievable HBM r+w
  bandwidth and :class:`BytesMoved` turns per-phase byte counts into
  %-of-roofline reports.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def sync(x):
    """Force device completion; returns its argument.  A scalar transfer is
    used instead of block_until_ready (unreliable through the axon TPU
    tunnel)."""
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape"):
            float(jnp.sum(leaf.reshape(-1)[:1]))
    return x


class PhaseTimer:
    """Named phase stopwatch — the rdtsc startTimer/stopTimer analog
    (rdtsc.h:35-57), accumulating seconds per phase like arg_t's
    part/sort/merge/join cycle fields (joincommon.h:106-148)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def phase(self, name: str, result_holder=None):
        t0 = time.perf_counter()
        yield
        self.phases[name] = self.phases.get(name, 0.0) + \
            (time.perf_counter() - t0)

    def report(self, ntuples: int) -> str:
        """Formatted like the reference's stderr stats block
        (joincommon.c:176-196, 214-227)."""
        total = self.phases.get("total", sum(self.phases.values()))
        lines = [f"[STATS] {k:14s} {v*1e6:14.1f} usecs"
                 for k, v in self.phases.items()]
        if total > 0:
            lines.append(f"[STATS] NUMTUPLES {ntuples}, TOTAL-TIME-USECS "
                         f"{total*1e6:.1f}, TUPLES-PER-SECOND "
                         f"{ntuples/total:.0f}")
        return "\n".join(lines)


@dataclasses.dataclass
class BytesMoved:
    """Per-phase HBM traffic accounting for roofline reports — the analog of
    the reference's speed-of-light comparisons against memcpy
    (multiwaymergebench.c:178-221)."""

    phases: Dict[str, int] = dataclasses.field(default_factory=dict)

    def add(self, phase: str, nbytes: int) -> None:
        self.phases[phase] = self.phases.get(phase, 0) + nbytes

    @staticmethod
    def sort_bytes(n: int, passes: int, keys_only: bool = False) -> int:
        """r+w bytes of a block-sort + `passes` merge passes over n tuples."""
        width = 4 if keys_only else 8
        return (passes + 1) * n * width * 2

    def roofline_report(self, timings: Dict[str, float],
                        bandwidth_gbps: float) -> str:
        lines = []
        for phase, nbytes in self.phases.items():
            secs = timings.get(phase)
            if not secs:
                continue
            gbps = nbytes / secs / 1e9
            lines.append(f"[ROOFLINE] {phase:14s} {gbps:8.1f} GB/s "
                         f"({100 * gbps / bandwidth_gbps:5.1f}% of "
                         f"{bandwidth_gbps:.0f} GB/s)")
        return "\n".join(lines)


def measure_copy_bandwidth(nbytes: int = 1 << 30, reps: int = 3) -> float:
    """Achievable HBM r+w bandwidth in GB/s via a chained elementwise pass —
    the memcpy speed-of-light baseline (partition.c:387-436's
    histogram_memcpy_bench analog).  Uses 10 chained adds per dispatch so
    the tunnel's per-dispatch latency amortizes away."""
    x = jnp.zeros((nbytes // 4,), jnp.int32)

    @jax.jit
    def chain(a):
        for _ in range(10):
            a = a + 1
        return a

    sync(chain(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(chain(x))
        best = min(best, time.perf_counter() - t0)
    return 10 * 2 * nbytes / best / 1e9


# Measured HBM copy roofline of the bench TPU (v5e via axon), overridable
# for other parts: the denominator of every %-of-roofline report.
import os

HBM_GBPS = float(os.environ.get("SMJ_HBM_GBPS", "567"))

# canonical phase order of the reference's record format
# (scripts/tput-scalability.sh:28: PARTCYC SORTCYC MERGE1CYC MERGERESTCYC
# MJOINCYC NUMTUP USECS TPUT) — we report microseconds where the reference
# reports cycles; column structure is identical so grid outputs diff
# row-for-row.
RECORD_PHASES = ("part", "sort", "merge1", "mergerest", "mergejoin")


def record_line(algo: str, nthreads: int, n_r: int, n_s: int, run_no: int,
                phases: Dict[str, float]) -> str:
    """One grid-record row in the reference scripts' column layout."""
    ntuples = n_r + n_s
    total = phases.get("total", sum(
        v for k, v in phases.items() if k != "total"))

    def us(k):
        return phases.get(k, 0.0) * 1e6

    cols = " ".join(f"{us(k):.0f}" for k in RECORD_PHASES)
    tput = ntuples / total if total > 0 else 0.0
    return (f"[RECORD] {algo} {nthreads} {n_r} {n_s} {run_no} {cols} "
            f"{ntuples} {total * 1e6:.0f} {tput:.0f}")


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context — the PCM_start/stop analog
    (perf_counters.h:51-103); inspect with TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
