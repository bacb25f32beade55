"""Shared bench harness utilities."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape"):
            float(jnp.sum(leaf.reshape(-1)[:1]))
    return x


def time_best(fn, *args, reps: int = 3, burn: int = 2) -> float:
    """Steady-state seconds/rep: one warmup (compile) call, ``burn``
    untimed steady-state reps (the first timed dispatch of a session
    reads up to ~1.7× high even after the warmup — the r4 measurement
    lesson, PLAN.md), then ``reps`` queued asynchronously and synced
    ONCE, so the ~30 ms axon dispatch+sync round-trip amortizes across
    reps instead of taxing each one (bench.py's discipline; the old
    per-rep-sync best-of-N overstated sub-100 ms benches by the tunnel
    latency)."""
    sync(fn(*args))
    out = None
    for _ in range(burn):
        out = fn(*args)
    if burn:
        sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def check_sorted(keys: np.ndarray) -> bool:
    return bool(np.all(keys[1:] >= keys[:-1]))


def gen_keys(n: int, seed: int = 12345) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**30), 2**30, n).astype(np.int32)
