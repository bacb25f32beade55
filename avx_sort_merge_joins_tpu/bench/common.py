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


def time_best(fn, *args, reps: int = 3) -> float:
    """Best-of-reps wall seconds with a warmup (compile) call."""
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def check_sorted(keys: np.ndarray) -> bool:
    return bool(np.all(keys[1:] >= keys[:-1]))


def gen_keys(n: int, seed: int = 12345) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**30), 2**30, n).astype(np.int32)
