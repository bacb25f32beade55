"""avx_sort_merge_joins_tpu — a TPU-native vectorized sort-merge-join engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the ETH
multi-core sort-merge-joins codebase (PVLDB'13 "Multi-Core, Main-Memory
Joins: Sort vs. Hash Revisited"): sorting networks, k-way multiway merge,
radix partitioning, and the m-pass / m-way / mpsm parallel sort-merge joins —
over HBM-resident columnar relations, scaled across TPU pod slices with
jax.sharding meshes instead of NUMA-pinned threads.
"""

import importlib

from .types import JoinConfig, JoinResult, Relation  # noqa: F401

__version__ = "0.1.0"

_SUBMODULES = ("datagen", "ops", "models", "parallel", "utils", "bench")


def __getattr__(name):
    """Lazy submodule access (``smj.datagen``, ``smj.models.mway`` …) without
    importing jax-heavy modules at package import time."""
    if name in _SUBMODULES:
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
