"""Test configuration: run everything on a simulated 8-device CPU mesh.

Real-TPU runs happen through bench.py; unit tests validate kernel and join
semantics on the CPU backend (with 8 virtual devices for the multi-chip
paths), mirroring the reference's `make check` property-test strategy
(reference: tests/Makefile.am, tests/check_*.c).
"""

import os

# sitecustomize imports jax and pins the axon TPU backend before any env var
# we set here could matter, so force the platform via the config API.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # seeded but logged, like the reference's seeded property tests
    seed = int(os.environ.get("SMJ_TEST_SEED", np.random.randint(0, 2**31 - 1)))
    print(f"[test rng seed = {seed}]")
    return np.random.default_rng(seed)
