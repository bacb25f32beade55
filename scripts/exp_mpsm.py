"""Round-3: mpsm perf characterization (single-chip nchunks sweep).

mpsm sorts only LOCAL S chunks and scans ALL of them during the join
(Albutiu et al.; the reference stubs the algorithm, so these rows are the
only quantitative record of the trade): more chunks = cheaper sort
(fewer/smaller merge levels for S) but nchunks fused count passes.

Usage: python scripts/exp_mpsm.py [mtuples] [nchunks ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from avx_sort_merge_joins_tpu.models import mpsm  # noqa: E402
from avx_sort_merge_joins_tpu.types import Relation  # noqa: E402


def main():
    n = int(float(sys.argv[1]) * (1 << 20)) if len(sys.argv) > 1 \
        else 16 * (1 << 20)
    chunks = [int(c) for c in sys.argv[2:]] or [1, 2, 4, 8]
    rk = jnp.arange(1, n + 1, dtype=jnp.int32)
    sk = jax.random.randint(jax.random.PRNGKey(9), (n,), 1, n + 1,
                            dtype=jnp.int32)
    R = Relation(rk, jnp.zeros_like(rk), n)
    S = Relation(sk, jnp.zeros_like(sk), n)
    for nc in chunks:
        t0 = time.perf_counter()
        res = mpsm.sortmergejoin_mpsm(R, S, nchunks=nc)
        warm = time.perf_counter() - t0
        assert res.totalresults == n, (nc, res.totalresults)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = mpsm.sortmergejoin_mpsm(R, S, nchunks=nc)
            best = min(best, time.perf_counter() - t0)
        print(f"mpsm n={n} nchunks={nc} warm={warm:.1f}s "
              f"best={best*1e3:.0f} ms {2*n/best/1e6:.1f} Mt/s "
              f"phases={ {k: round(v,3) for k,v in r.phases.items()} }",
              flush=True)


if __name__ == "__main__":
    main()
