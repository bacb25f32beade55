"""Round-3 E7: largest-fitting single-chip exact join point past 400M.

Workload-B semantics at scale without host arrays: R = the sorted unique
keys 1..n (comparison networks are data-independent, so pre-sorted input
does not change sort cost), S = uniform fk — count must equal |S|.

Usage: python scripts/exp_scale.py <mtuples> [mtuples ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from avx_sort_merge_joins_tpu.models import mway  # noqa: E402
from avx_sort_merge_joins_tpu.ops import mergejoin  # noqa: E402


def sync(x):
    float(jnp.sum(x.reshape(-1)[:1]))
    return x


def main():
    sizes = [int(float(a) * 1_000_000) for a in sys.argv[1:]] or \
        [500_000_001]
    for n in sizes:
        try:
            rk = jnp.arange(1, n + 1, dtype=jnp.int32)
            sk = jax.random.randint(jax.random.PRNGKey(5), (n,), 1, n + 1,
                                    dtype=jnp.int32)
            t0 = time.perf_counter()
            stats = mway._mway_count_device(
                rk, sk, n, n, mway.FANIN_DEFAULT, mway.BLOCK_ROWS_MWAY,
                mway.TILE_ROWS_MWAY)
            sync(stats)
            warm = time.perf_counter() - t0
            cnt = mergejoin.finish_count_fused(stats)
            ok = cnt == n
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                sync(mway._mway_count_device(
                    rk, sk, n, n, mway.FANIN_DEFAULT, mway.BLOCK_ROWS_MWAY,
                    mway.TILE_ROWS_MWAY))
                best = min(best, time.perf_counter() - t0)
            print(f"n={n} count={cnt} exact={ok} warm={warm:.1f}s "
                  f"best={best*1e3:.0f} ms {2*n/best/1e6:.1f} Mt/s",
                  flush=True)
        except Exception as e:
            print(f"n={n} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
