"""Round-3: count-kernel V2 tile sweep (128 vs 256 rows) at 128M.

The old kernel measured tile 128 > 256 (PLAN round-2); V2 changed the
per-tile work (tagged merge + hierarchical segscan + 2T prefetch), so the
dispatch point is re-measured.  Same-session A/B on identical sorted
inputs (tunnel conditions shift absolute numbers across sessions).

Usage: python scripts/exp_count_tile.py [mtuples] [tile ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from avx_sort_merge_joins_tpu.ops import mergejoin, multiwaymerge as mw  # noqa: E402


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape"):
            float(jnp.sum(leaf.reshape(-1)[:1]))
    return x


def main():
    n = int(float(sys.argv[1]) * (1 << 20)) if len(sys.argv) > 1 \
        else 128 * (1 << 20)
    tiles = [int(t) for t in sys.argv[2:]] or [128, 256]
    key = jax.random.PRNGKey(3)
    rk = jax.random.randint(key, (n,), 1, n, dtype=jnp.int32)
    sk = jax.random.randint(jax.random.fold_in(key, 1), (n,), 1, n,
                            dtype=jnp.int32)
    sort = jax.jit(lambda a: mw.multiway_sort(a, None, n, 512, 256,
                                              fanin=16, return_2d=True)[0])
    rk2 = sort(rk)
    skn2 = sort(-sk)  # negated-ascending (the production layout)
    sync((rk2, skn2))

    expected = None
    for t in tiles:
        fn = jax.jit(lambda a, b, t=t: mergejoin.merge_join_count_fused(
            a, b, n, n, t, s_negated=True))
        t0 = time.perf_counter()
        stats = fn(rk2, skn2)
        sync(stats)
        warm = time.perf_counter() - t0
        got = mergejoin.finish_count_fused(stats)
        if expected is None:
            expected = got
        assert got == expected, (t, got, expected)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            sync(fn(rk2, skn2))
            best = min(best, time.perf_counter() - t0)
        print(f"count[tile={t}] n={n}x{n}: warm={warm:.1f}s "
              f"best={best*1e3:.1f} ms ({2*n/best/1e6:.0f} Melem/s) "
              f"matches={got}", flush=True)


if __name__ == "__main__":
    main()
