"""Round-3: count-kernel A/B — flip_flat vs negated-S windows at 128M.

Both variants in one session (tunnel conditions shift absolute numbers
across sessions; only same-session A/Bs are comparable).
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
    key = jax.random.PRNGKey(3)
    rk = jax.random.randint(key, (n,), 1, n, dtype=jnp.int32)
    sk = jax.random.randint(jax.random.fold_in(key, 1), (n,), 1, n,
                            dtype=jnp.int32)
    sort = jax.jit(lambda a: mw.multiway_sort(a, None, n, 512, 256,
                                              fanin=16, return_2d=True)[0])
    rk2 = sort(rk)
    sk2 = sort(sk)          # ascending (flip variant input)
    skn2 = sort(-sk)        # negated-ascending (negate variant input)
    sync((rk2, sk2, skn2))

    for name, arr, neg in [("flip", sk2, False), ("negated", skn2, True)]:
        fn = jax.jit(lambda a, b, neg=neg: mergejoin.merge_join_count_fused(
            a, b, n, n, 128, s_negated=neg))
        stats = fn(rk2, arr)
        sync(stats)
        got = mergejoin.finish_count_fused(stats)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            sync(fn(rk2, arr))
            best = min(best, time.perf_counter() - t0)
        print(f"count[{name}] n={n}x{n}: {best*1e3:.1f} ms "
              f"({2*n/best/1e6:.0f} Melem/s) matches={got}", flush=True)


if __name__ == "__main__":
    main()
