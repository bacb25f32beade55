"""Probe: why is mpsm's join phase ~200x the count kernel's cost?

Times the exact count1 call mpsm makes (same layouts: block 128 sort,
tile 128 count) in isolation, then the mpsm join phase pieces.
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


def main():
    n = 16 * (1 << 20)
    rk = jnp.arange(1, n + 1, dtype=jnp.int32)
    sk = jax.random.randint(jax.random.PRNGKey(9), (n,), 1, n + 1,
                            dtype=jnp.int32)
    sort = jax.jit(lambda a, ln: mw.multiway_sort(
        a, None, ln, 128, 128, fanin=16, return_2d=True)[0],
        static_argnums=1)
    rks = sort(rk, n)
    sks = sort(sk, n)
    sync((rks, sks))
    print(f"layouts: r={rks.shape} s={sks.shape}", flush=True)
    cnt = jax.jit(lambda a, b: mergejoin.merge_join_count_fused(
        a, b, n, n, 128))
    sync(cnt(rks, sks))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(cnt(rks, sks))
        best = min(best, time.perf_counter() - t0)
    print(f"count1 16Mx16M (mpsm layouts): {best*1e3:.1f} ms", flush=True)

    # same with the tuned block-512/tile-256 layouts for contrast
    sort2 = jax.jit(lambda a: mw.multiway_sort(
        a, None, n, 512, 256, fanin=16, return_2d=True)[0])
    rks2, sks2 = sort2(rk), sort2(sk)
    sync((rks2, sks2))
    cnt2 = jax.jit(lambda a, b: mergejoin.merge_join_count_fused(
        a, b, n, n, 128))
    sync(cnt2(rks2, sks2))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(cnt2(rks2, sks2))
        best = min(best, time.perf_counter() - t0)
    print(f"count1 16Mx16M (tuned layouts): {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
