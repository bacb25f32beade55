"""Round-3 E1: block_rows sweep of the keys-only multiway sort at 128M.

Hypothesis: block_rows=4096 (512K tuples/block) gives 256 runs at 128M
-> TWO fanin-16 merge levels instead of three (block 512 -> 2048 runs ->
3 levels), trading ~40% more block-sort substages for a whole tree pass.

On-device key generation (host link is ~12 MB/s); dispatch amortized by
timing the jitted composition with the scalar-transfer sync.

Usage: python scripts/exp_blocksweep.py [n_mtuples] [block_rows ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from avx_sort_merge_joins_tpu.ops import multiwaymerge as mw  # noqa: E402


def gen(n, seed=7):
    k = jax.random.randint(jax.random.PRNGKey(seed), (n,), -(2**30), 2**30,
                           dtype=jnp.int32)
    return k


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape"):
            float(jnp.sum(leaf.reshape(-1)[:1]))
    return x


def main():
    n = int(float(sys.argv[1]) * (1 << 20)) if len(sys.argv) > 1 \
        else 128 * (1 << 20)
    blocks = [int(b) for b in sys.argv[2:]] or [512, 1024, 2048, 4096]
    kd = gen(n)
    sync(kd)
    for br in blocks:
        tile = 256
        levels = mw.merge_levels(n, br, 16)
        print(f"block_rows={br} levels={[(lv[2], lv[3]) for lv in levels]}",
              flush=True)
        fn = jax.jit(lambda a, br=br: mw.multiway_sort(
            a, None, n, br, tile, fanin=16)[0])
        t0 = time.perf_counter()
        out = fn(kd)
        sync(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(kd))
            best = min(best, time.perf_counter() - t0)
        # sortedness check on device (cheap reductions, no host pull)
        flat = out
        bad = int(jnp.sum((flat[1:] < flat[:-1]).astype(jnp.int32)))
        print(f"block_rows={br} n={n} {best*1e3:.1f} ms "
              f"{n/best/1e6:.1f} Mk/s compile={compile_s:.0f}s "
              f"inversions={bad}", flush=True)


if __name__ == "__main__":
    main()
