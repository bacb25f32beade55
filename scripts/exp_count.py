"""Round-3 E3: fused count-kernel timing at 128M x 128M (keys-only m-way).

Measures the count phase alone (inputs pre-sorted on device) so the A/B
against PLAN's recorded 92 ms baseline is direct.
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
    t0 = time.perf_counter()
    rk2 = sort(rk)
    sk2 = sort(sk)
    sync((rk2, sk2))
    print(f"sort both: {time.perf_counter()-t0:.1f}s", flush=True)

    count = jax.jit(lambda a, b: mergejoin.merge_join_count_fused(
        a, b, n, n, 128))
    t0 = time.perf_counter()
    stats = count(rk2, sk2)
    sync(stats)
    print(f"count compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    got = mergejoin.finish_count_fused(stats)

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sync(count(rk2, sk2))
        best = min(best, time.perf_counter() - t0)
    print(f"count kernel n={n}x{n}: {best*1e3:.1f} ms "
          f"({2*n/best/1e6:.0f} Melem/s) matches={got}", flush=True)

    # exactness spot check vs the XLA oracle at a smaller size
    m = 1 << 20
    rs = jax.lax.sort((rk[:m],), num_keys=1)[0]
    ss = jax.lax.sort((sk[:m],), num_keys=1)[0]
    exp = int(mergejoin.merge_join_count_xla(rs, ss, m, m))
    rk2s = sort_small(rs, m)
    sk2s = sort_small(ss, m)
    stats = mergejoin.merge_join_count_fused(rk2s, sk2s, m, m, 128)
    got_s = mergejoin.finish_count_fused(stats)
    print(f"small exactness: got={got_s} exp={exp} "
          f"{'OK' if got_s == exp else 'MISMATCH'}", flush=True)


def sort_small(sorted_keys, m):
    from avx_sort_merge_joins_tpu.ops import sort as so
    from avx_sort_merge_joins_tpu.ops.bitonic import KEY_POS_INF, LANES
    rows = so.padded_rows(m, 512, 256)
    kf = jnp.full((rows * LANES,), KEY_POS_INF, jnp.int32)
    return kf.at[:m].set(sorted_keys).reshape(rows, LANES)


if __name__ == "__main__":
    main()
