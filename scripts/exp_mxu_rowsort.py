"""Round-3 E2: MXU-assisted block sort — measure or kill (VERDICT r2 #2).

The only place an exact MXU permutation (ops/mxu_permute.permute_lanes)
can act inside the block sort is WITHIN a 128-lane row: cross-row
movement would need the global gather/scatter Mosaic lacks (the measured
round-2 dead end: XLA scatter = 998 ms/pass at 128M).  So the candidate
is a ROW SORT that replaces the lane-distance bitonic stages
(28 of the 136 block-sort substages at block 512 = 20% of the block
phase = ~5% of total sort — the structural ceiling):

  A. bitonic lane-stage row sort: 28 compare-exchange substages built
     from lane rotations (the production kernel's first stages),
  B. MXU rank-and-permute: per row, rank[i] = #{j: (k_j, j) <lex
     (k_i, i)} via 127 rotated compares, then apply the permutation as
     byte-split one-hot matmuls (exact int32; the systolic array does
     the movement).

Both run as jitted XLA-TPU functions on identical data so the comparison
isolates the algorithmic cost (the roll/compare primitives and the MXU
are the same units Mosaic uses).

Usage: python scripts/exp_mxu_rowsort.py [mtuples]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

L = 128


def sync(x):
    float(jnp.sum(x.reshape(-1)[:1]))
    return x


def rowsort_bitonic(k):
    """Per-row ascending bitonic sort: lane-distance stages only."""
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    for kk in range(1, 8):
        asc = ((lane >> kk) & 1) == 0
        d = 1 << (kk - 1)
        while d >= 1:
            lo = (lane & d) == 0
            kv = jnp.where(lo, jnp.roll(k, -d, 1), jnp.roll(k, d, 1))
            want_min = jnp.logical_not(jnp.logical_xor(lo, asc))
            k = jnp.where(want_min, jnp.minimum(k, kv),
                          jnp.maximum(k, kv))
            d //= 2
    return k


def rowsort_mxu(k):
    """Per-row rank via 127 rotated lex compares + one-hot MXU apply."""
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    rank = jnp.zeros_like(k)
    for s in range(1, L):
        kv = jnp.roll(k, s, 1)
        lv = (lane - s) & (L - 1)
        less = (kv < k) | ((kv == k) & (lv < lane))
        rank = rank + less.astype(jnp.int32)
    # scatter-apply y[rank[i]] = k[i] as byte-split one-hot matmuls
    onehot = (rank[:, :, None] ==
              jnp.arange(L, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.bfloat16)
    ku = k.astype(jnp.uint32)
    parts = []
    for shift in (24, 16, 8, 0):
        v = ((ku >> shift) & 255).astype(jnp.bfloat16)
        y = jax.lax.dot_general(onehot, v[:, :, None],
                                (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)[:, :, 0]
        parts.append(y.astype(jnp.uint32) << shift)
    return (parts[0] | parts[1] | parts[2] | parts[3]).astype(jnp.int32)


def rowsort_mxu_chunked(k):
    """128M-capable variant: the (rows,128,128) one-hot is 2 B/entry so
    rows are processed in 64K-row chunks (4.3 GB transient) via lax.map."""
    chunks = k.reshape(-1, 1 << 16, L)
    return jax.lax.map(rowsort_mxu, chunks).reshape(k.shape)


def main():
    n = int(float(sys.argv[1]) * (1 << 20)) if len(sys.argv) > 1 \
        else 16 * (1 << 20)
    rows = n // L
    k = jax.random.randint(jax.random.PRNGKey(2), (rows, L), -(2**30),
                           2**30, dtype=jnp.int32)
    exp = None
    mxu = rowsort_mxu if rows <= (1 << 18) else rowsort_mxu_chunked
    for name, fn in [("bitonic", rowsort_bitonic), ("mxu", mxu)]:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = sync(f(k))
        warm = time.perf_counter() - t0
        got = np.asarray(out[: 64])
        if exp is None:
            exp = np.sort(np.asarray(k[:64]), axis=1)
        np.testing.assert_array_equal(got, exp)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(k))
            best = min(best, time.perf_counter() - t0)
        print(f"rowsort[{name}] n={n} {best*1e3:.1f} ms "
              f"({n/best/1e6:.0f} Mk/s) warm={warm:.0f}s", flush=True)


if __name__ == "__main__":
    main()
