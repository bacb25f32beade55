"""2-way merge kernel micro-benchmark — the bench_merge analog
(reference: src/bench/mergebench.c: merge kernels on ~20M-element sorted
lists validated against qsort).

Benches the streaming pairwise merge pass (the merge16_varlen analog) and
the 2-way FIFO kernel, validated against numpy."""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import multiwaymerge as mw, sort as so
from . import common


def main(argv=None) -> int:
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="mergebench")
    p.add_argument("mtuples", type=float, nargs="?", default=8.0,
                   help="per-list tuples in 2^20 units")
    p.add_argument("--variant", default="fifo2",
                   choices=["fifo2", "pairwise"])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    n = int(args.mtuples * (1 << 20))
    rng = np.random.default_rng(7)
    a = np.sort(rng.integers(-(2**30), 2**30, n).astype(np.int32))
    b = np.sort(rng.integers(-(2**30), 2**30, n).astype(np.int32))

    tile = so.TILE_ROWS_DEFAULT
    stride = ((n // 128 + tile) // tile + 1) * tile
    rows = 2 * stride + tile + 8
    k = np.full((rows * 128,), 2**31 - 1, np.int32)
    k[:n] = a
    if args.variant == "fifo2":
        k[stride * 128:stride * 128 + n] = b
    else:
        # pairwise merge consumes an (asc, desc) bitonic pair
        k[stride * 128:stride * 128 + n] = b[::-1]
    k2 = jnp.asarray(k.reshape(rows, 128))
    p2 = jnp.zeros_like(k2)

    if args.variant == "fifo2":
        fn = jax.jit(lambda x, y: mw.multiway_merge(
            x, y, [n, n], stride, 2, tile)[0])
    else:
        fn = jax.jit(lambda x, y: so.merge_pass(
            x, y, [n, n], stride, tile)[0])

    secs = common.time_best(fn, k2, p2, reps=args.reps)
    got = np.asarray(fn(k2, p2)).reshape(-1)[:2 * n]
    exp = np.sort(np.concatenate([a, b]))
    assert np.array_equal(got, exp), "merge output mismatch vs oracle"
    mts = 2 * n / secs / 1e6
    print(f"[mergebench] variant={args.variant} 2x{n} "
          f"{secs*1e6:.0f} usecs {mts:.1f} Mtuples/s", file=sys.stderr)
    print(f"{2*n} {secs*1e6:.0f} {mts:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
