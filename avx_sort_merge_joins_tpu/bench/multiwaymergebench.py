"""Multiway-merge micro-benchmark — the bench_multiwaymerge analog
(reference: src/bench/multiwaymergebench.c: ``chunksize fanIn buffersize``
comparing AVX multiway merge vs scalar vs plain memcpy, printing a
usecs/tput/MB-per-sec triple, :214-221).

Here: FIFO-tree kernel vs XLA lax.sort-of-concat (the scalar analog) vs the
copy roofline.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import multiwaymerge as mw, sort as so
from . import common


def main(argv=None) -> int:
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="multiwaymergebench")
    p.add_argument("chunksize", type=int, nargs="?", default=1 << 20,
                   help="tuples per sorted input run")
    p.add_argument("fanin", type=int, nargs="?", default=16)
    p.add_argument("--what", default="all",
                   choices=["mway", "xla", "copy", "all"])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    chunk, fanin = args.chunksize, args.fanin
    n = chunk * fanin
    tile = so.TILE_ROWS_DEFAULT
    stride = max(tile, ((chunk // 128 + tile - 1) // tile) * tile)
    rng = np.random.default_rng(9)
    rows = fanin * stride + tile + 8
    k = np.full((rows * 128,), 2**31 - 1, np.int32)
    runs = []
    for i in range(fanin):
        r = np.sort(rng.integers(-(2**30), 2**30, chunk).astype(np.int32))
        runs.append(r)
        k[i * stride * 128:i * stride * 128 + chunk] = r
    k2 = jnp.asarray(k.reshape(rows, 128))
    flat = jnp.asarray(np.concatenate(runs))

    def report(name, secs):
        mbs = n * 4 / secs / 1e6
        print(f"[mwaymergebench] {name:6s} fanin={fanin} chunk={chunk} "
              f"{secs*1e6:.0f} usecs {n/secs/1e6:.1f} Mtuples/s "
              f"{mbs:.0f} MB/s", file=sys.stderr)
        print(f"{name} {secs*1e6:.0f} {n/secs/1e6:.2f} {mbs:.0f}")

    if args.what in ("mway", "all"):
        fn = jax.jit(lambda x: mw.multiway_merge(
            x, None, [chunk] * fanin, stride, fanin, tile)[0])
        secs = common.time_best(fn, k2, reps=args.reps)
        got = np.asarray(fn(k2)).reshape(-1)[:n]
        assert common.check_sorted(got), "multiway output not sorted"
        report("mway", secs)
    if args.what in ("xla", "all"):
        fn = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1)[0])
        report("xla", common.time_best(fn, flat, reps=args.reps))
    if args.what in ("copy", "all"):
        fn = jax.jit(lambda x: x + 1)
        report("copy", common.time_best(fn, flat, reps=args.reps))
    return 0


if __name__ == "__main__":
    sys.exit(main())
