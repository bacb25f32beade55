"""Sort micro-benchmark — the bench_sort analog
(reference: src/bench/sortbench.c: args ``[#tuples in 2^20] [variant]
[pow2?]``, times the AVX sort vs std::sort with a sortedness check).

Variants: ``pairwise`` (log2 2-way passes, = avxsort), ``multiway``
(k-way FIFO tree, = avxsort-multiway), ``keysonly`` (count-path network),
``xla`` (lax.sort, the std::sort analog).  Also covers the fork's
negative-key experiment (sortbench.c:305-370 _hybridsort): keys here are
native int32 so negatives need no special path — pass ``--negative`` to
run that key distribution.
"""

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
    p = argparse.ArgumentParser(prog="sortbench")
    p.add_argument("mtuples", type=float, nargs="?", default=16.0,
                   help="tuples in 2^20 units (sortbench.c:470)")
    p.add_argument("variant", nargs="?", default="multiway",
                   choices=["pairwise", "multiway", "keysonly", "xla"])
    p.add_argument("--fanin", type=int, default=16)
    # sweep-measured optimum for the k-way composition (PLAN round-2);
    # the pairwise composition keeps its own (128,128) optimum
    p.add_argument("--block-rows", type=int, default=512)
    p.add_argument("--tile-rows", type=int, default=256)
    p.add_argument("--negative", action="store_true",
                   help="signed key distribution (fork's debug_pos_neg_sort)")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    n = int(args.mtuples * (1 << 20))
    keys = common.gen_keys(n)
    if not args.negative:
        keys = np.abs(keys)
    pays = np.arange(n, dtype=np.int32)
    kd, pd = jnp.asarray(keys), jnp.asarray(pays)

    if args.variant == "pairwise":
        fn = jax.jit(lambda a, b: so.sort(a, b, n))
        arrs = (kd, pd)
    elif args.variant == "multiway":
        fn = jax.jit(lambda a, b: mw.multiway_sort(
            a, b, n, args.block_rows, args.tile_rows, fanin=args.fanin))
        arrs = (kd, pd)
    elif args.variant == "keysonly":
        fn = jax.jit(lambda a: mw.multiway_sort(
            a, None, n, args.block_rows, args.tile_rows,
            fanin=args.fanin)[0])
        arrs = (kd,)
    else:
        fn = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
        arrs = (kd, pd)

    secs = common.time_best(fn, *arrs, reps=args.reps)
    out = fn(*arrs)
    ok = np.asarray(out[0] if isinstance(out, tuple) else out)
    assert common.check_sorted(ok), "output not sorted"
    mts = n / secs / 1e6
    print(f"[sortbench] variant={args.variant} n={n} "
          f"{secs*1e6:.0f} usecs {mts:.1f} Mtuples/s", file=sys.stderr)
    print(f"{n} {secs*1e6:.0f} {mts:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
