"""Radix-partitioning micro-benchmark — the bench_partitioning analog
(reference: src/bench/partitioningbench.c: ``NUMTUPLES WHATTODO RDXBITS``
over variants normal/optimized/V2/histogram+memcpy/memcpy).

Variants here: ``hist`` (Pallas lane-rotation histogram, bits <= 7; MXU
one-hot matmul above), ``hist-mxu`` (MXU form at any bits), ``hist-xla``
(scatter-add), ``partition`` (full grouped layout), ``copy`` (roofline).
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import partition as pt
from . import common


def main(argv=None) -> int:
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="partitioningbench")
    p.add_argument("ntuples", type=int, nargs="?", default=8 * (1 << 20),
                   help="tuples (reference default 8M)")
    p.add_argument("what", nargs="?", default="all",
                   choices=["hist", "hist-mxu", "hist-xla", "partition",
                            "copy", "all"])
    p.add_argument("rdxbits", type=int, nargs="?", default=7)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    n = (args.ntuples // (512 * 128)) * 512 * 128 or 512 * 128
    nbits = args.rdxbits
    rng = np.random.default_rng(11)
    keys = rng.integers(1, 2**26, n).astype(np.int32)
    pays = np.arange(n, dtype=np.int32)
    kd, pd = jnp.asarray(keys), jnp.asarray(pays)
    k2 = jnp.asarray(keys.reshape(-1, 128))

    def report(name, secs, note=""):
        print(f"[partbench] {name:10s} n={n} bits={nbits} "
              f"{secs*1e6:.0f} usecs {n/secs/1e6:.1f} Mtuples/s{note}",
              file=sys.stderr)
        print(f"{name} {secs*1e6:.0f} {n/secs/1e6:.2f}")

    if args.what in ("hist", "all"):
        if nbits <= 7:
            # the roll-based Pallas kernel (unrolls fanout x 128 lane
            # rotations — compile cliff past 2^7; hist-mxu covers above)
            fn = jax.jit(lambda x: pt.radix_hist(x, nbits).sum(0))
            report("hist", common.time_best(fn, k2, reps=args.reps),
                   note=" (roll kernel)")
        else:
            print(f"[partbench] hist (roll kernel) skipped at bits={nbits} "
                  "> 7 (unrolled-rotation compile cliff); see hist-mxu",
                  file=sys.stderr)
    if args.what in ("hist-mxu", "all"):
        fn = jax.jit(lambda x: pt.radix_hist_mxu(x, nbits))
        report("hist-mxu", common.time_best(fn, k2, reps=args.reps))
    if args.what in ("hist-xla", "all"):
        fn = jax.jit(lambda x: pt.radix_hist_xla(x, nbits))
        report("hist-xla", common.time_best(fn, kd, reps=args.reps))
    if args.what in ("partition", "all"):
        fn = jax.jit(lambda x, y: pt.partition_relation(x, y, nbits))
        # honesty: the grouped layout runs through an XLA .at[].set scatter
        # (~128 Melem/s measured at 128M) — it is scatter-bound, far below
        # the histogram rooflines, and the row says so (no silent caps)
        report("partition", common.time_best(fn, kd, pd, reps=args.reps),
               note=" (XLA-scatter-bound; not a kernel roofline)")
    if args.what in ("copy", "all"):
        fn = jax.jit(lambda x: x + 1)
        report("copy", common.time_best(fn, kd, reps=args.reps))
    return 0


if __name__ == "__main__":
    sys.exit(main())
