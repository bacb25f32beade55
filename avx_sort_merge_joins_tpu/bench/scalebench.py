"""Scaling-efficiency harness: distributed join throughput vs chip count.

The analog of the reference's thread-scaling grid and its numabench
communication benchmark (reference: scripts/tput-scalability.sh:27-38,
src/bench/tputbench.c:902-1018): run the distributed m-way join at
1, 2, 4, ... devices and report rows/s plus parallel efficiency
tput(n) / (n * tput(1)) — the observable for BASELINE's >=75% scaling
target.  On the CPU-simulated mesh the virtual devices share host cores,
so wall-clock efficiency is a structural proxy (it exposes exchange and
padding overheads, not real ICI speedups); on a real multi-chip slice the
same harness reports true scaling.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np

from ..ops.mergejoin import merge_join_count_numpy
from ..parallel import dist_mway
from ..parallel.mesh import make_mesh


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scalebench")
    p.add_argument("ntuples", type=int, nargs="?", default=1 << 22)
    p.add_argument("--devices", default=None,
                   help="comma list of device counts (default 1,2,4,..,N)")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--algo", default="m-way", choices=["m-way", "m-pass"])
    args = p.parse_args(argv)

    ndev_all = len(jax.devices())
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = []
        d = 1
        while d <= ndev_all:
            counts.append(d)
            d *= 2
    n = args.ntuples
    rng = np.random.default_rng(3)
    rk = rng.permutation(np.arange(1, n + 1)).astype(np.int32)
    sk = rng.integers(1, n + 1, n).astype(np.int32)
    expected = merge_join_count_numpy(rk, sk)

    if args.algo == "m-pass":
        from ..parallel import dist_mpass
        join = dist_mpass.dist_mpass_join_count
    else:
        join = dist_mway.dist_mway_join_count

    tput1 = None
    for nd in counts:
        mesh = make_mesh(nd)
        cnt, ov = join(rk, sk, n, n, mesh)  # compile + warmup + exact check
        assert ov == 0 and cnt == expected, (nd, cnt, expected)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            join(rk, sk, n, n, mesh)
            best = min(best, time.perf_counter() - t0)
        tput = 2 * n / best
        if tput1 is None:
            tput1 = tput
        eff = tput / (nd * tput1)
        print(f"[scalebench] {args.algo} ndev={nd} n={n} "
              f"{best*1e6:.0f} usecs {tput/1e6:.1f} Mtuples/s "
              f"efficiency={eff:.2f}", file=sys.stderr)
        print(f"{args.algo} {nd} {n} {best*1e6:.0f} {tput/1e6:.2f} {eff:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
