"""Phase-throughput benchmark — the tputbench analog
(reference: src/bench/tputbench.c: inlined m-way pipeline with per-phase
PART/MERGE throughput prints :319-325,556-562, plus a ``numabench`` mode
measuring pure cross-NUMA memcpy/aggregation throughput under the
NEXT/RING/RANDOM shuffle orders :665-1171).

Modes:
  tput  — run the m-way pipeline phases (sort / merge / join) separately,
          printing per-phase tuples/s.
  numa  — the ICI analog of numabench: all_to_all bandwidth over the device
          mesh (requires >1 device; on CPU set
          XLA_FLAGS=--xla_force_host_platform_device_count=8).
  mpsm  — characterize MPSM's defining trade (the reference stubs mpsm,
          src/joins/sortmergejoin_mpsm.c:38-45, so these rows are the
          quantitative record the scripts could never produce): sweep
          ``nchunks`` and print per-phase tput — each added S chunk is one
          more full scan of sorted R in the join phase
          (models/mpsm.py:91-97), so MJOIN cost grows ~linearly in nchunks
          while the S sort shrinks sublinearly.
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mergejoin as mj, multiwaymerge as mw, sort as so
from . import common


def run_tput(n: int, fanin: int, reps: int) -> int:
    keys = common.gen_keys(n)
    kd = jnp.asarray(keys)

    from ..models import mway as mway_model
    br, tr = mway_model.BLOCK_ROWS_MWAY, mway_model.TILE_ROWS_MWAY
    block = jax.jit(lambda a: _blocks_only(a, n, br, tr))
    full = jax.jit(lambda a: mw.multiway_sort(a, None, n, br, tr,
                                              fanin=fanin,
                                              return_2d=True)[0])
    t_block = common.time_best(block, kd, reps=reps)
    t_full = common.time_best(full, kd, reps=reps)
    r2 = full(kd)
    count = jax.jit(functools.partial(mj.merge_join_count_fused,
                                      nR=n, nS=n))
    t_join = common.time_best(count, r2, r2, reps=reps)
    for name, secs in [("SORT-BLOCKS", t_block),
                       ("MERGE", max(t_full - t_block, 1e-9)),
                       ("MJOIN", t_join)]:
        print(f"[tputbench] {name:12s} {secs*1e6:12.0f} usecs "
              f"{n/secs/1e6:10.1f} Mtuples/s", file=sys.stderr)
    print(f"{t_block*1e6:.0f} {max(t_full-t_block,0)*1e6:.0f} "
          f"{t_join*1e6:.0f} {n} {t_full*1e6:.0f} {n/t_full/1e6:.2f}")
    return 0


def _blocks_only(keys, n, block_rows, tile_rows):
    return mw.sort_blocks_phase(keys, None, n, block_rows, tile_rows)[0]


def run_numa(n_per_chip: int, strategy: str, reps: int) -> int:
    from ..parallel.mesh import AXIS, make_mesh, shuffle_order
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    mesh = make_mesh()
    ndev = int(np.prod(list(mesh.shape.values())))
    if ndev < 2:
        print("[tputbench] numa mode needs >1 device", file=sys.stderr)
        return 1
    order = shuffle_order(strategy, ndev)
    print(f"[tputbench] numabench over {ndev} devices, strategy={strategy} "
          f"order={order.tolist()}", file=sys.stderr)
    x = jnp.zeros((ndev, n_per_chip), jnp.int32)
    sh = NamedSharding(mesh, P(AXIS))
    x = jax.device_put(x, sh)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=P(AXIS),
                       out_specs=P(AXIS))
    def a2a(v):
        out = jax.lax.all_to_all(v.reshape(-1), AXIS, 0, 0, tiled=True)
        return out.reshape(v.shape)

    secs = common.time_best(a2a, x, reps=reps)
    gb = ndev * n_per_chip * 4 / 1e9
    print(f"[tputbench] ALL-TO-ALL {secs*1e6:.0f} usecs "
          f"{gb/secs:.1f} GB/s aggregate", file=sys.stderr)

    # read-only aggregation under the shuffle order — the second half of
    # the reference's numabench (tputbench.c:665-1171 measures memcpy AND
    # an aggregation pass over every remote region).  TPUs have no remote
    # loads, so the analog is ppermute rounds in the strategy's visit
    # order, each arriving shard reduced into a lane accumulator (read +
    # reduce, no full-copy materialization of the gathered buffer).
    rows = n_per_chip // 128

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=P(AXIS),
                       out_specs=P(AXIS))
    def aggregate(v):
        x2 = v.reshape(-1)[: rows * 128].reshape(rows, 128)
        acc = jnp.zeros((128,), jnp.int32)
        for off in order.tolist():
            off = int(off)
            if off == 0:
                y = x2
            else:
                perm = [(s, (s - off) % ndev) for s in range(ndev)]
                y = jax.lax.ppermute(x2, AXIS, perm)
            acc = acc + jnp.sum(y, axis=0)
        return acc[None]

    secs_a = common.time_best(aggregate, x, reps=reps)
    # cross-chip read traffic only: the off == 0 round is a local VMEM
    # reduce with no ppermute — counting it would inflate the remote-read
    # figure ~ndev/(ndev-1)x vs the reference's remote-region aggregation
    # (tputbench.c:665-1171 walks the OTHER regions)
    gb_a = ndev * (ndev - 1) * rows * 128 * 4 / 1e9
    print(f"[tputbench] AGGREGATION {secs_a*1e6:.0f} usecs "
          f"{gb_a/secs_a:.1f} GB/s aggregate read", file=sys.stderr)
    print(f"{secs*1e6:.0f} {gb/secs:.2f} {secs_a*1e6:.0f} {gb_a/secs_a:.2f}")
    return 0


def run_mpsm(n: int, chunks: list[int], reps: int) -> int:
    from ..models import mpsm
    from ..types import Relation

    rk = jnp.arange(1, n + 1, dtype=jnp.int32)
    sk = jnp.asarray(np.random.default_rng(9).integers(
        1, n + 1, size=n, dtype=np.int32))
    R = Relation(rk, jnp.zeros_like(rk), n)
    S = Relation(sk, jnp.zeros_like(sk), n)
    for nc in chunks:
        best = None
        for _ in range(max(1, reps)):
            res = mpsm.sortmergejoin_mpsm(R, S, nchunks=nc)
            assert res.totalresults == n, (nc, res.totalresults)
            if best is None or res.phases["total"] < best.phases["total"]:
                best = res
        ph = best.phases
        print(f"[tputbench] MPSM nchunks={nc:3d} "
              f"SORT {ph['sort']*1e6:12.0f} usecs "
              f"MJOIN {ph['mergejoin']*1e6:12.0f} usecs "
              f"{2*n/ph['total']/1e6:10.1f} Mtuples/s", file=sys.stderr)
        print(f"{nc} {ph['sort']*1e6:.0f} {ph['mergejoin']*1e6:.0f} "
              f"{2*n} {ph['total']*1e6:.0f} {2*n/ph['total']/1e6:.2f}")
    return 0


def main(argv=None) -> int:
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="tputbench")
    p.add_argument("--mode", default="tput", choices=["tput", "numa", "mpsm"])
    p.add_argument("-n", "--ntuples", type=int, default=1 << 24)
    p.add_argument("-f", "--fanin", type=int, default=16)
    p.add_argument("-S", "--strategy", default="NEXT",
                   choices=["NEXT", "RING", "RANDOM"])
    p.add_argument("--nchunks", type=int, nargs="+", default=[1, 2, 4, 8],
                   help="mpsm mode: chunk counts to sweep")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)
    if args.mode == "tput":
        return run_tput(args.ntuples, args.fanin, args.reps)
    if args.mode == "mpsm":
        return run_mpsm(args.ntuples, args.nchunks, args.reps)
    return run_numa(args.ntuples, args.strategy, args.reps)


if __name__ == "__main__":
    sys.exit(main())
