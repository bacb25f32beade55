"""Round-4 structural A/B: dist m-way overlap=True vs bulk all_to_all
(VERDICT r3 weak #3 / next-round #6).

Real ICI timing needs >1 physical chip (this host exposes one), so this
measures what IS measurable today on the 8-device CPU mesh:

  structure — lower+compile BOTH pipelines and count the collective ops
              and the bytes they move (from the optimized HLO), plus the
              k-way merge traversals each path performs per element;
  wall proxy — end-to-end reps through the public API at a CPU-mesh-safe
              size (1-core box: treat as ORDER OF MAGNITUDE only).

The decision criterion (documented in PLAN round 4): overlap=True hides
exchange latency behind group merges at the cost of ONE EXTRA k-way pass
over all exchanged data.  The engine is VPU-bound (ROOFLINE.md §3) — a
merge pass costs ~16 substages/element while a v5e ICI hop moves the
same bytes ~50x faster than the VPU merges them — so overlap must win
its hidden-latency bet by more than a full pass to pay off.  The HLO op
counts below quantify exactly what each path schedules.

Usage: PYTHONPATH=/root/repo python scripts/exp_overlap_ab.py [n_total]
"""

import os
import re
import sys
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avx_sort_merge_joins_tpu.parallel import dist_mway  # noqa: E402
from avx_sort_merge_joins_tpu.parallel import exchange as ex  # noqa: E402
from avx_sort_merge_joins_tpu.parallel.mesh import flat_spec, make_mesh  # noqa: E402
from avx_sort_merge_joins_tpu.utils import cache  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

BLOCK_ROWS, TILE_ROWS, FANIN = 256, 128, 16

# optimized-HLO collective ops.  Parsing realities (all found by running
# against real XLA:CPU optimized HLO):
#   * a shard_map all_to_all lowers to a TUPLE-result op —
#     "(s32[128]{0}, s32[128]{0}, ...) all-to-all(...)" — so the byte
#     count must sum EVERY leaf shape of the result type, not just the
#     first (first-shape-only undercounts ~n_chips x);
#   * long tuple types carry "/*index=5*/" comments whose '=' breaks any
#     "[^=]*?" result-type span — strip /*...*/ comments per line first;
#   * async lowerings emit "-start"/"-done" pairs — count the -start.
_LINE_RE = re.compile(
    r"= ([^=]*?)\s*\b(all-to-all|collective-permute)(?:-start)?\(")
_COMMENT_RE = re.compile(r"/\*.*?\*/")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_DTYPE_BYTES = {"s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2}


def _collective_stats(hlo_text: str):
    ops = {"all-to-all": [0, 0], "collective-permute": [0, 0]}
    for line in hlo_text.splitlines():
        m = _LINE_RE.search(_COMMENT_RE.sub("", line))
        if not m:
            continue
        restype, kind = m.groups()
        ops[kind][0] += 1
        for dt, dims in _SHAPE_RE.findall(restype):
            if dt not in _DTYPE_BYTES:
                continue  # layout annotations etc.
            n = (int(np.prod([int(d) for d in dims.split(",") if d]))
                 if dims else 1)
            ops[kind][1] += n * _DTYPE_BYTES[dt]
    return ops


def build_and_lower(mesh, n: int, overlap: bool):
    n_chips = int(np.prod(list(mesh.shape.values())))
    shard = -(-n // n_chips)
    cap = ex.bucket_cap(shard, n_chips, 2.0, TILE_ROWS * 128)
    fn = dist_mway._count_fn(
        mesh, n_chips, cap, cap, BLOCK_ROWS, TILE_ROWS, FANIN,
        True,              # use_pallas (interpret on CPU)
        overlap,           # overlap_ok
        None, None,        # schedule, hier
        True,              # interp
        None, 1, cache.prefetch_env_key())
    sh = NamedSharding(mesh, flat_spec(mesh))
    keys = jax.ShapeDtypeStruct((n_chips, shard), jnp.int32, sharding=sh)
    cnts = jax.ShapeDtypeStruct((n_chips,), jnp.int32, sharding=sh)
    return fn.lower(keys, keys, cnts, cnts).compile()


def wall_proxy(n: int, overlap: bool, reps: int, mesh):
    rng = np.random.default_rng(7)
    rk = jnp.asarray(rng.integers(-2**31 + 2, 2**31 - 2, n, dtype=np.int32))
    sk = jnp.asarray(rng.integers(-2**31 + 2, 2**31 - 2, n, dtype=np.int32))
    # warm (compile)
    cnt, ov = dist_mway.dist_mway_join_count(
        rk, sk, n, n, mesh, block_rows=BLOCK_ROWS, tile_rows=TILE_ROWS,
        fanin=FANIN, use_pallas=True, overlap=overlap)
    assert ov == 0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        dist_mway.dist_mway_join_count(
            rk, sk, n, n, mesh, block_rows=BLOCK_ROWS, tile_rows=TILE_ROWS,
            fanin=FANIN, use_pallas=True, overlap=overlap)
        best = min(best, time.perf_counter() - t0)
    return cnt, best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    mesh = make_mesh(8)
    n_chips = 8
    print(f"[exp_overlap] n={n} over {n_chips}-dev CPU mesh "
          f"(structure is platform-independent; walls are 1-core proxies)",
          flush=True)
    rows = {}
    for overlap in (False, True):
        name = "overlap" if overlap else "bulk"
        compiled = build_and_lower(mesh, n, overlap)
        stats = _collective_stats(compiled.as_text())
        # fail LOUDLY if the parser stops matching the HLO (e.g. a future
        # async lowering this regex doesn't know): an exchange pipeline
        # with zero parsed collectives is a parse bug, not a measurement
        assert sum(v[0] for v in stats.values()) > 0, \
            "no collectives parsed from optimized HLO — parser is stale"
        # k-way traversals per element after the exchange:
        #   bulk: one fanin-16 merge level over 8 runs        = 1 pass
        #   overlap: 2 group merges (4 runs each) + final 2-way = 2 passes
        passes = 2 if overlap else 1
        cnt, wall = wall_proxy(n, overlap, reps=3, mesh=mesh)
        rows[name] = (stats, passes, wall, cnt)
        a2a_n, a2a_b = stats["all-to-all"]
        pp_n, pp_b = stats["collective-permute"]
        print(f"[exp_overlap] {name:8s} all_to_all x{a2a_n} "
              f"({a2a_b/1e6:.1f} MB global)  ppermute x{pp_n} "
              f"({pp_b/1e6:.1f} MB global)  post-exchange merge passes: "
              f"{passes}  wall_best {wall*1e3:.0f} ms  count={cnt}",
              flush=True)
    assert rows["bulk"][3] == rows["overlap"][3], "count mismatch"
    b, o = rows["bulk"], rows["overlap"]
    print(f"[exp_overlap] overlap adds "
          f"{o[0]['collective-permute'][0] - b[0]['collective-permute'][0]} "
          f"ppermute rounds and {o[1] - b[1]} extra k-way pass(es) to hide "
          f"{b[0]['all-to-all'][1]/1e6:.1f} MB of all_to_all; wall ratio "
          f"overlap/bulk = {o[2]/b[2]:.2f}", flush=True)


if __name__ == "__main__":
    main()
