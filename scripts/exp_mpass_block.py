"""Block-size sweep for the KEYS-ONLY m-pass composition (round 5).

PLAN r2's pairwise sweep pinned (block 128, tile 128) — but that was the
PAIR-carrying path (key+payload columns through every pass).  The r5
keys-only redesign halves the VMEM traffic per substage, which may move
the optimum toward bigger blocks (fewer log-halving levels), as it did
for m-way (block 512).  Steady-state discipline: burn 2, 3 timed reps
queued async, one sync.

  PYTHONPATH=/root/repo python scripts/exp_mpass_block.py [n ...]
  (default sizes: 16M, 128M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_results_grid as g  # noqa: E402  (workload + timed helpers)

M = 1_000_000


def main():
    import jax

    from avx_sort_merge_joins_tpu.ops import mergejoin
    from avx_sort_merge_joins_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    sizes = [int(a) for a in sys.argv[1:]] or [16 * M, 128 * M]
    print(f"backend={jax.default_backend()}", flush=True)
    for n in sizes:
        R, S = g.workload(n)
        for block in (128, 256, 512):
            fn = g._mpass_fn(n, n, block, 128)
            t0 = time.perf_counter()
            out = fn(R.keys, S.keys)
            g._sync(out)
            cnt = mergejoin.finish_count_fused(out)
            assert cnt == n, f"block {block}: {cnt} != {n}"
            print(f"n={n} block={block}: compile+warm "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            secs = g.timed(lambda: fn(R.keys, S.keys))
            print(f"n={n} block={block} tile=128: {secs * 1e3:.1f} ms  "
                  f"{2 * n / secs / 1e6:.1f} Mt/s", flush=True)


if __name__ == "__main__":
    main()
