"""Re-run named results-grid cells (e.g. after a model change).

Discards the cells' done-marks and re-executes their owning grids (all
other cells skip as done); the appended rows override the old ones —
the renderer keeps the LAST row per key, so the superseded measurements
stay in results_grid.jsonl as the historical A/B record.

  PYTHONPATH=/root/repo python scripts/rerun_cells.py KEY [KEY ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_results_grid as g  # noqa: E402


def main():
    keys = sys.argv[1:]
    assert keys, "pass the grid-cell keys to re-run"
    missing = [k for k in keys if k not in g.DONE]
    assert not missing, f"unknown cell keys (not in {g.OUT}): {missing}"
    for k in keys:
        g.DONE.discard(k)
    from avx_sort_merge_joins_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    for name in dict.fromkeys(k.split("/")[0] for k in keys):
        g.log(f"=== re-running grid: {name} ===")
        g.GRIDS[name]()


if __name__ == "__main__":
    main()
