"""Re-emit the 128M algo-grid rows with honest phase splits.

The first grid run recorded each phased model's SINGLE run, which on a
cold cache folded the phased-variant compiles into the phase columns
(116 s "sort" on a 582 ms join).  `_model_phases` now warms first; this
one-off re-runs it for the three 128M pallas cells and APPENDS corrected
rows to results_grid.jsonl (the renderer keeps the LAST row per key).

  PYTHONPATH=/root/repo python scripts/fix_grid_phases.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_results_grid as g  # noqa: E402  (scripts/ is on sys.path)


def main():
    from avx_sort_merge_joins_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    n = 128 * g.M
    R, S = g.workload(n)
    rows = {r["key"]: r for line in open(g.OUT)
            if (r := json.loads(line))}
    for algo in ("m-way", "m-pass", "mpsm"):
        key = f"algo/{algo}/{n}/pallas"
        row = dict(rows[key])
        kw = {"nchunks": 1} if algo == "mpsm" else {}
        phases = g._model_phases(algo, R, S, **kw)
        row["phases_ms"] = {k: round(v * 1e3, 1) for k, v in phases.items()}
        g.emit(row)


if __name__ == "__main__":
    main()
