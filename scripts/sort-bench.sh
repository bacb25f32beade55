#!/bin/bash
# Sort micro grid — {1..256} * 2^20 tuples x variants x pow2/non-pow2
# (reference: scripts/sort-bench.sh:14-31).
set -u
# run from anywhere: put the repo root on PYTHONPATH
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd):${PYTHONPATH:-}"
SIZES=${SIZES:-"1 2 4 8 16 32 64 128 256"}
VARIANTS=${VARIANTS:-"pairwise multiway keysonly xla"}
OUT=${OUT:-sort-bench.txt}

for v in $VARIANTS; do
  for m in $SIZES; do
    python -m avx_sort_merge_joins_tpu.bench.sortbench "$m" "$v" >> "$OUT" \
      2>> "${OUT%.txt}.log"
    # non-pow2 size (reference runs both)
    python -m avx_sort_merge_joins_tpu.bench.sortbench "$m.5" "$v" \
      >> "$OUT" 2>> "${OUT%.txt}.log"
  done
done
