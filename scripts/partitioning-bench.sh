#!/bin/bash
# Partitioning micro grid — 8M tuples x radix bits 2..16 x variants
# (reference: scripts/partitioning-bench.sh:17-33).
set -u
# run from anywhere: put the repo root on PYTHONPATH
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd):${PYTHONPATH:-}"
N=${N:-8388608}
BITS=${BITS:-"2 4 6 8 10 12 14 16"}
OUT=${OUT:-partitioning-bench.txt}

for b in $BITS; do
  python -m avx_sort_merge_joins_tpu.bench.partitioningbench "$N" all "$b" \
    >> "$OUT" 2>> "${OUT%.txt}.log"
done
