#!/bin/bash
# Multiway-merge micro grid — totals x fan-in sweep vs scalar vs memcpy
# (reference: scripts/multiwaymerge-bench.sh:19-41).
set -u
# run from anywhere: put the repo root on PYTHONPATH
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd):${PYTHONPATH:-}"
TOTALS=${TOTALS:-"4194304 8388608 16777216"}
FANINS=${FANINS:-"4 8 16 32 64"}
OUT=${OUT:-multiwaymerge-bench.txt}

for total in $TOTALS; do
  for f in $FANINS; do
    chunk=$((total / f))
    python -m avx_sort_merge_joins_tpu.bench.multiwaymergebench \
      "$chunk" "$f" >> "$OUT" 2>> "${OUT%.txt}.log"
  done
done
