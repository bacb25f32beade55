#!/bin/bash
# Thread(chip)-scaling experiment — the tput-scalability.sh analog
# (reference: scripts/tput-scalability.sh: algos x {64..1} threads x reps,
#  AVX and scalar, record format
#  "ALGO NTHREADS RUNNO ... NUMTUP USECS TPUT", :27-38).
# Chips replace threads; the scalar runs use --scalarsort/--scalarmerge.
set -u
# run from anywhere: put the repo root on PYTHONPATH
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd):${PYTHONPATH:-}"
NR=${NR:-134217728}
NS=${NS:-$NR}
REPS=${REPS:-3}
CHIPS=${CHIPS:-"1"}       # e.g. "8 4 2 1" on a pod slice
ALGOS=${ALGOS:-"m-way m-pass mpsm"}
LOG=${LOG:-tput-scalability.log}
OUT=${OUT:-tput-scalability.txt}

for algo in $ALGOS; do
  for n in $CHIPS; do
    for rep in $(seq 1 "$REPS"); do
      echo "# $algo chips=$n rep=$rep" >> "$LOG"
      python -m avx_sort_merge_joins_tpu -a "$algo" -n "$n" \
        -r "$NR" -s "$NS" >> "$OUT" 2>> "$LOG"
    done
  done
done
