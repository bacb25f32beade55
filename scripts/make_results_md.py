"""Render RESULTS.md from results_grid.jsonl (scripts/run_results_grid.py's
output) plus the consolidated micro-grid rows recorded in PLAN.md.

Every dynamic row carries the grid runner's steady-state discipline
(burn untimed reps, queue timed reps asynchronously, sync once) and was
exactness-asserted before timing.  Re-run after any grid extension:

  PYTHONPATH=/root/repo python scripts/make_results_md.py

Reference analogs: scripts/tput-scalability.sh:27-60, cardinality.sh:30-48,
scalesize.sh:31-45, sort-bench.sh, multiwaymerge-bench.sh,
partitioning-bench.sh in /root/reference.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "results_grid.jsonl")
DST = os.path.join(ROOT, "RESULTS.md")

M = 1_000_000


def _fmt_n(n: int) -> str:
    if n % M == 0:
        return f"{n // M}M"
    return f"{n / M:.1f}M"


def _load():
    rows = []
    with open(SRC) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    # keep the LAST row per key (resumable runner appends)
    by_key = {}
    for r in rows:
        by_key[r["key"]] = r
    return by_key


def _phase_cols(r):
    p = r.get("phases_ms")
    if not p:
        return "—"
    order = ["sort", "merge1", "mergerest", "mergejoin",
             "sort_r", "sort_s", "count", "total"]
    parts = [f"{k} {p[k]:.0f}" for k in order if k in p]
    parts += [f"{k} {v:.0f}" for k, v in p.items() if k not in order]
    return ", ".join(parts)


def render() -> str:
    rows = _load()
    out = []
    w = out.append

    w("# RESULTS — the reference's experiment grids on TPU v5e (1 chip)\n")
    w("All numbers: steady-state ms/run (burn 2 untimed reps, then 3 timed"
      " reps queued\nasynchronously and synced once — the ~30 ms axon-tunnel"
      " dispatch round-trip is\namortized out, per CLAUDE.md).  Every cell"
      " asserted `count == expected` before\nits timing was recorded"
      " (`exact: true` in `results_grid.jsonl`, the raw artifact).\n"
      "Throughput Mt/s = (|R|+|S|)/time.  Reproduce any section with the"
      " named command;\nthe runner is resumable (done cells skip).\n")
    w("Environment: single TPU v5e chip through the experimental axon"
      " tunnel; multi-chip\nhardware is not attached (the distributed"
      " paths are validated on the 8-device CPU\nmesh + dryrun — see"
      " PARITY.md / MULTICHIP_r*.json).\n")

    # ---------------------------------------------------------------- algo
    w("## 1. Algorithm grid — m-way vs m-pass vs mpsm"
      " (tput-scalability.sh analog, CHIPS=1)\n")
    w("`PYTHONPATH=/root/repo python scripts/run_results_grid.py algo`"
      "  (reference: `scripts/tput-scalability.sh:27-60`)\n")
    w("| algo | n/side | kernel mode | ms/run | Mt/s | phase split (ms,"
      " separate phased run) |")
    w("|---|---|---|---|---|---|")
    algo_rows = [r for r in rows.values() if r["grid"] == "algo"]
    algo_rows.sort(key=lambda r: (r["nR"], ("m-way", "m-pass", "mpsm")
                                  .index(r["algo"]), r["mode"],
                                  r.get("nchunks", 1)))
    for r in algo_rows:
        mode = r["mode"]
        if r.get("nchunks", 1) != 1:
            mode += f" (nchunks={r['nchunks']})"
        w(f"| {r['algo']} | {_fmt_n(r['nR'])} | {mode} | {r['ms']:.0f} "
          f"| **{r['mtps']:.1f}** | {_phase_cols(r)} |")
    w("")
    w("Notes: `pallas` = the engine's Mosaic kernels; `scalar` ="
      " `--scalarsort`/`--scalarmerge`\n(XLA `lax.sort` + XLA count — the"
      " reference's scalar-foil analog, main.c's\n`--scalarsort`).  Phase"
      " columns come from one separately-dispatched phased model\nrun"
      " (joincommon.c:175-196 split); each phase dispatch pays its own"
      " tunnel sync,\nso the single-dispatch `ms/run` column is the"
      " throughput source.  mpsm rows are\nnchunks=1 (the measured-best"
      " single-chip config — PLAN r3's nchunks sweep);\nthe nchunks=4 row"
      " shows the chunking trade at headline scale (each extra S chunk\n"
      "re-scans all of sorted R — MPSM's scan-all-runs cost shape; the"
      " reference stubs\nmpsm, so these rows are the only quantitative"
      " record of the trade).\n")
    w("m-pass rows are the r5 KEYS-ONLY redesign (block 512 + negated-S"
      " fused count —\nthe multipass structure is unchanged; the payloads"
      " the old pair path sorted were\ndiscarded at the join phase)."
      "  The superseded pair-carrying path measured\n174.1 Mt/s at 16M /"
      " 174.9 at 128M (earlier rows in `results_grid.jsonl` — the\n"
      "~2.5× gap is the payload tax: doubled per-substage VMEM traffic +"
      " the tag-merge\ncount kernel); block sweep:"
      " `scripts/exp_mpass_block.py` (16M: 128/256/512 →\n"
      "425.4/434.9/449.3 Mt/s; 128M: 355.6/379.7/393.6 — block 512"
      " adopted).\n")

    # --------------------------------------------------------------- key8b
    w("## 2. KEY_8B end-to-end join (8-byte keys)\n")
    w("`PYTHONPATH=/root/repo python scripts/run_results_grid.py key8b`"
      "  (reference: `src/main.c:871-877`, `src/types.h:23-29`)\n")
    w("| n/side | ms/run (single dispatch: widen32 → sort64 ×2 → fused64"
      " count) | Mt/s | phase split (ms) |")
    w("|---|---|---|---|")
    k8 = sorted((r for r in rows.values() if r["grid"] == "key8b"),
                key=lambda r: r["nR"])
    for r in k8:
        w(f"| {_fmt_n(r['nR'])} | {r['ms']:.0f} | **{r['mtps']:.1f}** "
          f"| {_phase_cols(r)} |")
    w("")
    w("The reference FORCES KEY_8B runs onto its scalar path"
      " (main.c:871-877) and its\nKEY_8B m-way produces wrong counts"
      " (PARITY.md); this engine runs 8-byte keys\nthrough the full Pallas"
      " pipeline as (hi, lo)-plane pair networks with the\nnegated-S"
      " NOT-plane count layout (PLAN r4).  S planes are consumed in NOT"
      " layout;\n`recover_s=True` adds two O(nS) flips only when sorted S"
      " must be returned.\n")

    # ---------------------------------------------------------------- zipf
    w("## 3. Skew — m-way under Zipf at headline scale\n")
    w("`PYTHONPATH=/root/repo python scripts/run_results_grid.py zipf`"
      "  (reference: `src/datagen/genzipf.c:97-159`, `main.c:566-588`)\n")
    w("| z | n/side | ms/run | Mt/s | overflow fallback fired |")
    w("|---|---|---|---|---|")
    zrows = sorted((r for r in rows.values() if r["grid"] == "zipf"),
                   key=lambda r: r["z"])
    for r in zrows:
        w(f"| {r['z']} | {_fmt_n(r['nR'])} | {r['ms']:.0f} "
          f"| **{r['mtps']:.1f}** | {'yes' if r.get('overflow_fired') else 'no'} |")
    w("")
    w("S is generated on device from the streamed Zipf quantile LUT"
      " (`parallel/scale.py`);\nR is the exact pk set 1..n, so count=|S|"
      " is checkable and the per-segment\ncntR·cntS < 2^29 invariant"
      " cannot trip (cntR=1 ⇒ product = cntS ≤ |S| < 2^29).\nThe"
      " comparison-network sort cost is data-independent; these rows"
      " measure the\nfused count kernel under heavy duplicate segments"
      " (z=1 ⇒ the hottest key\nrepeats ~10% of |S|).  The"
      " overflow→exact-fallback machinery is exercised\nseparately in"
      " tests (CountLimbOverflow) with nonunique R; on pk-R it is\n"
      "provably unreachable — recorded here as the honesty column.\n")

    # ---------------------------------------------------------------- card
    w("## 4. Cardinality — S/R ratio (cardinality.sh analog)\n")
    w("`PYTHONPATH=/root/repo python scripts/run_results_grid.py card`"
      "  (reference: `scripts/cardinality.sh:30-48`)\n")
    w("| |R| | |S| | ratio | ms/run | Mt/s |")
    w("|---|---|---|---|---|")
    crows = sorted((r for r in rows.values() if r["grid"] == "card"),
                   key=lambda r: r["nS"])
    for r in crows:
        w(f"| {_fmt_n(r['nR'])} | {_fmt_n(r['nS'])} | {r['ratio']} "
          f"| {r['ms']:.0f} | **{r['mtps']:.1f}** |")
    w("")

    # --------------------------------------------------------------- scale
    w("## 5. Scalesize — R=S=32M·k (scalesize.sh analog)\n")
    w("`PYTHONPATH=/root/repo python scripts/run_results_grid.py scale`"
      "  (reference: `scripts/scalesize.sh:31-45`)\n")
    w("| n/side | ms/run | Mt/s |")
    w("|---|---|---|")
    srows = sorted((r for r in rows.values() if r["grid"] == "scale"),
                   key=lambda r: r["nR"])
    for r in srows:
        w(f"| {_fmt_n(r['nR'])} | {r['ms']:.0f} | **{r['mtps']:.1f}** |")
    w("")
    w("Separate-session corroboration (round-3 scale audit,"
      " `scripts/exp_scale.py`,\nshuffled-generator workloads, non-pow2"
      " sizes): 500M 371.7 / 600M 359.2 /\n700M 360.1 / 800M 360.7 Mt/s —"
      " all exact; 800M/side (peak ≈ 9.6 GB) is the\ndemonstrated"
      " single-chip edge (900M+ fails in the axon compile helper, not"
      " device\nHBM — PLAN r3).\n")

    # ---------------------------------------------------------- micro-grids
    w("## 6. Micro-benchmark grids (consolidated measured rows)\n")
    w("The operator-level grids the reference's `sort-bench.sh` /"
      " `multiwaymerge-bench.sh` /\n`partitioning-bench.sh` sweep."
      "  Rows below are the adopted-config measurements from\nthe"
      " cross-round tuning record (PLAN.md, same-session A/B discipline);"
      " each is\nreproducible by the named in-tree command.\n")
    w("### 6.1 Sort (`python -m avx_sort_merge_joins_tpu.bench.sortbench"
      " -n ...`)\n")
    w("| op | n | config | ms | rate |")
    w("|---|---|---|---|---|")
    w("| multiway_sort keys-only | 16M | block 512, tile 256, fanin 16,"
      " leaf prefetch | 34.5 | 464 Mk/s (re-measured r5 same command:"
      " 37.2 ms after the bench-harness steady-state fix) |")
    w("| multiway_sort keys-only | 128M | block 512, tile 256, fanin 16,"
      " leaf prefetch | 296.5 | 432 Mk/s (re-measured r5 same command:"
      " 295.8 ms) |")
    w("| pairwise (m-pass) sort, pairs | 16M | block 128, tile 128"
      " (superseded pair path — r5 keys-only m-pass uses block 512, §1) |"
      " 74.7 | 214 Mp/s |")
    w("| sort64 (KEY_8B planes) | 64M | pair networks, 2 planes | — |"
      " see §2 phase split |")
    w("")
    w("### 6.2 Multiway merge"
      " (`python -m avx_sort_merge_joins_tpu.bench.multiwaymergebench`)\n")
    w("Window kernel (adopted) vs the round-2 carry-register redesign"
      " (measured, reverted):\n")
    w("| n | window kernel | carry kernel | verdict |")
    w("|---|---|---|---|")
    w("| 16M | 58.4 ms | 54.6 ms | carry +6% at small n |")
    w("| 128M | 277 ms | 331–341 ms | window wins 20% at scale —"
      " adopted |")
    w("")
    w("### 6.3 Partitioning"
      " (`python -m avx_sort_merge_joins_tpu.bench.partitioningbench`)\n")
    w("Roll-based hist vs MXU one-hot hist at 8M keys (Mt/s) — dispatch"
      " point: roll ≤ 2^7,\nMXU ≥ 2^8 (PLAN r3 sweep):\n")
    w("| bits | roll | MXU one-hot |")
    w("|---|---|---|")
    w("| 2 | 304 | 317 |")
    w("| 4 | 316 | 294 |")
    w("| 6 | 294 | 313 |")
    w("| 7 | 318 | 225 |")
    w("")
    w("### 6.4 mpsm chunking"
      " (`python -m avx_sort_merge_joins_tpu.bench.tputbench --mode"
      " mpsm`)\n")
    w("16M⋈16M v5e nchunks sweep (PLAN r3; the 128M nchunks=4 point is"
      " §1's last row):\n")
    w("| nchunks | sort ms | mergejoin ms | Mt/s |")
    w("|---|---|---|---|")
    w("| 1 | 112 | 34 | 195.6 |")
    w("| 2 | 147 | 72 | 123.0 |")
    w("| 4 | 205 | 137 | 74.0 |")
    w("| 8 | 316 | 284 | 41.5 |")
    w("")

    # ------------------------------------------------------------- context
    w("## 7. Baseline context\n")
    w("The in-repo scalar baseline (XLA `lax.sort` + XLA count, §1's"
      " `scalar` rows) is\nthe same-hardware foil; `bench.py` pins the"
      " headline ratio every round\n(BENCH_r04: 440.6 Mt/s = 6.06× that"
      " baseline at 128M⋈128M).  The reference's\nown numbers"
      " (BASELINE.md) are x86/AVX-hardware-bound and not directly"
      "\ncomparable chip-to-chip; the grid above reproduces its"
      " experiment STRUCTURE\n(algorithm comparison, cardinality,"
      " scalesize, skew, micro grids) on v5e.\n")
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    md = render()
    with open(DST, "w") as f:
        f.write(md)
    print(f"wrote {DST} ({len(md.splitlines())} lines)")
