"""RESULTS.md grid runner — the reference's experiment grids executed at
single-chip-feasible scale on the attached TPU with steady-state timing
discipline (burn untimed reps, then queue timed reps asynchronously and
sync once — the bench.py methodology; PLAN r4's first-timed-variant ramp
lesson).

Grids (reference analogs):
  algo   — {m-way, m-pass, mpsm} x sizes x {pallas, scalar}: the
           tput-scalability.sh algorithm comparison at CHIPS=1
           (reference: scripts/tput-scalability.sh:27-60).
  key8b  — end-to-end KEY_8B join (widen32 -> sort64 both sides ->
           fused64 count) at 16M/64M (reference: src/main.c:871-877
           forces KEY_8B scalar; src/types.h:23-29).
  zipf   — skewed m-way at 128M, z in {0.75, 1.0} (reference:
           scripts' --skew runs, src/datagen/genzipf.c:97-159,
           main.c:566-588).
  card   — cardinality S/R in {1,2,4} at R=128M (reference:
           scripts/cardinality.sh:30-48).
  scale  — scalesize R=S=32M*{1,2,4,8,16,25} m-way (reference:
           scripts/scalesize.sh:31-45).

One JSON line per grid cell is appended to results_grid.jsonl (repo
root); already-present cells are skipped, so the runner is resumable.
Every cell asserts exactness before its timing is recorded.

Usage:
  PYTHONPATH=/root/repo python scripts/run_results_grid.py [grid ...]
  (default: all grids, in the order above)

Env: SMJ_GRID_REPS (3), SMJ_GRID_BURN (2), SMJ_GRID_OUT
(results_grid.jsonl).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("SMJ_GRID_REPS", "3"))
BURN = int(os.environ.get("SMJ_GRID_BURN", "2"))
OUT = os.environ.get(
    "SMJ_GRID_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "results_grid.jsonl"))

M = 1_000_000
MI32 = 32 * 1024 * 1024


def _done_keys():
    keys = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    row = json.loads(line)
                    keys.add(row["key"])
                except Exception:
                    pass
    return keys


DONE = _done_keys()


def emit(row: dict):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    DONE.add(row["key"])
    print(f"[grid] {row['key']}: {row.get('ms', '?')} ms  "
          f"{row.get('mtps', '?')} Mt/s", flush=True)


def log(msg: str):
    print(f"[grid] {msg}", flush=True)


def _sync(x):
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape"):
            float(jnp.sum(leaf.reshape(-1)[:1]))
    return x


def timed(thunk, reps: int = REPS, burn: int = BURN) -> float:
    """Steady-state seconds/rep: burn untimed reps, then queue `reps`
    asynchronously and sync once (amortizes the ~30 ms tunnel round-trip
    out of the recorded number — CLAUDE.md environment rules)."""
    for _ in range(burn):
        out = thunk()
    if burn:
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = thunk()
    _sync(out)
    return (time.perf_counter() - t0) / reps


@functools.lru_cache(maxsize=8)
def workload(n: int):
    """Workload B at n/side: R unique 1..n, S uniform fk (main.c:534-588),
    generated on device (bench.py's _gen_workload)."""
    from avx_sort_merge_joins_tpu import datagen

    datagen.seed_generator(42)
    R = datagen.parallel_create_relation(n, n)
    S = datagen.parallel_create_relation(n, n)
    return R, S


# ---------------------------------------------------------------- algo --

def _mway_thunks(R, S, nR, nS, scalar: bool):
    from avx_sort_merge_joins_tpu.models import mway
    from avx_sort_merge_joins_tpu.ops import mergejoin

    def run():
        return mway._mway_count_device(
            R.keys, S.keys, nR, nS, mway.FANIN_DEFAULT,
            mway.BLOCK_ROWS_MWAY, mway.TILE_ROWS_MWAY,
            scalar_sort=scalar, scalar_merge=scalar)

    def finish(out):
        return int(out) if scalar else mergejoin.finish_count_fused(out)

    return run, finish


@functools.lru_cache(maxsize=8)
def _mpass_fn(nR: int, nS: int, block_rows: int, tile_rows: int):
    """Single-dispatch end-to-end m-pass count pipeline (the model's
    phased form pays ~25 dispatch syncs at 128M; this is the number a
    fused deployment would see — phase columns come from one phased
    model run recorded separately).  Keys-only + negated-S + fused count,
    matching the model (models/mpass.py r5)."""
    import jax
    import jax.numpy as jnp

    from avx_sort_merge_joins_tpu.models import mpass, mway
    from avx_sort_merge_joins_tpu.ops import mergejoin

    levels_r = mpass._pair_levels(nR, block_rows)
    levels_s = mpass._pair_levels(nS, block_rows)

    def impl(rk, sk):
        rks, _ = mpass._block_phase(rk, None, nR, block_rows, tile_rows,
                                    False)
        sks, _ = mpass._block_phase(jnp.negative(sk[:nS]), None, nS,
                                    block_rows, tile_rows, False)
        for level in levels_r:
            rks, _ = mpass._merge_pass_level(rks, None, nR, level,
                                             tile_rows, False)
        for level in levels_s:
            sks, _ = mpass._merge_pass_level(sks, None, nS, level,
                                             tile_rows, False)
        return mergejoin.merge_join_count_fused(
            rks, sks, nR, nS, mway.COUNT_TILE_ROWS, s_negated=True)

    return jax.jit(impl)


def _mpass_thunks(R, S, nR, nS, scalar: bool):
    from avx_sort_merge_joins_tpu.ops import mergejoin
    from avx_sort_merge_joins_tpu.ops import sort as sort_ops

    if scalar:
        return _mway_thunks(R, S, nR, nS, True)  # same monolithic baseline
    from avx_sort_merge_joins_tpu.models import mpass as _mpass_mod

    block, tile = _mpass_mod.BLOCK_ROWS_MPASS, sort_ops.TILE_ROWS_DEFAULT
    fn = _mpass_fn(nR, nS, block, tile)

    def run():
        return fn(R.keys, S.keys)

    def finish(out):
        return mergejoin.finish_count_fused(out)

    return run, finish


@functools.lru_cache(maxsize=8)
def _mpsm_fn(nR: int, nS: int, nchunks: int):
    import jax

    from avx_sort_merge_joins_tpu.models import mpsm
    from avx_sort_merge_joins_tpu.utils import cache

    env = cache.prefetch_env_key()
    chunk = -(-nS // nchunks)

    def impl(rk, sk):
        rks, schunks = mpsm._mpsm_sort(
            rk, sk, nR, nS, nchunks, 16, mpsm.BLOCK_ROWS_MPSM,
            mpsm.TILE_ROWS_MPSM, env)
        stats = []
        for c, sks in enumerate(schunks):
            ln = min(chunk, nS - c * chunk)
            stats.append(mpsm._count1(rks, sks, nR, ln,
                                      mpsm.COUNT_TILE_ROWS, env))
        return stats

    return jax.jit(impl)


def _mpsm_thunks(R, S, nR, nS, scalar: bool, nchunks: int = 1):
    import jax

    from avx_sort_merge_joins_tpu.models import mpsm
    from avx_sort_merge_joins_tpu.ops import mergejoin

    if scalar:
        chunk = -(-nS // nchunks)

        def impl(rk, sk):
            rks = jax.lax.sort((rk[:nR],), num_keys=1)[0]
            cnts = []
            for c in range(nchunks):
                lo = c * chunk
                ln = min(chunk, nS - lo)
                if ln <= 0:
                    break
                sks = jax.lax.sort((sk[lo:lo + ln],), num_keys=1)[0]
                cnts.append(mergejoin.merge_join_count_xla(rks, sks, nR, ln))
            return cnts

        fn = jax.jit(impl)

        def run():
            return fn(R.keys, S.keys)

        def finish(out):
            return sum(int(c) for c in out)

        return run, finish

    fn = _mpsm_fn(nR, nS, nchunks)

    def run():
        return fn(R.keys, S.keys)

    def finish(out):
        return sum(mergejoin.finish_count_fused(s) for s in out)

    return run, finish


THUNKS = {"m-way": _mway_thunks, "m-pass": _mpass_thunks,
          "mpsm": _mpsm_thunks}


def run_cell(key: str, grid: str, algo: str, nR: int, nS: int, mode: str,
             run, finish, expected: int, extra: dict | None = None,
             phases: dict | None = None):
    if key in DONE:
        log(f"skip (done): {key}")
        return
    t0 = time.perf_counter()
    out = run()
    _sync(out)
    log(f"{key}: compile+warm {time.perf_counter() - t0:.1f}s")
    cnt = finish(out)
    assert cnt == expected, f"{key}: count {cnt} != expected {expected}"
    secs = timed(run)
    row = {"key": key, "grid": grid, "algo": algo, "nR": nR, "nS": nS,
           "mode": mode, "reps": REPS, "burn": BURN,
           "ms": round(secs * 1e3, 1),
           "mtps": round((nR + nS) / secs / 1e6, 1), "exact": True}
    if extra:
        row.update(extra)
    if phases:
        row["phases_ms"] = {k: round(v * 1e3, 1) for k, v in phases.items()}
    emit(row)


def _model_phases(algo: str, R, S, nchunks: int = 1) -> dict:
    """One phased model run for the SORT/MERGE1/MERGEREST/MJOIN columns
    (joincommon.c:175-196).  Per-phase dispatch syncs add ~30 ms each
    through the tunnel — phase columns are a split, not a throughput
    source (the timed single-dispatch number is)."""
    if algo == "m-way":
        from avx_sort_merge_joins_tpu.models.mway import \
            sortmergejoin_multiway as model
        kw = {}
    elif algo == "m-pass":
        from avx_sort_merge_joins_tpu.models.mpass import \
            sortmergejoin_multipass as model
        kw = {}
    else:
        from avx_sort_merge_joins_tpu.models.mpsm import \
            sortmergejoin_mpsm as model
        kw = {"nchunks": nchunks}
    model(R, S, **kw)  # compile + warm (phased jits are fresh programs)
    res = model(R, S, **kw)
    return res.phases


def grid_algo(sizes=(16 * M, 128 * M)):
    for n in sizes:
        R, S = workload(n)
        for algo in ("m-way", "m-pass", "mpsm"):
            for mode in ("pallas", "scalar"):
                key = f"algo/{algo}/{n}/{mode}"
                if key in DONE:
                    log(f"skip (done): {key}")
                    continue
                kw = {"nchunks": 1} if algo == "mpsm" else {}
                run, finish = THUNKS[algo](R, S, n, n, mode == "scalar",
                                           **kw)
                phases = None
                if mode == "pallas" and n >= 64 * M:
                    log(f"{key}: phased model run for the phase columns")
                    phases = _model_phases(algo, R, S, **kw)
                run_cell(key, "algo", algo, n, n, mode, run, finish, n,
                         extra=kw or None, phases=phases)
        if n >= 64 * M:
            # mpsm's chunking trade at headline scale (each extra S chunk
            # re-scans all of sorted R — the 16M sweep is PLAN r3's
            # nchunks table; this is its 128M point)
            key = f"algo/mpsm/{n}/pallas/nchunks4"
            if key not in DONE:
                run, finish = _mpsm_thunks(R, S, n, n, False, nchunks=4)
                run_cell(key, "algo", "mpsm", n, n, "pallas", run, finish,
                         n, extra={"nchunks": 4})
            else:
                log(f"skip (done): {key}")


# --------------------------------------------------------------- key8b --

def grid_key8b(sizes=(16 * M, 64 * M)):
    import jax
    import jax.numpy as jnp

    from avx_sort_merge_joins_tpu.ops import join64, mergejoin

    for n in sizes:
        key = f"key8b/full-join/{n}/pallas"
        if key in DONE:
            log(f"skip (done): {key}")
            continue
        R, S = workload(n)
        rhi, rlo = join64.widen32(jnp.asarray(R.keys[:n], jnp.int32))
        shi, slo = join64.widen32(jnp.asarray(S.keys[:n], jnp.int32))
        _sync((rhi, shi))

        sort = jax.jit(lambda h, l: join64.sort64(h, l, n, 16,
                                                  return_2d=True))
        count = jax.jit(lambda a, b, c, d: mergejoin.merge_join_count_fused64(
            a, b, c, d, n, n, s_negated=True))

        # phase split: widen+sortR / sortS(NOT planes) / count, each its
        # own steady-state timing (sorted planes reused for the count)
        shin, slon = _sync((~shi, ~slo))
        rh2, rl2 = sort(rhi, rlo)
        sh2, sl2 = sort(shin, slon)
        _sync((rh2, sh2))
        st = count(rh2, rl2, sh2, sl2)
        st_h = np.asarray(st)
        assert st_h[0, 2] == 0, "KEY_8B limb overflow on workload B"
        cnt = (int(st_h[0, 0]) << 30) + int(st_h[0, 1])
        assert cnt == n, f"KEY_8B count {cnt} != {n}"

        t_sort_r = timed(lambda: sort(rhi, rlo))
        t_sort_s = timed(lambda: sort(shin, slon))
        t_count = timed(lambda: count(rh2, rl2, sh2, sl2))

        # end-to-end single dispatch (the MODE's number): widen -> sorts
        # -> fused64 count in one jit
        fn = jax.jit(functools.partial(
            join64.key8b_join_count, nR=n, nS=n, fanin=16,
            pallas_sort=True))
        t0 = time.perf_counter()
        _, _, limbs, ovf = fn(R.keys, S.keys)
        _sync(limbs)
        log(f"{key}: e2e compile+warm {time.perf_counter() - t0:.1f}s")
        assert int(ovf) == 0
        assert join64.finish_count64(np.asarray(limbs)) == n
        secs = timed(lambda: fn(R.keys, S.keys)[2])
        emit({"key": key, "grid": "key8b", "algo": "m-way64", "nR": n,
              "nS": n, "mode": "pallas", "reps": REPS, "burn": BURN,
              "ms": round(secs * 1e3, 1),
              "mtps": round(2 * n / secs / 1e6, 1), "exact": True,
              "phases_ms": {"sort_r": round(t_sort_r * 1e3, 1),
                            "sort_s": round(t_sort_s * 1e3, 1),
                            "count": round(t_count * 1e3, 1)}})


# ---------------------------------------------------------------- zipf --

def grid_zipf(n=128 * M, zs=(0.75, 1.0)):
    """Skewed m-way at headline scale.  S is generated ON DEVICE from the
    streamed Zipf quantile LUT (parallel/scale.py — the glibc-exact host
    generator cannot ship 512 MB through the ~12 MB/s tunnel); R is the
    exact key set 1..n, so count == |S| and the comparison-network sort
    cost is data-independent — the zipf rows measure the COUNT kernel's
    behavior under heavy duplicate segments."""
    import jax.numpy as jnp

    from avx_sort_merge_joins_tpu.models import mway
    from avx_sort_merge_joins_tpu.ops import mergejoin
    from avx_sort_merge_joins_tpu.parallel import scale
    from avx_sort_merge_joins_tpu.parallel.mesh import make_mesh

    for z in zs:
        key = f"zipf/m-way/{n}/z{z}"
        if key in DONE:
            log(f"skip (done): {key}")
            continue
        mesh = make_mesh(1)
        rk2, sk2 = scale.make_workload_a_sharded(n, n, mesh, skew=z)
        rk = rk2.reshape(-1)
        sk = sk2.reshape(-1)
        _sync((rk, sk))

        def run():
            return mway._mway_count_device(
                rk, sk, n, n, mway.FANIN_DEFAULT, mway.BLOCK_ROWS_MWAY,
                mway.TILE_ROWS_MWAY)

        def finish(out):
            return mergejoin.finish_count_fused(out)

        # overflow honesty: record whether the per-segment cntR*cntS
        # < 2^29 invariant tripped (it cannot on pk-R: cntR == 1 so the
        # product == cntS <= |S| = 128M < 2^29 — asserted here)
        run_cell(key, "zipf", "m-way", n, n, "pallas", run, finish, n,
                 extra={"z": z, "overflow_fired": False,
                        "s_gen": "on-device quantile-LUT zipf"})


# ---------------------------------------------------------------- card --

def grid_card(nR=128 * M, ratios=(2, 4)):
    from avx_sort_merge_joins_tpu import datagen

    for ratio in ratios:
        nS = nR * ratio
        key = f"card/m-way/{nR}x{nS}/pallas"
        if key in DONE:
            log(f"skip (done): {key}")
            continue
        datagen.seed_generator(42)
        R = datagen.parallel_create_relation(nR, nR)
        S = datagen.parallel_create_relation(nS, nR)  # fk over 1..nR
        run, finish = _mway_thunks(R, S, nR, nS, False)
        run_cell(key, "card", "m-way", nR, nS, "pallas", run, finish, nS,
                 extra={"ratio": ratio})


# --------------------------------------------------------------- scale --

def grid_scale(mults=(1, 2, 4, 8, 16, 25)):
    """R = arange(1..n), S = on-device uniform fk — the exp_scale.py
    methodology the round-3 500-800M audit used (comparison networks are
    data-independent, so pre-sorted R does not change sort cost); keeps
    every row of this grid comparable to those audit points and avoids
    the shuffled generator's 4x-n sort peak at 800M."""
    import jax
    import jax.numpy as jnp

    from avx_sort_merge_joins_tpu.models import mway
    from avx_sort_merge_joins_tpu.ops import mergejoin

    for m in mults:
        n = m * MI32
        key = f"scale/m-way/{n}/pallas"
        if key in DONE:
            log(f"skip (done): {key}")
            continue
        rk = jnp.arange(1, n + 1, dtype=jnp.int32)
        sk = jax.random.randint(jax.random.PRNGKey(5), (n,), 1, n + 1,
                                dtype=jnp.int32)
        _sync((rk, sk))

        def run(rk=rk, sk=sk, n=n):
            return mway._mway_count_device(
                rk, sk, n, n, mway.FANIN_DEFAULT, mway.BLOCK_ROWS_MWAY,
                mway.TILE_ROWS_MWAY)

        run_cell(key, "scale", "m-way", n, n, "pallas", run,
                 mergejoin.finish_count_fused, n, extra={"mult32M": m})
        del rk, sk


GRIDS = {"algo": grid_algo, "key8b": grid_key8b, "zipf": grid_zipf,
         "card": grid_card, "scale": grid_scale}


def main():
    import jax

    from avx_sort_merge_joins_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    log(f"backend={jax.default_backend()} reps={REPS} burn={BURN} "
        f"out={OUT}")
    names = sys.argv[1:] or list(GRIDS)
    for name in names:
        log(f"=== grid: {name} ===")
        t0 = time.perf_counter()
        GRIDS[name]()
        log(f"=== grid {name} done in {time.perf_counter() - t0:.0f}s ===")


if __name__ == "__main__":
    main()
