"""Round-4 A/B: the fused last-level experiment (VERDICT r3 #2).

Variant fused1 (current): both compositions merge to ONE run; the count
kernel stream-merges the two columns (negated-S windows).
Variant fused2: both compositions STOP at TWO runs
(multiwaymerge.merge_levels_2runs — one tree traversal per element
deleted) and the 4-way-select count kernel
(mergejoin.merge_join_count_fused2) absorbs the missing merge at the
price of 3 tagged networks per emitted tile instead of 1.

Same session, same on-device data; SMJ_COUNT2 toggles the model path
(jit caches are keyed on the env snapshot).

Usage: PYTHONPATH=/root/repo python scripts/exp_count2.py [ntuples ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avx_sort_merge_joins_tpu import datagen
from avx_sort_merge_joins_tpu.models import mway
from avx_sort_merge_joins_tpu.ops import mergejoin
from avx_sort_merge_joins_tpu.utils.cache import enable_compile_cache


def run_case(n: int, reps: int):
    datagen.seed_generator(42)
    rk = datagen.parallel_create_relation(n, n).keys
    sk = datagen.parallel_create_relation(n, n).keys
    out = {}
    for mode, env in [("fused1", "0"), ("fused2", "1")]:
        os.environ["SMJ_COUNT2"] = env

        def run_async():
            return mway._mway_count_device(
                rk, sk, n, n, mway.FANIN_DEFAULT,
                mway.BLOCK_ROWS_MWAY, mway.TILE_ROWS_MWAY)

        t0 = time.perf_counter()
        st = run_async()
        float(jnp.sum(st[:1, :1]))
        print(f"[exp_count2] n={n} {mode}: compile+warm "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        cnt = mergejoin.finish_count_fused(st)
        assert cnt == n, (mode, cnt, n)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = run_async()
        float(jnp.sum(st[:1, :1]))
        secs = (time.perf_counter() - t0) / reps
        print(f"[exp_count2] n={n} {mode}: {secs * 1e3:.1f} ms  "
              f"{2 * n / secs / 1e6:.1f} Mt/s  (count exact)", flush=True)
        out[mode] = secs
    d = (out["fused1"] - out["fused2"]) / out["fused1"] * 100
    print(f"[exp_count2] n={n}: fused2 is {d:+.1f}% vs fused1", flush=True)


def main():
    enable_compile_cache()
    print(f"[exp_count2] backend={jax.default_backend()}", flush=True)
    sizes = [int(a) for a in sys.argv[1:]] or [16_000_000, 128_000_000]
    for n in sizes:
        run_case(n, reps=3)


if __name__ == "__main__":
    main()
