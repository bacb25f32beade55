"""Round-4 KEY_8B count-kernel sweep (VERDICT r3 weak #6 / #7): tile
128 vs 256, single- vs double-buffered windows — the V2 medicine applied
to the plane-pair kernel (ops/mergejoin._count_kernel64).

Sorts once (join64.sort64), then times ONLY merge_join_count_fused64
per variant on the same on-device planes.

Usage: PYTHONPATH=/root/repo python scripts/exp_key8b.py [ntuples ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avx_sort_merge_joins_tpu import datagen
from avx_sort_merge_joins_tpu.ops import join64, mergejoin
from avx_sort_merge_joins_tpu.utils.cache import enable_compile_cache


def run_case(n: int, reps: int):
    datagen.seed_generator(42)
    rk = datagen.parallel_create_relation(n, n).keys
    sk = datagen.parallel_create_relation(n, n).keys
    rhi, rlo = join64.widen32(jnp.asarray(rk[:n], jnp.int32))
    shi, slo = join64.widen32(jnp.asarray(sk[:n], jnp.int32))
    sort = jax.jit(lambda h, l: join64.sort64(h, l, n, 16, return_2d=True))
    rh2, rl2 = sort(rhi, rlo)
    sh2, sl2 = sort(shi, slo)
    float(jnp.sum(rh2[:1, :1]) + jnp.sum(sh2[:1, :1]))
    results = {}
    for tile in (128, 256):
        for pf in (False, True):
            fn = jax.jit(lambda a, b, c, d, t=tile, p=pf:
                         mergejoin.merge_join_count_fused64(
                             a, b, c, d, n, n, tile_rows=t, prefetch=p))
            t0 = time.perf_counter()
            st = fn(rh2, rl2, sh2, sl2)
            st_h = np.asarray(st)
            print(f"[exp_key8b] n={n} tile={tile} prefetch={int(pf)}: "
                  f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
            assert st_h[0, 2] == 0
            cnt = (int(st_h[0, 0]) << 30) + int(st_h[0, 1])
            assert cnt == n, (tile, pf, cnt, n)
            # steady-state warmup: the FIRST timed loop of a session reads
            # 1.7x high even after the compile dispatch (tunnel/device
            # ramp — measured 87.1 -> 50.3 ms for the identical variant
            # re-timed at the end; r4 session) — burn a few reps first
            for _ in range(3):
                st = fn(rh2, rl2, sh2, sl2)
            float(jnp.sum(st[:1, :1]))
            t0 = time.perf_counter()
            for _ in range(reps):
                st = fn(rh2, rl2, sh2, sl2)
            float(jnp.sum(st[:1, :1]))
            secs = (time.perf_counter() - t0) / reps
            results[(tile, pf)] = secs
            print(f"[exp_key8b] n={n} tile={tile} prefetch={int(pf)}: "
                  f"{secs*1e3:.1f} ms  {2*n/secs/1e6:.1f} Mt/s (count exact)",
                  flush=True)
    # negated (NOT-plane) S layout: back-to-front windows + 1 elementwise
    # ~ per plane replace the two 14-stage flips per tile (the plane-pair
    # analog of the 32-bit negated-S trick); needs S sorted as ~planes
    snh2, snl2 = sort(~shi, ~slo)
    float(jnp.sum(snh2[:1, :1]))
    for tile in (256,):
        fn = jax.jit(lambda a, b, c, d, t=tile:
                     mergejoin.merge_join_count_fused64(
                         a, b, c, d, n, n, tile_rows=t, prefetch=True,
                         s_negated=True))
        t0 = time.perf_counter()
        st = fn(rh2, rl2, snh2, snl2)
        st_h = np.asarray(st)
        print(f"[exp_key8b] n={n} tile={tile} NEG+pf: compile+warm "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        assert st_h[0, 2] == 0
        cnt = (int(st_h[0, 0]) << 30) + int(st_h[0, 1])
        assert cnt == n, (tile, "neg", cnt, n)
        for _ in range(3):  # same steady-state burn as the other variants
            st = fn(rh2, rl2, snh2, snl2)
        float(jnp.sum(st[:1, :1]))
        t0 = time.perf_counter()
        for _ in range(reps):
            st = fn(rh2, rl2, snh2, snl2)
        float(jnp.sum(st[:1, :1]))
        secs = (time.perf_counter() - t0) / reps
        results[(tile, "neg")] = secs
        print(f"[exp_key8b] n={n} tile={tile} NEG+pf: {secs*1e3:.1f} ms  "
              f"{2*n/secs/1e6:.1f} Mt/s (count exact)", flush=True)
    base = results[(128, False)]
    best = min(results, key=results.get)
    print(f"[exp_key8b] n={n}: baseline tile128/single "
          f"{base*1e3:.1f} ms; best {best} {results[best]*1e3:.1f} ms "
          f"({(base-results[best])/base*100:+.1f}%)", flush=True)


def main():
    enable_compile_cache()
    print(f"[exp_key8b] backend={jax.default_backend()}", flush=True)
    sizes = [int(a) for a in sys.argv[1:]] or [16_000_000, 64_000_000]
    for n in sizes:
        run_case(n, reps=5)


if __name__ == "__main__":
    main()
