"""Round-4 experiment: the remote-pull receiver on REAL TPU.

1. Runs the EMULATED chunk-gated merge (remote_fifo.chunk_gated_merge)
   as a compiled Mosaic kernel on the attached TPU chip — the receiver
   logic executes on real hardware (arrivals emulated, data local).
2. Attempts to COMPILE the dark real-DMA pair
   (remote_fifo.remote_pull_exchange_merge) on the TPU backend, behind
   SMJ_REMOTE_DMA=1.  On this 1-chip host the compile may be rejected by
   the topology; either outcome is recorded (PLAN round-4).

Usage: PYTHONPATH=/root/repo python scripts/exp_remote_compile.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from avx_sort_merge_joins_tpu.ops.bitonic import KEY_POS_INF, LANES
from avx_sort_merge_joins_tpu.parallel import remote_fifo as rf


def main():
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind})")
    on_tpu = dev.platform == "tpu"

    # ---- 1. emulated receiver, compiled Mosaic, real chip -------------
    rng = np.random.default_rng(7)
    tile_rows, stride_rows, chunk_elems = 128, 1024, 16384 * 4
    W = 4
    cap = stride_rows * LANES
    lens = [cap, cap - 12345, cap // 2 + 1, cap - 1]
    rows = W * stride_rows + tile_rows + 8
    k2 = np.full((rows * LANES,), KEY_POS_INF, np.int32)
    vals = []
    for s in range(W):
        v = np.sort(rng.integers(-2**31 + 2, 2**31 - 2, lens[s],
                                 dtype=np.int64).astype(np.int32))
        k2[s * cap: s * cap + lens[s]] = v
        vals.append(v)
    expect = np.sort(np.concatenate(vals))
    arrive = rf.arrival_schedule(W, cap // chunk_elems, rate=2)
    t0 = time.perf_counter()
    merged, waited, viol = rf.chunk_gated_merge(
        jnp.asarray(k2.reshape(rows, LANES)), lens, stride_rows,
        chunk_elems, arrive, tile_rows=tile_rows,
        interpret=not on_tpu)
    got = np.asarray(merged).reshape(-1)[: expect.shape[0]]
    dt = time.perf_counter() - t0
    ok = bool(np.array_equal(got, expect))
    print(f"[1] emulated receiver on {dev.platform}: exact={ok} "
          f"viol={int(viol)} waited={np.asarray(waited).tolist()} "
          f"({dt:.1f}s incl. compile)")
    assert ok and int(viol) == 0

    # ---- 2. dark real-DMA pair: compile attempt ------------------------
    if not on_tpu:
        print("[2] skipped (no TPU attached)")
        return 0
    n_chips, cap2 = 4, 128 * LANES * 4
    bucket = jnp.zeros((n_chips * cap2,), jnp.int32)
    counts = jnp.zeros((n_chips,), jnp.int32)
    me = jnp.int32(0)
    try:
        fn = jax.jit(lambda b, c, m: rf.remote_pull_exchange_merge(
            b, c, m, n_chips, cap2, 128 * LANES, tile_rows=128))
        t0 = time.perf_counter()
        lowered = fn.lower(bucket, counts, me)
        compiled = lowered.compile()
        print(f"[2] remote-DMA pair COMPILED on the TPU backend "
              f"({time.perf_counter() - t0:.1f}s) — "
              f"{len(compiled.as_text()) if hasattr(compiled, 'as_text') else '?'} chars")
    except Exception as e:  # noqa: BLE001 — record the exact failure mode
        print(f"[2] remote-DMA compile FAILED: {type(e).__name__}: "
              f"{str(e)[:500]}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
