"""Remote-DMA FIFO-leaf scaffold: schedule/layout unit tests (the
interpret-testable half; the DMA kernel itself is dark — see the module
docstring's TEST PLAN for the >1-chip validation sequence)."""

import numpy as np
import pytest

from avx_sort_merge_joins_tpu.parallel import remote_fifo as rf


def test_push_schedule_chunk_major_and_complete():
    lens = [100, 0, 250, 64]
    plan = rf.push_schedule(4, me=1, bucket_lens=lens, chunk_elems=64)
    # every byte of every bucket is pushed exactly once
    seen = {d: [] for d in range(4)}
    for p in plan:
        seen[p.dst].append((p.start, p.size))
    for d, ln in enumerate(lens):
        spans = sorted(seen[d])
        total = sum(s for _, s in spans)
        assert total == ln, d
        pos = 0
        for st, sz in spans:
            assert st == pos
            pos += sz
    # chunk-major: all chunk-0 pushes precede any chunk-1 push
    rounds = [p.round for p in plan]
    assert rounds == sorted(rounds)
    first_c1 = next(i for i, p in enumerate(plan) if p.chunk == 1)
    assert all(p.chunk == 0 for p in plan[:first_c1])


def test_push_schedule_respects_order():
    order = [2, 0, 3, 1]
    plan = rf.push_schedule(4, me=0, bucket_lens=[64] * 4, chunk_elems=64)
    plan_o = rf.push_schedule(4, me=0, bucket_lens=[64] * 4,
                              chunk_elems=64, order=order)
    assert [p.dst for p in plan] == [0, 1, 2, 3]
    assert [p.dst for p in plan_o] == [2, 0, 3, 1]


def test_landing_layout_matches_bulk_exchange():
    strip, nch = rf.landing_layout(8, cap=1024, chunk_elems=256)
    assert strip == 1024 and nch == 4
    with pytest.raises(AssertionError):
        rf.landing_layout(8, cap=1000, chunk_elems=256)


def test_leaf_wait_chunks_monotone_and_sufficient():
    chunk, win = 4096, 16384 + 128  # window spans multiple chunks
    waits = rf.expected_sem_waits(10, win, chunk)
    assert waits == sorted(waits)
    for w, c in enumerate(waits):
        last_elem = w * win + win - 1
        assert c * chunk + chunk > last_elem  # waited chunk covers window
        assert (c - 1) * chunk + chunk <= last_elem + chunk  # not wasteful


def test_remote_dma_dark_by_default(monkeypatch):
    monkeypatch.delenv("SMJ_REMOTE_DMA", raising=False)
    assert not rf.remote_dma_enabled()
    monkeypatch.setenv("SMJ_REMOTE_DMA", "1")
    assert rf.remote_dma_enabled()


# ---------------------------------------------------------------------------
# round 4: the EXECUTABLE receiver — chunk-gated merge + arrival emulation
# ---------------------------------------------------------------------------

def _strips(rng, lens, stride_rows, tile_rows):
    from avx_sort_merge_joins_tpu.ops.bitonic import KEY_POS_INF, LANES

    W = len(lens)
    cap = stride_rows * LANES
    rows = W * stride_rows + tile_rows + 8
    k2 = np.full((rows * LANES,), KEY_POS_INF, np.int32)
    vals = []
    for s in range(W):
        v = np.sort(rng.integers(-10**6, 10**6, lens[s]).astype(np.int32))
        k2[s * cap: s * cap + lens[s]] = v
        vals.append(v)
    return k2.reshape(rows, 128), np.sort(np.concatenate(vals))


@pytest.mark.parametrize("case", ["bulk", "push-next", "slow", "late-leaf"])
def test_chunk_gated_merge_schedules(rng, case):
    """The receiver merge is exact under adversarial arrival schedules,
    never reads past a delivered prefix (violation flag), and its
    per-leaf chunk-wait counters equal the wait sequence the REAL kernel
    would issue (ceil(len/chunk) — the leaf_wait_chunk arithmetic)."""
    import jax.numpy as jnp

    tile_rows, stride_rows, chunk_elems = 8, 32, 1024
    lens = [3900, 0, 4096, 1111]
    k2, expect = _strips(rng, lens, stride_rows, tile_rows)
    arrive = {
        "bulk": np.zeros((4, 4), np.int32),
        "push-next": rf.arrival_schedule(4, 4, rate=1),
        "slow": rf.arrival_schedule(4, 4, rate=3),
        "late-leaf": np.array([[0, 0, 0, 0], [0, 0, 0, 0],
                               [9, 9, 9, 9], [0, 5, 10, 15]], np.int32),
    }[case]
    merged, waited, viol = rf.chunk_gated_merge(
        jnp.asarray(k2), lens, stride_rows, chunk_elems, arrive,
        tile_rows=tile_rows, interpret=True)
    got = np.asarray(merged).reshape(-1)[: expect.shape[0]]
    assert np.array_equal(got, expect)
    assert int(viol) == 0
    assert np.asarray(waited).tolist() == \
        [-(-ln // chunk_elems) for ln in lens]


def test_arrival_schedule_shape():
    a = rf.arrival_schedule(4, 3, rate=2)
    assert a.shape == (4, 3)
    assert np.all(np.diff(a, axis=1) >= 0)  # chunk_gated_merge requires
    # chunk-major: every chunk-0 arrival precedes every chunk-1 arrival
    assert a[:, 0].max() < a[:, 1].min()
    assert rf.arrival_schedule(4, 3, rate=0).max() == 0


def test_pick_chunk_elems():
    T = 1024
    assert rf.pick_chunk_elems(4 * T, T, 4) == T           # small: 1 tile
    c = rf.pick_chunk_elems(1024 * T, T, 8)                # big: coarsen
    assert c % T == 0 and (1024 * T) % c == 0
    assert 8 * ((1024 * T) // c) <= 512                    # SMEM budget


def test_dist_mway_remote_pull_uniform(rng):
    """The whole distributed m-way join through the chunk-gated receiver
    (the remote-pull readmerge, emulated arrivals) — exact vs oracle."""
    from avx_sort_merge_joins_tpu.ops.mergejoin import merge_join_count_numpy
    from avx_sort_merge_joins_tpu.parallel import dist_mway

    nR, nS = 60_000, 90_000
    rk = rng.permutation(np.arange(1, nR + 1)).astype(np.int32)
    sk = rng.integers(1, nR + 1, nS).astype(np.int32)
    cnt, ov = dist_mway.dist_mway_join_count(
        rk, sk, nR, nS, use_pallas=True, remote_pull="emulate")
    assert ov == 0
    assert cnt == merge_join_count_numpy(rk, sk)


def test_dist_mway_remote_pull_ragged_slow_arrivals(rng):
    """Ragged nonunique workload with SLOW chunk delivery (3 merge rounds
    per push round): the merge must stall on undelivered leaves and still
    come out exact."""
    from avx_sort_merge_joins_tpu.ops.mergejoin import merge_join_count_numpy
    from avx_sort_merge_joins_tpu.parallel import dist_mway

    nR, nS = 10_007, 14_013
    rk = rng.integers(1, 3000, nR).astype(np.int32)
    sk = rng.integers(1, 3000, nS).astype(np.int32)
    cnt, ov = dist_mway.dist_mway_join_count(
        rk, sk, nR, nS, use_pallas=True, slack=3.0,
        remote_pull="emulate", pull_rate=3)
    assert ov == 0
    assert cnt == merge_join_count_numpy(rk, sk)


def test_dist_mway_remote_pull_zipf(rng):
    """Zipf z=1 skew through the gated receiver (equi-depth splitters +
    chunked arrivals)."""
    from avx_sort_merge_joins_tpu.datagen import (create_relation_pk,
                                                  create_relation_zipf,
                                                  seed_generator)
    from avx_sort_merge_joins_tpu.ops.mergejoin import merge_join_count_numpy
    from avx_sort_merge_joins_tpu.parallel import dist_mway

    nR, nS = 20_000, 30_000
    seed_generator(42)
    R = create_relation_pk(nR)
    seed_generator(43)
    S = create_relation_zipf(nS, nR, 1.0)
    rk, _ = R.to_numpy()
    sk, _ = S.to_numpy()
    cnt, ov = dist_mway.dist_mway_join_count(
        rk, sk, nR, nS, use_pallas=True, slack=4.0,
        remote_pull="emulate")
    assert ov == 0
    assert cnt == merge_join_count_numpy(rk, sk)


def test_remote_pull_requires_pallas_flat_mesh(rng, capsys):
    """Flag honesty: remote_pull falls back LOUDLY off the Pallas flat
    path, and the real-DMA mode refuses on this host."""
    from avx_sort_merge_joins_tpu.ops.mergejoin import merge_join_count_numpy
    from avx_sort_merge_joins_tpu.parallel import dist_mway

    nR, nS = 20_000, 30_000
    rk = rng.permutation(np.arange(1, nR + 1)).astype(np.int32)
    sk = rng.integers(1, nR + 1, nS).astype(np.int32)
    cnt, ov = dist_mway.dist_mway_join_count(
        rk, sk, nR, nS, use_pallas=False, remote_pull="emulate")
    err = capsys.readouterr().err
    assert "remote_pull" in err and "bulk path" in err
    assert ov == 0 and cnt == merge_join_count_numpy(rk, sk)
    with pytest.raises(ValueError, match="multi-chip"):
        dist_mway.dist_mway_join_count(rk, sk, nR, nS, use_pallas=True,
                                       remote_pull="dma")
