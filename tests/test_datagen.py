"""Datagen tests — invariants of the reference generators plus NumPy↔native
cross-checks (reference semantics: src/datagen/generator.c, genzipf.c;
bit-exactness vs the compiled C code was verified out-of-band)."""

import numpy as np
import pytest

from avx_sort_merge_joins_tpu.datagen import (
    GlibcRand,
    create_relation_fk,
    create_relation_nonunique,
    create_relation_pk,
    create_relation_zipf,
    gen_zipf,
    parallel_create_relation,
    seed_generator,
)
from avx_sort_merge_joins_tpu.datagen.c_rng import RAND_MAX
from avx_sort_merge_joins_tpu.datagen.generator import knuth_shuffle_keys


def test_glibc_rand_known_values():
    # golden outputs from glibc srand(12345); rand() x 8
    r = GlibcRand(12345)
    assert [r.rand() for _ in range(8)] == [
        383100999, 858300821, 357768173, 455528251,
        133005921, 116285904, 591987137, 102557902,
    ]


def test_glibc_rand_array_matches_scalar():
    a = GlibcRand(7)
    b = GlibcRand(7)
    xs = a.rand_array(1000)
    ys = np.array([b.rand() for _ in range(1000)])
    assert (xs == ys).all()
    # stream continues correctly after a block fill
    assert a.rand() == b.rand()


def test_rand_in_range():
    r = GlibcRand(3)
    xs = r.rand_array(10000)
    assert xs.min() >= 0 and xs.max() <= RAND_MAX


def test_knuth_shuffle_numpy_native_agree():
    try:
        from avx_sort_merge_joins_tpu.datagen import native
    except Exception:
        pytest.skip("native module unavailable")
    if not native.available():
        pytest.skip("native lib not built")
    n = 100000  # above the native threshold
    keys_nat = np.arange(1, n + 1, dtype=np.int32)
    native.knuth_shuffle(keys_nat, GlibcRand(99))
    # numpy path: force by using the slow loop directly on a fresh rng
    rng = GlibcRand(99)
    draws = rng.rand_array(n - 1).astype(np.float64)
    idx = np.arange(n - 1, 0, -1, dtype=np.int64)
    js = (draws / float(RAND_MAX + 1) * idx).astype(np.int64)
    keys_np = np.arange(1, n + 1, dtype=np.int32)
    for pos, i in enumerate(range(n - 1, 0, -1)):
        j = js[pos]
        keys_np[i], keys_np[j] = keys_np[j], keys_np[i]
    assert (keys_nat == keys_np).all()


def test_pk_relation_is_permutation():
    seed_generator(42)
    rel = create_relation_pk(10000)
    keys, payloads = rel.to_numpy()
    assert sorted(keys.tolist()) == list(range(1, 10001))
    assert (payloads == np.arange(5, 10005)).all()


def test_parallel_create_relation_multiset():
    seed_generator(42)
    rel = parallel_create_relation(10000, maxid=10000, nthreads=4)
    keys, payloads = rel.to_numpy()
    assert sorted(keys.tolist()) == list(range(1, 10001))
    # payload = 5 + index within each thread's chunk of 2500
    assert payloads[0] == 5 and payloads[2499] == 5 + 2499
    assert payloads[2500] == 5 and payloads[9999] == 5 + 2499


def test_fk_relation_multiset():
    seed_generator(1)
    rel = create_relation_fk(25000, maxid=10000)
    keys, _ = rel.to_numpy()
    counts = np.bincount(keys, minlength=10001)
    # two full blocks of 1..10000 plus one shuffled 1..5000 block
    assert (counts[1:5001] == 3).all()
    assert (counts[5001:10001] == 2).all()


def test_nonunique_range():
    seed_generator(5)
    rel = create_relation_nonunique(50000, maxid=1000)
    keys, payloads = rel.to_numpy()
    assert keys.min() >= 0 and keys.max() < 1000
    assert (payloads == (50000 - np.arange(50000))).all()


def test_zipf_skew_and_alphabet():
    seed_generator(9)
    rel = create_relation_zipf(100000, maxid=1000, zipf_param=1.0)
    keys, _ = rel.to_numpy()
    assert keys.min() >= 1 and keys.max() <= 1000
    counts = np.sort(np.bincount(keys, minlength=1001))[::-1]
    # heavy hitter should dominate: top key ~ N/H(1000) ≈ 13.4% of draws
    assert counts[0] > 100000 * 0.08
    # z=0: uniform-ish sanity
    u = gen_zipf(100000, 1000, 0.0, GlibcRand(9))
    cu = np.bincount(u, minlength=1001)[1:]
    assert cu.max() < 3 * cu.mean()


def test_zipf_numpy_native_agree_small_vs_large_threshold():
    # same seed: sequence must not depend on which implementation path runs
    a = gen_zipf(65536, 100, 0.75, GlibcRand(11))  # native path (if built)
    b_rng = GlibcRand(11)
    # force numpy path by calling below threshold in two chunks is NOT
    # equivalent (stream position differs), so instead check the prefix
    # against a scalar re-implementation of the draw loop.
    from avx_sort_merge_joins_tpu.datagen.genzipf import gen_alphabet, gen_zipf_lut

    alphabet = gen_alphabet(100, b_rng)
    lut = gen_zipf_lut(0.75, 100)
    draws = b_rng.rand_array(65536).astype(np.float64) / float(RAND_MAX)
    pos = np.minimum(np.searchsorted(lut, draws, side="left"), 99)
    assert (a == alphabet[pos]).all()


def test_shuffle_preserves_multiset(rng):
    n = int(rng.integers(2, 5000))
    keys = rng.integers(-(2**31) + 1, 2**31 - 2, n).astype(np.int32)
    orig = np.sort(keys.copy())
    knuth_shuffle_keys(keys, GlibcRand(int(rng.integers(1, 1 << 30))))
    assert (np.sort(keys) == orig).all()


def test_tblio_roundtrip(rng):
    """Native .tbl writer/reader (csrc/tblio.cc) vs the Python fallback —
    the reference's write_relation text format (generator.c:200-213)."""
    import os
    import tempfile

    from avx_sort_merge_joins_tpu.datagen import generator as g
    from avx_sort_merge_joins_tpu.types import Relation

    n = 10_000
    keys = rng.integers(-(10**9), 10**9, n).astype(np.int32)
    pays = rng.integers(-(10**9), 10**9, n).astype(np.int32)
    rel = Relation.from_numpy(keys, pays)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "T.tbl")
        g.write_relation(rel, p)
        with open(p) as f:
            first = f.readline().split()
        assert [int(first[0]), int(first[1])] == [keys[0], pays[0]]
        back = g.read_relation(p)
        bk, bp = back.to_numpy()
        np.testing.assert_array_equal(bk, keys)
        np.testing.assert_array_equal(bp, pays)


def test_zipf_golden_vs_reference_c():
    """Bit-exact gen_zipf streams vs the reference genzipf.c compiled on
    this host (driver: srand(seed); gen_zipf(n, alpha, z)).  Golden
    constants are the C binary's first outputs."""
    from avx_sort_merge_joins_tpu.datagen.c_rng import GlibcRand
    from avx_sort_merge_joins_tpu.datagen.genzipf import gen_zipf

    golden = {
        (42, 1000, 1.0): [281, 817, 148, 557, 557, 668],
        (7, 500, 0.5): [192, 292, 65, 165, 495, 151],
        (42, 1000, 0.75): [283, 878, 148, 902, 152, 197],
    }
    for (seed, alpha, z), expect in golden.items():
        got = gen_zipf(12, alpha, z, GlibcRand(seed))[:6]
        assert got.tolist() == expect, (seed, alpha, z, got)
