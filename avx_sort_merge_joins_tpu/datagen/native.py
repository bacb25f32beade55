"""ctypes bindings for the native datagen kernels (csrc/datagen.c).

The shared library is compiled on first use with the system C compiler into
``csrc/build/``.  Python's :class:`~.c_rng.GlibcRand` owns the RNG state; its
31-word history is passed by pointer so NumPy and native paths interleave
bit-exactly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .c_rng import GlibcRand

_lock = threading.Lock()
_lib = None
_tried = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _build() -> str:
    src = os.path.abspath(os.path.join(_CSRC, "datagen.c"))
    out_dir = os.path.abspath(os.path.join(_CSRC, "build"))
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libsmjdatagen.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cc = os.environ.get("CC", "cc")
    subprocess.run(
        [cc, "-O3", "-shared", "-fPIC", src, "-o", so], check=True, capture_output=True
    )
    return so


def _build_tblio() -> str:
    src = os.path.abspath(os.path.join(_CSRC, "tblio.cc"))
    out_dir = os.path.abspath(os.path.join(_CSRC, "build"))
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libsmjtblio.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cxx = os.environ.get("CXX", "g++")
    subprocess.run(
        [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", src,
         "-o", so], check=True, capture_output=True
    )
    return so


_tblio_lib = None
_tblio_tried = False


def _load_tblio():
    global _tblio_lib, _tblio_tried
    with _lock:
        if _tblio_lib is not None or _tblio_tried:
            return _tblio_lib
        _tblio_tried = True
        try:
            lib = ctypes.CDLL(_build_tblio())
        except Exception:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.tbl_write.argtypes = [ctypes.c_char_p, i32p, i32p,
                                  ctypes.c_int64, ctypes.c_int]
        lib.tbl_write.restype = ctypes.c_int
        lib.tbl_append.argtypes = [ctypes.c_char_p, i32p, i32p,
                                   ctypes.c_int64, ctypes.c_int]
        lib.tbl_append.restype = ctypes.c_int
        lib.tbl_read.argtypes = [ctypes.c_char_p, i32p, i32p, ctypes.c_int64]
        lib.tbl_read.restype = ctypes.c_int64
        _tblio_lib = lib
        return _tblio_lib


def tblio_available() -> bool:
    return _load_tblio() is not None


def tbl_write(path: str, keys: np.ndarray, payloads: np.ndarray,
              nthreads: int = 8) -> None:
    lib = _load_tblio()
    keys = np.ascontiguousarray(keys, np.int32)
    payloads = np.ascontiguousarray(payloads, np.int32)
    rc = lib.tbl_write(path.encode(), keys, payloads, keys.shape[0], nthreads)
    if rc != 0:
        raise IOError(f"tbl_write({path}) failed with {rc}")


def tbl_append(path: str, keys: np.ndarray, payloads: np.ndarray,
               nthreads: int = 8) -> None:
    """Append rows to an existing (or new) .tbl — the streaming-persist
    primitive: distributed materialize flushes one bounded per-chip chunk
    at a time instead of assembling the join output on the host."""
    lib = _load_tblio()
    keys = np.ascontiguousarray(keys, np.int32)
    payloads = np.ascontiguousarray(payloads, np.int32)
    rc = lib.tbl_append(path.encode(), keys, payloads, keys.shape[0],
                        nthreads)
    if rc != 0:
        raise IOError(f"tbl_append({path}) failed with {rc}")


def tbl_read(path: str, cap: int):
    lib = _load_tblio()
    keys = np.empty(cap, np.int32)
    payloads = np.empty(cap, np.int32)
    n = lib.tbl_read(path.encode(), keys, payloads, cap)
    if n < 0:
        raise IOError(f"tbl_read({path}) failed with {n}")
    return keys[:n], payloads[:n]


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            lib = ctypes.CDLL(_build())
        except Exception:
            return None
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.glibc_fill.argtypes = [u32p, u32p, ctypes.c_int64]
        lib.knuth_shuffle_i32.argtypes = [i32p, ctypes.c_int64, u32p]
        lib.alphabet_shuffle_i64.argtypes = [i64p, ctypes.c_int64, u32p]
        lib.zipf_fill_i32.argtypes = [f64p, i64p, ctypes.c_int64, i32p, ctypes.c_int64, u32p]
        lib.random_gen_i32.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, u32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _hist(rng: GlibcRand) -> np.ndarray:
    h = np.ascontiguousarray(rng._hist, dtype=np.uint32)
    rng._hist = h  # share the buffer so C-side updates persist
    return h


def knuth_shuffle(keys: np.ndarray, rng: GlibcRand) -> None:
    lib = _load()
    assert keys.dtype == np.int32 and keys.flags.c_contiguous
    lib.knuth_shuffle_i32(keys, keys.shape[0], _hist(rng))


def alphabet_shuffle(alpha: np.ndarray, rng: GlibcRand) -> None:
    lib = _load()
    assert alpha.dtype == np.int64 and alpha.flags.c_contiguous
    lib.alphabet_shuffle_i64(alpha, alpha.shape[0], _hist(rng))


def zipf_fill(lut: np.ndarray, alphabet: np.ndarray, n: int, rng: GlibcRand) -> np.ndarray:
    lib = _load()
    out = np.empty(n, dtype=np.int32)
    lib.zipf_fill_i32(
        np.ascontiguousarray(lut, np.float64),
        np.ascontiguousarray(alphabet, np.int64),
        alphabet.shape[0],
        out,
        n,
        _hist(rng),
    )
    return out


def random_gen(n: int, maxid: int, rng: GlibcRand) -> np.ndarray:
    lib = _load()
    out = np.empty(n, dtype=np.int32)
    lib.random_gen_i32(out, n, maxid, _hist(rng))
    return out
