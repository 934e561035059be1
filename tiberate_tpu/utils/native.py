"""ctypes loader for the native oracle library (native/tiberate_native.cpp).

Compiles on first use with g++ (the image's baked toolchain); the .so is
cached next to the source.  All entry points are optional conveniences —
every caller has a (slower) pure-python fallback.
"""

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libtiberate_native.so")
_SRC = os.path.join(_NATIVE_DIR, "tiberate_native.cpp")


class NativeUnavailable(RuntimeError):
    pass


@lru_cache(maxsize=1)
def load():
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not os.path.exists(_SRC):
            raise NativeUnavailable(f"source not found: {_SRC}")
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeUnavailable(f"native build failed: {e}") from e

    lib = ctypes.CDLL(_SO)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")

    lib.negacyclic_mul.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                   ctypes.c_int64]
    lib.negacyclic_mul.restype = ctypes.c_int
    lib.mont_mult_verify.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64]
    lib.mont_mult_verify.restype = ctypes.c_int64
    lib.chacha20_blocks.argtypes = [u32p, u32p, ctypes.c_int64]
    lib.chacha20_blocks.restype = None
    lib.is_prime_u64.argtypes = [ctypes.c_uint64]
    lib.is_prime_u64.restype = ctypes.c_int
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.shoup_key_row.argtypes = [u64p, ctypes.c_int64, ctypes.c_uint64,
                                  ctypes.c_uint64, ctypes.c_int64, u64p,
                                  u64p]
    lib.shoup_key_row.restype = None
    return lib


def negacyclic_mul(a, b, q: int) -> np.ndarray:
    """Exact a*b mod (X^N+1, q), inputs/outputs [0, q) int64 arrays."""
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)
    out = np.empty_like(a)
    rc = lib.negacyclic_mul(a, b, out, a.shape[-1], q)
    if rc != 0:
        raise ValueError(f"q={q} is not NTT-friendly for N={a.shape[-1]}")
    return out


def mont_mult_verify(a, b, got, q: int) -> int:
    """Number of elements where got !≡ a*b*R^-1 (mod q) or got >= 2q."""
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.int64).ravel()
    b = np.ascontiguousarray(b, dtype=np.int64).ravel()
    got = np.ascontiguousarray(got, dtype=np.int64).ravel()
    return int(lib.mont_mult_verify(a, b, got, a.size, q))


def chacha20_blocks(states) -> np.ndarray:
    """RFC-7539 block function over [n, 16] uint32 states."""
    lib = load()
    states = np.ascontiguousarray(states, dtype=np.uint32)
    out = np.empty_like(states)
    lib.chacha20_blocks(states, out, states.shape[0])
    return out


def is_prime(n: int) -> bool:
    return bool(load().is_prime_u64(n))


def shoup_key_row(k, q: int, rinv: int, rbits: int, w_out, s_out):
    """w = k * rinv mod q and its Shoup companion floor(w << rbits / q)
    for one channel row (u64 arrays; k may be lazy [0, 2q))."""
    lib = load()
    k = np.ascontiguousarray(k, dtype=np.uint64)
    lib.shoup_key_row(k, k.size, q, rinv, rbits, w_out, s_out)
