"""Native host library loader (C++ keygen math; see modinv.cpp).

Builds the shared object on first use with g++ (cached next to the source);
every entry point has a numpy fallback so the package works without a
toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "modinv.cpp")
_SO = os.path.join(_DIR, "libmkfhe_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            _lib = False
            return False
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return False
    lib.invert_matrix_mod_p.restype = ctypes.c_int
    lib.invert_ring_mod_q.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


def invert_matrix_mod_p(M: np.ndarray, p: int):
    """Exact inverse over GF(p); None if singular. Native fast path with
    numpy Gauss-Jordan fallback (keygen.invert_matrix_mod_p)."""
    lib = _load()
    if not lib:
        from ..keygen import invert_matrix_mod_p as np_inv

        return np_inv(M, p)
    n = M.shape[0]
    a = np.ascontiguousarray(M % p, dtype=np.int64)
    out = np.empty((n, n), dtype=np.int64)
    rc = lib.invert_matrix_mod_p(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(n), ctypes.c_int64(p))
    return out if rc == 0 else None


def invert_ring_mod_q(f: np.ndarray, tables):
    """(f_inv, f_eval, f_inv_eval) in Z_Q[X]/(X^N+1); None if non-invertible.

    `tables` is an ops.ntt.NTTTables; the C++ NTT uses the same psi tables,
    so results are bit-identical to the jax path.
    """
    lib = _load()
    if not lib:
        return None  # caller falls back to the jax path
    N, Q = tables.N, tables.Q
    fa = np.ascontiguousarray(np.asarray(f, np.int64) % Q)
    psi = np.ascontiguousarray(np.asarray(tables.psi_brv, np.int64))
    ipsi = np.ascontiguousarray(np.asarray(tables.ipsi_brv, np.int64))
    f_inv = np.empty(N, np.int64)
    f_eval = np.empty(N, np.int64)
    f_inv_eval = np.empty(N, np.int64)
    P = ctypes.POINTER(ctypes.c_int64)
    rc = lib.invert_ring_mod_q(
        fa.ctypes.data_as(P), psi.ctypes.data_as(P), ipsi.ctypes.data_as(P),
        ctypes.c_int64(tables.n_inv), f_inv.ctypes.data_as(P),
        f_eval.ctypes.data_as(P), f_inv_eval.ctypes.data_as(P),
        ctypes.c_int(N), ctypes.c_int64(Q))
    if rc != 0:
        return None
    return f_inv, f_eval, f_inv_eval


def ntt_fwd_batch(a: np.ndarray, tables) -> np.ndarray | None:
    """Host-side batched forward NTT (keygen path; avoids device traffic).
    a: [..., N] int64 -> same shape, or None if no native lib."""
    lib = _load()
    if not lib:
        return None
    N, Q = tables.N, tables.Q
    shape = a.shape
    a2 = np.ascontiguousarray(a.reshape(-1, N) % Q, dtype=np.int64)
    out = np.empty_like(a2)
    psi = np.ascontiguousarray(np.asarray(tables.psi_brv, np.int64))
    P = ctypes.POINTER(ctypes.c_int64)
    lib.ntt_forward_batch(
        a2.ctypes.data_as(P), psi.ctypes.data_as(P), out.ctypes.data_as(P),
        ctypes.c_long(a2.shape[0]), ctypes.c_int(N), ctypes.c_int64(Q))
    return out.reshape(shape)


def ntt_inv_batch(a: np.ndarray, tables) -> np.ndarray | None:
    lib = _load()
    if not lib:
        return None
    N, Q = tables.N, tables.Q
    shape = a.shape
    a2 = np.ascontiguousarray(a.reshape(-1, N) % Q, dtype=np.int64)
    out = np.empty_like(a2)
    ipsi = np.ascontiguousarray(np.asarray(tables.ipsi_brv, np.int64))
    P = ctypes.POINTER(ctypes.c_int64)
    lib.ntt_inverse_batch(
        a2.ctypes.data_as(P), ipsi.ctypes.data_as(P),
        ctypes.c_int64(tables.n_inv), out.ctypes.data_as(P),
        ctypes.c_long(a2.shape[0]), ctypes.c_int(N), ctypes.c_int64(Q))
    return out.reshape(shape)
