"""Host-side exact key-material math (NTL replacement).

The reference depends on NTL/GMP for two inversions:
  * ring inverse of an NTRU secret f in Z_Q[X]/(X^N+1)
    (Get_invertible_NativeVector, binfhe-base-scheme.cpp:105-195)
  * matrix inverse of an n x n secret F over Z_qKS
    (Get_invertible_Matrix, mntru-pke.cpp:19-106)

TPU-native replacements (no NTL):
  * Q is an NTT-friendly prime, so f is invertible iff its NTT has no zero
    slot, and the inverse is the INTT of the slotwise Fermat inverse — a
    vectorized O(N log N) procedure instead of NTL's XGCD.
  * qKS is prime (45181 / 32749 / the intermediate Q), so Gauss-Jordan
    elimination over GF(qKS) with numpy row ops gives the exact inverse;
    singular candidates are rejected and resampled, like the reference.
"""

import numpy as np

from .constants import SecretKeyDist
from .ops import ntt as ntt_mod
from .rng import Sampler


def _np_ntt_fwd(tables, a: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(ntt_mod.ntt_fwd(tables, jnp.asarray(a, jnp.int32)), np.int64)


def _np_ntt_inv(tables, a: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(ntt_mod.ntt_inv(tables, jnp.asarray(a, jnp.int32)), np.int64)


def sample_invertible_ring_secret(
    sampler: Sampler, tables, key_dist: SecretKeyDist, std: float = 0.5
):
    """Sample an invertible f and return (f_coeff, f_inv_coeff, f_eval,
    f_inv_eval), coefficients in [0, Q).

    Distribution matches Get_invertible_NativeVector: GAUSSIAN uses
    trunc(N(0, 0.5)) per coefficient (the hardcoded sigma at
    binfhe-base-scheme.cpp:109), UNIFORM_TERNARY uses uniform {-1,0,1}.
    """
    from . import native

    N, Q = tables.N, tables.Q
    while True:
        if key_dist == SecretKeyDist.GAUSSIAN:
            f = sampler.truncated_normal_int(std, N)
        else:
            f = sampler.ternary(N)
        f_mod = np.where(f < 0, f + Q, f).astype(np.int64)
        if native.available():
            res = native.invert_ring_mod_q(f_mod, tables)
            if res is None:
                continue
            f_inv, f_eval, inv_eval = res
            return f_mod, f_inv, f_eval, inv_eval
        f_eval = _np_ntt_fwd(tables, f_mod)
        if np.any(f_eval == 0):
            continue
        inv_eval = np.array([pow(int(v), Q - 2, Q) for v in f_eval], np.int64)
        f_inv = _np_ntt_inv(tables, inv_eval)
        return f_mod, f_inv, f_eval, inv_eval


def invert_matrix_mod_p(M: np.ndarray, p: int):
    """Exact inverse of M over GF(p) via Gauss-Jordan; None if singular."""
    n = M.shape[0]
    A = np.concatenate([M % p, np.eye(n, dtype=np.int64)], axis=1)
    for col in range(n):
        piv = col + int(np.argmax(A[col:, col] != 0))
        if A[piv, col] == 0:
            return None
        if piv != col:
            A[[col, piv]] = A[[piv, col]]
        inv = pow(int(A[col, col]), p - 2, p)
        A[col] = (A[col] * inv) % p
        factors = A[:, col].copy()
        factors[col] = 0
        A = (A - np.outer(factors, A[col])) % p
    return A[:, n:]


def sample_invertible_matrix(
    sampler: Sampler, n: int, p: int, key_dist: SecretKeyDist, std: float = 1.0
):
    """(F, F_inv) with F ternary or trunc-Gaussian, F*F_inv == I mod p.

    Matches Get_invertible_Matrix (mntru-pke.cpp:19-106): GAUSSIAN uses
    trunc(N(0, 1)) (hardcoded sigma at mntru-pke.cpp:25).
    """
    from . import native

    while True:
        if key_dist == SecretKeyDist.GAUSSIAN:
            F = sampler.truncated_normal_int(std, (n, n))
        else:
            F = sampler.ternary((n, n))
        F_mod = np.where(F < 0, F + p, F).astype(np.int64)
        if native.available():
            F_inv = native.invert_matrix_mod_p(F_mod, p)
        else:
            F_inv = invert_matrix_mod_p(F_mod, p)
        if F_inv is not None:
            return F_mod, F_inv
