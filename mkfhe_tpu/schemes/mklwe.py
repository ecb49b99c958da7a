"""Multi-key LWE linear layer (reference: mklwe-pke.cpp).

Ciphertexts are (a: [..., k, n], b: [...]) int32 pytrees; key switching keeps
the reference's 4-D expanded layout per user (mklwe-pke.cpp:176-256) so
reference keys can be injected, realized as one [k, N, Bks, d, n] gather
table; the switch is a digit gather + segment sum over (u, i, digit).
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.decompose import base_digits_unsigned
from ..ops.modmath import I32, I64, mod_add, mod_sub, round_q_Q
from ..params import MKLWEParams
from ..rng import Sampler


class MKLWECiphertext(NamedTuple):
    a: jnp.ndarray  # [..., k, n] int32
    b: jnp.ndarray  # [...] int32


class MKLWESwitchingKey(NamedTuple):
    A: jnp.ndarray  # [k, N, Bks, d, n] int32 mod qKS
    B: jnp.ndarray  # [k, N, Bks, d] int32 mod qKS


def _switch_modulus_np(v, q_from: int, q_to: int):
    s = np.where(v > q_from // 2, np.asarray(v, np.int64) - q_from, v)
    return s % q_to


def key_gen_binary(sampler: Sampler, params: MKLWEParams) -> np.ndarray:
    """k binary secrets over Z_qKS (KeyGenBinary, mklwe-pke.cpp:19-30).
    The reference draws one throwaway vector first (:23); irrelevant here."""
    return sampler.binary((params.k, params.n))


def encrypt(
    sampler: Sampler, params: MKLWEParams, sk: np.ndarray, m,
    p: int = 4, mod: int | None = None,
) -> MKLWECiphertext:
    """b = sum_u <a_u, s_u> + e + (q/p) m with a_u ~ DGG(sigma=2), the
    default-constructed dgg the reference uses (mklwe-pke.cpp:54,
    discretegaussiangenerator.h:94 default std=2)."""
    mod = params.q if mod is None else mod
    k, n = params.k, params.n
    m = np.asarray(m, np.int64)
    shape = m.shape
    s = _switch_modulus_np(sk, params.q_ks, mod)
    a = sampler.discrete_gaussian(2.0, shape + (k, n), q=mod)
    e = sampler.discrete_gaussian(params.std, shape, q=mod)
    b = ((m % p) * (mod // p) + e + np.einsum("...kn,kn->...", a, s)) % mod
    return MKLWECiphertext(jnp.asarray(a, I32), jnp.asarray(b, I32))


def decrypt(params: MKLWEParams, sk: np.ndarray, ct, p: int = 4):
    """round(p/q (b - sum_u <a_u,s_u>)) (Decrypt, mklwe-pke.cpp:66-112)."""
    mod = params.q
    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    s = _switch_modulus_np(sk, params.q_ks, mod)
    r = (b - np.einsum("...kn,kn->...", a, s)) % mod
    r = (r + mod // (p * 2)) % mod
    return (p * r) // mod


def decrypt_nand(params: MKLWEParams, sk: np.ndarray, ct, p: int = 4):
    """DecryptNAND (mklwe-pke.cpp:115-156)."""
    mod = params.q
    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    s = _switch_modulus_np(sk, params.q_ks, mod)
    r = (b - np.einsum("...kn,kn->...", a, s)) % mod
    r = (r + mod // p) % mod
    return ((p // 2) * r) // mod


def eval_add(ct1: MKLWECiphertext, ct2: MKLWECiphertext, q: int):
    return MKLWECiphertext(
        mod_add(ct1.a, ct2.a, q), mod_add(ct1.b, ct2.b, q))


def eval_sub(ct1: MKLWECiphertext, ct2: MKLWECiphertext, q: int):
    return MKLWECiphertext(
        mod_sub(ct1.a, ct2.a, q), mod_sub(ct1.b, ct2.b, q))


def mod_switch(ct: MKLWECiphertext, q_to: int, q_from: int):
    return MKLWECiphertext(
        round_q_Q(ct.a, q_to, q_from), round_q_Q(ct.b, q_to, q_from))


def neg_a(ct: MKLWECiphertext, q: int) -> MKLWECiphertext:
    """GetAneg (mklwe-ciphertext.h:86-96): negate the rotation direction."""
    return MKLWECiphertext(mod_sub(jnp.zeros((), I32), ct.a, q), ct.b)


# ---------------------------------------------------------------- keyswitch

def key_switch_gen(
    sampler: Sampler, params: MKLWEParams, sk: np.ndarray, skN: np.ndarray,
) -> MKLWESwitchingKey:
    """Per-user FHEW-style expanded key (KeySwitchGen, mklwe-pke.cpp:176-256):
    b[u,i,j,t] = e + skN[u][i]*(j*Bks^t) + <a[u,i,j,t], sk[u]> mod qKS,
    a ~ dgg(params.std)."""
    n, N, k = params.n, params.N, params.k
    qks, bks, d = params.q_ks, params.base_ks, params.digits_ks
    sv = _switch_modulus_np(sk, params.q_ks, qks)       # [k, n]
    svN = _switch_modulus_np(skN, params.Q, qks)        # [k, N]
    digits = (bks ** np.arange(d, dtype=np.int64)) % qks

    A = sampler.discrete_gaussian(params.std, (k, N, bks, d, n), q=qks)
    E = sampler.discrete_gaussian(params.std, (k, N, bks, d), q=qks)
    j = np.arange(bks, dtype=np.int64)
    scale = (j[:, None] * digits[None, :]) % qks        # [Bks, d]
    B = (E + svN[:, :, None, None] * scale[None, None]
         + np.einsum("kijtn,kn->kijt", A, sv)) % qks
    return MKLWESwitchingKey(jnp.asarray(A, I32), jnp.asarray(B, I32))


@partial(jax.jit, static_argnames=("q_ks", "base_ks", "digits_ks", "n"))
def key_switch(
    ct: MKLWECiphertext,
    ksk: MKLWESwitchingKey,
    q_ks: int,
    base_ks: int,
    digits_ks: int,
    n: int,
) -> MKLWECiphertext:
    """a'[u] = -sum_{i,t} A[u,i,digit,t], b' = b - sum B[...] (KeySwitch,
    mklwe-pke.cpp:260-290). Batched over leading dims."""
    k, N = ct.a.shape[-2:]
    lead = ct.a.shape[:-2]
    a_in = ct.a.reshape(-1, k, N)
    b_in = ct.b.reshape(-1)

    dig = base_digits_unsigned(a_in, base_ks, digits_ks)  # [d, B, k, N]
    dig = jnp.moveaxis(dig, 0, -1)                        # [B, k, N, d]

    # flat row index (u, i, j, t) -> ((u*N + i)*Bks + j)*d + t
    u_idx = jnp.arange(k, dtype=jnp.int32)[None, :, None, None]
    i_idx = jnp.arange(N, dtype=jnp.int32)[None, None, :, None]
    t_idx = jnp.arange(digits_ks, dtype=jnp.int32)[None, None, None, :]
    flat = (((u_idx * N + i_idx) * base_ks + dig) * digits_ks + t_idx)
    flat2 = flat.reshape(flat.shape[0], k, -1)            # [B, k, N*d]

    A2 = ksk.A.reshape(k * N * base_ks * digits_ks, n)
    B2 = ksk.B.reshape(-1)

    rows = A2[flat2]                                      # [B, k, N*d, n]
    bs = B2[flat2.reshape(flat2.shape[0], -1)]            # [B, k*N*d]

    a_out = (-(rows.astype(I64).sum(axis=2))) % q_ks      # [B, k, n]
    b_out = (b_in.astype(I64) - bs.astype(I64).sum(axis=1)) % q_ks
    return MKLWECiphertext(
        a_out.astype(I32).reshape(*lead, k, n),
        b_out.astype(I32).reshape(*lead),
    )
