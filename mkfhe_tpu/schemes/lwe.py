"""Classic FHEW LWE linear layer (reference: lwe-pke.cpp).

TPU re-design: ciphertexts are NamedTuples of int32 arrays with an arbitrary
leading batch shape; every op below is pure, jittable, and batched. Key
switching keeps the reference's expanded table layout
(A[N][Bks][d][n], B[N][Bks][d], lwe-pke.cpp:291-375) so that keys captured
from the reference can be injected for bit-exact testing; the switch itself
(lwe-pke.cpp:379-403) becomes a digit gather + segment sum instead of a
triple scalar loop.

Moduli are python ints (static under jit).
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import SecretKeyDist
from ..ops.decompose import base_digits_unsigned
from ..ops.modmath import I32, I64, mod_add, mod_sub, round_q_Q, switch_modulus
from ..params import LWEParams
from ..rng import Sampler


class LWECiphertext(NamedTuple):
    """(a, b) with a: int32 [..., n], b: int32 [...]. Modulus/pt-modulus are
    carried out-of-band (static python ints) to keep this a pure pytree."""

    a: jnp.ndarray
    b: jnp.ndarray


class LWESwitchingKey(NamedTuple):
    """Expanded FHEW switching key (lwe-pke.cpp:330-374)."""

    A: jnp.ndarray  # [N, Bks, d, n] int32 mod qKS
    B: jnp.ndarray  # [N, Bks, d] int32 mod qKS


class LWEPublicKey(NamedTuple):
    """(A, v = A s + e) over Z_Q (PubKeyGen, lwe-pke.cpp:84-115)."""

    A: np.ndarray   # [N, N] int64
    v: np.ndarray   # [N] int64


# ------------------------------------------------------------------- keygen

def key_gen(sampler: Sampler, params: LWEParams) -> np.ndarray:
    """Secret key over Z_qKS, length n (KeyGen, lwe-pke.cpp:49-59; the
    context calls it with qKS — binfhecontext.cpp:218-225)."""
    if params.key_dist == SecretKeyDist.GAUSSIAN:
        return sampler.discrete_gaussian(3.19, params.n, q=params.q_ks)
    return sampler.ternary(params.n, q=params.q_ks)


def key_gen_N(sampler: Sampler, params: LWEParams) -> np.ndarray:
    """Ring-dimension secret skN over Z_Q (KeyGenPair, lwe-pke.cpp:62-73)."""
    if params.key_dist == SecretKeyDist.GAUSSIAN:
        return sampler.discrete_gaussian(3.19, params.N, q=params.Q)
    return sampler.ternary(params.N, q=params.Q)


def encrypt(
    sampler: Sampler,
    params: LWEParams,
    sk: np.ndarray,
    m,
    p: int = 4,
    mod: int | None = None,
) -> LWECiphertext:
    """b = <a, s> + e + (q/p) m (Encrypt, lwe-pke.cpp:120-146). Host-side
    (numpy): encryption is client-side work, batched over leading dims of m."""
    mod = params.q if mod is None else mod
    m = np.asarray(m, np.int64)
    shape = m.shape
    s = _switch_modulus_np(sk, params.q_ks, mod)
    a = sampler.uniform(mod, shape + (params.n,))
    e = sampler.discrete_gaussian(params.std, shape, q=mod)
    b = ((m % p) * (mod // p) + e + a @ s) % mod
    return LWECiphertext(jnp.asarray(a, I32), jnp.asarray(b, I32))


def _switch_modulus_np(v: np.ndarray, q_from: int, q_to: int) -> np.ndarray:
    """NativeVector::SwitchModulus on host values."""
    s = np.where(v > q_from // 2, v.astype(np.int64) - q_from, v)
    return s % q_to


def decrypt(params: LWEParams, sk: np.ndarray, ct: LWECiphertext, p: int = 4):
    """round(p/q (b - <a,s>)) (Decrypt, lwe-pke.cpp:202-243). Returns int64."""
    mod = params.q
    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    s = _switch_modulus_np(sk, params.q_ks, mod)
    r = (b - a @ s) % mod
    r = (r + mod // (p * 2)) % mod
    return (p * r) // mod


def pub_key_gen(
    sampler: Sampler, params: LWEParams, skN: np.ndarray
) -> LWEPublicKey:
    """v = A s + e over Z_Q (PubKeyGen, lwe-pke.cpp:84-115)."""
    N, Q = params.N, params.Q
    A = sampler.uniform(Q, (N, N))
    e = sampler.discrete_gaussian(params.std, N, q=Q)
    s = np.asarray(skN, np.int64) % Q
    v = (e + A @ s) % Q
    return LWEPublicKey(A, v)


def encrypt_N(
    sampler: Sampler,
    params: LWEParams,
    pk: LWEPublicKey,
    m,
    p: int = 4,
    mod: int | None = None,
) -> LWECiphertext:
    """Public-key encryption at dimension N (EncryptN, lwe-pke.cpp:151-187):
    a = A^T s' + e', b = <v, s'> + e'' + (mod/p) m."""
    mod = params.Q if mod is None else mod
    m = np.asarray(m, np.int64)
    shape = m.shape
    N = params.N
    v = _switch_modulus_np(pk.v, params.Q, mod)
    sp = sampler.ternary(shape + (N,), q=mod)
    ep = sampler.discrete_gaussian(params.std, shape + (N,), q=mod)
    e = sampler.discrete_gaussian(params.std, shape, q=mod)
    # a = sum_j A[j] * sp_j + ep  (column-wise accumulate, lwe-pke.cpp:174-177)
    a = (ep + np.einsum("...j,jn->...n", sp, pk.A % mod)) % mod
    b = ((m % p) * (mod // p) + e + (sp * v).sum(axis=-1)) % mod
    return LWECiphertext(jnp.asarray(a, I32), jnp.asarray(b, I32))


def switch_ct_to_qn(
    ct: LWECiphertext, ksk: LWESwitchingKey, params: LWEParams
) -> LWECiphertext:
    """(N, Q) ciphertext -> (n, q): ModSwitch(qKS) -> KeySwitch ->
    ModSwitch(q) (SwitchCTtoqn, lwe-pke.cpp:190-198)."""
    ct_ms = mod_switch(ct, params.q_ks, params.Q)
    ct_ks = key_switch(
        ct_ms, ksk, params.q_ks, params.base_ks, params.digits_ks, params.n)
    return mod_switch(ct_ks, params.q, params.q_ks)


def decrypt_N(params: LWEParams, skN: np.ndarray, ct: LWECiphertext,
              p: int = 4, mod: int | None = None):
    """Decrypt a dimension-N ciphertext under skN (for PKE tests)."""
    mod = params.Q if mod is None else mod
    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    s = _switch_modulus_np(skN, params.Q, mod)
    r = (b - a @ s) % mod
    r = (r + mod // (p * 2)) % mod
    return (p * r) // mod


# ---------------------------------------------------------------- device ops

def eval_add(ct1: LWECiphertext, ct2: LWECiphertext, q: int) -> LWECiphertext:
    return LWECiphertext(mod_add(ct1.a, ct2.a, q), mod_add(ct1.b, ct2.b, q))


def eval_sub(ct1: LWECiphertext, ct2: LWECiphertext, q: int) -> LWECiphertext:
    return LWECiphertext(mod_sub(ct1.a, ct2.a, q), mod_sub(ct1.b, ct2.b, q))


def eval_add_const(ct: LWECiphertext, cnst: int, q: int) -> LWECiphertext:
    return LWECiphertext(ct.a, mod_add(ct.b, jnp.asarray(cnst % q, I32), q))


def eval_sub_const(ct: LWECiphertext, cnst: int, q: int) -> LWECiphertext:
    return LWECiphertext(ct.a, mod_sub(ct.b, jnp.asarray(cnst % q, I32), q))


def eval_mult_const(ct: LWECiphertext, cnst: int, q: int) -> LWECiphertext:
    c = jnp.asarray(cnst % q, I64)
    return LWECiphertext(
        ((ct.a.astype(I64) * c) % q).astype(I32),
        ((ct.b.astype(I64) * c) % q).astype(I32),
    )


def eval_not(ct: LWECiphertext, q: int) -> LWECiphertext:
    """EvalNOT: (-a, q/4 - b) (binfhe-base-scheme.cpp:729-738)."""
    zero = jnp.zeros((), I32)
    return LWECiphertext(
        mod_sub(zero, ct.a, q), mod_sub(jnp.asarray(q >> 2, I32), ct.b, q)
    )


def mod_switch(ct: LWECiphertext, q_to: int, q_from: int) -> LWECiphertext:
    """RoundqQ on every component (ModSwitch, lwe-pke.cpp:281-288)."""
    return LWECiphertext(
        round_q_Q(ct.a, q_to, q_from), round_q_Q(ct.b, q_to, q_from)
    )


def noiseless_embedding(params: LWEParams, m: int) -> LWECiphertext:
    q = params.q
    return LWECiphertext(
        jnp.zeros((params.n,), I32), jnp.asarray((m * (q >> 2)) % q, I32)
    )


# ---------------------------------------------------------------- key switch

def key_switch_gen(
    sampler: Sampler, params: LWEParams, sk: np.ndarray, skN: np.ndarray
) -> LWESwitchingKey:
    """Build the expanded switching key (KeySwitchGen, lwe-pke.cpp:291-375).

    b[i,j,k] = e + svN[i]*(j*Bks^k) + <a[i,j,k], sv>  over Z_qKS, with
    a ~ discrete Gaussian sigma=1.4 (the reference's dgg at lwe-pke.cpp:327)
    and e ~ dggKS (sigma = params.std).
    """
    n, N = params.n, params.N
    qks, bks, d = params.q_ks, params.base_ks, params.digits_ks
    sv = _switch_modulus_np(sk, params.q_ks, qks)
    svN = _switch_modulus_np(skN, params.Q, qks)
    digits = (bks ** np.arange(d, dtype=np.int64)) % qks

    A = sampler.discrete_gaussian(1.4, (N, bks, d, n), q=qks)
    E = sampler.discrete_gaussian(params.std, (N, bks, d), q=qks)
    j = np.arange(bks, dtype=np.int64)
    scale = (j[:, None] * digits[None, :]) % qks          # [Bks, d]
    # compute on CENTERED representatives so every s64 product stays exact
    # up to qKS = 2^35 (the large-precision profile, binfhecontext.cpp:66):
    # |A_c| <= qKS/2, |sv_c|/|svN_c| small (ternary/Gaussian secrets) —
    # identical result mod qKS for the classic <= 2^28 sets.
    def center(x, q):
        return np.where(x > q // 2, x - q, x)

    A_c = center(A, qks)
    sv_c = center(sv, qks)
    svN_c = center(svN, qks)
    E_c = center(E, qks)
    B = (E_c + svN_c[:, None, None] * scale[None] + A_c @ sv_c) % qks
    dtype = I32 if qks < (1 << 31) else I64
    return LWESwitchingKey(jnp.asarray(A, dtype), jnp.asarray(B, dtype))


@partial(jax.jit, static_argnames=("q_ks", "base_ks", "digits_ks", "n"))
def key_switch(
    ct: LWECiphertext,
    ksk: LWESwitchingKey,
    q_ks: int,
    base_ks: int,
    digits_ks: int,
    n: int,
) -> LWECiphertext:
    """a' = -sum_{i,k} A[i, digit_k(a_i), k], b' = b - sum B[...]
    (KeySwitch, lwe-pke.cpp:379-403). Batched over leading dims of ct."""
    N = ct.a.shape[-1]
    lead = ct.a.shape[:-1]
    a_in = ct.a.reshape(-1, N)
    b_in = ct.b.reshape(-1)

    dig = base_digits_unsigned(a_in, base_ks, digits_ks)   # [d, B, N]
    dig = jnp.moveaxis(dig, 0, -1)                         # [B, N, d]

    # One-hot s8 MXU formulation: the row selection A2[i*Bks*d + dig*d + k]
    # is a [B, N*Bks*d] 0/1 matrix times the KSK table. The TPU gather path
    # materialises [B, N*d, n] int32 rows (~0.8 GB at batch 128) through
    # the scalar pipeline; the one-hot matmul runs on the MXU instead
    # (measured 21 ms -> <2 ms per 128-batch at STD128). Exact: at most
    # N*d of the K rows are selected, so s32 partial sums stay < 2^20
    # per 7-bit limb plane.
    K = N * base_ks * digits_ks
    bsz = a_in.shape[0]
    iota = jax.lax.broadcasted_iota(I32, (1, 1, base_ks, 1), 2)
    onehot = (dig[:, :, None, :] == iota).astype(jnp.int8)  # [B, N, Bks, d]
    onehot = onehot.reshape(bsz, K)
    AB = jnp.concatenate(
        [ksk.A.reshape(K, n), ksk.B.reshape(K, 1)], axis=1)  # [K, n+1] i32
    n_limbs = -(-(q_ks - 1).bit_length() // 7)
    S = None
    for l in range(n_limbs):
        plane = ((AB >> (7 * l)) & 127).astype(jnp.int8)
        part = jax.lax.dot_general(
            onehot, plane, (((1,), (0,)), ((), ())),
            preferred_element_type=I32)                      # [B, n+1]
        part = part.astype(I64) << (7 * l)
        S = part if S is None else S + part
    a_out = (-S[:, :n]) % q_ks
    b_out = (b_in.astype(I64) - S[:, n]) % q_ks
    # wide moduli (qKS = 2^35 large-precision profile) stay in s64 lanes
    out_dtype = I32 if q_ks < (1 << 31) else I64
    return LWECiphertext(
        a_out.astype(out_dtype).reshape(*lead, n),
        b_out.astype(out_dtype).reshape(*lead),
    )
