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

from ..ops.decompose import base_digits_signed, base_digits_unsigned
from ..ops.modmath import I32, I64, exact_mod_matmul, mod_add, mod_sub, \
    round_q_Q
from ..params import MKLWEParams
from ..rng import Sampler


class MKLWECiphertext(NamedTuple):
    a: jnp.ndarray  # [..., k, n] int32
    b: jnp.ndarray  # [...] int32


class MKLWESwitchingKey(NamedTuple):
    A: jnp.ndarray  # [k, N, Bks, d, n] int32 mod qKS
    B: jnp.ndarray  # [k, N, Bks, d] int32 mod qKS


class MKLWECompactSwitchingKey(NamedTuple):
    """j-linear signed-digit switching key (r5, production path for high
    party counts — the MKLWE analogue of mntru.key_switch_gen2).

    The reference expands a fresh LWE encryption per digit VALUE
    (mklwe-pke.cpp:176-256): k*N*Bks*d rows — ~6.3 GB at k=16, the r4
    blocker for STD100_MKNTRU_LWE_4. This key stores ONE encryption per
    (user, long-key index, digit position) of svN[u][i] * Bc^t and is
    consumed with EXACT balanced base-Bc digits, so it is Bks/dc-fold
    smaller (~0.5 GB at k=16 with Bc=4) and the switch becomes an MXU
    matmul instead of a 4-D gather. Choosing a small Bc keeps the extra
    digit factor E[d^2] = Bc^2/12 near 1: at Bc=4 the key-switch noise
    is ~sqrt(10/3)x the expanded table's per-row sigma — measured, not
    just analyzed, in tools/ksweep_mklwe.json."""

    AB: jnp.ndarray      # [k, N*dc, n+1] int32 mod qKS (B is column n)
    rowsum: jnp.ndarray  # [k, n+1] int32: sum of AB rows mod qKS


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


COMPACT_BASE = 4     # Bc: balanced digit base of the compact key


def signed_digit_count(q: int, base: int) -> int:
    """Smallest dc such that base_digits_signed(v, q, base, dc) leaves a
    ZERO residual for EVERY v in [0, q) — i.e. the balanced digits
    recompose exactly, not just mod base^dc. Verified exhaustively
    (host-side; all supported qKS are < 2^26)."""
    assert q < (1 << 26), "exhaustive signed-digit check bound"
    v = np.arange(q, dtype=np.int64)
    d = np.where(v > q >> 1, v - q, v)
    half = base // 2
    dc = 0
    while np.any(d != 0):
        r = ((d + half) % base) - half
        d = (d - r) // base
        dc += 1
        assert dc < 64
    return dc


def key_switch_gen_compact(
    sampler: Sampler, params: MKLWEParams, sk: np.ndarray, skN: np.ndarray,
    base_c: int = COMPACT_BASE,
) -> MKLWECompactSwitchingKey:
    """Row (u, i*dc + t): LWE encryption of svN[u][i] * Bc^t under sk[u]
    over Z_qKS — the j-linear layout (see MKLWECompactSwitchingKey).
    a ~ dgg(params.std), e ~ dgg(params.std), matching the expanded
    keygen's distributions (mklwe-pke.cpp:195-200)."""
    n, N, k = params.n, params.N, params.k
    qks = params.q_ks
    dc = signed_digit_count(qks, base_c)
    sv = _switch_modulus_np(sk, params.q_ks, qks)       # [k, n]
    svN = _switch_modulus_np(skN, params.Q, qks)        # [k, N]
    pow_b = np.array([pow(base_c, t, qks) for t in range(dc)], np.int64)

    AB = np.empty((k, N * dc, n + 1), np.int64)
    for u in range(k):
        A = sampler.discrete_gaussian(params.std, (N * dc, n), q=qks)
        E = sampler.discrete_gaussian(params.std, (N * dc,), q=qks)
        gadget = (svN[u][:, None] * pow_b[None, :]).reshape(N * dc) % qks
        B = (E + gadget + A @ sv[u]) % qks
        AB[u, :, :n] = A
        AB[u, :, n] = B
    rowsum = AB.sum(axis=1) % qks                       # [k, n+1]
    return MKLWECompactSwitchingKey(
        jnp.asarray(AB, I32), jnp.asarray(rowsum, I32))


@partial(jax.jit, static_argnames=("q_ks", "base_c", "digits_c", "n"))
def key_switch_compact(
    ct: MKLWECiphertext,
    ksk: MKLWECompactSwitchingKey,
    q_ks: int,
    base_c: int,
    digits_c: int,
    n: int,
) -> MKLWECiphertext:
    """Signed-digit consumption of the j-linear key:

        a'[u] = -sum_{i,t} d[u,i,t] * A[u, i*dc+t]
        b'    = b - sum_{u,i,t} d[u,i,t] * B[u, i*dc+t]       (mod qKS)

    with d the EXACT balanced base-Bc digits of the centered a[u,i]
    (sum_t d*Bc^t == centered a[u,i], zero residual — signed_digit_count
    guarantees it). The contraction runs on the MXU via lifted digits in
    [0, Bc) plus a (Bc/2)*rowsum correction (the mntru.key_switch2
    trick). Batched over leading dims of ct."""
    k, N = ct.a.shape[-2:]
    lead = ct.a.shape[:-2]
    a_in = ct.a.reshape(-1, k, N)
    b_in = ct.b.reshape(-1)

    dig = base_digits_signed(a_in, q_ks, base_c, digits_c)  # [dc, B, k, N]
    dig = dig + (base_c // 2)                          # lift to [0, Bc)
    dig = jnp.moveaxis(dig, 0, -1)                     # [B, k, N, dc]
    dig = dig.reshape(-1, k, N * digits_c)             # rows (i*dc + t)

    dig_bits = max(1, (base_c - 1).bit_length())
    out = exact_mod_matmul(
        jnp.moveaxis(dig, 1, 0),                       # [k, B, N*dc]
        ksk.AB, q_ks, a_bits=dig_bits)                 # [k, B, n+1]
    # undo the +Bc/2 lift
    shift = (ksk.rowsum.astype(I64) * (base_c // 2)) % q_ks
    out = (out.astype(I64) - shift[:, None, :]) % q_ks  # [k, B, n+1]

    a_sw = jnp.moveaxis((-out[..., :n]) % q_ks, 0, 1)  # [B, k, n]
    b_sw = (b_in.astype(I64) - out[..., n].sum(axis=0)) % q_ks
    return MKLWECiphertext(
        a_sw.astype(I32).reshape(*lead, k, n),
        b_sw.astype(I32).reshape(*lead),
    )


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
