"""Matrix-NTRU linear layer (reference: mntru-pke.cpp).

TPU re-design:
  * ciphertexts are int32 arrays [..., k, n] (leading batch shape)
  * Encrypt is a batched vector-matrix product on device-sized arrays
  * the reference's expanded KeySwitchGen2 table KSK2[k][Bks][N*d][n]
    (mntru-pke.cpp:624-760) is provably j-linear: KSK2[u][j] = j * KSK[u]
    (built at :743-753), so we store ONLY the un-expanded KSK [k, N*d, n]
    and KeySwitch2 becomes digits @ KSK — an MXU matmul instead of the
    reference's 0.9 GB table gather (SURVEY.md §7 'hard parts')
  * keygen (invertible F over Z_qKS) is host-side exact Gauss-Jordan
    (keygen.sample_invertible_matrix), replacing NTL mat_ZZ_p::inv
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import SecretKeyDist
from ..keygen import sample_invertible_matrix
from ..ops.decompose import base_digits_signed, base_digits_unsigned
from ..ops.modmath import (
    I32, I64, exact_mod_matmul, mod_add, mod_sub, round_q_Q)
from ..params import MNTRUParams
from ..rng import Sampler


class MNTRUCiphertext(NamedTuple):
    """c: int32 [..., k, n] mod q."""

    c: jnp.ndarray


class MNTRUPrivateKey(NamedTuple):
    """Host-side numpy key material, entries mod qKS
    (mntru-privatekey.h; generated at qKS per binfhecontext.cpp:235-241)."""

    F: np.ndarray       # [k, n, n]
    F_inv: np.ndarray   # [k, n, n]

    @property
    def F_col0(self) -> np.ndarray:
        return self.F[:, :, 0]


class MNTRUSwitchingKey(NamedTuple):
    """Un-expanded KSK: ksk[u] = (E_u + G_u) @ F_u^{-1} mod qKS with
    G_u the gadget rows (s_u[i] * Bks^j at column 0)."""

    ksk: jnp.ndarray    # [k, N*d, n] int32 mod qKS


def _switch_modulus_np(v, q_from: int, q_to: int):
    s = np.where(v > q_from // 2, np.asarray(v, np.int64) - q_from, v)
    return s % q_to


def key_gen(sampler: Sampler, params: MNTRUParams) -> MNTRUPrivateKey:
    """k invertible (F, F^-1) pairs over Z_qKS (KeyGen/KeyGenGaussian,
    mntru-pke.cpp:124-156)."""
    Fs, Finvs = [], []
    for _ in range(params.k):
        F, F_inv = sample_invertible_matrix(
            sampler, params.n, params.q_ks, params.key_dist, std=1.0)
        Fs.append(F)
        Finvs.append(F_inv)
    return MNTRUPrivateKey(np.stack(Fs), np.stack(Finvs))


def encrypt(
    sampler: Sampler,
    params: MNTRUParams,
    sk: MNTRUPrivateKey,
    m,
    p: int = 4,
    mod: int | None = None,
) -> MNTRUCiphertext:
    """c_u = (e_u + (q/p) m delta_{u=0}) @ F_u^{-1} (Encrypt,
    mntru-pke.cpp:158-205). Host-side; batched over leading dims of m."""
    mod = params.q if mod is None else mod
    k, n = params.k, params.n
    m = np.asarray(m, np.int64)
    shape = m.shape
    e = sampler.discrete_gaussian(params.std, shape + (k, n), q=mod)
    e[..., 0, 0] = (e[..., 0, 0] + (m % p) * (mod // p)) % mod
    Finv = _switch_modulus_np(sk.F_inv, params.q_ks, mod)  # [k, n, n]
    c = np.einsum("...kl,kln->...kn", e, Finv) % mod
    return MNTRUCiphertext(jnp.asarray(c, I32))


def _inner_f0(params: MNTRUParams, sk: MNTRUPrivateKey, ct: MNTRUCiphertext):
    mod = params.q
    f0 = _switch_modulus_np(sk.F_col0, params.q_ks, mod)  # [k, n]
    c = np.asarray(ct.c, np.int64)
    return np.einsum("...kn,kn->...", c, f0) % mod


def decrypt(params: MNTRUParams, sk: MNTRUPrivateKey, ct, p: int = 4):
    """NAND-shifted decode: m = floor(p*(inner + q/p)/q) (Decrypt,
    mntru-pke.cpp:306-357)."""
    mod = params.q
    inner = (_inner_f0(params, sk, ct) + mod // p) % mod
    return (p * inner) // mod


def decrypt2(params: MNTRUParams, sk: MNTRUPrivateKey, ct, p: int = 4):
    """Fresh-encryption decode: m = floor(p*(inner + q/2p)/q) (Decrypt2,
    mntru-pke.cpp:208-253)."""
    mod = params.q
    inner = (_inner_f0(params, sk, ct) + mod // (2 * p)) % mod
    return (p * inner) // mod


def decrypt_nand(params: MNTRUParams, sk: MNTRUPrivateKey, ct, p: int = 4):
    """DecryptNAND (mntru-pke.cpp:255-304)."""
    mod = params.q
    inner = (_inner_f0(params, sk, ct) + mod // (p // 2 * 2)) % mod
    return ((p // 2) * inner) // mod


def eval_add(ct1: MNTRUCiphertext, ct2: MNTRUCiphertext, q: int):
    return MNTRUCiphertext(mod_add(ct1.c, ct2.c, q))


def eval_sub(ct1: MNTRUCiphertext, ct2: MNTRUCiphertext, q: int):
    return MNTRUCiphertext(mod_sub(ct1.c, ct2.c, q))


def mod_switch(ct: MNTRUCiphertext, q_to: int, q_from: int):
    """RoundqQ per coefficient (ModSwitch, mntru-pke.cpp:359-374)."""
    return MNTRUCiphertext(round_q_Q(ct.c, q_to, q_from))


# ---------------------------------------------------------------- keyswitch

def key_switch_gen2(
    sampler: Sampler, params: MNTRUParams, sk: MNTRUPrivateKey,
    skN: np.ndarray,
) -> MNTRUSwitchingKey:
    """Un-expanded production switching key (KeySwitchGen2,
    mntru-pke.cpp:624-760).

    Row (i*d + j) of user u: (E + gadget) @ F_u^{-1} over Z_qKS where the
    gadget adds s_u[i] * Bks^j at column 0. E rows are fresh Gaussians here
    (the reference's vector-fill constructor at :655 accidentally repeats
    one row; fresh rows strictly improve security with identical decrypt
    semantics). The reference's KSK2[u][j] = j*KSK[u] expansion (:743-753)
    is not materialized.
    """
    n, N, k = params.n, params.N, params.k
    qks, bks, d = params.q_ks, params.base_ks, params.digits_ks

    sN = _switch_modulus_np(skN, params.Q, qks)  # [k, N]
    pow_b = (bks ** np.arange(d, dtype=np.int64)) % qks

    out = np.empty((k, N * d, n), dtype=np.int64)
    for u in range(k):
        E = sampler.discrete_gaussian(params.std, (N * d, n), q=qks)
        gadget = (sN[u][:, None] * pow_b[None, :]).reshape(N * d) % qks
        E[:, 0] = (E[:, 0] + gadget) % qks
        Es = np.where(E > qks // 2, E - qks, E)
        Fs = np.where(sk.F_inv[u] > qks // 2,
                      sk.F_inv[u].astype(np.int64) - qks, sk.F_inv[u])
        out[u] = (Es @ Fs) % qks
    return MNTRUSwitchingKey(jnp.asarray(out, I32))


@partial(jax.jit, static_argnames=("q_ks", "base_ks", "digits_ks", "signed"))
def key_switch2(
    ct: MNTRUCiphertext,
    ksk: MNTRUSwitchingKey,
    q_ks: int,
    base_ks: int,
    digits_ks: int,
    signed: bool = True,
) -> MNTRUCiphertext:
    """c'[u] = digits(c[u]) @ KSK[u] mod qKS (KeySwitch2,
    mntru-pke.cpp:763-823, with the j-scaled table replaced by an on-the-fly
    digit multiply: sum_l digit_l * KSK[u][l] == sum_l KSK2[u][digit_l][l]).

    ct.c: [..., k, N]; output [..., k, n]. The contraction is an
    MXU-friendly batched integer matmul (digits < Bks, entries < qKS:
    N*d * Bks * qKS < 2**63 — exact in int64).

    signed=True (production default) consumes the SAME j-linear KSK with
    EXACT balanced digits d in [-Bks/2, Bks/2): the gadget part still
    recomposes to <c_hat, s> == <c, s> (mod qKS), while E[d^2] falls
    ~(B-1)(2B-1)/6 -> B^2/12, i.e. key-switch noise drops ~2x — the term
    that blows the q/8 margin at k=8/16 with unsigned digits. The lifted
    digits u = d + Bks/2 stay in [0, Bks), so the MXU contraction is
    unchanged; the constant shift is repaired with Bks/2 * rowsum(KSK).
    signed=False reproduces the reference's unsigned consumption
    (mntru-pke.cpp:782-791) for bit-exact oracle comparison.
    """
    k, Nd, n = ksk.ksk.shape
    N = Nd // digits_ks
    lead = ct.c.shape[:-2]
    c = ct.c.reshape(-1, k, N)

    if signed:
        dig = base_digits_signed(c, q_ks, base_ks, digits_ks)  # [d, B, k, N]
        dig = dig + (base_ks // 2)                    # lift to [0, Bks)
    else:
        dig = base_digits_unsigned(c, base_ks, digits_ks)
    dig = jnp.moveaxis(dig, 0, -1)                        # [B, k, N, d]
    dig = dig.reshape(-1, k, Nd)                          # row-major (i*d+j)

    # exact MXU contraction (s64 dots are unsupported on TPU)
    dig_bits = max(1, (base_ks - 1).bit_length())
    out = exact_mod_matmul(
        jnp.moveaxis(dig, 1, 0),                          # [k, B, Nd]
        ksk.ksk, q_ks, a_bits=dig_bits)                   # [k, B, n]
    out = jnp.moveaxis(out, 0, 1)                         # [B, k, n]
    if signed:
        # undo the +Bks/2 lift: subtract (Bks/2) * sum_l KSK[u][l]
        rowsum = jnp.sum(ksk.ksk.astype(I64), axis=1) % q_ks   # [k, n]
        shift = (rowsum * (base_ks // 2)) % q_ks
        out = (out.astype(I64) - shift[None].astype(I64)) % q_ks
        out = out.astype(I32)
    return MNTRUCiphertext(out.reshape(*lead, k, n))
