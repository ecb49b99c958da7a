"""UniEnc multi-key accumulators XZW / XZW_B
(reference: mk-acc-xzw.cpp, mk-acc-xzw_B.cpp).

TPU re-design:
  * the bootstrapping key is a pair of int32 arrays
      ek:     [k, nb, n, dG, 2, N]   (nb = 2 branches for XZW ternary
                                      secrets: evk+/evk-; 1 for XZW_B)
      ekstar: [dG, 2, N]             (the KDM evk* = Enc(1/f_1) stored at
                                      index n in the reference, used only
                                      at step (u=0, i=0))
    with the last axis pair (d, f) in EVAL form
  * EvalAcc is one unrolled KDM step + a lax.scan over the remaining
    k*n - 1 steps; the per-step HbProd decomposes all k accumulator
    components at once (the reference's per-user loop at mk-acc-xzw.cpp:
    240-271 vectorizes over a [k] axis, and over the ciphertext batch)
  * the index-selective 'acc[index] += w' (mk-acc-xzw.cpp:281-289) becomes
    a one-hot masked add so the scan body is trace-static
  * monomials X^c - 1 are slot-exponent gathers (ops.poly), replacing the
    2N-entry precomputed table (mk-cryptoparameters.cpp:53-70)
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from functools import reduce

from ..ops.decompose import signed_digit_decompose
from ..ops.modmath import I32, I64, mod_add, mod_sub
from ..ops.ntt import NTTTables, ntt_fwd, ntt_fwd_digits, ntt_inv
from ..ops.poly import monomial_minus_one_eval, monomial_minus_one_shoup
from ..params import UniEncParams
from ..rng import Sampler


class UniEncKey(NamedTuple):
    ek: jnp.ndarray      # [k, nb, n, dG, 2, N] int32 EVAL
    ekstar: jnp.ndarray  # [dG, 2, N] int32 EVAL
    pkey: jnp.ndarray    # [k, dG, N] int32 EVAL (Pkey[u][i] = e - CRS_i*f_u)
    ek_sh: jnp.ndarray | None = None
    # ^ floor(ek * 2^32 / Q) u32 — fused-kernel Shoup companions,
    #   precomputed at keygen (the in-graph u64 divide fallback is for
    #   raw test keys only)


# ------------------------------------------------------------------- keygen

def _unienc_rows(
    sampler: Sampler,
    params: UniEncParams,
    tables: NTTTables,
    crs_eval: np.ndarray,
    invsk_eval: np.ndarray,
    msel: np.ndarray,
    kdm: np.ndarray,
):
    """Batched UniEnc encryptions (KeyGenXZW / KDMKeyGenXZW,
    mk-acc-xzw.cpp:132-228).

    For each row r and digit i:
      f[r,i] = (e1 + Gpow[i+1] * rpoly) * invsk[r]
      d[r,i] = e0 + msel[r] * Gpow[i+1] * (invsk[r] if kdm[r] else 1)
               + rpoly_slot_i * CRS[i]
    where rpoly is ONE dggR EVAL poly per row (shared across its digits)
    and `rpoly_slot_i * CRS[i]` replicates the reference's scalar-slot
    product (mk-acc-xzw.cpp:167 — `skrPoly[i] * CRS[i]`).

    Shapes: crs_eval [dG, N]; invsk_eval [R, N]; msel, kdm [R] ->
    returns (d, f) each [R, dG, N] int32 EVAL.
    """
    N, Q = params.N, params.Q
    dg = params.digits_g - 1
    R = invsk_eval.shape[0]

    gpow = np.ones(params.digits_g, dtype=np.int64)
    for i in range(1, params.digits_g):
        gpow[i] = gpow[i - 1] * params.base_g % Q
    gvals = gpow[1:dg + 1]                       # Gpow[i+1], [dG]

    e0 = sampler.discrete_gaussian(params.sigma_e, (R, dg, N), q=Q)
    e1 = sampler.discrete_gaussian(params.sigma_e, (R, dg, N), q=Q)
    r_coeff = sampler.discrete_gaussian(params.sigma_r, (R, N), q=Q)

    from ..ops.ntt import host_ntt_fwd

    e0_eval = host_ntt_fwd(tables, e0)
    e1_eval = host_ntt_fwd(tables, e1)
    r_eval = host_ntt_fwd(tables, r_coeff)

    inv = np.asarray(invsk_eval, np.int64)                      # [R, N]
    # f = (e1 + g_i * r) * invsk  (all EVAL, g_i constant-poly = scalar)
    f = (e1_eval + gvals[None, :, None] * r_eval[:, None, :]) % Q
    f = f * inv[:, None, :] % Q

    # d = e0 + m * g_i (* invsk if KDM) + r_slot_i * CRS_i
    gm = gvals[None, :, None] * msel[:, None, None] % Q         # [R, dG, 1]
    gm = np.where(kdm[:, None, None], gm * inv[:, None, :] % Q,
                  np.broadcast_to(gm, (R, dg, N)))
    r_slots = r_eval[:, :dg]                                    # [R, dG]
    d = (e0_eval + gm
         + r_slots[:, :, None] * np.asarray(crs_eval, np.int64)[None]) % Q
    return d, f


def key_gen_acc(
    sampler: Sampler,
    params: UniEncParams,
    tables: NTTTables,
    invsk_eval: np.ndarray,   # [k, N] EVAL inverse ring secrets 1/f_u
    sv: np.ndarray,           # [k, n] per-user LWE-layer secrets mod sv_mod
    sv_mod: int,
    crs_eval: np.ndarray,     # [dG, N]
    pkey: np.ndarray,         # [k, dG, N] (built by the scheme's MKKeyGen)
    binary: bool,
) -> UniEncKey:
    """KeyGenAcc (XZW: mk-acc-xzw.cpp:38-87; XZW_B: mk-acc-xzw_B.cpp:38-101).

    XZW (ternary secrets): branch 0 encrypts (s==1), branch 1 (s==-1).
    XZW_B (binary secrets): single branch encrypting (s==1).
    Step (0,0) uses KDM encryptions, plus ekstar = KDM-Enc(1).
    """
    k, n = sv.shape
    nb = 1 if binary else 2
    s = np.asarray(sv, np.int64)

    msel = np.empty((k, nb, n), dtype=np.int64)
    msel[:, 0] = (s == 1)
    if not binary:
        msel[:, 1] = (s == sv_mod - 1)

    kdm = np.zeros((k, nb, n), dtype=bool)
    kdm[0, :, 0] = True    # step (u=0, i=0) rows are KDM-form

    inv_rows = np.repeat(np.asarray(invsk_eval, np.int64)[:, None, None, :],
                         nb, axis=1)
    inv_rows = np.broadcast_to(inv_rows, (k, nb, n, params.N)).reshape(
        k * nb * n, params.N)
    d, f = _unienc_rows(
        sampler, params, tables, crs_eval, inv_rows,
        msel.reshape(-1), kdm.reshape(-1))
    dg = params.digits_g - 1
    ek = np.stack([d, f], axis=2).reshape(k, nb, n, dg, 2, params.N)

    ds, fs = _unienc_rows(
        sampler, params, tables, crs_eval,
        np.asarray(invsk_eval, np.int64)[0:1],
        np.ones(1, dtype=np.int64), np.ones(1, dtype=bool))
    ekstar = np.stack([ds[0], fs[0]], axis=1)     # [dG, 2, N]

    ek_sh = (ek.astype(np.uint64) << np.uint64(32)) // np.uint64(params.Q)
    return UniEncKey(
        ek=jnp.asarray(ek, I32),
        ekstar=jnp.asarray(ekstar, I32),
        pkey=jnp.asarray(pkey, I32),
        ek_sh=jnp.asarray(ek_sh.astype(np.uint32)),
    )


# ------------------------------------------------------------------ EvalAcc

def _mm(a, b, q):
    return ((a.astype(I64) * b.astype(I64)) % q).astype(I32)


def _hb_prod(tables, params: UniEncParams, d, f, uhot, pkey, acc):
    """The hybrid (external) product (HbProd, mk-acc-xzw.cpp:231-290).

    d, f: [B, dG, N] EVAL; uhot: [B, k] one-hot of the step's user index;
    pkey: [k, dG, N]; acc: [B, k, N] EVAL. Returns the REPLACED acc
    (uj per user, + w added to the index'd user).
    """
    Q = params.Q
    dg = params.digits_g - 1

    ct = ntt_inv(tables, acc)                               # [B, k, N] coeff
    dct = signed_digit_decompose(
        ct, Q, params.base_g, dg, signed=True)              # [dG, B, k, N]
    dct = ntt_fwd_digits(tables, dct, params.base_g)
    dct = jnp.moveaxis(dct, 0, 2)                           # [B, k, dG, N]

    dct64 = dct.astype(I64)
    # uj[u] = <g^-1(acc_u), d>;  v[u] = <g^-1(acc_u), Pkey_u>
    uj = (dct64 * d[:, None].astype(I64)).sum(axis=2) % Q   # [B, k, N]
    v = (dct64 * pkey[None].astype(I64)).sum(axis=2) % Q
    sum_v = v.sum(axis=1) % Q                               # [B, N]

    sv_coeff = ntt_inv(tables, sum_v.astype(I32))
    dct2 = signed_digit_decompose(
        sv_coeff, Q, params.base_g, dg, signed=True)
    dct2 = ntt_fwd_digits(tables, dct2, params.base_g)      # [dG, B, N]
    dct2 = jnp.moveaxis(dct2, 0, 1)                         # [B, dG, N]

    w = (dct2.astype(I64) * f.astype(I64)).sum(axis=1) % Q  # [B, N]
    out = (uj + uhot[:, :, None].astype(I64) * w[:, None, :]) % Q
    return out.astype(I32)


@partial(jax.jit, static_argnames=("params", "binary"))
def eval_acc(
    tables: NTTTables,
    params: UniEncParams,
    key: UniEncKey,
    acc,
    c_all,
    binary: bool,
):
    """Blind rotation over all k*n steps (EvalAcc, mk-acc-xzw.cpp:89-130 /
    mk-acc-xzw_B.cpp:103-133).

    acc: [..., k, N] EVAL; c_all: [..., k, n] rotation indices already in
    [0, 2N) (the caller applies the scheme-specific scaling: floor(a*2N/q)
    for MNTRU, raw mod-2N values for MKLWE).
    """
    Q, N = params.Q, params.N
    k = key.ek.shape[0]
    n = key.ek.shape[2]
    dg = params.digits_g - 1

    lead = c_all.shape[:-2]
    acc = acc.reshape(-1, k, N)
    c2 = c_all.reshape(-1, k, n)
    bsz = acc.shape[0]

    # step order (u, i) row-major; step t has user u = t // n
    c_steps = jnp.moveaxis(c2.reshape(bsz, k * n), 1, 0)     # [k*n, B]
    u_steps = (jnp.arange(k * n, dtype=I32) // n)
    uhot_steps = jax.nn.one_hot(u_steps, k, dtype=I32)       # [k*n, k]

    # ---------------------------------------------------------- step (0,0)
    c0 = c_steps[0]                                          # [B]
    mon_p0 = monomial_minus_one_eval(tables, c0)             # [B, N]
    ek00 = key.ek[0, 0, 0]                                   # [dG, 2, N]
    es = key.ekstar
    if binary:
        df0 = (es[None].astype(I64)
               + ek00[None].astype(I64) * mon_p0[:, None, None, :].astype(I64)
               ) % Q
    else:
        mon_n0 = monomial_minus_one_eval(tables, (2 * N - c0) % (2 * N))
        ek01 = key.ek[0, 1, 0]
        df0 = (es[None].astype(I64)
               + ek00[None].astype(I64) * mon_p0[:, None, None, :].astype(I64)
               + ek01[None].astype(I64) * mon_n0[:, None, None, :].astype(I64)
               ) % Q
    df0 = df0.astype(I32)                                    # [B, dG, 2, N]
    acc = _hb_prod(tables, params, df0[:, :, 0], df0[:, :, 1],
                   uhot_steps[0][None].repeat(bsz, 0), key.pkey, acc)

    # ------------------------------------------------- steps 1 .. k*n - 1
    # Contraction arithmetic is s64 with ONE amortized reduction per dG
    # row-sum — the measured in-gate winner over per-product Shoup/Barrett
    # (cggi.py note; round-1 u32 rewrite of this step was a correctness
    # regression, VERDICT r1 headline).
    ek_flat = key.ek.transpose(0, 2, 1, 3, 4, 5).reshape(
        k * n, (1 if binary else 2), dg, 2, N)

    from ..ops import fused
    if fused.enabled():
        eksh_flat = None
        if key.ek_sh is not None:
            eksh_flat = key.ek_sh.transpose(0, 2, 1, 3, 4, 5).reshape(
                k * n, (1 if binary else 2), dg, 2, N)[1:]
        out = fused.xzw_scan_fused(
            tables, params, ek_flat[1:], key.pkey, acc,
            c_steps[1:].astype(I32), binary, ek_sh=eksh_flat)
        return out.reshape(*lead, k, N)

    def _contract(dctn, keys):
        """dctn [..., dG, N] x keys [..., dG, N] -> [..., N].

        s64 products summed over dG with ONE amortized reduction (measured
        2.8 Gmulmod/s on v5e vs 1.9-2.0 for per-product Shoup/Barrett)."""
        prod = (dctn.astype(I64) * keys.astype(I64)).sum(axis=-2)
        return ((prod % Q)).astype(I32)

    def step(acc, xs):
        ek_t, c_t, uhot_t = xs            # ek_t: [nb, dG, 2, N]; c_t: [B]
        mon_p = monomial_minus_one_eval(tables, c_t)          # [B, N]

        # d,f rows for this step (mk-acc-xzw.cpp:322-325):
        # ternary: df = ev1 - ev2*(X^{-c}-1) - ev2; binary: df = ev1.
        # Fused s64 multiplies beat Shoup in-gate (see cggi.py note).
        if binary:
            df = jnp.broadcast_to(
                ek_t[0][None], (bsz, dg, 2, N))           # [B, dG, 2, N]
        else:
            mon_n = monomial_minus_one_eval(
                tables, (2 * N - c_t) % (2 * N))
            t2 = ((ek_t[1][None].astype(I64)
                   * mon_n[:, None, None, :].astype(I64)) % Q).astype(I32)
            df = mod_sub(mod_sub(ek_t[0][None], t2, Q), ek_t[1][None], Q)

        # acctemp = acc * (X^c - 1)
        acctemp = _mm(acc, mon_p[:, None, :], Q)

        # HbProd (mk-acc-xzw.cpp:231-290)
        ct = ntt_inv(tables, acctemp)                        # [B, k, N]
        dct = signed_digit_decompose(
            ct, Q, params.base_g, dg, signed=True)           # [dG, B, k, N]
        dct = ntt_fwd_digits(tables, dct, params.base_g)
        dctn = jnp.moveaxis(dct, 0, 2)                       # [B, k, dG, N]

        uj = _contract(dctn, df[:, None, :, 0, :])           # [B, k, N]
        v = _contract(dctn, key.pkey[None])                  # [B, k, N]
        sum_v = reduce(lambda a_, b_: mod_add(a_, b_, Q),
                       [v[:, u] for u in range(k)])          # [B, N]

        sv_coeff = ntt_inv(tables, sum_v)
        dct2 = signed_digit_decompose(
            sv_coeff, Q, params.base_g, dg, signed=True)
        dct2 = ntt_fwd_digits(tables, dct2, params.base_g)
        dct2 = jnp.moveaxis(dct2, 0, 1)                      # [B, dG, N]

        w = _contract(dct2, df[:, :, 1, :])                  # [B, N]

        uhot = jnp.broadcast_to(uhot_t[None], (bsz, k))
        acctemp = jnp.where(
            (uhot == 1)[:, :, None],
            mod_add(uj, w[:, None, :], Q), uj)
        acc = mod_add(acc, acctemp, Q)
        return acc, None

    xs = (ek_flat[1:], c_steps[1:], uhot_steps[1:])
    acc, _ = jax.lax.scan(step, acc, xs)
    return acc.reshape(*lead, k, N)
