"""DM (AP) blind rotation (reference: rgsw-acc-dm.cpp).

TPU re-design: the per-coefficient digit keys (*ek)[i][j][k]
(rgsw-acc-dm.cpp:39-60) become one int32 array [n, baseR, dR, dG2, 2, N];
EvalAcc is a lax.scan over the n*dR digit steps, gathering each batch
element's key row by its (traced) digit value and masking the zero-digit
'skip' (rgsw-acc-dm.cpp:73) with a lane select.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from functools import reduce

from ..ops.decompose import signed_digit_decompose_pair
from ..ops.modmath import I32, I64, mod_add
from ..ops.ntt import NTTTables, ntt_fwd, ntt_fwd_digits, ntt_inv
from ..params import RGSWParams
from ..rng import Sampler


class DMKey(NamedTuple):
    """[n, baseR, dR, dG2, 2, N] int32 EVAL (+ uint32 Shoup companions).
    Index j == 0 rows are unused (EvalAcc skips zero digits), zeros."""

    key: jnp.ndarray


def key_gen_acc(
    sampler: Sampler,
    params: RGSWParams,
    tables: NTTTables,
    sk_N_eval: np.ndarray,
    lwe_sk: np.ndarray,
    sk_mod: int,
) -> DMKey:
    """KeyGenAcc + KeyGenDM (rgsw-acc-dm.cpp:39-116): RGSW encryptions of
    X^{(2N/q) * s_i * j * baseR^t} for every digit value j and position t."""
    n = lwe_sk.shape[0]
    N, Q, q = params.N, params.Q, params.q
    dg2 = 2 * (params.digits_g - 1)
    baseR = params.base_r
    dR = params.digits_r
    factor = 2 * N // q

    gpow = np.ones(params.digits_g, dtype=np.int64)
    for i in range(1, params.digits_g):
        gpow[i] = gpow[i - 1] * params.base_g % Q
    rpow = baseR ** np.arange(dR, dtype=np.int64)

    s = np.asarray(lwe_sk, np.int64)
    s_signed = np.where(s > sk_mod // 2, s - sk_mod, s)

    # m[i, j, t] = s_i * j * baseR^t; embedded as +-X^{mm*factor}
    m = s_signed[:, None, None] * np.arange(baseR)[None, :, None] \
        * rpow[None, None, :]
    mm = (((m % q) + q) % q) * factor
    neg = mm >= N
    mm = np.where(neg, mm - N, mm)

    R = n * baseR * dR
    A = sampler.uniform(Q, (R, dg2, N))
    E = sampler.discrete_gaussian(params.std, (R, dg2, N), q=Q)

    d_idx = np.arange(dg2)
    gvals = gpow[(d_idx >> 1) + 1]
    sign = np.where(neg.reshape(R), -1, 1)
    A_msg = A.copy()
    rows = np.arange(R)
    evn = (d_idx & 1) == 0
    # add +-Gpow at coefficient mm of component (d&1), in COEFF format
    add = (sign[:, None] * gvals[None, :]) % Q                   # [R, dg2]
    mmr = mm.reshape(R)
    A_msg[rows[:, None], d_idx[None, evn.nonzero()[0]], mmr[:, None]] = (
        A[rows[:, None], d_idx[None, evn.nonzero()[0]], mmr[:, None]]
        + add[:, evn]) % Q
    E[rows[:, None], d_idx[None, (~evn).nonzero()[0]], mmr[:, None]] = (
        E[rows[:, None], d_idx[None, (~evn).nonzero()[0]], mmr[:, None]]
        + add[:, ~evn]) % Q

    from ..ops.ntt import host_ntt_fwd

    A_eval = host_ntt_fwd(tables, A)
    A_msg_eval = host_ntt_fwd(tables, A_msg)
    E_eval = host_ntt_fwd(tables, E)
    sk_np = np.asarray(sk_N_eval, np.int64)
    B_eval = (E_eval + A_eval * sk_np) % Q
    key = np.stack([A_msg_eval, B_eval], axis=2)                 # [R, dg2, 2, N]
    key = key.reshape(n, baseR, dR, dg2, 2, N)
    # zero out j == 0 rows (never used; keeps gather semantics clean)
    key[:, 0] = 0
    return DMKey(jnp.asarray(key, I32))


@partial(jax.jit, static_argnames=("params", "a_mod"))
def eval_acc(
    tables: NTTTables, params: RGSWParams, key: DMKey, acc, a,
    a_mod: int | None = None,
) -> jnp.ndarray:
    """Blind rotation (EvalAcc + AddToAccDM, rgsw-acc-dm.cpp:62-144).

    acc: [..., 2, N] EVAL; a: [..., n] mod q. Scan over n*dR digit steps;
    each step REPLACES acc by <g^-1(acc), ek[i][digit][t]> unless the digit
    is zero (lane-masked)."""
    Q, N = params.Q, params.N
    q = params.q if a_mod is None else a_mod
    dg = params.digits_g - 1
    dg2 = 2 * dg
    baseR, dR = params.base_r, params.digits_r

    lead = a.shape[:-1]
    n = a.shape[-1]
    acc = acc.reshape(-1, 2, N)
    a2 = a.reshape(-1, n)
    bsz = acc.shape[0]

    aI = (q - a2) % q                                   # [B, n]
    digs = []
    cur = aI.astype(I64)
    for _ in range(dR):
        digs.append((cur % baseR).astype(I32))
        cur = cur // baseR
    dig = jnp.stack(digs, axis=-1)                      # [B, n, dR]
    dig_steps = jnp.moveaxis(dig.reshape(bsz, n * dR), 1, 0)   # [n*dR, B]

    # step order (i, t) with t innermost -> [n*dR, baseR, dg2, 2, N]
    key_flat = key.key.transpose(0, 2, 1, 3, 4, 5).reshape(
        n * dR, baseR, dg2, 2, N)
    def step(acc, xs):
        ek_row, d_t = xs           # ek_row: [baseR, dg2, 2, N]; d_t: [B]
        ct0 = ntt_inv(tables, acc)
        dct = signed_digit_decompose_pair(
            ct0[:, 0, :], ct0[:, 1, :], Q, params.base_g, dg,
            signed=True)                                        # [dg2, B, N]
        dct = ntt_fwd_digits(tables, dct, params.base_g)
        dct = jnp.moveaxis(dct, 0, 1)                           # [B, dg2, N]
        ek = ek_row[d_t]                                        # [B, dg2, 2, N]
        prod = (dct[:, :, None, :].astype(I64) * ek.astype(I64)).sum(axis=1)
        new = (prod % Q).astype(I32)                            # [B, 2, N]
        acc = jnp.where((d_t == 0)[:, None, None], acc, new)
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (key_flat, dig_steps))
    return acc.reshape(*lead, 2, N)


# ===================================================== dual-limb RNS (big Q)

def key_gen_acc_rns(
    sampler: Sampler,
    params: RGSWParams,
    rt,                       # ops.rns.RNSTables
    skN: np.ndarray,          # [N] values in [0, Q_eff)
    lwe_sk: np.ndarray,
    sk_mod: int,
) -> DMKey:
    """KeyGenAcc/KeyGenDM over the dual-limb RNS pair (ops/rns.py); same
    construction as key_gen_acc with per-limb Z_Q sampling (independent
    uniforms per limb == CRT image of uniform mod Q). Key layout:
    [n, baseR, dR, dg2, 2, L, N] int32 EVAL."""
    from ..ops.rns import rns_host_ntt_fwd, to_residues

    n = lwe_sk.shape[0]
    N, Q, q = params.N, rt.Q, params.q
    L = len(rt.limbs)
    dg2 = 2 * (params.digits_g - 1)
    baseR = params.base_r
    dR = params.digits_r
    factor = 2 * N // q

    gpow = [pow(params.base_g, i, Q) for i in range(params.digits_g)]
    rpow = baseR ** np.arange(dR, dtype=np.int64)

    s = np.asarray(lwe_sk, np.int64)
    s_signed = np.where(s > sk_mod // 2, s - sk_mod, s)

    m = s_signed[:, None, None] * np.arange(baseR)[None, :, None] \
        * rpow[None, None, :]
    mm = (((m % q) + q) % q) * factor
    neg = mm >= N
    mm = np.where(neg, mm - N, mm)

    R = n * baseR * dR
    A = np.stack([sampler.uniform(ql, (R, dg2, N)) for ql in rt.limbs],
                 axis=-2)                                   # [R, dg2, L, N]
    E_int = sampler.discrete_gaussian(params.std, (R, dg2, N))
    E = np.stack([np.asarray(E_int, np.int64) % ql for ql in rt.limbs],
                 axis=-2)

    d_idx = np.arange(dg2)
    sign = np.where(neg.reshape(R), -1, 1)
    rows = np.arange(R)
    evn = (d_idx & 1) == 0
    mmr = mm.reshape(R)
    A_msg = A.copy()
    for li, ql in enumerate(rt.limbs):
        gl = np.asarray([gpow[(d >> 1) + 1] % ql for d in d_idx], np.int64)
        add = (sign[:, None] * gl[None, :]) % ql            # [R, dg2]
        A_msg[rows[:, None], d_idx[None, evn.nonzero()[0]], li,
              mmr[:, None]] = (
            A[rows[:, None], d_idx[None, evn.nonzero()[0]], li,
              mmr[:, None]] + add[:, evn]) % ql
        E[rows[:, None], d_idx[None, (~evn).nonzero()[0]], li,
          mmr[:, None]] = (
            E[rows[:, None], d_idx[None, (~evn).nonzero()[0]], li,
              mmr[:, None]] + add[:, ~evn]) % ql

    A_eval = rns_host_ntt_fwd(rt, A)
    A_msg_eval = rns_host_ntt_fwd(rt, A_msg)
    E_eval = rns_host_ntt_fwd(rt, E)
    sk_eval = rns_host_ntt_fwd(rt, to_residues(skN, rt.limbs)).astype(
        np.int64)                                           # [L, N]
    B_eval = np.empty_like(A_eval, dtype=np.int64)
    for li, ql in enumerate(rt.limbs):
        B_eval[..., li, :] = (
            E_eval[..., li, :].astype(np.int64)
            + A_eval[..., li, :].astype(np.int64) * sk_eval[li]) % ql
    key = np.stack([A_msg_eval.astype(np.int64), B_eval], axis=2)
    key = key.reshape(n, baseR, dR, dg2, 2, L, N)
    key[:, 0] = 0
    return DMKey(jnp.asarray(key, I32))


def eval_acc_rns(rt, params: RGSWParams, key: DMKey, acc, a,
                 a_mod: int | None = None) -> jnp.ndarray:
    """AP blind rotation over the RNS pair: acc [..., 2, L, N] EVAL."""
    from ..ops.rns import (
        rns_digits_to_eval, rns_mulsum_u32, rns_ntt_inv,
        rns_signed_digits_u32)

    N = params.N
    L = len(rt.limbs)
    q = params.q if a_mod is None else a_mod
    dg = params.digits_g - 1
    dg2 = 2 * dg
    baseR, dR = params.base_r, params.digits_r

    lead = a.shape[:-1]
    n = a.shape[-1]
    acc = acc.reshape(-1, 2, L, N)
    a2 = a.reshape(-1, n)
    bsz = acc.shape[0]

    aI = (q - a2) % q
    digs = []
    cur = aI.astype(I64)
    for _ in range(dR):
        digs.append((cur % baseR).astype(I32))
        cur = cur // baseR
    dig = jnp.stack(digs, axis=-1)
    dig_steps = jnp.moveaxis(dig.reshape(bsz, n * dR), 1, 0)

    key_flat = key.key.transpose(0, 2, 1, 3, 4, 5, 6).reshape(
        n * dR, baseR, dg2, 2, L, N)

    def step(acc, xs):
        ek_row, d_t = xs       # [baseR, dg2, 2, L, N]; [B]
        ct0 = rns_ntt_inv(rt, acc)                       # [B, 2, L, N]
        d0 = rns_signed_digits_u32(rt, ct0[:, 0], params.base_g, dg)
        d1 = rns_signed_digits_u32(rt, ct0[:, 1], params.base_g, dg)
        digp = jnp.stack([d0, d1], axis=1).reshape(
            (dg2,) + d0.shape[1:])                       # [dg2, B, N]
        dct = rns_digits_to_eval(rt, digp)               # [dg2, B, L, N]
        dct = jnp.moveaxis(dct, 0, 1)                    # [B, dg2, L, N]
        ek = ek_row[d_t]                                 # [B, dg2, 2, L, N]
        new = rns_mulsum_u32(rt, dct[:, :, None], ek, axis=1)
        acc = jnp.where((d_t == 0)[:, None, None, None], acc, new)
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (key_flat, dig_steps))
    return acc.reshape(*lead, 2, L, N)
