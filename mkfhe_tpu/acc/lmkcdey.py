"""LMKCDEY blind rotation (ia.cr/2022/198; reference: rgsw-acc-lmkcdey.cpp).

The reference's EvalAcc walks the discrete-log ladder of the generator 5
with data-dependent control flow: coefficients are bucketed by
logGen[-a_i | 1], buckets are visited in descending order with keyed
automorphisms by 5^{<=w} (w = numAutoKeys) flushed lazily between them
(rgsw-acc-lmkcdey.cpp:71-159). That shape cannot batch on TPU directly.

TPU re-design — an OP TAPE with a static slot count and traced contents:
every ciphertext compiles to the same T = n + 2 + 2*ceil((Nh-1)/w) slots;
each slot carries (auto_amount in [0, w], action kind, evk index), all
traced data built in-graph from the a-vector by sort + cumsum arithmetic.
A lax.scan executes the tape; batch elements follow their own schedules
through gathers and lane masks while sharing one trace. The automorphism
work matches the reference's (movement is chunked by the same window w),
so noise growth is the same class.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from functools import reduce

from ..ops.decompose import (
    signed_digit_decompose,
    signed_digit_decompose_pair,
)
from ..ops.modmath import (
    I32, I64, mod_add, shoup_mul, shoup_precompute)
from ..ops.ntt import NTTTables, ntt_fwd, ntt_fwd_digits, ntt_inv
from ..ops.poly import automorphism_eval
from ..params import RGSWParams
from ..rng import Sampler


class LMKCDEYKey(NamedTuple):
    evk: jnp.ndarray     # [n, dG2, 2, N]  RGSW(X^{(2N/q) s_i})
    auto: jnp.ndarray    # [w+1, dG, 2, N] index 0: key for 2N-5; 1..w: 5^i
    pow5: jnp.ndarray    # [w+1] int32: 5^i mod 2N (pow5[0] = 2N-5)
    log_gen: jnp.ndarray  # [2N] int32 discrete-log table (see key_gen_acc)
    evk_sh: jnp.ndarray   # uint32 Shoup companions
    auto_sh: jnp.ndarray


def key_gen_acc(
    sampler: Sampler,
    params: RGSWParams,
    tables: NTTTables,
    sk_N_eval: np.ndarray,
    lwe_sk: np.ndarray,
    sk_mod: int,
) -> LMKCDEYKey:
    """KeyGenAcc (rgsw-acc-lmkcdey.cpp:39-68): n RGSW keys + w+1 auto keys.

    log_gen encoding (int32): logGen[5^i mod 2N] = i, logGen[2N - 5^i] = -i
    for i in [1, Nh), logGen[2N-1] = Nh (the '-1' bucket marker; reference
    uses M), logGen[1] = 0 (rgsw-cryptoparameters.cpp:112-124).
    """
    n = lwe_sk.shape[0]
    N, Q, q = params.N, params.Q, params.q
    M = 2 * N
    Nh = N // 2
    w = params.num_auto_keys
    dg = params.digits_g - 1
    dg2 = 2 * dg

    gpow = np.ones(params.digits_g, dtype=np.int64)
    for i in range(1, params.digits_g):
        gpow[i] = gpow[i - 1] * params.base_g % Q
    gvals2 = gpow[(np.arange(dg2) >> 1) + 1]

    s = np.asarray(lwe_sk, np.int64)
    s_signed = np.where(s > sk_mod // 2, s - sk_mod, s)
    mm = (((s_signed % q) + q) % q) * (M // q)
    neg = mm >= N
    mm = np.where(neg, mm - N, mm)

    # RGSW(X^{mm}) rows (KeyGenLMKCDEY, :164-202) — vectorized like cggi
    A = sampler.uniform(Q, (n, dg2, N))
    E = sampler.discrete_gaussian(params.std, (n, dg2, N), q=Q)
    sign = np.where(neg, -1, 1)
    A_msg = A.copy()
    d_idx = np.arange(dg2)
    evn = (d_idx & 1) == 0
    add = (sign[:, None] * gvals2[None, :]) % Q               # [n, dg2]
    rows = np.arange(n)
    A_msg[rows[:, None], d_idx[None, evn], mm[:, None]] = (
        A[rows[:, None], d_idx[None, evn], mm[:, None]] + add[:, evn]) % Q
    E[rows[:, None], d_idx[None, ~evn], mm[:, None]] = (
        E[rows[:, None], d_idx[None, ~evn], mm[:, None]] + add[:, ~evn]) % Q

    from ..ops.ntt import host_ntt_fwd

    A_eval = host_ntt_fwd(tables, A)
    A_msg_eval = host_ntt_fwd(tables, A_msg)
    E_eval = host_ntt_fwd(tables, E)
    skev = np.asarray(sk_N_eval, np.int64)
    B_eval = (E_eval + A_eval * skev) % Q
    evk = np.stack([A_msg_eval, B_eval], axis=2)               # [n, dg2, 2, N]

    # automorphism keys (KeyGenAuto, :205-227):
    # rows d: (a, e - psi_t(s) Gpow[d+1] + a*s), all EVAL
    ts = np.empty(w + 1, dtype=np.int64)
    ts[0] = M - 5
    for i in range(1, w + 1):
        ts[i] = pow(5, i, M)
    sk_auto = np.asarray(
        automorphism_eval(
            tables, jnp.asarray(skev, I32)[None].repeat(w + 1, 0),
            jnp.asarray(ts)), np.int64)                        # [w+1, N]
    # NativePoly(dug/dgg, EVALUATION) samples in COEFF then NTTs
    # (poly-impl.h:56-61), so the Gaussian noise is small in COEFF domain
    Aa = sampler.uniform(Q, (w + 1, dg, N))
    Ea = sampler.discrete_gaussian(params.std, (w + 1, dg, N), q=Q)
    Aa = host_ntt_fwd(tables, Aa)
    Ea = host_ntt_fwd(tables, Ea)
    Ba = (Ea - sk_auto[:, None, :] * gpow[1:dg + 1][None, :, None]
          + Aa * skev) % Q
    ak = np.stack([Aa, Ba], axis=2)                            # [w+1, dG, 2, N]

    log_gen = np.zeros(M, dtype=np.int64)
    log_gen[M - 1] = Nh
    gp = 1
    for i in range(1, Nh):
        gp = gp * 5 % M
        log_gen[gp] = i
        log_gen[M - gp] = -i

    return LMKCDEYKey(
        evk=jnp.asarray(evk, I32),
        auto=jnp.asarray(ak, I32),
        pow5=jnp.asarray(ts, I32),
        log_gen=jnp.asarray(log_gen, I32),
        evk_sh=jnp.asarray(shoup_precompute(evk, Q)),
        auto_sh=jnp.asarray(shoup_precompute(ak, Q)),
    )


def _ext_prod_rlwe(tables, params, ek, ek_sh, acc):
    """acc <- <g^-1(acc), ek> (AddToAccLMKCDEY, :231-256).
    ek: [B, dg2, 2, N]; acc: [B, 2, N] EVAL. REPLACES acc (Shoup)."""
    Q = params.Q
    dg = params.digits_g - 1
    dg2 = 2 * dg
    ct = ntt_inv(tables, acc)
    dct = signed_digit_decompose_pair(
        ct[:, 0, :], ct[:, 1, :], Q, params.base_g, dg,
        signed=True)                                           # [dg2, B, N]
    dct = ntt_fwd_digits(tables, dct, params.base_g)
    dct = jnp.moveaxis(dct, 0, 1)                              # [B, dg2, N]
    del ek_sh
    prod = (dct[:, :, None, :].astype(I64) * ek.astype(I64)).sum(axis=1)
    return (prod % Q).astype(I32)                              # [B, 2, N]


def _keyed_auto(tables, params, t_val, ak, ak_sh, acc):
    """Keyed automorphism (Automorphism, :259-290): acc0' = <g^-1(auto
    acc0), ak[:,0]>, acc1' = auto(acc1) + <g^-1(auto acc0), ak[:,1]>.
    t_val: [B]; ak: [B, dG, 2, N]; acc: [B, 2, N] (Shoup products)."""
    Q = params.Q
    dg = params.digits_g - 1
    acc1 = automorphism_eval(tables, acc[:, 1, :], t_val)
    acc0 = automorphism_eval(tables, acc[:, 0, :], t_val)
    cta = ntt_inv(tables, acc0)
    dct = signed_digit_decompose(
        cta, Q, params.base_g, dg, signed=True)                # [dG, B, N]
    dct = ntt_fwd_digits(tables, dct, params.base_g)
    dct = jnp.moveaxis(dct, 0, 1)                              # [B, dG, N]
    del ak_sh
    prod = (dct[:, :, None, :].astype(I64) * ak.astype(I64)).sum(axis=1)
    out = (prod % Q).astype(I32)                               # [B, 2, N]
    return out.at[:, 1, :].set(mod_add(out[:, 1, :], acc1, Q))


def _build_tape(key: LMKCDEYKey, a2, n: int, N: int, w: int):
    """In-graph tape construction. a2: [B, n] mod q. Returns per-slot
    arrays [T, B]: auto_amt, kind (0 none, 1 evk, 2 key0), evk_idx."""
    B = a2.shape[0]
    M = 2 * N
    Nh = N // 2

    a_odd = ((M - a2.astype(I64)) % M) | 1                     # [B, n]
    idx = key.log_gen.astype(I64)[a_odd]                       # [B, n]

    # global movement position G and phase for each coefficient event:
    #   idx in [-(Nh-1), -1]  -> G = Nh-1 + idx          (phase A)
    #   idx == Nh (the -1 bkt)-> G = Nh-1                (end of phase A)
    #   idx in [1, Nh-1]      -> G = (Nh-1) + (Nh-1-idx) (phase B)
    #   idx == 0              -> G = 2(Nh-1)             (very end)
    is_m = idx == Nh
    is_pos = (idx >= 1) & (idx <= Nh - 1)
    is_zero = idx == 0
    G = jnp.where(is_m, Nh - 1,
        jnp.where(is_pos, (Nh - 1) + (Nh - 1 - idx),
        jnp.where(is_zero, 2 * (Nh - 1), (Nh - 1) + idx)))
    # ord: key0 sits between phase A (code 0) and phase B (code 2)
    phase_code = jnp.where(is_pos | is_zero, 2, 0)
    ordkey = G * 4 + phase_code                                # [B, n]

    # synthetic events: key0 (G = Nh-1, code 1) and end-flush (G=2(Nh-1),
    # code 3, ensures the trailing movement is applied)
    G_syn = jnp.asarray([Nh - 1, 2 * (Nh - 1)], I64)
    ord_syn = G_syn * 4 + jnp.asarray([1, 3], I64)
    kind_syn = jnp.asarray([2, 0], I32)

    m = n + 2
    G_all = jnp.concatenate(
        [G, jnp.broadcast_to(G_syn, (B, 2))], axis=1)          # [B, m]
    ord_all = jnp.concatenate(
        [ordkey, jnp.broadcast_to(ord_syn, (B, 2))], axis=1)
    kind_all = jnp.concatenate(
        [jnp.ones((B, n), I32), jnp.broadcast_to(kind_syn, (B, 2))], axis=1)
    j_all = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(n, dtype=I32), (B, n)),
         jnp.zeros((B, 2), I32)], axis=1)

    order = jnp.argsort(ord_all, axis=1)                       # stable
    G_s = jnp.take_along_axis(G_all, order, axis=1)
    kind_s = jnp.take_along_axis(kind_all, order, axis=1)
    j_s = jnp.take_along_axis(j_all, order, axis=1)

    G_prev = jnp.concatenate([jnp.zeros((B, 1), I64), G_s[:, :-1]], axis=1)
    delta = G_s - G_prev                                       # [B, m] >= 0
    qch = delta // w                                           # full chunks
    r = delta % w

    # slot cursor of event e: e + cumsum(q)_e  (q_e pure-auto slots first)
    cur = jnp.arange(m, dtype=I64)[None, :] + jnp.cumsum(qch, axis=1)
    used = cur[:, -1] + 1                                      # slots used

    T = m + 2 * ((Nh - 1) // w + 1)
    slot_b = jnp.arange(B)[:, None]

    kind_t = jnp.zeros((B, T), I32).at[slot_b, cur].set(kind_s)
    j_t = jnp.zeros((B, T), I32).at[slot_b, cur].set(j_s)
    r_t = jnp.zeros((B, T), I32).at[slot_b, cur].set(r.astype(I32))
    is_proc = jnp.zeros((B, T), jnp.bool_).at[slot_b, cur].set(True)
    in_use = jnp.arange(T)[None, :] < used[:, None]
    auto_amt = jnp.where(is_proc, r_t,
                         jnp.where(in_use, jnp.full((), w, I32), 0))
    return (jnp.moveaxis(auto_amt, 1, 0), jnp.moveaxis(kind_t, 1, 0),
            jnp.moveaxis(j_t, 1, 0))


@partial(jax.jit, static_argnames=("params",))
def eval_acc(
    tables: NTTTables, params: RGSWParams, key: LMKCDEYKey, acc, a
) -> jnp.ndarray:
    """Batched LMKCDEY accumulation (EvalAcc, rgsw-acc-lmkcdey.cpp:71-159)
    via the op tape. acc: [..., 2, N] EVAL; a: [..., n] mod q (q == N)."""
    Q, N = params.Q, params.N
    M = 2 * N
    w = params.num_auto_keys
    dg = params.digits_g - 1

    lead = a.shape[:-1]
    n = a.shape[-1]
    acc = acc.reshape(-1, 2, N)
    a2 = a.reshape(-1, n)
    bsz = acc.shape[0]

    # initial unkeyed automorphism of the body by 2N-5 (:100; acc0 == 0)
    acc = acc.at[:, 1, :].set(
        automorphism_eval(tables, acc[:, 1, :], M - 5))

    auto_amt, kind_t, j_t = _build_tape(key, a2, n, N, w)

    def step(acc, xs):
        amt, kind, jv = xs          # each [B]
        # 1. movement: keyed auto by 5^amt (amt in [0, w]; 0 = skip)
        t_val = key.pow5.astype(I64)[amt]                      # [B]
        idx = jnp.maximum(amt, 1)
        moved = _keyed_auto(
            tables, params, t_val, key.auto[idx], key.auto_sh[idx], acc)
        acc = jnp.where((amt > 0)[:, None, None], moved, acc)
        # 2. action
        proc = _ext_prod_rlwe(
            tables, params, key.evk[jv], key.evk_sh[jv], acc)
        acc = jnp.where((kind == 1)[:, None, None], proc, acc)
        ak0 = jnp.broadcast_to(key.auto[0][None], (bsz,) + key.auto[0].shape)
        ak0_sh = jnp.broadcast_to(
            key.auto_sh[0][None], (bsz,) + key.auto_sh[0].shape)
        k0 = _keyed_auto(
            tables, params,
            jnp.full((bsz,), M - 5, I64), ak0, ak0_sh, acc)
        acc = jnp.where((kind == 2)[:, None, None], k0, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (auto_amt, kind_t, j_t))
    return acc.reshape(*lead, 2, N)


# ===================================================== dual-limb RNS (big Q)

def key_gen_acc_rns(
    sampler: Sampler,
    params: RGSWParams,
    rt,                       # ops.rns.RNSTables
    skN: np.ndarray,          # [N] in [0, Q_eff)
    lwe_sk: np.ndarray,
    sk_mod: int,
) -> LMKCDEYKey:
    """KeyGenAcc over the dual-limb RNS pair: evk [n, dG2, 2, L, N],
    auto [w+1, dG, 2, L, N]; the dlog/pow5 tables are modulus-free."""
    from ..ops.rns import rns_host_ntt_fwd, to_residues

    n = lwe_sk.shape[0]
    N, Q, q = params.N, rt.Q, params.q
    L = len(rt.limbs)
    M = 2 * N
    Nh = N // 2
    w = params.num_auto_keys
    dg = params.digits_g - 1
    dg2 = 2 * dg

    gpow = [pow(params.base_g, i, Q) for i in range(params.digits_g)]

    s = np.asarray(lwe_sk, np.int64)
    s_signed = np.where(s > sk_mod // 2, s - sk_mod, s)
    mm = (((s_signed % q) + q) % q) * (M // q)
    neg = mm >= N
    mm = np.where(neg, mm - N, mm)

    A = np.stack([sampler.uniform(ql, (n, dg2, N)) for ql in rt.limbs],
                 axis=-2)                                    # [n, dg2, L, N]
    E_int = sampler.discrete_gaussian(params.std, (n, dg2, N))
    E = np.stack([np.asarray(E_int, np.int64) % ql for ql in rt.limbs],
                 axis=-2)
    sign = np.where(neg, -1, 1)
    d_idx = np.arange(dg2)
    evn = (d_idx & 1) == 0
    rows = np.arange(n)
    A_msg = A.copy()
    for li, ql in enumerate(rt.limbs):
        gl = np.asarray([gpow[(d >> 1) + 1] % ql for d in d_idx], np.int64)
        add = (sign[:, None] * gl[None, :]) % ql
        A_msg[rows[:, None], d_idx[None, evn], li, mm[:, None]] = (
            A[rows[:, None], d_idx[None, evn], li, mm[:, None]]
            + add[:, evn]) % ql
        E[rows[:, None], d_idx[None, ~evn], li, mm[:, None]] = (
            E[rows[:, None], d_idx[None, ~evn], li, mm[:, None]]
            + add[:, ~evn]) % ql

    A_eval = rns_host_ntt_fwd(rt, A)
    A_msg_eval = rns_host_ntt_fwd(rt, A_msg)
    E_eval = rns_host_ntt_fwd(rt, E)
    sk_eval = rns_host_ntt_fwd(rt, to_residues(skN, rt.limbs)).astype(
        np.int64)                                            # [L, N]
    B_eval = np.empty_like(A_eval, dtype=np.int64)
    for li, ql in enumerate(rt.limbs):
        B_eval[..., li, :] = (
            E_eval[..., li, :].astype(np.int64)
            + A_eval[..., li, :].astype(np.int64) * sk_eval[li]) % ql
    evk = np.stack([A_msg_eval.astype(np.int64), B_eval], axis=2)

    # automorphism keys per limb
    ts = np.empty(w + 1, dtype=np.int64)
    ts[0] = M - 5
    for i in range(1, w + 1):
        ts[i] = pow(5, i, M)
    from ..ops.poly import automorphism_eval as _auto

    sk_auto = np.stack([
        np.asarray(_auto(
            rt.tables[li],
            jnp.asarray(sk_eval[li], I32)[None].repeat(w + 1, 0),
            jnp.asarray(ts)), np.int64)
        for li in range(L)], axis=-2)                        # [w+1, L, N]
    Aa = np.stack([sampler.uniform(ql, (w + 1, dg, N)) for ql in rt.limbs],
                  axis=-2)
    Ea_int = sampler.discrete_gaussian(params.std, (w + 1, dg, N))
    Ea = np.stack([np.asarray(Ea_int, np.int64) % ql for ql in rt.limbs],
                  axis=-2)
    Aa = rns_host_ntt_fwd(rt, Aa)
    Ea = rns_host_ntt_fwd(rt, Ea)
    Ba = np.empty_like(Aa, dtype=np.int64)
    for li, ql in enumerate(rt.limbs):
        gl = np.asarray([g % ql for g in gpow[1:dg + 1]], np.int64)
        Ba[..., li, :] = (
            Ea[..., li, :].astype(np.int64)
            - sk_auto[:, None, li, :] * gl[None, :, None]
            + Aa[..., li, :].astype(np.int64) * sk_eval[li]) % ql
    ak = np.stack([Aa.astype(np.int64), Ba], axis=2)         # [w+1,dG,2,L,N]

    log_gen = np.zeros(M, dtype=np.int64)
    log_gen[M - 1] = Nh
    gp = 1
    for i in range(1, Nh):
        gp = gp * 5 % M
        log_gen[gp] = i
        log_gen[M - gp] = -i

    return LMKCDEYKey(
        evk=jnp.asarray(evk, I32),
        auto=jnp.asarray(ak, I32),
        pow5=jnp.asarray(ts, I32),
        log_gen=jnp.asarray(log_gen, I32),
        evk_sh=jnp.zeros((1,), jnp.uint32),   # unused on the RNS path
        auto_sh=jnp.zeros((1,), jnp.uint32),
    )


def _rns_digits_pair(rt, params, ct):
    """[B, 2, L, N] COEFF residues -> interleaved digit EVAL residues
    [B, dg2, L, N]."""
    from ..ops.rns import rns_digits_to_eval, rns_signed_digits_u32

    dg = params.digits_g - 1
    d0 = rns_signed_digits_u32(rt, ct[:, 0], params.base_g, dg)
    d1 = rns_signed_digits_u32(rt, ct[:, 1], params.base_g, dg)
    digp = jnp.stack([d0, d1], axis=1).reshape((2 * dg,) + d0.shape[1:])
    dct = rns_digits_to_eval(rt, digp)
    return jnp.moveaxis(dct, 0, 1)


def _ext_prod_rlwe_rns(rt, params, ek, acc):
    """ek: [B, dg2, 2, L, N]; acc: [B, 2, L, N] EVAL -> replaces acc.
    All-u32 contraction (r5; was emulated s64)."""
    from ..ops.rns import rns_mulsum_u32, rns_ntt_inv

    ct = rns_ntt_inv(rt, acc)
    dct = _rns_digits_pair(rt, params, ct)                  # [B, dg2, L, N]
    return rns_mulsum_u32(rt, dct[:, :, None], ek, axis=1)


def _keyed_auto_rns(rt, params, t_val, ak, acc):
    """t_val: [B]; ak: [B, dG, 2, L, N]; acc: [B, 2, L, N]."""
    from ..ops.rns import (
        rns_digits_to_eval, rns_mulsum_u32, rns_ntt_inv,
        rns_signed_digits_u32)

    L = len(rt.limbs)
    dg = params.digits_g - 1
    limbs_row = jnp.asarray(np.asarray(rt.limbs, np.int32)[:, None])

    acc1 = jnp.stack(
        [automorphism_eval(rt.tables[li], acc[:, 1, li, :], t_val)
         for li in range(L)], axis=-2)                       # [B, L, N]
    acc0 = jnp.stack(
        [automorphism_eval(rt.tables[li], acc[:, 0, li, :], t_val)
         for li in range(L)], axis=-2)
    cta = rns_ntt_inv(rt, acc0)                              # [B, L, N]
    dct = rns_signed_digits_u32(rt, cta, params.base_g, dg)  # [dG, B, N]
    dct = rns_digits_to_eval(rt, dct)                        # [dG, B, L, N]
    dct = jnp.moveaxis(dct, 0, 1)                            # [B, dG, L, N]
    out = rns_mulsum_u32(rt, dct[:, :, None], ak, axis=1)    # [B, 2, L, N]
    s = out[:, 1] + acc1
    s = jnp.where(s >= limbs_row, s - limbs_row, s)
    return out.at[:, 1].set(s)


def eval_acc_rns(rt, params: RGSWParams, key: LMKCDEYKey, acc, a):
    """LMKCDEY accumulation over the RNS pair; same op tape as eval_acc.
    acc: [..., 2, L, N] EVAL; a: [..., n] mod q (q == N)."""
    N = params.N
    L = len(rt.limbs)
    M = 2 * N
    w = params.num_auto_keys

    lead = a.shape[:-1]
    n = a.shape[-1]
    acc = acc.reshape(-1, 2, L, N)
    a2 = a.reshape(-1, n)
    bsz = acc.shape[0]

    acc = acc.at[:, 1].set(jnp.stack(
        [automorphism_eval(rt.tables[li], acc[:, 1, li, :], M - 5)
         for li in range(L)], axis=-2))

    auto_amt, kind_t, j_t = _build_tape(key, a2, n, N, w)

    def step(acc, xs):
        amt, kind, jv = xs
        t_val = key.pow5.astype(I64)[amt]
        idx = jnp.maximum(amt, 1)
        moved = _keyed_auto_rns(rt, params, t_val, key.auto[idx], acc)
        acc = jnp.where((amt > 0)[:, None, None, None], moved, acc)
        proc = _ext_prod_rlwe_rns(rt, params, key.evk[jv], acc)
        acc = jnp.where((kind == 1)[:, None, None, None], proc, acc)
        ak0 = jnp.broadcast_to(
            key.auto[0][None], (bsz,) + key.auto[0].shape)
        k0 = _keyed_auto_rns(
            rt, params, jnp.full((bsz,), M - 5, I64), ak0, acc)
        acc = jnp.where((kind == 2)[:, None, None, None], k0, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (auto_amt, kind_t, j_t))
    return acc.reshape(*lead, 2, L, N)
