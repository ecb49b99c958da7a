"""CGGI (GINX) blind rotation (reference: rgsw-acc-cggi.cpp).

TPU re-design:
  * the bootstrapping key is ONE int32 array [n, 2, dG2, 2, N] in EVAL form
    (secret-branch axis for the ternary-MUX double key ek00/ek01,
    rgsw-acc-cggi.cpp:40-63) instead of n*2 RingGSWEvalKey objects
  * EvalAcc is a lax.scan over the n rotation steps; within a step the
    external product is a [dG2] x [dG2, 2, N] modular contraction plus a
    monomial (X^c - 1) pointwise multiply — all batched over a leading
    ciphertext-batch axis
  * monomials come from the slot-exponent gather in ops.poly, replacing the
    reference's precomputed 2N-entry X^m-1 table
    (rgsw-cryptoparameters.cpp:94-110)
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from functools import reduce

from ..ops.decompose import signed_digit_decompose_pair
from ..ops.modmath import I32, I64, mod_add, mod_sub
from ..ops.ntt import NTTTables, ntt_fwd, ntt_fwd_digits, ntt_inv
from ..ops.poly import monomial_minus_one_eval
from ..params import RGSWParams
from ..rng import Sampler


class CGGIKey(NamedTuple):
    """BSkey: [n, 2, dG2, 2, N] int32 EVAL (+ uint32 Shoup companions).
    Axis 1: ek00 (s==1) / ek01 (s==-1); axis 3: (a, b) components.

    key_sh: floor(key * 2^32 / Q) as uint32, precomputed at keygen — the
    fused kernel's Shoup companions. Computing these in-graph costs a u64
    divide over the whole key per gate call (~19% of device time in the
    r3 profile); host precompute makes them free.

    winv_f / wfwd_f: input-limb-folded s8 NTT weight planes
    (ops.ntt.get_folded_tables, r5). Carried in the key pytree so they
    enter jitted gate graphs as ARGUMENTS — embedding the ~24 MB tables
    as HLO constants blows the remote-compile request size at large
    batch (r5 multilaunch probe, HTTP 413).

    vi4 / vf4: 4-step block planes [G, na, nw, 128, 128] s8
    (ops.ntt.get_ntt4_tables) — the default transform path; ~4 MB."""

    key: jnp.ndarray
    key_sh: jnp.ndarray | None = None
    winv_f: jnp.ndarray | None = None
    wfwd_f: jnp.ndarray | None = None
    vi4: jnp.ndarray | None = None
    vf4: jnp.ndarray | None = None


def key_gen_acc(
    sampler: Sampler,
    params: RGSWParams,
    tables: NTTTables,
    sk_N_eval: np.ndarray,
    lwe_sk: np.ndarray,
    sk_mod: int,
) -> CGGIKey:
    """KeyGenAcc + KeyGenCGGI (rgsw-acc-cggi.cpp:40-102), vectorized.

    For each LWE coefficient i and branch t in {0,1}:
      m = (s_i == 1) if t == 0 else (s_i == -1)
      row d: (a_d, e_d + a_d * skN) + m * Gpow[(d>>1)+1] added to component
      (d & 1) at coefficient 0 before the NTT.
    """
    n = lwe_sk.shape[0]
    N, Q = params.N, params.Q
    dg2 = 2 * (params.digits_g - 1)

    gpow = np.ones(params.digits_g, dtype=np.int64)
    for i in range(1, params.digits_g):
        gpow[i] = gpow[i - 1] * params.base_g % Q

    A = sampler.uniform(Q, (n, 2, dg2, N))
    E = sampler.discrete_gaussian(params.std, (n, 2, dg2, N), q=Q)

    s = np.asarray(lwe_sk, np.int64)
    msel = np.stack([s == 1, s == sk_mod - 1], axis=1).astype(np.int64)  # [n, 2]

    # message add: m * Gpow[(d>>1)+1] to coeff 0 of component (d&1),
    # applied in COEFF format (KeyGenCGGI, rgsw-acc-cggi.cpp:80-100). The
    # skNTT product uses A *without* the gadget add (tempA is copied before
    # the add in the reference), so keep A_msg separate from A.
    d_idx = np.arange(dg2)
    gvals = gpow[(d_idx >> 1) + 1]                                   # [dg2]
    addA = np.where((d_idx & 1) == 0, gvals, 0)[None, None, :]       # -> A
    addE = np.where((d_idx & 1) == 1, gvals, 0)[None, None, :]       # -> E
    A_msg = A.copy()
    A_msg[:, :, :, 0] = (A[:, :, :, 0] + msel[:, :, None] * addA) % Q
    E[:, :, :, 0] = (E[:, :, :, 0] + msel[:, :, None] * addE) % Q

    from ..ops.ntt import host_ntt_fwd

    A_eval = host_ntt_fwd(tables, A)
    A_msg_eval = host_ntt_fwd(tables, A_msg)
    E_eval = host_ntt_fwd(tables, E)
    sk_np = np.asarray(sk_N_eval, np.int64)
    B_eval = (E_eval + A_eval * sk_np) % Q
    key = np.stack([A_msg_eval, B_eval], axis=3)
    key_sh = (key.astype(np.uint64) << np.uint64(32)) // np.uint64(Q)
    from ..ops.ntt import get_folded_tables

    winv_f, wfwd_f = get_folded_tables(tables, params.base_g)
    from ..ops.ntt import get_ntt4_tables, ntt4_supported

    vi4 = vf4 = None
    if ntt4_supported(N):
        t4 = get_ntt4_tables(tables)
        vi4 = jnp.asarray(t4["vi_planes"])
        vf4 = jnp.asarray(t4["vf_planes"])
    return CGGIKey(
        key=jnp.asarray(key, I32),
        key_sh=jnp.asarray(key_sh.astype(np.uint32)),
        winv_f=jnp.asarray(winv_f), wfwd_f=jnp.asarray(wfwd_f),
        vi4=vi4, vf4=vf4)


@partial(jax.jit, static_argnames=("params", "a_mod"))
def eval_acc(
    tables: NTTTables, params: RGSWParams, key: CGGIKey, acc, a,
    a_mod: int | None = None,
) -> jnp.ndarray:
    """Blind rotation (EvalAcc + AddToAccCGGI, rgsw-acc-cggi.cpp:60-152).

    acc: [..., 2, N] EVAL; a: [..., n] int32 mod q. Scan over the n
    (sequential) steps; batch dims ride along.
    """
    Q, N = params.Q, params.N
    q = params.q if a_mod is None else a_mod
    dg = params.digits_g - 1
    dg2 = 2 * dg
    m_by_mod = 2 * N // q

    lead = a.shape[:-1]
    n = a.shape[-1]
    acc = acc.reshape(-1, 2, N)
    a2 = a.reshape(-1, n)
    bsz = acc.shape[0]

    # index c_i = ((q - a_i) mod q) * 2N/q in [0, 2N); X^{2N} == 1 so the
    # reference's ==2N edge case folds into mod 2N
    c_pos = (((q - a2) % q).astype(I64) * m_by_mod) % (2 * N)   # [B, n]
    c_neg = (2 * N - c_pos) % (2 * N)

    from ..ops import fused
    if fused.enabled():
        out = fused.cggi_scan_fused(
            tables, params, key.key, acc,
            c_pos.astype(I32), c_neg.astype(I32), key_sh=key.key_sh,
            winv_f=key.winv_f, wfwd_f=key.wfwd_f,
            vi4=key.vi4, vf4=key.vf4)
        return out.reshape(*lead, 2, N)

    def step(acc, xs):
        ek, cp, cn = xs            # ek: [2, dg2, 2, N]; cp/cn: [B]
        ct0 = ntt_inv(tables, acc)                         # [B, 2, N] coeff
        dct = signed_digit_decompose_pair(
            ct0[:, 0, :], ct0[:, 1, :], Q, params.base_g, dg, signed=True
        )                                                   # [dg2, B, N]
        dct = ntt_fwd_digits(tables, dct, params.base_g)
        dct = jnp.moveaxis(dct, 0, 1)                       # [B, dg2, N]

        # tmp[t, c] = sum_d dct[d] * ek[t, d, c] — s64 products with one
        # amortized reduction (faster than per-product Shoup, see xzw.py)
        prod = (dct[:, None, :, None, :].astype(I64)
                * ek[None].astype(I64)).sum(axis=2)
        tmp = (prod % Q).astype(I32)                        # [B, 2, 2, N]

        # monomial multiplies stay in fused s64 form: measured in-gate,
        # XLA's fused mul+constant-mod chains beat the u64-mulhi Shoup
        # sequence (91 vs 56 gates/s on the full GINX gate)
        mon_p = monomial_minus_one_eval(tables, cp)         # [B, N]
        mon_n = monomial_minus_one_eval(tables, cn)
        upd = (
            tmp[:, 0].astype(I64) * mon_p[:, None, :].astype(I64)
            + tmp[:, 1].astype(I64) * mon_n[:, None, :].astype(I64)
        ) % Q
        acc = mod_add(acc, upd.astype(I32), Q)
        return acc, None

    xs = (key.key, c_pos.T, c_neg.T)
    acc, _ = jax.lax.scan(step, acc, xs)
    return acc.reshape(*lead, 2, N)


# ===================================================== dual-limb RNS (big Q)

def key_gen_acc_rns(
    sampler: Sampler,
    params: RGSWParams,
    rt,                       # ops.rns.RNSTables
    skN: np.ndarray,          # [N] ring secret, values in [0, Q_eff)
    lwe_sk: np.ndarray,
    sk_mod: int,
) -> CGGIKey:
    """KeyGenAcc for >28-bit moduli over the dual-limb RNS representation
    (ops/rns.py). Same construction as key_gen_acc, with Z_Q sampling done
    per limb: independent uniforms over Z_q1 x Z_q2 ARE the CRT image of a
    uniform over Z_Q, and the small Gaussian/gadget integers reduce per
    limb. Key layout: [n, 2, dg2, 2, L, N] int32 EVAL."""
    from ..ops.rns import rns_host_ntt_fwd, to_residues

    n = lwe_sk.shape[0]
    N, Q = params.N, rt.Q
    L = len(rt.limbs)
    dg2 = 2 * (params.digits_g - 1)

    gpow = [pow(params.base_g, i, Q) for i in range(params.digits_g)]

    # independent per-limb uniforms == uniform mod Q (CRT)
    A = np.stack([sampler.uniform(q, (n, 2, dg2, N))
                  for q in rt.limbs], axis=-2)            # [n,2,dg2,L,N]
    # small Gaussian ints, SAME integer reduced into each limb
    E_int = sampler.discrete_gaussian(params.std, (n, 2, dg2, N))
    E = np.stack([np.asarray(E_int, np.int64) % q
                  for q in rt.limbs], axis=-2)

    s = np.asarray(lwe_sk, np.int64)
    msel = np.stack([s == 1, s == sk_mod - 1], axis=1).astype(np.int64)

    d_idx = np.arange(dg2)
    gvals = np.asarray([gpow[(d >> 1) + 1] for d in d_idx], dtype=object)
    A_msg = A.copy()
    for li, q in enumerate(rt.limbs):
        gl = np.asarray([int(g) % q for g in gvals], np.int64)
        addA = np.where((d_idx & 1) == 0, gl, 0)[None, None, :]
        addE = np.where((d_idx & 1) == 1, gl, 0)[None, None, :]
        A_msg[:, :, :, li, 0] = (A[:, :, :, li, 0]
                                 + msel[:, :, None] * addA) % q
        E[:, :, :, li, 0] = (E[:, :, :, li, 0]
                             + msel[:, :, None] * addE) % q

    A_eval = rns_host_ntt_fwd(rt, A)
    A_msg_eval = rns_host_ntt_fwd(rt, A_msg)
    E_eval = rns_host_ntt_fwd(rt, E)
    skN_res = to_residues(skN, rt.limbs)                  # [L, N]
    sk_eval = rns_host_ntt_fwd(rt, skN_res).astype(np.int64)
    B_eval = np.empty_like(A_eval, dtype=np.int64)
    for li, q in enumerate(rt.limbs):
        B_eval[..., li, :] = (
            E_eval[..., li, :].astype(np.int64)
            + A_eval[..., li, :].astype(np.int64) * sk_eval[li]) % q
    key = np.stack([A_msg_eval.astype(np.int64), B_eval], axis=3)
    # per-limb Shoup companions (the u32 step consumes them; r5)
    key_sh = np.empty(key.shape, np.uint32)
    for li, q in enumerate(rt.limbs):
        key_sh[..., li, :] = (
            (key[..., li, :].astype(np.uint64) << np.uint64(32))
            // np.uint64(q)).astype(np.uint32)
    return CGGIKey(key=jnp.asarray(key, I32), key_sh=jnp.asarray(key_sh))


def eval_acc_rns(rt, params: RGSWParams, key: CGGIKey, acc, a,
                 a_mod: int | None = None) -> jnp.ndarray:
    """Blind rotation over the RNS pair: acc [..., 2, L, N] EVAL,
    a [..., n] mod q. Per-limb NTT/monomial/contraction (ops/rns.py).

    r5: the step body is ALL-u32 — per-limb Shoup contraction against
    keygen-time companions, mulmod_u32 monomial multiplies, and the
    (hi, lo)-pair Garner digit chain (rns_signed_digits_u32). The r4
    form ran every product through emulated s64 lanes (~30x per op on
    the TPU VPU) and measured 40 gates/s at STD128Q_4; see
    tools/rns_probe.json for the before/after."""
    from ..ops.modmath import (
        U32, barrett_reduce_u32, mulmod_u32, shoup_mul_lazy_u32)
    from ..ops.poly import monomial_minus_one_eval
    from ..ops.rns import (
        rns_digits_to_eval, rns_ntt_inv, rns_signed_digits_u32)

    N = params.N
    L = len(rt.limbs)
    q = params.q if a_mod is None else a_mod
    dg = params.digits_g - 1
    dg2 = 2 * dg
    m_by_mod = 2 * N // q

    lead = a.shape[:-1]
    n = a.shape[-1]
    acc = acc.reshape(-1, 2, L, N)
    a2 = a.reshape(-1, n)

    c_pos = (((q - a2) % q).astype(I64) * m_by_mod) % (2 * N)
    c_neg = (2 * N - c_pos) % (2 * N)

    ek_sh_all = key.key_sh
    if ek_sh_all is None:      # raw test keys: one-off in-graph fallback
        parts = []
        for li, ql in enumerate(rt.limbs):
            parts.append(((key.key[..., li, :].astype(jnp.uint64)
                           << jnp.uint64(32)) // jnp.uint64(ql))
                         .astype(jnp.uint32))
        ek_sh_all = jnp.stack(parts, axis=-2)

    def step(acc, xs):
        ek, eksh, cp, cn = xs     # ek/eksh: [2, dg2, 2, L, N]
        ct0 = rns_ntt_inv(rt, acc)                       # [B, 2, L, N]
        d0 = rns_signed_digits_u32(rt, ct0[:, 0], params.base_g, dg)
        d1 = rns_signed_digits_u32(rt, ct0[:, 1], params.base_g, dg)
        dig = jnp.stack([d0, d1], axis=1).reshape(
            (dg2,) + d0.shape[1:])                       # [dg2, B, N]
        dct = rns_digits_to_eval(rt, dig)                # [dg2, B, L, N]

        new_limbs = []
        for li, ql in enumerate(rt.limbs):
            dct_l = dct[..., li, :].astype(U32)          # [dg2, B, N]
            mon_p = monomial_minus_one_eval(
                rt.tables[li], cp).astype(U32)           # [B, N]
            mon_n = monomial_minus_one_eval(rt.tables[li], cn).astype(U32)
            comps = []
            for c in range(2):
                sums = []
                for t in range(2):
                    s = None
                    for d2 in range(dg2):
                        term = shoup_mul_lazy_u32(
                            dct_l[d2],
                            ek[t, d2, c, li][None].astype(U32),
                            eksh[t, d2, c, li][None], ql)
                        s = term if s is None else s + term  # < 2*dg2*ql
                    sums.append(barrett_reduce_u32(s, ql))
                a0 = mulmod_u32(sums[0], mon_p, ql)      # [0, ql)
                a1 = mulmod_u32(sums[1], mon_n, ql)
                s = acc[:, c, li, :].astype(U32) + a0 + a1   # < 3*ql
                comps.append(barrett_reduce_u32(s, ql).astype(I32))
            new_limbs.append(jnp.stack(comps, axis=1))   # [B, 2, N]
        return jnp.stack(new_limbs, axis=2), None        # [B, 2, L, N]

    xs = (key.key, ek_sh_all, c_pos.T.astype(I32), c_neg.T.astype(I32))
    acc, _ = jax.lax.scan(step, acc, xs)
    return acc.reshape(*lead, 2, L, N)
