"""Extended single-key ops: arbitrary-LUT functional bootstrap, flooring,
large-precision sign, and digit decomposition
(reference: binfhe-base-scheme.cpp:740-1000, ia.cr/2021/1337).

All ops are batched over leading ciphertext dims. Moduli walk through
python ints, so each (static) modulus stage jit-compiles once.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import boot
from .constants import BINGATE
from .ops.modmath import I32, I64, mod_add
from .ops.ntt import ntt_fwd, ntt_inv
from .ops.poly import transpose_eval
from .params import BinFHEParams
from .schemes import lwe


def check_input_function(lut: list[int], mod: int) -> int:
    """0 = negacyclic, 1 = periodic, 2 = arbitrary
    (checkInputFunction, binfhe-base-scheme.h:116-131)."""
    mid = len(lut) // 2
    if lut[0] == (mod - lut[mid]) % mod:
        if all(lut[i] == (mod - lut[mid + i]) % mod for i in range(1, mid)):
            return 0
        return 2
    if lut[0] == lut[mid]:
        if all(lut[i] == lut[mid + i] for i in range(1, mid)):
            return 1
        return 2
    return 2


def _reinterpret_mod(ct: lwe.LWECiphertext, q_new: int) -> lwe.LWECiphertext:
    """LWECiphertextImpl::SetModulus: reduce components mod the new modulus
    (lwe-ciphertext.h:121-125)."""
    return lwe.LWECiphertext(
        (ct.a.astype(I64) % q_new).astype(I32),
        (ct.b.astype(I64) % q_new).astype(I32))


def bootstrap_func(tables, params, ek, ct, f, fmod: int, ct_mod: int):
    """BootstrapFunc (binfhe-base-scheme.cpp:1252-1312). f: python callable
    (x, ct_mod, fmod) -> int, tabulated host-side into a (Q/fmod)*f table."""
    Q = params.lwe.Q
    lut = [Q // fmod * (f(x, ct_mod, fmod) % fmod) % Q for x in range(ct_mod)]
    if params.rgsw.limbs:
        return _bootstrap_func_rns(tables, params, ek, ct, lut, ct_mod, fmod)
    return _bootstrap_func_mod(
        tables, params, ek, ct,
        jnp.asarray(np.asarray(lut, np.int64), I32), ct_mod, fmod)


def _bootstrap_func_rns(rt, params, ek, ct, lut, ct_mod: int, out_mod: int):
    """Functional bootstrap over the dual-limb RNS ring (>28-bit Q /
    logQprime=54 profile). Same structure as the RNS gate: jitted per-limb
    rotation + extraction, exact host Garner + Q_eff->qKS rounding, then
    the (possibly s64-wide) keyswitch tail."""
    from .ops.rns import (
        host_garner_centered, host_round_switch)

    lp = params.lwe
    lut_res = np.stack(
        [np.asarray([v % ql for v in lut], np.int64) for ql in rt.limbs],
        axis=-1)                                          # [ct_mod, L]
    a_res, b_res = _bootstrap_func_rotate_rns(
        rt, params, ek.bs, ct.a, ct.b, jnp.asarray(lut_res, I32), ct_mod)

    a_c = host_garner_centered(
        rt.Q, rt.limbs, rt.inv_q1_mod_q2, np.asarray(a_res))
    b_c = host_garner_centered(
        rt.Q, rt.limbs, rt.inv_q1_mod_q2,
        np.asarray(b_res)[..., None])[..., 0]
    a_ks = host_round_switch(rt.Q, a_c, lp.q_ks)
    b_ks = host_round_switch(rt.Q, b_c, lp.q_ks)

    dtype = I32 if lp.q_ks < (1 << 31) else I64
    ct_ms = lwe.LWECiphertext(
        jnp.asarray(a_ks, dtype), jnp.asarray(b_ks, dtype))
    ct_ks = lwe.key_switch(
        ct_ms, ek.ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n)
    return lwe.mod_switch(ct_ks, out_mod, lp.q_ks)


@partial(jax.jit, static_argnames=("params", "ct_mod"))
def _bootstrap_func_rotate_rns(rt, params, bs_key, a, b, lut_res, ct_mod):
    from .acc import cggi
    from .ops.poly import transpose_eval as _transpose
    from .ops.rns import rns_ntt_fwd, rns_ntt_inv

    lp = params.lwe
    N = lp.N
    L = len(rt.limbs)
    factor = 2 * N // ct_mod

    j = jnp.arange(ct_mod >> 1, dtype=I64)
    temp = ((b[..., None].astype(I64) - j) % ct_mod).astype(jnp.int32)
    vals = lut_res[temp]                                  # [..., m/2, L]
    m = jnp.zeros(b.shape + (L, N), I32)
    pos = np.arange(ct_mod >> 1) * factor
    m = m.at[..., pos].set(jnp.moveaxis(vals, -1, -2).astype(I32))

    m_eval = rns_ntt_fwd(rt, m)
    acc = jnp.stack([jnp.zeros_like(m_eval), m_eval], axis=-3)
    acc = boot._eval_acc_rns(rt, params, bs_key, acc, a, ct_mod)

    a_t = jnp.stack(
        [_transpose(rt.tables[i], acc[..., 0, i, :]) for i in range(L)],
        axis=-2)
    a_coeff = rns_ntt_inv(rt, a_t)
    b_coeff = rns_ntt_inv(rt, acc[..., 1, :, :])[..., 0]
    return a_coeff, b_coeff


@partial(jax.jit, static_argnames=("params", "ct_mod", "out_mod"))
def _bootstrap_func_mod(tables, params, ek, ct, lut_vals, ct_mod, out_mod):
    lp = params.lwe
    N, Q = lp.N, lp.Q
    factor = 2 * N // ct_mod

    b = ct.b
    j = jnp.arange(ct_mod >> 1, dtype=I64)
    temp = ((b[..., None].astype(I64) - j) % ct_mod).astype(jnp.int32)
    vals = lut_vals[temp]
    m = jnp.zeros(b.shape + (N,), I32)
    pos = np.arange(ct_mod >> 1) * factor
    m = m.at[..., pos].set(vals.astype(I32))

    m_eval = ntt_fwd(tables, m)
    acc = jnp.stack([jnp.zeros_like(m_eval), m_eval], axis=-2)
    acc = boot._eval_acc(tables, params, ek.bs, acc, ct.a, ct_mod)

    a_coeff = ntt_inv(tables, transpose_eval(tables, acc[..., 0, :]))
    b_coeff = ntt_inv(tables, acc[..., 1, :])
    ct_ext = lwe.LWECiphertext(a_coeff, b_coeff[..., 0])
    ct_ms = lwe.mod_switch(ct_ext, lp.q_ks, Q)
    ct_ks = lwe.key_switch(ct_ms, ek.ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n)
    return lwe.mod_switch(ct_ks, out_mod, lp.q_ks)


def eval_func(tables, params, ek, ct, lut: list[int], beta: int,
              ct_mod: int | None = None):
    """EvalFunc (binfhe-base-scheme.cpp:742-826)."""
    lp = params.lwe
    q = lp.q if ct_mod is None else ct_mod
    prop = check_input_function(lut, q)
    lut = [int(v) for v in lut]

    if prop == 0:  # negacyclic: one bootstrap
        ct1 = lwe.eval_add_const(ct, beta, q)
        f = lambda x, qq, QQ: lut[x]
        return bootstrap_func(tables, params, ek, ct1, f, q, q)

    if prop == 2:  # arbitrary: boost modulus q -> 2q
        if q > lp.N:
            raise ValueError("q must be <= N for arbitrary functions")
        lut2 = lut + lut
        dq = q << 1
        ct1 = ct  # values unchanged; modulus reinterpreted upward
        ct2 = lwe.eval_add_const(ct1, beta, dq)
        f0 = lambda x, qq, QQ: (QQ - (qq >> 2)) if x < (qq >> 1) else (qq >> 2)
        ct3 = bootstrap_func(tables, params, ek, ct2, f0, dq, dq)
        ct3 = lwe.eval_sub(ct1, ct3, dq)
        ct3 = lwe.eval_add_const(ct3, beta, dq)
        ct3 = lwe.eval_sub_const(ct3, q >> 1, dq)
        f1 = lambda x, qq, QQ: lut2[x] if x < (qq >> 1) \
            else (QQ - lut2[x - qq // 2]) % QQ
        ct4 = bootstrap_func(tables, params, ek, ct3, f1, dq, dq)
        return _reinterpret_mod(ct4, q)

    # periodic
    ct1 = lwe.eval_add_const(ct, beta, q)
    f0 = lambda x, qq, QQ: (QQ - (qq >> 2)) if x < (qq >> 1) else (qq >> 2)
    ct2 = bootstrap_func(tables, params, ek, ct1, f0, q, q)
    ct2 = lwe.eval_sub(ct, ct2, q)
    ct2 = lwe.eval_add_const(ct2, beta, q)
    ct2 = lwe.eval_sub_const(ct2, q >> 2, q)
    f1 = lambda x, qq, QQ: lut[x] if x < (qq >> 1) \
        else (QQ - lut[x - qq // 2]) % QQ
    return bootstrap_func(tables, params, ek, ct2, f1, q, q)


def eval_floor(tables, params, ek, ct, beta: int, ct_mod: int,
               roundbits: int = 0):
    """EvalFloor (binfhe-base-scheme.cpp:829-866). ct_mod is the current
    (large) modulus of ct; returns ct at the same modulus with the low
    log2(q) bits floored away."""
    lp = params.lwe
    q = lp.q if roundbits == 0 else beta * (1 << (roundbits + 1))
    mod = ct_mod

    ct1 = lwe.eval_add_const(ct, beta, mod)
    ct1_modq = _reinterpret_mod(ct1, q)
    f1 = lambda x, qq, QQ: (QQ - (qq >> 2)) if x < (qq >> 1) else (qq >> 2)
    ct2 = bootstrap_func(
        tables, params, ek, ct1_modq, f1, fmod=mod, ct_mod=q)
    ct1 = lwe.eval_sub(ct1, ct2, mod)

    ct2_modq = _reinterpret_mod(ct1, q)
    def f2(x, qq, QQ):
        if x < (qq >> 2):
            return QQ - (qq >> 1) - x
        if x < 3 * (qq >> 2):
            return x
        return QQ + (qq >> 1) - x
    ct3 = bootstrap_func(
        tables, params, ek, ct2_modq, f2, fmod=mod, ct_mod=q)
    return lwe.eval_sub(ct1, ct3, mod)


def eval_sign(tables, params, ek, ct, beta: int, ct_mod: int):
    """EvalSign (binfhe-base-scheme.cpp:869-939), static-base variant."""
    lp = params.lwe
    q = lp.q
    mod = ct_mod
    if mod <= q:
        raise ValueError("EvalSign is only for large precision")
    cttmp = ct
    while mod > q:
        cttmp = eval_floor(tables, params, ek, cttmp, beta, mod)
        new_mod = (mod * 2 * beta) // q
        cttmp = lwe.mod_switch(cttmp, new_mod, mod)
        mod = new_mod
    cttmp = lwe.eval_add_const(cttmp, beta, mod)
    f3 = lambda x, qq, QQ: (QQ // 4) if x < qq // 2 else (QQ - QQ // 4)
    cttmp = bootstrap_func(
        tables, params, ek, cttmp, f3, fmod=q, ct_mod=mod)
    return lwe.eval_sub_const(cttmp, q >> 2, q)


def eval_decomp(tables, params, ek, ct, beta: int, ct_mod: int):
    """EvalDecomp (binfhe-base-scheme.cpp:942-999): returns the list of
    mod-q digit ciphertexts, least significant first, with the final
    (smaller-modulus) remainder last."""
    lp = params.lwe
    q = lp.q
    mod = ct_mod
    if mod <= q:
        raise ValueError("EvalDecomp is only for large precision")
    cttmp = ct
    out = []
    while mod > q:
        out.append(_reinterpret_mod(cttmp, q))
        cttmp = eval_floor(tables, params, ek, cttmp, beta, mod)
        new_mod = (mod // q) * 2 * beta
        cttmp = lwe.mod_switch(cttmp, new_mod, mod)
        mod = new_mod
    out.append(cttmp)
    return out


def eval_sign_dynamic(tables, params, ek_map, ct, beta: int, ct_mod: int):
    """EvalSign with the dynamic gadget-base schedule
    (binfhe-base-scheme.cpp:869-939 + Change_BaseG): as the working modulus
    shrinks, switch to a larger baseG key (fewer digits per bootstrap)."""
    import dataclasses

    lp = params.lwe
    q = lp.q
    mod = ct_mod
    if mod <= q:
        raise ValueError("EvalSign is only for large precision")

    def params_for(base):
        return dataclasses.replace(
            params, rgsw=dataclasses.replace(params.rgsw, base_g=base))

    cur_base = params.rgsw.base_g
    cttmp = ct
    while mod > q:
        cttmp = eval_floor(
            tables, params_for(cur_base), ek_map[cur_base], cttmp, beta, mod)
        new_mod = (mod * 2 * beta) // q
        cttmp = lwe.mod_switch(cttmp, new_mod, mod)
        mod = new_mod
        if len(ek_map) >= 3:
            bin_log = max(mod.bit_length() - 1, 1)
            base = 0
            if bin_log <= 17:
                base = 1 << 27
            elif bin_log <= 26:
                base = 1 << 18
            if base and base in ek_map:
                cur_base = base
    cttmp = lwe.eval_add_const(cttmp, beta, mod)
    f3 = lambda x, qq, QQ: (QQ // 4) if x < qq // 2 else (QQ - QQ // 4)
    cttmp = bootstrap_func(
        tables, params_for(cur_base), ek_map[cur_base], cttmp, f3,
        fmod=q, ct_mod=mod)
    return lwe.eval_sub_const(cttmp, q >> 2, q)
