"""Gate-bootstrapping orchestration (reference: binfhe-base-scheme.cpp).

Functional BinFHEScheme: test-vector construction, accumulator dispatch,
extraction, and the ModSwitch -> KeySwitch -> ModSwitch tail, all batched
over a leading ciphertext axis and jit-compiled end to end.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .acc import cggi
from .constants import BINGATE, BINFHE_METHOD, KEYGEN_MODE
from .ops.modmath import I32, I64, mod_add, mod_sub
from .ops.ntt import NTTTables, ntt_fwd, ntt_inv
from .ops.poly import transpose_eval
from .params import BinFHEParams
from .rng import Sampler
from .schemes import lwe


class RingGSWBTKey(NamedTuple):
    """RingGSWBTKey (binfhe-base-scheme.h:44-56): blind-rotation key +
    LWE switching key."""

    bs: NamedTuple
    ks: lwe.LWESwitchingKey


# ------------------------------------------------------------------- keygen

def bt_key_gen(
    sampler: Sampler,
    params: BinFHEParams,
    tables: NTTTables,
    lwe_sk: np.ndarray,
    keygen_mode: KEYGEN_MODE = KEYGEN_MODE.SYM_ENCRYPT,
) -> RingGSWBTKey:
    """BinFHEScheme::KeyGen (binfhe-base-scheme.cpp:44-74)."""
    lp = params.lwe
    skN = lwe.key_gen_N(sampler, lp)
    ks = lwe.key_switch_gen(sampler, lp, lwe_sk, skN)
    skN_eval = np.asarray(ntt_fwd(tables, jnp.asarray(skN, I32)))
    if params.method == BINFHE_METHOD.GINX:
        bs = cggi.key_gen_acc(
            sampler, params.rgsw, tables, skN_eval, lwe_sk, lp.q_ks)
    else:
        raise NotImplementedError(params.method)
    return RingGSWBTKey(bs=bs, ks=ks)


# ------------------------------------------------------- test-vector build

def _gate_range(params: BinFHEParams, gate: BINGATE) -> tuple[int, int]:
    from .constants import gate_constants

    q = params.lwe.q
    q1 = gate_constants(q)[int(gate)]
    q2 = (q1 + (q >> 1)) % q
    return q1, q2


def make_gate_test_vector(params: BinFHEParams, gate: BINGATE, b) -> jnp.ndarray:
    """m poly for BootstrapGateCore (binfhe-base-scheme.cpp:1204-1230).

    b: [...] int32 mod q -> m: [..., N] int32 mod Q (COEFF format).
    """
    lp = params.lwe
    q, Q, N, p = lp.q, lp.Q, lp.N, 4
    q_half = q >> 1
    factor = 2 * N // q
    q1, q2 = _gate_range(params, gate)
    Q2p = Q // (2 * p) + 1
    Q2pNeg = Q - Q2p

    j = jnp.arange(q_half, dtype=I64)
    temp = (b[..., None].astype(I64) - j) % q
    if q1 < q2:
        vals = jnp.where((temp >= q1) & (temp < q2), Q2pNeg, Q2p)
    else:
        vals = jnp.where((temp >= q2) & (temp < q1), Q2p, Q2pNeg)

    m = jnp.zeros(b.shape + (N,), I32)
    pos = np.arange(q_half) * factor
    return m.at[..., pos].set(vals.astype(I32))


def make_func_test_vector(params: BinFHEParams, b, lut_vals) -> jnp.ndarray:
    """m poly for BootstrapFuncCore (binfhe-base-scheme.cpp:1265-1281):
    m[j*factor] = (Q/fmod) * f((b - j) mod ctMod). `lut_vals` is the
    precomputed (Q/fmod)*f(t) table of length ctMod (device int32)."""
    lp = params.lwe
    q, N = lp.q, lp.N
    factor = 2 * N // q
    j = jnp.arange(q >> 1, dtype=I64)
    temp = ((b[..., None].astype(I64) - j) % q).astype(jnp.int32)
    vals = lut_vals[temp]
    m = jnp.zeros(b.shape + (N,), I32)
    pos = np.arange(q >> 1) * factor
    return m.at[..., pos].set(vals.astype(I32))


# ------------------------------------------------------------- core + tail

def _eval_acc(tables, params: BinFHEParams, bs, acc, a):
    if params.method == BINFHE_METHOD.GINX:
        return cggi.eval_acc(tables, params.rgsw, bs, acc, a)
    raise NotImplementedError(params.method)


def bootstrap_gate_core(tables, params: BinFHEParams, bs, m_coeff, a):
    """acc = [0, NTT(m)]; blind-rotate by a (BootstrapGateCore,
    binfhe-base-scheme.cpp:1191-1246)."""
    m_eval = ntt_fwd(tables, m_coeff)
    acc = jnp.stack([jnp.zeros_like(m_eval), m_eval], axis=-2)
    return _eval_acc(tables, params, bs, acc, a)


def extract_and_switch(
    tables, params: BinFHEParams, ks: lwe.LWESwitchingKey, acc, b_add: int,
    out_mod: int | None = None,
) -> lwe.LWECiphertext:
    """Transpose-extract + ModSwitch/KeySwitch/ModSwitch tail
    (binfhe-base-scheme.cpp:609-628)."""
    lp = params.lwe
    a_coeff = ntt_inv(tables, transpose_eval(tables, acc[..., 0, :]))
    b_coeff = ntt_inv(tables, acc[..., 1, :])
    b = mod_add(b_coeff[..., 0], jnp.asarray(b_add % lp.Q, I32), lp.Q)
    ct_ext = lwe.LWECiphertext(a_coeff, b)
    ct_ms = lwe.mod_switch(ct_ext, lp.q_ks, lp.Q)
    ct_ks = lwe.key_switch(ct_ms, ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n)
    return lwe.mod_switch(ct_ks, out_mod or lp.q, lp.q_ks)


# ------------------------------------------------------------------- gates

@partial(jax.jit, static_argnames=("params", "gate"))
def _gate_jit(tables, params, gate, ek, a1, b1, a2, b2):
    lp = params.lwe
    ct1 = lwe.LWECiphertext(a1, b1)
    ct2 = lwe.LWECiphertext(a2, b2)
    if gate in (BINGATE.XOR_FAST, BINGATE.XNOR_FAST):
        prep = lwe.eval_sub(ct1, ct2, lp.q)
        prep = lwe.eval_add(prep, prep, lp.q)
    else:
        prep = lwe.eval_add(ct1, ct2, lp.q)
    m = make_gate_test_vector(params, gate, prep.b)
    acc = bootstrap_gate_core(tables, params, ek.bs, m, prep.a)
    return extract_and_switch(tables, params, ek.ks, acc, (lp.Q >> 3) + 1)


def eval_bin_gate(
    tables: NTTTables,
    params: BinFHEParams,
    gate: BINGATE,
    ek: RingGSWBTKey,
    ct1: lwe.LWECiphertext,
    ct2: lwe.LWECiphertext,
) -> lwe.LWECiphertext:
    """EvalBinGate (binfhe-base-scheme.cpp:577-629); batched over leading
    dims of the ciphertexts."""
    if gate in (BINGATE.XOR, BINGATE.XNOR):
        ct_and1 = eval_bin_gate(
            tables, params, BINGATE.AND, ek, ct1, eval_not(params, ct2))
        ct_and2 = eval_bin_gate(
            tables, params, BINGATE.AND, ek, eval_not(params, ct1), ct2)
        ct_or = eval_bin_gate(tables, params, BINGATE.OR, ek, ct_and1, ct_and2)
        return ct_or if gate == BINGATE.XOR else eval_not(params, ct_or)
    return _gate_jit(tables, params, gate, ek, ct1.a, ct1.b, ct2.a, ct2.b)


@partial(jax.jit, static_argnames=("params", "gate", "num_ct", "p"))
def _multi_gate_jit(tables, params, gate, ek, a, b, num_ct, p):
    """3/4-input gates (binfhe-base-scheme.cpp:636-678). a: [num_ct, ..., n]."""
    lp = params.lwe
    prep = lwe.LWECiphertext(a[0], b[0])
    for i in range(1, num_ct):
        prep = lwe.eval_add(prep, lwe.LWECiphertext(a[i], b[i]), lp.q)
    m = make_gate_test_vector(params, gate, prep.b)
    acc = bootstrap_gate_core(tables, params, ek.bs, m, prep.a)
    return extract_and_switch(
        tables, params, ek.ks, acc, lp.Q // (2 * p) + 1)


def eval_bin_gate_multi(
    tables, params, gate: BINGATE, ek, cts: list, p: int = 4
) -> lwe.LWECiphertext:
    if gate == BINGATE.CMUX:
        c_not = eval_not(params, cts[2])
        n1 = eval_bin_gate(tables, params, BINGATE.NAND, ek, cts[0], c_not)
        n2 = eval_bin_gate(tables, params, BINGATE.NAND, ek, cts[1], cts[2])
        return eval_bin_gate(tables, params, BINGATE.NAND, ek, n1, n2)
    a = jnp.stack([ct.a for ct in cts])
    b = jnp.stack([ct.b for ct in cts])
    return _multi_gate_jit(tables, params, gate, ek, a, b, len(cts), p)


@partial(jax.jit, static_argnames=("params", "p"))
def _bootstrap_jit(tables, params, ek, a, b, p):
    lp = params.lwe
    prep = lwe.eval_add_const(lwe.LWECiphertext(a, b), lp.q >> 2, lp.q)
    m = make_gate_test_vector(params, BINGATE.AND, prep.b)
    acc = bootstrap_gate_core(tables, params, ek.bs, m, prep.a)
    return extract_and_switch(
        tables, params, ek.ks, acc, lp.Q // (2 * p) + 1)


def bootstrap(tables, params, ek, ct: lwe.LWECiphertext, p: int = 4):
    """Refreshing bootstrap (binfhe-base-scheme.cpp:697-726)."""
    return _bootstrap_jit(tables, params, ek, ct.a, ct.b, p)


def eval_not(params: BinFHEParams, ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
    return lwe.eval_not(ct, params.lwe.q)
