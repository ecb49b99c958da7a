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

from .acc import cggi, dm, lmkcdey, xzddf, xzw
from .constants import BINGATE, BINFHE_METHOD, KEYGEN_MODE
from .keygen import sample_invertible_ring_secret
from .ops.modmath import I32, I64, mod_add, mod_sub
from .ops.ntt import NTTTables, ntt_fwd, ntt_inv
from .ops.poly import transpose_eval
from .params import BinFHEParams
from .rng import Sampler
from .schemes import lwe, mklwe, mntru


class RingGSWBTKey(NamedTuple):
    """RingGSWBTKey (binfhe-base-scheme.h:44-56): blind-rotation key +
    LWE switching key (+ public key under PUB_ENCRYPT keygen)."""

    bs: NamedTuple
    ks: lwe.LWESwitchingKey
    pk: lwe.LWEPublicKey | None = None


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
    from .ops.ntt import host_ntt_fwd

    skN = lwe.key_gen_N(sampler, lp)
    pk = None
    if keygen_mode == KEYGEN_MODE.PUB_ENCRYPT:
        pk = lwe.pub_key_gen(sampler, lp, skN)
    ks = lwe.key_switch_gen(sampler, lp, lwe_sk, skN)
    skN_eval = host_ntt_fwd(tables, skN)
    if params.method == BINFHE_METHOD.GINX:
        bs = cggi.key_gen_acc(
            sampler, params.rgsw, tables, skN_eval, lwe_sk, lp.q_ks)
    elif params.method == BINFHE_METHOD.AP:
        bs = dm.key_gen_acc(
            sampler, params.rgsw, tables, skN_eval, lwe_sk, lp.q_ks)
    elif params.method == BINFHE_METHOD.LMKCDEY:
        bs = lmkcdey.key_gen_acc(
            sampler, params.rgsw, tables, skN_eval, lwe_sk, lp.q_ks)
    else:
        raise NotImplementedError(params.method)
    return RingGSWBTKey(bs=bs, ks=ks, pk=pk)


# ------------------------------------------------------- test-vector build

def _gate_range(params: BinFHEParams, gate: BINGATE) -> tuple[int, int]:
    from .constants import gate_constants

    q = params.lwe.q
    q1 = gate_constants(q)[int(gate)]
    q2 = (q1 + (q >> 1)) % q
    return q1, q2


def make_gate_test_vector(params: BinFHEParams, gate: BINGATE, b,
                          p: int = 4) -> jnp.ndarray:
    """m poly for BootstrapGateCore (binfhe-base-scheme.cpp:1204-1230).

    b: [...] int32 mod q -> m: [..., N] int32 mod Q (COEFF format).
    p: the inputs' plaintext modulus — the amplitude is Q/(2p)+1
    (binfhe-base-scheme.cpp:1214, p read off the ciphertext; 6/8 for the
    3/4-input gates).
    """
    lp = params.lwe
    q, Q, N = lp.q, lp.Q, lp.N
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

    return _sparse_embed(vals.astype(I32), q_half, factor, N)


def _sparse_embed(vals, q_half: int, factor: int, N: int):
    """Place vals[..., j] at coefficient j*factor of an [..., N] poly —
    the Z_Q[x]/(X^{q/2}+1) -> Z_Q[x]/(X^N+1) sparse embedding
    (binfhe-base-scheme.cpp:1221-1230) as a zero-interleave reshape
    (contiguous stores) instead of a strided scatter."""
    if factor == 1:
        return vals
    z = jnp.zeros(vals.shape + (factor - 1,), vals.dtype)
    return jnp.concatenate([vals[..., None], z], axis=-1).reshape(
        *vals.shape[:-1], N)


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
    return _sparse_embed(vals.astype(I32), q >> 1, factor, N)


# ------------------------------------------------------------- core + tail

def _eval_acc(tables, params: BinFHEParams, bs, acc, a, a_mod=None):
    if params.method == BINFHE_METHOD.GINX:
        return cggi.eval_acc(tables, params.rgsw, bs, acc, a, a_mod)
    if params.method == BINFHE_METHOD.AP:
        return dm.eval_acc(tables, params.rgsw, bs, acc, a, a_mod)
    if params.method == BINFHE_METHOD.LMKCDEY:
        return lmkcdey.eval_acc(tables, params.rgsw, bs, acc, a)
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
    m = make_gate_test_vector(params, gate, prep.b, p)
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
    # p flows into BOTH the test-vector amplitude and the output offset
    # (the reference reads p off the ciphertext for both,
    # binfhe-base-scheme.cpp:699/1205)
    m = make_gate_test_vector(params, BINGATE.AND, prep.b, p)
    acc = bootstrap_gate_core(tables, params, ek.bs, m, prep.a)
    return extract_and_switch(
        tables, params, ek.ks, acc, lp.Q // (2 * p) + 1)


def bootstrap(tables, params, ek, ct: lwe.LWECiphertext, p: int = 4):
    """Refreshing bootstrap (binfhe-base-scheme.cpp:697-726)."""
    return _bootstrap_jit(tables, params, ek, ct.a, ct.b, p)


def eval_not(params: BinFHEParams, ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
    return lwe.eval_not(ct, params.lwe.q)


# ===================================================================== MK ==

class UniEncBTKey(NamedTuple):
    """UniEncBTKey (binfhe-base-scheme.h:65-83): UniEnc accumulator key
    (with Pkey folded in), the MNTRU/MKLWE switching key, and the ring
    secrets f (EVAL) kept for diagnostics/serialization."""

    bs: xzw.UniEncKey
    ks: NamedTuple                # MNTRUSwitchingKey or MKLWESwitchingKey
    f_eval: jnp.ndarray           # [k, N]
    f_coeff: jnp.ndarray          # [k, N]


def make_crs(sampler: Sampler, params: BinFHEParams, tables) -> np.ndarray:
    """CRS: digitsG-1 Gaussian (sigma_e) polys in EVAL
    (mk-cryptoparameters.h:173-178)."""
    up = params.unienc
    dg = up.digits_g - 1
    from .ops.ntt import host_ntt_fwd

    coeff = sampler.discrete_gaussian(up.sigma_e, (dg, up.N), q=up.Q)
    return host_ntt_fwd(tables, coeff)


def _mk_ring_secrets(sampler, params: BinFHEParams, tables, gaussian: bool):
    """k invertible ring secrets f_u with NTT-domain Fermat inversion
    (replaces Get_invertible_NativeVector's NTL InvMod,
    binfhe-base-scheme.cpp:105-195)."""
    from .constants import SecretKeyDist

    k = params.unienc.k
    dist = SecretKeyDist.GAUSSIAN if gaussian else SecretKeyDist.UNIFORM_TERNARY
    fs, finvs, fevals, finv_evals = [], [], [], []
    for _ in range(k):
        f, f_inv, f_eval, inv_eval = sample_invertible_ring_secret(
            sampler, tables, dist, std=0.5)
        fs.append(f)
        fevals.append(f_eval)
        finv_evals.append(inv_eval)
    return np.stack(fs), np.stack(fevals), np.stack(finv_evals)


def _mk_pkey(sampler, params: BinFHEParams, tables, crs_eval, f_evals):
    """Pkey[u][i] = e - CRS_i * f_u (binfhe-base-scheme.cpp:250-269)."""
    up = params.unienc
    dg = up.digits_g - 1
    from .ops.ntt import host_ntt_fwd

    e = sampler.discrete_gaussian(up.sigma_e, (up.k, dg, up.N), q=up.Q)
    e_eval = host_ntt_fwd(tables, e)
    pk = (e_eval - crs_eval[None] * f_evals[:, None, :]) % up.Q
    return pk


def mk_bt_key_gen_mntru(
    sampler: Sampler,
    params: BinFHEParams,
    tables,
    sk: mntru.MNTRUPrivateKey,
    crs_eval: np.ndarray,
) -> UniEncBTKey:
    """MKKeyGen for MNTRU (binfhe-base-scheme.cpp:198-276). Ring secrets
    are GAUSSIAN(0.5) regardless of the LWE-layer key dist (:218)."""
    f_coeff, f_evals, finv_evals = _mk_ring_secrets(
        sampler, params, tables, gaussian=True)
    ks = mntru.key_switch_gen2(sampler, params.mntru, sk, f_coeff)
    pkey = _mk_pkey(sampler, params, tables, crs_eval, f_evals)
    binary = params.method == BINFHE_METHOD.MKNTRU_B
    bs = xzw.key_gen_acc(
        sampler, params.unienc, tables, finv_evals,
        sk.F_col0, params.mntru.q_ks, crs_eval, pkey, binary=binary)
    return UniEncBTKey(
        bs=bs, ks=ks,
        f_eval=jnp.asarray(f_evals, I32),
        f_coeff=jnp.asarray(f_coeff, I32))


def mk_bt_key_gen_mklwe(
    sampler: Sampler,
    params: BinFHEParams,
    tables,
    sk: np.ndarray,
    crs_eval: np.ndarray,
) -> UniEncBTKey:
    """MKKeyGen for MKLWE (binfhe-base-scheme.cpp:279-338). Ring secrets
    are UNIFORM_TERNARY (:298); accumulator is XZW_B."""
    f_coeff, f_evals, finv_evals = _mk_ring_secrets(
        sampler, params, tables, gaussian=False)
    if params.mklwe.ks_compact:
        # r5 production path for k >= 8: j-linear signed-digit key
        # (Bks/dc-fold smaller than the reference's expanded table —
        # unblocks k=16, mklwe.MKLWECompactSwitchingKey docstring)
        ks = mklwe.key_switch_gen_compact(sampler, params.mklwe, sk, f_coeff)
    else:
        ks = mklwe.key_switch_gen(sampler, params.mklwe, sk, f_coeff)
    pkey = _mk_pkey(sampler, params, tables, crs_eval, f_evals)
    bs = xzw.key_gen_acc(
        sampler, params.unienc, tables, finv_evals,
        sk, params.mklwe.q_ks, crs_eval, pkey, binary=True)
    return UniEncBTKey(
        bs=bs, ks=ks,
        f_eval=jnp.asarray(f_evals, I32),
        f_coeff=jnp.asarray(f_coeff, I32))


def ct_gate_gen(
    sampler: Sampler, params: BinFHEParams, sk: mntru.MNTRUPrivateKey,
    gate: BINGATE = BINGATE.NAND,
) -> mntru.MNTRUCiphertext:
    """ctNAND: encryption of the 5q/8 gate offset under F^-1
    (ctGateGen, binfhe-base-scheme.cpp:340-376)."""
    if gate != BINGATE.NAND:
        raise NotImplementedError("Support NAND gate only")
    mp = params.mntru
    mod, k, n = mp.q, mp.k, mp.n
    e = sampler.discrete_gaussian(mp.std, (k, n), q=mod)
    e[0, 0] = (e[0, 0] + 5 * mod // 8) % mod
    Finv = np.where(sk.F_inv > mp.q_ks // 2,
                    sk.F_inv.astype(np.int64) - mp.q_ks, sk.F_inv) % mod
    c = np.einsum("kl,kln->kn", e, Finv) % mod
    return mntru.MNTRUCiphertext(jnp.asarray(c, I32))


def _mk_test_vector_mntru(params: BinFHEParams, shape, p: int = 4):
    """Rx[j] = j<N/2 ? -(Q/2p+1) : Q/2p+1 (BootstrapGateCore MNTRU,
    binfhe-base-scheme.cpp:1092-1097) — constant, broadcast to batch."""
    up = params.unienc
    Q2p = up.Q // (2 * p) + 1
    rx = np.where(np.arange(up.N) < up.N // 2, up.Q - Q2p, Q2p)
    return jnp.broadcast_to(jnp.asarray(rx, I32), shape + (up.N,))


def _mk_test_vector_mklwe(params: BinFHEParams, b, p: int = 4):
    """Rx rotated by b-hat (BootstrapGateCore MKLWE,
    binfhe-base-scheme.cpp:1022-1043). b: [...] already mod 2N."""
    up = params.unienc
    N, Q = up.N, up.Q
    Q2p = Q // (2 * p) + 1
    rx = jnp.asarray(np.where(np.arange(N) < N // 2, Q2p, Q - Q2p), I64)
    j = jnp.arange(N, dtype=I64)
    idx = b[..., None].astype(I64) + j                 # [..., N]
    wrap = (idx >= N) & (idx < 2 * N)
    val = jnp.where(wrap, Q - rx, rx).astype(I32)
    pos = (idx % N).astype(jnp.int32)
    m = jnp.zeros(b.shape + (N,), I32)
    bidx = jnp.arange(int(np.prod(b.shape, dtype=np.int64)) or 1)
    m2 = m.reshape(-1, N)
    out = m2.at[bidx[:, None], pos.reshape(-1, N)].set(val.reshape(-1, N))
    return out.reshape(b.shape + (N,))


def _mk_extract(tables, params: BinFHEParams, acc):
    """Per-user transpose + INTT extraction (binfhe-base-scheme.cpp:498-506).
    acc: [..., k, N] EVAL -> [..., k, N] COEFF under the original secrets."""
    return ntt_inv(tables, transpose_eval(tables, acc))


@partial(jax.jit, static_argnames=("params",))
def _mk_gate_mntru_jit(tables, params, ek, ct_nand_c, c1, c2):
    mp = params.mntru
    up = params.unienc
    q = mp.q
    prep = mod_add(c1, c2, q)
    ct_temp = mod_sub(ct_nand_c, prep, q)              # [..., k, n]

    # rotation indices: floor(a * 2N / q)  (mk-acc-xzw.cpp:110/125 —
    # NativeInteger integer division; q does not divide 2N for MK sets)
    c_idx = (ct_temp.astype(I64) * (2 * up.N)) // q

    m = _mk_test_vector_mntru(params, ct_temp.shape[:-2])
    m_eval = ntt_fwd(tables, m)
    acc = jnp.zeros(ct_temp.shape[:-2] + (up.k, up.N), I32)
    acc = acc.at[..., 0, :].set(m_eval)

    binary = params.method == BINFHE_METHOD.MKNTRU_B
    acc = xzw.eval_acc(tables, up, ek.bs, acc, c_idx.astype(I32), binary)

    ext = _mk_extract(tables, params, acc)             # [..., k, N]
    ct_ms = mntru.mod_switch(mntru.MNTRUCiphertext(ext), mp.q_ks, up.Q)
    return mntru.key_switch2(
        ct_ms, ek.ks, mp.q_ks, mp.base_ks, mp.digits_ks, signed=mp.ks_signed)


def eval_bin_gate_mntru(
    tables, params: BinFHEParams, gate: BINGATE, ek: UniEncBTKey,
    ct1: mntru.MNTRUCiphertext, ct2: mntru.MNTRUCiphertext,
    ct_nand: mntru.MNTRUCiphertext,
) -> mntru.MNTRUCiphertext:
    """MNTRU gate eval (EvalBinGate, binfhe-base-scheme.cpp:467-515).
    Batched over leading dims of ct1/ct2."""
    if gate != BINGATE.NAND:
        raise NotImplementedError("MKNTRU path supports NAND (reference parity)")
    return _mk_gate_mntru_jit(tables, params, ek, ct_nand.c, ct1.c, ct2.c)


@partial(jax.jit, static_argnames=("params",))
def _mk_gate_mklwe_jit(tables, params, ek, a1, b1, a2, b2):
    lp = params.mklwe
    up = params.unienc
    q = lp.q
    ct1 = mklwe.MKLWECiphertext(a1, b1)
    ct2 = mklwe.MKLWECiphertext(a2, b2)
    prep = mklwe.eval_add(ct1, ct2, q)
    zero = mklwe.MKLWECiphertext(
        jnp.zeros_like(a1), jnp.full(b1.shape, (5 * q) // 8, I32))
    ct_temp = mklwe.eval_sub(zero, prep, q)
    ct_ms1 = mklwe.mod_switch(ct_temp, 2 * up.N, q)    # mod 2N

    m = _mk_test_vector_mklwe(params, ct_ms1.b)
    m_eval = ntt_fwd(tables, m)
    acc = jnp.zeros(ct_ms1.b.shape + (up.k, up.N), I32)
    acc = acc.at[..., 0, :].set(m_eval)

    a_neg = mklwe.neg_a(ct_ms1, 2 * up.N).a            # rotation uses -a
    acc = xzw.eval_acc(tables, up, ek.bs, acc, a_neg, binary=True)

    ext = _mk_extract(tables, params, acc)             # [..., k, N]
    b_out = jnp.full(ct_ms1.b.shape, (up.Q >> 3) + 1, I32)
    ct_ext = mklwe.MKLWECiphertext(ext, b_out)
    ct_ms = mklwe.mod_switch(ct_ext, lp.q_ks, up.Q)
    if isinstance(ek.ks, mklwe.MKLWECompactSwitchingKey):
        return mklwe.key_switch_compact(
            ct_ms, ek.ks, lp.q_ks, lp.base_c, lp.digits_c, lp.n)
    return mklwe.key_switch(
        ct_ms, ek.ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n)


def eval_bin_gate_mklwe(
    tables, params: BinFHEParams, gate: BINGATE, ek: UniEncBTKey,
    ct1: mklwe.MKLWECiphertext, ct2: mklwe.MKLWECiphertext,
) -> mklwe.MKLWECiphertext:
    """MKLWE gate eval (EvalBinGate, binfhe-base-scheme.cpp:380-463)."""
    if gate != BINGATE.NAND:
        raise NotImplementedError("MKLWE path supports NAND (reference parity)")
    return _mk_gate_mklwe_jit(
        tables, params, ek, ct1.a, ct1.b, ct2.a, ct2.b)


# ================================================== single-key NTRU (XZDDF)

class VectorNTRUBTKey(NamedTuple):
    """VectorNTRUBTKey (binfhe-base-scheme.h): XZDDF accumulator key +
    LWE switching key targeting the NTRU secret f."""

    bs: "xzddf.XZDDFKey"
    ks: lwe.LWESwitchingKey


def nbt_key_gen(
    sampler: Sampler, params: BinFHEParams, tables, lwe_sk: np.ndarray,
) -> VectorNTRUBTKey:
    """NKeyGen (binfhe-base-scheme.cpp:76-103): Gaussian(0.5) invertible
    ring secret f; KSkey switches from f-coefficients back to the LWE key."""
    from .constants import SecretKeyDist

    f, f_inv, f_eval, inv_eval = sample_invertible_ring_secret(
        sampler, tables, SecretKeyDist.GAUSSIAN, std=0.5)
    ks = lwe.key_switch_gen(sampler, params.lwe, lwe_sk, f)
    bs = xzddf.key_gen_acc(
        sampler, params.vntru, tables, f_eval, inv_eval,
        lwe_sk, params.lwe.q_ks)
    return VectorNTRUBTKey(bs=bs, ks=ks)


@partial(jax.jit, static_argnames=("params",))
def _ntru_gate_jit(tables, params, ek, a1, b1, a2, b2):
    """XZDDF NAND-family gate (EvalBinGate, binfhe-base-scheme.cpp:518-574
    + BootstrapGateCore :1136-1188)."""
    lp = params.lwe
    vp = params.vntru
    q, N, Q = lp.q, vp.N, vp.Q
    twoN = 2 * N
    factor = twoN // q

    ct1 = lwe.LWECiphertext(a1, b1)
    ct2 = lwe.LWECiphertext(a2, b2)
    prep = lwe.eval_add(ct1, ct2, q)
    zero = lwe.LWECiphertext(
        jnp.zeros_like(a1), jnp.full(b1.shape, (5 * q) // 8, I32))
    ct_temp = lwe.eval_sub(zero, prep, q)

    # test vector rotated by b_hat = b * 2N/q, sign-flipped on wrap
    p = 4
    Q2p = Q // (2 * p) + 1
    rx = jnp.asarray(
        np.where(np.arange(N) < N // 2, Q2p, Q - Q2p), I64)
    b_hat = ct_temp.b.astype(I64) * factor                       # [...]
    j = jnp.arange(N, dtype=I64)
    idx = b_hat[..., None] + j
    wrap = (idx >= N) & (idx < twoN)
    val = jnp.where(wrap, Q - rx, rx).astype(I32)
    pos = (idx % N).astype(jnp.int32)
    bsz = int(np.prod(ct_temp.b.shape, dtype=np.int64)) or 1
    m2 = jnp.zeros((bsz, N), I32)
    bidx = jnp.arange(bsz)
    new_m = m2.at[bidx[:, None], pos.reshape(-1, N)].set(
        val.reshape(-1, N)).reshape(ct_temp.b.shape + (N,))

    # pre-rotate by invw0 (binfhe-base-scheme.cpp:1179-1186)
    from .acc.xzddf import _newton_inv_mod_2N
    from .ops.poly import automorphism_eval

    w0 = (factor * ct_temp.a[..., 0].astype(I64) + 1) % twoN
    invw0 = _newton_inv_mod_2N(w0, twoN)
    acc = automorphism_eval(tables, ntt_fwd(tables, new_m), invw0)

    acc = xzddf.eval_acc(tables, vp, ek.bs, acc, ct_temp.a)

    # extraction: a = coeffs of transpose(acc), b = Q/8+1 (:558-566)
    a_out = ntt_inv(tables, transpose_eval(tables, acc))
    b_out = jnp.full(ct_temp.b.shape, (Q >> 3) + 1, I32)
    ct_ext = lwe.LWECiphertext(a_out, b_out)
    ct_ms = lwe.mod_switch(ct_ext, lp.q_ks, Q)
    ct_ks = lwe.key_switch(ct_ms, ek.ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n)
    return lwe.mod_switch(ct_ks, q, lp.q_ks)


def eval_bin_gate_ntru(
    tables, params: BinFHEParams, gate: BINGATE, ek: VectorNTRUBTKey,
    ct1: lwe.LWECiphertext, ct2: lwe.LWECiphertext,
) -> lwe.LWECiphertext:
    """XZDDF gate eval. The reference's dispatch computes the NAND-style
    5q/8 - (ct1+ct2) preparation for every non-XOR gate and a fixed test
    vector (binfhe-base-scheme.cpp:541-556, 1158-1177), so NAND is the
    gate with reference-parity semantics."""
    if gate != BINGATE.NAND:
        raise NotImplementedError(
            "XZDDF path supports NAND (reference parity)")
    return _ntru_gate_jit(tables, params, ek, ct1.a, ct1.b, ct2.a, ct2.b)


# ======================================== dual-limb RNS single-key (big Q)

def bt_key_gen_rns(
    sampler: Sampler,
    params: BinFHEParams,
    rt,
    lwe_sk: np.ndarray,
) -> RingGSWBTKey:
    """BTKeyGen for >28-bit sets over the RNS pair (ops/rns.py):
    GINX, AP, and LMKCDEY accumulators."""
    lp = params.lwe
    skN = lwe.key_gen_N(sampler, lp)         # int64, values in [0, Q_eff)
    ks = lwe.key_switch_gen(sampler, lp, lwe_sk, skN)
    if params.method == BINFHE_METHOD.GINX:
        bs = cggi.key_gen_acc_rns(
            sampler, params.rgsw, rt, skN, lwe_sk, lp.q_ks)
    elif params.method == BINFHE_METHOD.AP:
        bs = dm.key_gen_acc_rns(
            sampler, params.rgsw, rt, skN, lwe_sk, lp.q_ks)
    elif params.method == BINFHE_METHOD.LMKCDEY:
        bs = lmkcdey.key_gen_acc_rns(
            sampler, params.rgsw, rt, skN, lwe_sk, lp.q_ks)
    else:
        raise NotImplementedError(params.method)
    return RingGSWBTKey(bs=bs, ks=ks)


def _eval_acc_rns(rt, params: BinFHEParams, bs, acc, a, a_mod=None):
    if params.method == BINFHE_METHOD.GINX:
        return cggi.eval_acc_rns(rt, params.rgsw, bs, acc, a, a_mod)
    if params.method == BINFHE_METHOD.AP:
        return dm.eval_acc_rns(rt, params.rgsw, bs, acc, a, a_mod)
    if params.method == BINFHE_METHOD.LMKCDEY:
        return lmkcdey.eval_acc_rns(rt, params.rgsw, bs, acc, a)
    raise NotImplementedError(params.method)


def _make_gate_test_vector_rns(rt, params: BinFHEParams, gate: BINGATE, b,
                               p: int = 4):
    """Per-limb residues of the gate test vector: [..., L, N] COEFF."""
    lp = params.lwe
    q, N = lp.q, lp.N
    Q = rt.Q
    q_half = q >> 1
    factor = 2 * N // q
    q1, q2 = _gate_range(params, gate)
    Q2p = Q // (2 * p) + 1

    j = jnp.arange(q_half, dtype=I64)
    temp = (b[..., None].astype(I64) - j) % q
    if q1 < q2:
        neg = (temp >= q1) & (temp < q2)
    else:
        neg = ~((temp >= q2) & (temp < q1))
    outs = []
    for ql in rt.limbs:
        pos_l = jnp.asarray(Q2p % ql, I32)
        neg_l = jnp.asarray((Q - Q2p) % ql, I32)
        vals = jnp.where(neg, neg_l, pos_l)
        outs.append(_sparse_embed(vals, q_half, factor, N))
    return jnp.stack(outs, axis=-2)


@partial(jax.jit, static_argnames=("params", "gate"))
def _gate_rotate_extract_rns(rt, params, gate, bs_key, a1, b1, a2, b2):
    """Jitted front of the RNS gate: prep, test vector, blind rotation,
    transpose-extract. Returns per-limb residues (a: [..., L, N],
    b: [..., L]) still mod Q_eff."""
    lp = params.lwe
    L = len(rt.limbs)
    ct1 = lwe.LWECiphertext(a1, b1)
    ct2 = lwe.LWECiphertext(a2, b2)
    if gate in (BINGATE.XOR_FAST, BINGATE.XNOR_FAST):
        prep = lwe.eval_sub(ct1, ct2, lp.q)
        prep = lwe.eval_add(prep, prep, lp.q)
    else:
        prep = lwe.eval_add(ct1, ct2, lp.q)

    from .ops.rns import rns_ntt_fwd, rns_ntt_inv

    m = _make_gate_test_vector_rns(rt, params, gate, prep.b)
    m_eval = rns_ntt_fwd(rt, m)                       # [..., L, N]
    acc = jnp.stack([jnp.zeros_like(m_eval), m_eval], axis=-3)
    acc = _eval_acc_rns(rt, params, bs_key, acc, prep.a)

    a_t = jnp.stack(
        [transpose_eval(rt.tables[i], acc[..., 0, i, :]) for i in range(L)],
        axis=-2)
    a_coeff = rns_ntt_inv(rt, a_t)                    # [..., L, N]
    b_coeff = rns_ntt_inv(rt, acc[..., 1, :, :])[..., 0]    # [..., L]
    b_add = (rt.Q >> 3) + 1
    limbs_row = jnp.asarray(np.asarray(rt.limbs, np.int32))
    b_out = (b_coeff + jnp.asarray(
        np.asarray([b_add % ql for ql in rt.limbs], np.int32))) % limbs_row
    return a_coeff, b_out


def eval_bin_gate_rns(
    rt, params: BinFHEParams, gate: BINGATE, ek: RingGSWBTKey,
    ct1: lwe.LWECiphertext, ct2: lwe.LWECiphertext,
) -> lwe.LWECiphertext:
    """Single-key GINX gate at a >28-bit (dual-limb) modulus.

    Structure: jitted rotation/extraction per limb -> exact host Garner +
    Q_eff->qKS rounding (the ~72-bit product exceeds s64; see
    ops/rns.py host_round_switch) -> jitted key switch + final ModSwitch.
    """
    from .ops.rns import host_garner_centered, host_round_switch

    lp = params.lwe
    if gate in (BINGATE.XOR, BINGATE.XNOR):
        ct_and1 = eval_bin_gate_rns(
            rt, params, BINGATE.AND, ek, ct1, eval_not(params, ct2))
        ct_and2 = eval_bin_gate_rns(
            rt, params, BINGATE.AND, ek, eval_not(params, ct1), ct2)
        ct_or = eval_bin_gate_rns(
            rt, params, BINGATE.OR, ek, ct_and1, ct_and2)
        return ct_or if gate == BINGATE.XOR else eval_not(params, ct_or)

    a_res, b_res = _gate_rotate_extract_rns(
        rt, params, gate, ek.bs, ct1.a, ct1.b, ct2.a, ct2.b)

    a_c = host_garner_centered(
        rt.Q, rt.limbs, rt.inv_q1_mod_q2, np.asarray(a_res))
    b_c = host_garner_centered(
        rt.Q, rt.limbs, rt.inv_q1_mod_q2, np.asarray(b_res)[..., None])[..., 0]
    a_ks = host_round_switch(rt.Q, a_c, lp.q_ks)
    b_ks = host_round_switch(rt.Q, b_c, lp.q_ks)

    ct_ms = lwe.LWECiphertext(
        jnp.asarray(a_ks, I32), jnp.asarray(b_ks, I32))
    ct_ks = lwe.key_switch(
        ct_ms, ek.ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n)
    return lwe.mod_switch(ct_ks, lp.q, lp.q_ks)
