"""Loader for reference-oracle test vectors (oracle/capture_mkntru.cpp).

The capture harness dumps every key/ciphertext of a reference MKNTRU run as
raw int64 files with polynomials in COEFFICIENT format. Loading converts to
this framework's containers — NTT'ing with OUR tables, so all EVAL-domain
math matches the reference as polynomial identities regardless of twiddle
ordering — and the gate output must then be BIT-EXACT.
"""

import os

import numpy as np
import jax.numpy as jnp

from . import boot
from .acc.xzw import UniEncKey
from .constants import BINFHE_METHOD
from .ops.modmath import I32
from .ops.ntt import host_ntt_fwd, make_ntt_tables
from .params import (
    BinFHEParams, LWEParams, MNTRUParams, UniEncParams, get_tables,
)
from .schemes.mntru import MNTRUCiphertext, MNTRUSwitchingKey

def _read(path, name, shape):
    a = np.fromfile(os.path.join(path, name + ".bin"), dtype=np.int64)
    return a.reshape(shape)

def load_mkntru_vectors(path: str):
    """Returns (params, tables, ek: UniEncBTKey, cts: dict)."""
    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "paramset" else int(val)

    k, n, N = meta["k"], meta["n"], meta["N"]
    q, Q, qks = meta["q"], meta["Q"], meta["qks"]
    dg = meta["digitsG"] - 1
    dks = meta["dks"]

    from .constants import BINFHE_PARAMSET, SecretKeyDist

    lwe_p = LWEParams(n=n, N=N, q=q, Q=Q, q_ks=qks, std=0.75,
                      base_ks=meta["bks"],
                      key_dist=SecretKeyDist.UNIFORM_TERNARY)
    mntru_p = MNTRUParams(k=k, n=n, N=N, q=q, Q=Q, q_ks=qks, std=0.75,
                          base_ks=meta["bks"],
                          key_dist=SecretKeyDist.UNIFORM_TERNARY,
                          ks_signed=False)  # reference-parity unsigned digits
    unienc_p = UniEncParams(k=k, N=N, Q=Q, q=q, base_g=meta["baseG"],
                            method=BINFHE_METHOD.MKNTRU,
                            key_dist=SecretKeyDist.UNIFORM_TERNARY)
    params = BinFHEParams(
        paramset=BINFHE_PARAMSET.STD100_MKNTRU, method=BINFHE_METHOD.MKNTRU,
        lwe=lwe_p, mntru=mntru_p, unienc=unienc_p)
    tables = get_tables(N, Q)

    bs_coeff = _read(path, "bskey", (k, 2, n + 1, dg, 2, N))
    bs_eval = host_ntt_fwd(tables, bs_coeff)
    ek_arr = bs_eval[:, :, :n]                       # [k, 2, n, dg, 2, N]
    ekstar = bs_eval[0, 0, n]                        # [dg, 2, N]

    pkey = host_ntt_fwd(tables, _read(path, "pkey", (k, dg, N)))
    fvec = _read(path, "fvec", (k, N))
    f_eval = host_ntt_fwd(tables, fvec)

    ksk = _read(path, "kskey", (k, N * dks, n))

    ek_sh = (ek_arr.astype(np.uint64) << np.uint64(32)) // np.uint64(Q)
    bs = UniEncKey(
        ek=jnp.asarray(ek_arr, I32),
        ekstar=jnp.asarray(ekstar, I32),
        pkey=jnp.asarray(pkey, I32),
        ek_sh=jnp.asarray(ek_sh.astype(np.uint32)))
    ek = boot.UniEncBTKey(
        bs=bs,
        ks=MNTRUSwitchingKey(ksk=jnp.asarray(ksk, I32)),
        f_eval=jnp.asarray(f_eval, I32),
        f_coeff=jnp.asarray(fvec, I32))

    cts = {
        name: MNTRUCiphertext(
            jnp.asarray(_read(path, name, (k, n)), I32))
        for name in ("ct1", "ct2", "ctnand", "ctout")
    }
    sk_F = _read(path, "sk_F", (k, n, n))
    sk_Finv = _read(path, "sk_Finv", (k, n, n))
    return params, tables, ek, cts, (sk_F, sk_Finv)

def load_ginx_vectors(path: str):
    """Load capture_ginx dumps -> (params, tables, ek, cts dict)."""
    from .acc.cggi import CGGIKey
    from .constants import BINFHE_PARAMSET, SecretKeyDist
    from .schemes.lwe import LWECiphertext, LWESwitchingKey
    from .params import RGSWParams

    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "paramset" else int(val)

    n, N = meta["n"], meta["N"]
    q, Q, qks = meta["q"], meta["Q"], meta["qks"]
    dg2 = (meta["digitsG"] - 1) * 2
    dks, bks = meta["dks"], meta["bks"]

    lwe_p = LWEParams(n=n, N=N, q=q, Q=Q, q_ks=qks, std=1.9, base_ks=bks,
                      key_dist=SecretKeyDist.UNIFORM_TERNARY)
    rgsw_p = RGSWParams(N=N, Q=Q, q=q, base_g=meta["baseG"], base_r=32,
                        method=BINFHE_METHOD.GINX, std=1.9,
                        key_dist=SecretKeyDist.UNIFORM_TERNARY)
    params = BinFHEParams(
        paramset=BINFHE_PARAMSET.STD128, method=BINFHE_METHOD.GINX,
        lwe=lwe_p, rgsw=rgsw_p)
    tables = get_tables(N, Q)

    bs_coeff = _read(path, "bskey", (n, 2, dg2, 2, N))
    bs_eval = host_ntt_fwd(tables, bs_coeff)
    bs_sh = (bs_eval.astype(np.uint64) << np.uint64(32)) // np.uint64(Q)
    bs = CGGIKey(jnp.asarray(bs_eval, I32),
                 key_sh=jnp.asarray(bs_sh.astype(np.uint32)))
    ksk = LWESwitchingKey(
        A=jnp.asarray(_read(path, "ksk_a", (N, bks, dks, n)), I32),
        B=jnp.asarray(_read(path, "ksk_b", (N, bks, dks)), I32))
    ek = boot.RingGSWBTKey(bs=bs, ks=ksk)

    def load_ct(name):
        v = _read(path, name, (n + 1,))
        return LWECiphertext(
            jnp.asarray(v[:n], I32), jnp.asarray(v[n], I32))

    cts = {"ct1": load_ct("ct1"), "ct2": load_ct("ct2")}
    for g in ("or", "and", "nor", "nand", "xorf", "xnorf"):
        cts["ctout_" + g] = load_ct("ctout_" + g)
    sk = _read(path, "sk", (n,))
    return params, tables, ek, cts, sk

def load_mklwe_vectors(path: str):
    """Load capture_mklwe dumps -> (params, tables, ek, cts, sk)."""
    from .constants import BINFHE_PARAMSET, SecretKeyDist
    from .params import MKLWEParams
    from .schemes.mklwe import MKLWECiphertext, MKLWESwitchingKey

    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "paramset" else int(val)

    k, n, N = meta["k"], meta["n"], meta["N"]
    q, Q, qks = meta["q"], meta["Q"], meta["qks"]
    dg = meta["digitsG"] - 1
    dks, bks = meta["dks"], meta["bks"]

    lwe_p = LWEParams(n=n, N=N, q=q, Q=Q, q_ks=qks, std=1.9, base_ks=bks,
                      key_dist=SecretKeyDist.BINARY)
    mklwe_p = MKLWEParams(k=k, n=n, N=N, q=q, Q=Q, q_ks=qks, std=1.9,
                          base_ks=bks, key_dist=SecretKeyDist.BINARY)
    unienc_p = UniEncParams(k=k, N=N, Q=Q, q=q, base_g=meta["baseG"],
                            method=BINFHE_METHOD.MKNTRU_LWE,
                            key_dist=SecretKeyDist.BINARY)
    params = BinFHEParams(
        paramset=BINFHE_PARAMSET.STD100_MKNTRU_LWE,
        method=BINFHE_METHOD.MKNTRU_LWE,
        lwe=lwe_p, mklwe=mklwe_p, unienc=unienc_p)
    tables = get_tables(N, Q)

    bs_coeff = _read(path, "bskey", (k, n + 1, dg, 2, N))
    bs_eval = host_ntt_fwd(tables, bs_coeff)
    ek_arr = bs_eval[:, None, :n]                    # [k, 1, n, dg, 2, N]
    ekstar = bs_eval[0, n]                           # [dg, 2, N]
    pkey = host_ntt_fwd(tables, _read(path, "pkey", (k, dg, N)))
    fvec = _read(path, "fvec", (k, N))

    ek_sh = (ek_arr.astype(np.uint64) << np.uint64(32)) // np.uint64(Q)
    bs = UniEncKey(
        ek=jnp.asarray(ek_arr, I32),
        ekstar=jnp.asarray(ekstar, I32),
        pkey=jnp.asarray(pkey, I32),
        ek_sh=jnp.asarray(ek_sh.astype(np.uint32)))
    ks = MKLWESwitchingKey(
        A=jnp.asarray(_read(path, "ksk_a", (k, N, bks, dks, n)), I32),
        B=jnp.asarray(_read(path, "ksk_b", (k, N, bks, dks)), I32))
    ek = boot.UniEncBTKey(
        bs=bs, ks=ks,
        f_eval=jnp.asarray(host_ntt_fwd(tables, fvec), I32),
        f_coeff=jnp.asarray(fvec, I32))

    def load_ct(name):
        v = _read(path, name, (k * n + 1,))
        return MKLWECiphertext(
            jnp.asarray(v[:k * n].reshape(k, n), I32),
            jnp.asarray(v[k * n], I32))

    cts = {name: load_ct(name) for name in ("ct1", "ct2", "ctout")}
    sk = _read(path, "sk", (k, n))
    return params, tables, ek, cts, sk

def load_ap_vectors(path: str):
    """Load capture_ginx STD128_AP dumps -> (params, tables, ek, cts, sk)."""
    from .acc.dm import DMKey
    from .constants import BINFHE_PARAMSET, SecretKeyDist
    from .schemes.lwe import LWECiphertext, LWESwitchingKey
    from .params import RGSWParams

    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "paramset" else int(val)
    with open(os.path.join(path, "meta_ap.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = int(val)

    n, N = meta["n"], meta["N"]
    q, Q, qks = meta["q"], meta["Q"], meta["qks"]
    dg2 = (meta["digitsG"] - 1) * 2
    dks, bks = meta["dks"], meta["bks"]
    baseR, dR = meta["baseR"], meta["dR"]

    lwe_p = LWEParams(n=n, N=N, q=q, Q=Q, q_ks=qks, std=1.9, base_ks=bks,
                      key_dist=SecretKeyDist.UNIFORM_TERNARY)
    rgsw_p = RGSWParams(N=N, Q=Q, q=q, base_g=meta["baseG"], base_r=baseR,
                        method=BINFHE_METHOD.AP, std=1.9,
                        key_dist=SecretKeyDist.UNIFORM_TERNARY)
    params = BinFHEParams(
        paramset=BINFHE_PARAMSET.STD128_AP, method=BINFHE_METHOD.AP,
        lwe=lwe_p, rgsw=rgsw_p)
    tables = get_tables(N, Q)

    bs_coeff = _read(path, "bskey", (n, baseR, dR, dg2, 2, N))
    bs_eval = host_ntt_fwd(tables, bs_coeff)
    bs = DMKey(jnp.asarray(bs_eval, I32))
    ksk = LWESwitchingKey(
        A=jnp.asarray(_read(path, "ksk_a", (N, bks, dks, n)), I32),
        B=jnp.asarray(_read(path, "ksk_b", (N, bks, dks)), I32))
    ek = boot.RingGSWBTKey(bs=bs, ks=ksk)

    def load_ct(name):
        v = _read(path, name, (n + 1,))
        return LWECiphertext(
            jnp.asarray(v[:n], I32), jnp.asarray(v[n], I32))

    cts = {"ct1": load_ct("ct1"), "ct2": load_ct("ct2")}
    for g in ("or", "and", "nor", "nand", "xorf", "xnorf"):
        cts["ctout_" + g] = load_ct("ctout_" + g)
    sk = _read(path, "sk", (n,))
    return params, tables, ek, cts, sk


def load_lmkcdey_vectors(path: str):
    """Load capture_lmkcdey STD128_LMKCDEY dumps -> (params, tables, ek,
    cts, sk). Key layouts: bskey [n][dg2][2][N], autokey [w+1][dg][2][N]
    (index 0 = key for 2N-5, 1..w = 5^i; rgsw-acc-lmkcdey.cpp:61-67), all
    COEFFICIENT — NTT'd here with our tables."""
    from .acc.lmkcdey import LMKCDEYKey
    from .constants import BINFHE_PARAMSET, SecretKeyDist
    from .ops.modmath import shoup_precompute
    from .schemes.lwe import LWECiphertext, LWESwitchingKey
    from .params import RGSWParams

    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "paramset" else int(val)

    n, N = meta["n"], meta["N"]
    q, Q, qks = meta["q"], meta["Q"], meta["qks"]
    w = meta["numAutoKeys"]
    dg = meta["digitsG"] - 1
    dg2 = 2 * dg
    dks, bks = meta["dks"], meta["bks"]
    M = 2 * N

    lwe_p = LWEParams(n=n, N=N, q=q, Q=Q, q_ks=qks, std=1.9, base_ks=bks,
                      key_dist=SecretKeyDist.UNIFORM_TERNARY)
    rgsw_p = RGSWParams(N=N, Q=Q, q=q, base_g=meta["baseG"], base_r=32,
                        method=BINFHE_METHOD.LMKCDEY, std=1.9,
                        key_dist=SecretKeyDist.UNIFORM_TERNARY,
                        num_auto_keys=w)
    params = BinFHEParams(
        paramset=BINFHE_PARAMSET.STD128_LMKCDEY,
        method=BINFHE_METHOD.LMKCDEY, lwe=lwe_p, rgsw=rgsw_p)
    tables = get_tables(N, Q)

    evk = host_ntt_fwd(tables, _read(path, "bskey", (n, dg2, 2, N)))
    ak = host_ntt_fwd(tables, _read(path, "autokey", (w + 1, dg, 2, N)))

    ts = np.empty(w + 1, dtype=np.int64)
    ts[0] = M - 5
    for i in range(1, w + 1):
        ts[i] = pow(5, i, M)
    log_gen = np.zeros(M, dtype=np.int64)
    log_gen[M - 1] = N // 2
    gp = 1
    for i in range(1, N // 2):
        gp = gp * 5 % M
        log_gen[gp] = i
        log_gen[M - gp] = -i

    bs = LMKCDEYKey(
        evk=jnp.asarray(evk, I32), auto=jnp.asarray(ak, I32),
        pow5=jnp.asarray(ts, I32), log_gen=jnp.asarray(log_gen, I32),
        evk_sh=jnp.asarray(shoup_precompute(evk, Q)),
        auto_sh=jnp.asarray(shoup_precompute(ak, Q)))
    ksk = LWESwitchingKey(
        A=jnp.asarray(_read(path, "ksk_a", (N, bks, dks, n)), I32),
        B=jnp.asarray(_read(path, "ksk_b", (N, bks, dks)), I32))
    ek = boot.RingGSWBTKey(bs=bs, ks=ksk)

    def load_ct(name):
        v = _read(path, name, (n + 1,))
        return LWECiphertext(
            jnp.asarray(v[:n], I32), jnp.asarray(v[n], I32))

    cts = {"ct1": load_ct("ct1"), "ct2": load_ct("ct2")}
    for g in ("or", "and", "nor", "nand", "xorf", "xnorf"):
        cts["ctout_" + g] = load_ct("ctout_" + g)
    sk = _read(path, "sk", (n,))
    return params, tables, ek, cts, sk


def load_xzddf_vectors(path: str):
    """Load capture_xzddf dumps (P128T single-key vector-NTRU) ->
    (params, tables, ek: VectorNTRUBTKey, cts dict, sk).

    Reference: vntru-acc-xzddf.cpp:8-46 key layout — bskey [n+1][dG][N]
    (KDM at 0, Enc(X^{sum s}) at n), autokey [q-1][dG][N] for
    t = (2N/q)(j+1)+1 — and the EvalBinGate(VNTRU) tail
    (binfhe-base-scheme.cpp:518-574)."""
    from .acc.xzddf import XZDDFKey
    from .constants import BINFHE_PARAMSET, SecretKeyDist
    from .params import VNTRUParams
    from .schemes.lwe import LWECiphertext, LWESwitchingKey

    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "paramset" else int(val)

    n, N = meta["n"], meta["N"]
    q, Q, qks = meta["q"], meta["Q"], meta["qks"]
    dg = meta["digitsG"] - 1
    dks, bks = meta["dks"], meta["bks"]

    lwe_p = LWEParams(n=n, N=N, q=q, Q=Q, q_ks=qks, std=0.5, base_ks=bks,
                      key_dist=SecretKeyDist.UNIFORM_TERNARY)
    vntru_p = VNTRUParams(N=N, Q=Q, q=q, base_g=meta["baseG"], std=0.5,
                          key_dist=SecretKeyDist.UNIFORM_TERNARY)
    params = BinFHEParams(
        paramset=BINFHE_PARAMSET.P128T, method=BINFHE_METHOD.XZDDF,
        lwe=lwe_p, vntru=vntru_p)
    tables = get_tables(N, Q)

    evk = host_ntt_fwd(tables, _read(path, "bskey", (n + 1, dg, N)))
    auto = host_ntt_fwd(tables, _read(path, "autokey", (q - 1, dg, N)))
    bs = XZDDFKey(evk=jnp.asarray(evk, I32), auto=jnp.asarray(auto, I32))
    ksk = LWESwitchingKey(
        A=jnp.asarray(_read(path, "ksk_a", (N, bks, dks, n)), I32),
        B=jnp.asarray(_read(path, "ksk_b", (N, bks, dks)), I32))
    ek = boot.VectorNTRUBTKey(bs=bs, ks=ksk)

    def load_ct(name):
        v = _read(path, name, (n + 1,))
        return LWECiphertext(
            jnp.asarray(v[:n], I32), jnp.asarray(v[n], I32))

    cts = {"ct1": load_ct("ct1"), "ct2": load_ct("ct2"),
           "ctout_nand": load_ct("ctout_nand")}
    sk = _read(path, "sk", (n,))
    return params, tables, ek, cts, sk


def load_ext64_vectors(path: str):
    """Load capture_ext64 dumps (NATIVE_SIZE=64 reference build, the
    TOY large-precision profile: 54-bit prime Q, qKS=2^35).

    Returns (meta, sk, ksk, units, streams):
      * sk: [n] int64 LWE secret
      * ksk: schemes.lwe.LWESwitchingKey (int64 — qKS > 2^31)
      * units: dict of keyswitch/ModSwitch unit vectors
        (in: [R, N+1] mod qKS; out/ms: [R, n+1])
      * streams: dict of EvalSign/EvalFloor/EvalDecomp inputs, output
        ciphertexts and reference-decrypted values
    """
    from .ops.modmath import I64
    from .schemes.lwe import LWESwitchingKey

    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "profile" else int(val)
    n, N = meta["n"], meta["N"]
    bks, dks = meta["bks"], meta["dks"]

    sk = _read(path, "sk", (n,))
    ksk = LWESwitchingKey(
        A=jnp.asarray(_read(path, "ksk_a", (N, bks, dks, n)), I64),
        B=jnp.asarray(_read(path, "ksk_b", (N, bks, dks)), I64))

    R = 4
    units = {
        "in": _read(path, "ksunit_in", (R, N + 1)),
        "out": _read(path, "ksunit_out", (R, n + 1)),
        "ms": _read(path, "ksunit_ms", (R, n + 1)),
    }
    streams = {}
    for name in ("sign", "floor"):
        m = _read(path, name + "_m", (-1,))
        streams[name] = {
            "m": m,
            "ct": _read(path, name + "_ct", (m.size, n + 1)),
            "res": _read(path, name + "_res", (m.size,)),
        }
    m = _read(path, "decomp_m", (-1,))
    count = _read(path, "decomp_count", (m.size,))
    total = int(count.sum())
    streams["decomp"] = {
        "m": m, "count": count,
        "ct": _read(path, "decomp_ct", (total, n + 1)),
        "res": _read(path, "decomp_res", (total,)),
    }
    return meta, sk, ksk, units, streams


def load_bigq64_vectors(path: str):
    """Load capture_bigq64 dumps (NATIVE_SIZE=64 build, >28-bit GINX
    sets). Returns (meta, sk, ksk, units, gate_res[4, 4])."""
    from .ops.modmath import I64
    from .schemes.lwe import LWESwitchingKey

    meta = {}
    with open(os.path.join(path, "meta.txt")) as fh:
        for line in fh:
            key, val = line.split()
            meta[key] = val if key == "paramset" else int(val)
    n, N = meta["n"], meta["N"]
    bks, dks = meta["bks"], meta["dks"]

    sk = _read(path, "sk", (n,))
    dtype = I32 if meta["qks"] < (1 << 31) else I64
    ksk = LWESwitchingKey(
        A=jnp.asarray(_read(path, "ksk_a", (N, bks, dks, n)), dtype),
        B=jnp.asarray(_read(path, "ksk_b", (N, bks, dks)), dtype))
    R = 4
    units = {
        "in": _read(path, "ksunit_in", (R, N + 1)),
        "out": _read(path, "ksunit_out", (R, n + 1)),
        "ms": _read(path, "ksunit_ms", (R, n + 1)),
    }
    gate_res = _read(path, "gate_res", (4, 4))
    return meta, sk, ksk, units, gate_res
