"""Extended-op tests (EvalFunc / EvalFloor / EvalSign / EvalDecomp),
mirroring src/binfhe/unittest/UnitTestFunc.cpp at MEDIUM-ish params."""

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET


@pytest.fixture(scope="module")
def ctx():
    cc = BinFHEContext(seed=9)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.MEDIUM, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


def test_eval_func_cube(ctx):
    """f(m) = m^3 mod p (UnitTestFunc.cpp:50-72)."""
    cc, sk = ctx
    p = cc.GetMaxPlaintextSpace()
    lut = cc.GenerateLUTviaFunction(lambda m, pp: (m ** 3) % pp, p)
    m = np.arange(p)
    ct = cc.Encrypt(sk, m, p=p)
    ct_out = cc.EvalFunc(ct, lut)
    res = cc.Decrypt(sk, ct_out, p=p)
    np.testing.assert_array_equal(res, (m ** 3) % p)


def test_eval_floor(ctx):
    """EvalFloor drops the low log2(q) chunk (UnitTestFunc.cpp:74-98).

    Encoding unit is 2*beta = 256 (one 'digit' of GetMaxPlaintextSpace=4
    per q-level); flooring then mod-switching by q/2beta leaves m // 4."""
    cc, sk = ctx
    q = cc.params.lwe.q                      # 1024
    beta = cc.GetBeta()
    mod = q << 3                             # 8192
    P = mod // (2 * beta)                    # 32 messages, unit 256
    m = np.array([0, 3, 4, 17, 31])
    ct = cc.Encrypt(sk, m, p=P, mod=mod)
    ct_fl = cc.EvalFloor(ct, mod)
    new_mod = (mod // q) * 2 * beta          # 2048
    from mkfhe_tpu.schemes import lwe as lwe_mod

    ct_sw = lwe_mod.mod_switch(ct_fl, new_mod, mod)
    got = decrypt_at(cc, sk, ct_sw, new_mod, new_mod // 256)
    want = m // 4
    np.testing.assert_array_equal(got, want)


def decrypt_at(cc, sk, ct, mod, p):
    """Decrypt helper at an explicit modulus (values encode m*(mod/p))."""
    import numpy as np

    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    qks = cc.params.lwe.q_ks
    s = np.where(sk > qks // 2, sk - qks, sk) % mod
    r = (b - a @ s) % mod
    r = (r + mod // (p * 2)) % mod
    return (p * r) // mod


def test_eval_sign(ctx):
    """Large-precision MSB (UnitTestFunc.cpp:100-122)."""
    cc, sk = ctx
    q = cc.params.lwe.q
    mod = 1 << 17
    P = mod // 512
    half = P // 2
    m = np.array([half - 2, half - 1, half, half + 1, half + 2]) % P
    ct = cc.Encrypt(sk, m, p=P, mod=mod)
    ct_out = cc.EvalSign(ct, mod)
    res = cc.Decrypt(sk, ct_out, p=2)
    want = (m >= half).astype(np.int64)
    np.testing.assert_array_equal(res, want)


def test_eval_decomp(ctx):
    """Digit decomposition returns all base-p digits
    (UnitTestFunc.cpp:150-240)."""
    cc, sk = ctx
    q = cc.params.lwe.q
    p = cc.GetMaxPlaintextSpace()            # 4
    beta = cc.GetBeta()
    mod = 1 << 17
    P = mod // (2 * beta)                    # unit 256
    m = np.array([5, 37, 77, 123])
    ct = cc.Encrypt(sk, m, p=P, mod=mod)
    digits = cc.EvalDecomp(ct, mod)
    # first digit is m mod p (decrypted at modulus q with pt space p)
    got0 = decrypt_at(cc, sk, digits[0], q, p)
    np.testing.assert_array_equal(got0, m % p)


def test_eval_decomp_all_digits_exact(ctx):
    """EXACT per-digit parity against the base-p decomposition of m, the
    reference's own verification model (UnitTestFunc.cpp:150-240): digit j
    decoded at plaintext space p equals (m >> j*log2(p)) mod p, and the
    final level decodes at p_last = 2^(MSB(P-1) mod MSB(p-1)) at its own
    (possibly < q) chain modulus.

    Precision note: the reference exercises this at its large-precision
    profile (logQprime=54, qKS=2^35 — binfhecontext.cpp:38-67), which no
    32-bit build can represent (MAX_MODULUS_SIZE=28). Within 32-bit
    lanes the exactness condition is beta*q/mod > bootstrap noise
    (measured ~10 q-units p99 at MEDIUM — the same class as the
    reference's own 32-bit configs), i.e. mod <= 2^12 here; larger mod
    decomposes correctly only in the EvalSign sense (top digits), which
    test_eval_sign covers."""
    cc, sk = ctx
    q = cc.params.lwe.q
    p = cc.GetMaxPlaintextSpace()            # 4
    beta = cc.GetBeta()
    lg = p.bit_length() - 1
    for mod in (4096, 2048):
        P = mod // (2 * beta)
        m = np.arange(P)
        ct = cc.Encrypt(sk, m, p=P, mod=mod)
        digits = cc.EvalDecomp(ct, mod)
        # per-level modulus bookkeeping (binfhe-base-scheme.cpp:965-976):
        # every level is mod q except the last, whose chain modulus is the
        # final (mod/q)*2*beta
        mods = [q] * (len(digits) - 1)
        mm, last_mod = mod, q
        while mm > q:
            last_mod = (mm // q) * 2 * beta
            mm = last_mod
        mods.append(min(last_mod, q) if last_mod != q else q)
        plast_log = (P - 1).bit_length() % lg
        p_last = 1 << plast_log if plast_log else p
        for j, (d, mj) in enumerate(zip(digits, mods)):
            pj = p if j < len(digits) - 1 else p_last
            got = np.asarray(decrypt_at(cc, sk, d, mj, pj))
            want = (m >> (lg * j)) % pj
            np.testing.assert_array_equal(
                got, want, err_msg=f"mod={mod} digit {j}")


# ----------------------- large-precision profile (logQprime=54, qKS=2^35)

@pytest.fixture(scope="module")
def ctx_ext():
    """GenerateBinFHEContext(set, arbFunc, logQ, ...) — the reference's
    large-precision constructor (binfhecontext.cpp:28-80): 54-bit
    intermediate modulus (dual-limb RNS) and a 2^35 key-switch modulus
    (s64-wide tail). TOY keeps n=32 so the chain stays CPU-fast."""
    cc = BinFHEContext(seed=21)
    cc.GenerateBinFHEContextExt(BINFHE_PARAMSET.TOY, arb_func=False,
                                logQ=17)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


def test_ext_profile_params(ctx_ext):
    cc, sk = ctx_ext
    lp, rg = cc.params.lwe, cc.params.rgsw
    assert lp.q_ks == 1 << 35
    # composite just below 2^54, like the reference's 54-bit prime
    assert rg.limbs and (1 << 53) < rg.Q < (1 << 54)
    assert lp.N == 2048 and lp.q == 2 * lp.N
    assert rg.base_g == 1 << 18      # logQ in (16, 25]


def test_ext_profile_eval_sign(ctx_ext):
    """MSB extraction through the 54-bit accumulator + 2^35 keyswitch."""
    cc, sk = ctx_ext
    mod = 1 << 17
    P = mod // 512
    half = P // 2
    m = np.array([half - 2, half - 1, half, half + 1, half + 2]) % P
    ct = cc.Encrypt(sk, m, p=P, mod=mod)
    ct_out = cc.EvalSign(ct, mod)
    res = cc.Decrypt(sk, ct_out, p=2)
    want = (m >= half).astype(np.int64)
    np.testing.assert_array_equal(res, want)


def test_ext_profile_eval_decomp_first_digit(ctx_ext):
    cc, sk = ctx_ext
    q = cc.params.lwe.q
    beta = cc.GetBeta()
    mod = 1 << 17
    P = mod // (2 * beta)
    p4 = cc.GetMaxPlaintextSpace()
    m = np.array([5, 13, 7, 2])
    ct = cc.Encrypt(sk, m, p=P, mod=mod)
    digits = cc.EvalDecomp(ct, mod)
    got0 = decrypt_at(cc, sk, digits[0], q, p4)
    np.testing.assert_array_equal(got0, m % p4)


def test_ext_profile_arbitrary_eval_func():
    """arbFunc=True profile (q = ringDim, binfhecontext.cpp:64): an
    ARBITRARY (non-negacyclic, non-periodic) LUT through the 54-bit
    accumulator — exercises the modulus-boost q -> 2q path of EvalFunc."""
    cc = BinFHEContext(seed=22)
    cc.GenerateBinFHEContextExt(BINFHE_PARAMSET.TOY, arb_func=True,
                                logQ=17)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    assert cc.params.lwe.q == cc.params.lwe.N      # arbFunc: q = ringDim
    p = cc.GetMaxPlaintextSpace()
    lut = cc.GenerateLUTviaFunction(lambda m, pp: (m * m) % pp, p)
    m = np.arange(p)
    ct = cc.Encrypt(sk, m, p=p)
    res = cc.Decrypt(sk, cc.EvalFunc(ct, lut), p=p)
    np.testing.assert_array_equal(res, (m * m) % p)
