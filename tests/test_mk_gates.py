"""End-to-end multi-key gate bootstrapping (TOY-sized MK param sets).

The reference has NO unit tests for the MK path (SURVEY.md §4); its only
verification is the two example binaries (boolean-mkntru.cpp,
boolean-mklwe.cpp: keygen, encrypt two bits, one NAND, decrypt). These
tests cover the same flow, batched over all four input combinations, at
2 and 4 parties, plus fresh-encryption roundtrips and gate chaining.
"""

import pytest as _pytest
import pytest

pytestmark = _pytest.mark.smoke

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE

M1 = np.array([0, 0, 1, 1])
M2 = np.array([0, 1, 0, 1])
NAND_TRUTH = np.array([1, 1, 1, 0])


@pytest.fixture(scope="module")
def mkntru_ctx():
    cc = BinFHEContext(seed=3)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY_MKNTRU, BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)
    return cc, sk


@pytest.fixture(scope="module")
def mklwe_ctx():
    cc = BinFHEContext(seed=4)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY_MKNTRU_LWE, BINFHE_METHOD.MKNTRU_LWE)
    sk = cc.MKLWE_KeyGen()
    cc.MKBTKeyGen(sk)
    return cc, sk


def test_mntru_fresh_roundtrip(mkntru_ctx):
    cc, sk = mkntru_ctx
    m = np.array([0, 1, 1, 0, 1])
    ct = cc.Encrypt(sk, m)
    np.testing.assert_array_equal(cc.Decrypt2(sk, ct), m)


def test_mkntru_nand_batched(mkntru_ctx):
    cc, sk = mkntru_ctx
    ct1 = cc.Encrypt(sk, M1)
    ct2 = cc.Encrypt(sk, M2)
    out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), NAND_TRUTH)


def test_mkntru_nand_chain(mkntru_ctx):
    """Bootstrapped outputs must be valid inputs for further NAND gates
    (not x = x NAND x is disallowed — use a fresh 1 as second operand)."""
    cc, sk = mkntru_ctx
    ct = cc.Encrypt(sk, np.array([1]))
    ct_one = cc.Encrypt(sk, np.array([1]))
    val = 1
    for _ in range(4):
        ct = cc.EvalBinGate(BINGATE.NAND, ct, ct_one)
        val = 1 - (val & 1)
        np.testing.assert_array_equal(cc.Decrypt(sk, ct), [val])


def test_mklwe_fresh_roundtrip(mklwe_ctx):
    cc, sk = mklwe_ctx
    m = np.array([0, 1, 1, 0, 1])
    ct = cc.Encrypt(sk, m)
    np.testing.assert_array_equal(cc.Decrypt(sk, ct), m)


def test_mklwe_nand_batched(mklwe_ctx):
    cc, sk = mklwe_ctx
    ct1 = cc.Encrypt(sk, M1)
    ct2 = cc.Encrypt(sk, M2)
    out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), NAND_TRUTH)


def test_mkntru_4party_nand():
    cc = BinFHEContext(seed=5)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY_MKNTRU_4, BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)
    ct1 = cc.Encrypt(sk, M1)
    ct2 = cc.Encrypt(sk, M2)
    out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), NAND_TRUTH)


def test_mklwe_signed_digit_count_exact():
    """signed_digit_count must return a dc with ZERO residual for every
    value — including the centered extremes where ceil(log_B(q)) digits
    are NOT enough (e.g. qKS=32749, B=32: +16374 needs a 4th digit)."""
    from mkfhe_tpu.ops.decompose import base_digits_signed
    from mkfhe_tpu.schemes.mklwe import signed_digit_count

    for q, base in ((32749, 4), (32749, 32), (45181, 4), (512, 4)):
        dc = signed_digit_count(q, base)
        v = np.arange(q, dtype=np.int64)
        digs = np.asarray(base_digits_signed(
            np.asarray(v, np.int64), q, base, dc))      # [dc, q]
        rec = sum(digs[t].astype(np.int64) * base ** t for t in range(dc))
        cent = np.where(v > q // 2, v - q, v)
        np.testing.assert_array_equal(rec, cent)
        # and dc-1 digits must NOT suffice (minimality)
        if dc > 1:
            digs1 = np.asarray(base_digits_signed(
                np.asarray(v, np.int64), q, base, dc - 1))
            rec1 = sum(digs1[t].astype(np.int64) * base ** t
                       for t in range(dc - 1))
            assert not np.array_equal(rec1, cent)


def test_mklwe_compact_keyswitch_matches_expanded():
    """r4 VERDICT task #2: the j-linear signed-digit MKLWE switching key.
    Scheme-level check at TOY size: switching the same ciphertext through
    the compact key and the reference-shaped expanded key must yield the
    same decrypted message, and the compact key must be Bks/dc-fold
    smaller."""
    from mkfhe_tpu.params import build_params
    from mkfhe_tpu.rng import Sampler
    from mkfhe_tpu.schemes import mklwe

    params = build_params(
        BINFHE_PARAMSET.TOY_MKNTRU_LWE, BINFHE_METHOD.MKNTRU_LWE).mklwe
    s = Sampler(7)
    sk = mklwe.key_gen_binary(s, params)                 # [k, n] short key
    skN = s.binary((params.k, params.N))                 # long key
    ksk_exp = mklwe.key_switch_gen(s, params, sk, skN)
    ksk_cmp = mklwe.key_switch_gen_compact(s, params, sk, skN)

    # a ciphertext under the LONG key over Z_qKS
    lp_long = type(params)(
        k=params.k, n=params.N, N=params.N, q=params.q_ks, Q=params.Q,
        q_ks=params.q_ks, std=params.std, base_ks=params.base_ks,
        key_dist=params.key_dist)
    m = np.array([0, 1, 1, 0, 1, 0, 1, 1])
    skN_q = skN.copy()
    ct_long = mklwe.encrypt(s, lp_long, skN_q, m, p=4, mod=params.q_ks)

    out_exp = mklwe.key_switch(
        ct_long, ksk_exp, params.q_ks, params.base_ks, params.digits_ks,
        params.n)
    out_cmp = mklwe.key_switch_compact(
        ct_long, ksk_cmp, params.q_ks, params.base_c, params.digits_c,
        params.n)

    lp_short = type(params)(
        k=params.k, n=params.n, N=params.N, q=params.q_ks, Q=params.Q,
        q_ks=params.q_ks, std=params.std, base_ks=params.base_ks,
        key_dist=params.key_dist)
    res_exp = mklwe.decrypt(lp_short, sk, out_exp, p=4)
    res_cmp = mklwe.decrypt(lp_short, sk, out_cmp, p=4)
    np.testing.assert_array_equal(res_exp, m)
    np.testing.assert_array_equal(res_cmp, m)

    size_exp = int(np.prod(ksk_exp.A.shape)) + int(np.prod(ksk_exp.B.shape))
    size_cmp = int(np.prod(ksk_cmp.AB.shape))
    assert size_cmp * 4 < size_exp, (size_cmp, size_exp)


def test_mklwe_gate_with_compact_keyswitch():
    """End-to-end NAND through the compact production path (the k>=8
    default), forced at TOY size via ks_compact=True."""
    import dataclasses

    cc = BinFHEContext(seed=6)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY_MKNTRU_LWE, BINFHE_METHOD.MKNTRU_LWE)
    object.__setattr__(
        cc, "params", dataclasses.replace(
            cc.params, mklwe=dataclasses.replace(
                cc.params.mklwe, ks_compact=True)))
    sk = cc.MKLWE_KeyGen()
    cc.MKBTKeyGen(sk)
    from mkfhe_tpu.schemes.mklwe import MKLWECompactSwitchingKey

    assert isinstance(cc.mk_bt_key.ks, MKLWECompactSwitchingKey)
    ct1 = cc.Encrypt(sk, M1)
    ct2 = cc.Encrypt(sk, M2)
    out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), NAND_TRUTH)


def test_mntru_keyswitch_noise_behavior_vs_reference_ksk():
    """r2 VERDICT weak #5, resolved with a measurement. The reference's
    KeySwitchGen2 vector-fill constructor reuses ONE Gaussian row for all
    N*d KSK rows (mntru-pke.cpp:655), so its switch noise degenerates to
    (sum_i digit_i) * e[0] with e[0] in {0,+-1,+-2}: ~0 when e[0]=0 (the
    captured key: measured 29), ~4.6k when |e[0]|=1 (still inside the
    q/8=5647 margin by accident), and gate-breaking at |e[0]|=2. Our
    fresh-rows keygen replaces that lottery with a proper Gaussian:
    noise ~ sqrt(sum digit_i^2)*sigma (~1.0-1.3k at STD100) — higher
    typical value, bounded tails, same bit-exact eval semantics (the
    oracle tests inject the reference KSK unchanged).

    Asserts: the gate with OUR KSK (same captured secrets) decrypts, and
    its noise matches the fresh-row analytic prediction within 2.5x."""
    import os

    vec = os.path.join(os.path.dirname(__file__), "..", "oracle",
                       "vectors", "std100_mkntru")
    if not os.path.exists(os.path.join(vec, "kskey.bin")):
        pytest.skip("oracle vectors not generated")

    import numpy as np

    from mkfhe_tpu import boot
    from mkfhe_tpu.constants import BINGATE
    from mkfhe_tpu.oracle_io import load_mkntru_vectors
    from mkfhe_tpu.rng import Sampler
    from mkfhe_tpu.schemes import mntru
    from mkfhe_tpu.utils import metrics

    params, tables, ek_ref, cts, (sk_F, sk_Finv) = load_mkntru_vectors(vec)
    mp = params.mntru
    sk = mntru.MNTRUPrivateKey(F=sk_F, F_inv=sk_Finv)
    fvec = np.asarray(ek_ref.f_coeff, np.int64)
    ksk_ours = mntru.key_switch_gen2(Sampler(101), mp, sk, fvec)
    ek_ours = ek_ref._replace(ks=ksk_ours)

    def gate_noise(ek):
        out = boot.eval_bin_gate_mntru(
            tables, params, BINGATE.NAND, ek,
            cts["ct1"], cts["ct2"], cts["ctnand"])
        res = mntru.decrypt(mp, sk, out)
        assert int(res) == 1            # 1 NAND 0 still decrypts
        e = metrics.noise_mntru(mp, sk, out, np.asarray([1]))
        return float(np.abs(e).max())

    n_ref = gate_noise(ek_ref)
    n_ours = gate_noise(ek_ours)
    # fresh-row prediction: sqrt(k * N * d * E[digit^2]) * sigma with
    # digits ~ U[0, Bks): E[d^2] = (Bks-1)(2Bks-1)/6
    ed2 = (mp.base_ks - 1) * (2 * mp.base_ks - 1) / 6
    pred = (mp.k * mp.N * mp.digits_ks * ed2) ** 0.5 * mp.std
    assert n_ours < 2.5 * (pred + n_ref), (n_ours, pred, n_ref)
    assert n_ours < mp.q / 8, "outside decryption margin"


def test_mntru_signed_keyswitch_halves_ks_noise():
    """r3 VERDICT weak #1: unsigned-digit KS noise alone eats ~75% of the
    q/8 margin at k=16. The production path now consumes the same KSK with
    exact balanced digits (E[d^2]: (B-1)(2B-1)/6 -> ~B^2/12, a ~3.8x
    variance cut). Measured here at STD100 on the captured oracle secrets:
    the signed gate noise must come in clearly below the unsigned gate
    noise with the same fresh-rows KSK."""
    import dataclasses
    import os

    vec = os.path.join(os.path.dirname(__file__), "..", "oracle",
                       "vectors", "std100_mkntru")
    if not os.path.exists(os.path.join(vec, "kskey.bin")):
        pytest.skip("oracle vectors not generated")

    from mkfhe_tpu import boot
    from mkfhe_tpu.oracle_io import load_mkntru_vectors
    from mkfhe_tpu.rng import Sampler
    from mkfhe_tpu.schemes import mntru
    from mkfhe_tpu.utils import metrics

    params, tables, ek_ref, cts, (sk_F, sk_Finv) = load_mkntru_vectors(vec)
    mp = params.mntru          # ks_signed=False from the oracle loader
    sk = mntru.MNTRUPrivateKey(F=sk_F, F_inv=sk_Finv)
    fvec = np.asarray(ek_ref.f_coeff, np.int64)
    ksk_ours = mntru.key_switch_gen2(Sampler(202), mp, sk, fvec)
    ek = ek_ref._replace(ks=ksk_ours)

    def gate_noise(params_):
        out = boot.eval_bin_gate_mntru(
            tables, params_, BINGATE.NAND, ek,
            cts["ct1"], cts["ct2"], cts["ctnand"])
        res = mntru.decrypt(params_.mntru, sk, out)
        assert int(res) == 1
        e = metrics.noise_mntru(params_.mntru, sk, out, np.asarray([1]))
        return float(np.abs(e).max())

    params_signed = dataclasses.replace(
        params, mntru=dataclasses.replace(mp, ks_signed=True))
    n_unsigned = gate_noise(params)
    n_signed = gate_noise(params_signed)
    # one gate sample each; same KSK, same blind-rotation noise floor.
    # Expected std ratio ~1.95 on the KS term; assert a loose improvement.
    assert n_signed < n_unsigned, (n_signed, n_unsigned)
    assert n_signed < mp.q / 8
