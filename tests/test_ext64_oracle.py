"""NATIVE_SIZE=64 oracle comparison for the large-precision surface
(r5, VERDICT r4 task #3).

The >28-bit sets and the logQprime=54 ext profile were verified only by
self-consistency through r4 — zero reference vectors exist above 28 bits
because the 32-bit oracle build cannot run them. oracle/capture_ext64
(built against oracle/build64.sh, NATIVE_SIZE=64) captures the TOY ext
profile (54-bit prime Q, qKS=2^35, binfhecontext.cpp:28-80):

  * BIT-EXACT: the s64 keyswitch (qKS=2^35) and the following ModSwitch
    are modulus-compatible — we replay the reference's switching key on
    its own deterministic input ciphertexts and must match every word.
  * SEMANTIC: the 54-bit ring is a dual-limb composite on our side (by
    design — ops/rns.py), so rotation outputs cannot be bit-compared;
    the EvalSign / EvalFloor / EvalDecomp DIGIT STREAMS are compared as
    integers against the reference's own decrypted outputs instead.
"""

import os

import numpy as np
import pytest

VEC = os.path.join(os.path.dirname(__file__), "..", "oracle", "vectors",
                   "toy_ext64")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(VEC, "meta.txt")),
    reason="ext64 oracle vectors not generated (oracle/build64.sh + "
           "capture_ext64)")


@pytest.fixture(scope="module")
def vectors():
    from mkfhe_tpu.oracle_io import load_ext64_vectors

    return load_ext64_vectors(VEC)


def test_meta_matches_our_ext_profile(vectors):
    """Our GenerateBinFHEContextExt must derive the same LWE-layer
    geometry the reference derives (binfhecontext.cpp:28-80)."""
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_PARAMSET

    meta, *_ = vectors
    cc = BinFHEContext(seed=1)
    cc.GenerateBinFHEContextExt(BINFHE_PARAMSET.TOY, arb_func=False,
                                logQ=17)
    lp = cc.params.lwe
    assert lp.n == meta["n"] and lp.N == meta["N"]
    assert lp.q == meta["q"] and lp.q_ks == meta["qks"]
    assert lp.base_ks == meta["bks"] and lp.digits_ks == meta["dks"]
    assert cc.params.rgsw.base_g == meta["baseG"]
    assert cc.GetBeta() == meta["beta"]
    assert cc.GetMaxPlaintextSpace() == meta["maxP"]
    # the ring modulus is composite on our side; both are 54-bit covers
    # (the reference takes PreviousPrime(FirstPrime(2^54)) — just below)
    assert cc.params.rgsw.Q >= (1 << 53) and meta["Q"] >= (1 << 53)


def test_s64_keyswitch_bit_exact(vectors):
    """Replay the reference's qKS=2^35 switching key on its own inputs:
    every output word must match (lwe-pke.cpp:379-403 at NATIVE_SIZE=64)."""
    from mkfhe_tpu.schemes import lwe

    meta, sk, ksk, units, _ = vectors
    n, N = meta["n"], meta["N"]
    qks, bks, dks = meta["qks"], meta["bks"], meta["dks"]

    a = units["in"][:, :N]
    b = units["in"][:, N]
    ct = lwe.LWECiphertext(a, b)
    out = lwe.key_switch(ct, ksk, qks, bks, dks, n)
    got = np.concatenate(
        [np.asarray(out.a, np.int64),
         np.asarray(out.b, np.int64)[:, None]], axis=1)
    np.testing.assert_array_equal(got, units["out"])

    # ... and the following ModSwitch (qKS -> q) word-for-word
    ms = lwe.mod_switch(out, meta["q"], qks)
    got_ms = np.concatenate(
        [np.asarray(ms.a, np.int64),
         np.asarray(ms.b, np.int64)[:, None]], axis=1)
    np.testing.assert_array_equal(got_ms, units["ms"])


@pytest.fixture(scope="module")
def ctx_ext():
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_PARAMSET

    cc = BinFHEContext(seed=33)
    cc.GenerateBinFHEContextExt(BINFHE_PARAMSET.TOY, arb_func=False,
                                logQ=17)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


def _decrypt_at(cc, sk, ct, mod, p):
    from mkfhe_tpu.utils.metrics import _signed

    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    s = _signed(np.asarray(sk), cc.params.lwe.q_ks) % mod
    r = (b - a @ s) % mod
    r = (r + mod // (p * 2)) % mod
    return (p * r) // mod


def test_eval_sign_stream_matches_reference(vectors, ctx_ext):
    meta, _, _, _, streams = vectors
    cc, sk = ctx_ext
    mod = 1 << meta["logQ"]
    P = mod // 512
    m = streams["sign"]["m"]
    ct = cc.Encrypt(sk, m % P, p=P, mod=mod)
    out = cc.EvalSign(ct, mod)
    got = np.asarray(cc.Decrypt(sk, out, p=2))
    np.testing.assert_array_equal(got, streams["sign"]["res"])


def test_eval_floor_stream_matches_reference(vectors, ctx_ext):
    meta, _, _, _, streams = vectors
    cc, sk = ctx_ext
    mod = 1 << meta["logQ"]
    P = mod // 512
    m = streams["floor"]["m"]
    ct = cc.Encrypt(sk, m % P, p=P, mod=mod)
    out = cc.EvalFloor(ct, mod, roundbits=1)
    got = _decrypt_at(cc, sk, out, mod, P // 2)
    np.testing.assert_array_equal(got, streams["floor"]["res"])


def test_eval_decomp_stream_matches_reference(vectors, ctx_ext):
    """The full digit stream, digit for digit, incl. the last-digit
    modulus rule (UnitTestFunc.cpp:160-199)."""
    meta, _, _, _, streams = vectors
    cc, sk = ctx_ext
    mod = 1 << meta["logQ"]
    beta = cc.GetBeta()
    P = mod // (2 * beta)
    p4 = cc.GetMaxPlaintextSpace()
    m = streams["decomp"]["m"]
    ct = cc.Encrypt(sk, m % P, p=P, mod=mod)
    digits = cc.EvalDecomp(ct, mod)
    assert len(digits) == int(streams["decomp"]["count"][0])
    q = meta["q"]
    beta_ = cc.GetBeta()
    # full digits live at the base modulus q; the final remainder ct
    # lives at the last shrunken working modulus (extended.eval_decomp:
    # mod_{t+1} = (mod_t // q) * 2*beta until <= q)
    last_mod = mod
    while last_mod > q:
        last_mod = (last_mod // q) * 2 * beta_
    got = []
    for j, d in enumerate(digits):
        if j == len(digits) - 1:
            logp = (int(P - 1).bit_length()) % (int(p4 - 1).bit_length())
            pd = 1 << logp
            mod_d = last_mod
        else:
            pd = p4
            mod_d = q
        got.append(np.asarray(_decrypt_at(cc, sk, d, mod_d, pd)))
    got = np.stack(got, axis=1).reshape(-1)   # [m, digits] row-major
    want = streams["decomp"]["res"]
    np.testing.assert_array_equal(got, want)


# ------------------------- >28-bit GINX sets (capture_bigq64, STD128Q_4)

BIGQ_VEC = os.path.join(os.path.dirname(__file__), "..", "oracle",
                        "vectors", "std128q4_64")

bigq_mark = pytest.mark.skipif(
    not os.path.exists(os.path.join(BIGQ_VEC, "meta.txt")),
    reason="bigq64 oracle vectors not generated")


@pytest.fixture(scope="module")
def bigq_vectors():
    from mkfhe_tpu.oracle_io import load_bigq64_vectors

    return load_bigq64_vectors(BIGQ_VEC)


@bigq_mark
def test_bigq_meta_matches_table(bigq_vectors):
    """Our STD128Q_4 LWE-layer geometry vs the 64-bit reference build."""
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET
    from mkfhe_tpu.params import build_params

    meta, *_ = bigq_vectors
    p = build_params(BINFHE_PARAMSET.STD128Q_4, BINFHE_METHOD.GINX)
    lp = p.lwe
    assert lp.n == meta["n"] and lp.N == meta["N"]
    assert lp.q == meta["q"] and lp.q_ks == meta["qks"]
    assert lp.base_ks == meta["bks"] and lp.digits_ks == meta["dks"]
    assert p.rgsw.base_g == meta["baseG"]
    assert p.rgsw.digits_g == meta["digitsG"]
    # ring modulus: 50-bit prime there, dual-limb composite here — both
    # sit just below 2^50 (the one by-design non-comparable quantity),
    # so every derived digit count above matched exactly
    assert (1 << 49) < p.rgsw.Q < (1 << 50)
    assert (1 << 49) < meta["Q"] < (1 << 50)


@bigq_mark
def test_bigq_keyswitch_bit_exact(bigq_vectors):
    """Bit-exact replay of the STD128Q_4 switching key + ModSwitch: the
    KSK encodes the ternary ring secret whose SwitchModulus image does
    not depend on the ring modulus, so this tail is fully comparable."""
    from mkfhe_tpu.schemes import lwe

    meta, sk, ksk, units, _ = bigq_vectors
    n, N = meta["n"], meta["N"]
    qks, bks, dks = meta["qks"], meta["bks"], meta["dks"]

    ct = lwe.LWECiphertext(units["in"][:, :N], units["in"][:, N])
    out = lwe.key_switch(ct, ksk, qks, bks, dks, n)
    got = np.concatenate(
        [np.asarray(out.a, np.int64),
         np.asarray(out.b, np.int64)[:, None]], axis=1)
    np.testing.assert_array_equal(got, units["out"])

    ms = lwe.mod_switch(out, meta["q"], qks)
    got_ms = np.concatenate(
        [np.asarray(ms.a, np.int64),
         np.asarray(ms.b, np.int64)[:, None]], axis=1)
    np.testing.assert_array_equal(got_ms, units["ms"])


@bigq_mark
def test_bigq_reference_gate_truth_tables(bigq_vectors):
    """The 64-bit reference's own STD128Q_4 gate outputs — the semantic
    anchor the RNS path is held to (tests/test_rns_bigq runs our side)."""
    *_, gate_res = bigq_vectors
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    want = np.stack([m1 & m2, m1 | m2, 1 - (m1 & m2), 1 - (m1 | m2)])
    np.testing.assert_array_equal(gate_res, want)
