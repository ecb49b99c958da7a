"""Dual-limb RNS path for >28-bit moduli (ops/rns.py; the reference's
NATIVE_SIZE=64 territory, binfhecontext.cpp:105-113 rows).

Not bit-exact-vs-oracle by construction (composite q1*q2 instead of the
reference's single ~2^numberBits prime — the scheme is modulus-agnostic);
verified by exact-recombination unit tests + end-to-end gate truth tables
at a TOY-scale 34-bit set, plus limb-selection checks for all six real
>28-bit rows (test_paramsets_3_4.py)."""

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import (
    BINFHE_METHOD, BINGATE, ContextParams, SecretKeyDist)

RNG = np.random.default_rng(17)

# TOY-scale 34-bit row: N=512, n=64, q=512, qKS=2^14, baseG=2^12
TOY_BIGQ = ContextParams(
    num_user=1, number_bits=34, cycl_order=1024, lattice_param=64,
    mod=512, mod_ks=1 << 14, std_dev=1.9, base_ks=25, base_g=1 << 12,
    base_rk=23, num_auto_keys=9, key_dist=SecretKeyDist.UNIFORM_TERNARY)


def test_garner_exact_roundtrip():
    from mkfhe_tpu.ops.rns import (
        garner_centered, host_garner_centered, make_rns_tables, pick_limbs,
        to_residues)

    limbs = pick_limbs(34, 1024)
    rt = make_rns_tables(512, limbs)
    Q = rt.Q
    v = np.concatenate([
        RNG.integers(0, Q, size=500, dtype=np.int64),
        np.array([0, 1, Q - 1, Q // 2, Q // 2 + 1], dtype=np.int64)])
    res = to_residues(v.reshape(-1, 1), limbs)          # [M, L, 1]
    got = np.asarray(garner_centered(rt, res))[:, 0]
    want = np.where(v > Q // 2, v - Q, v)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        host_garner_centered(Q, limbs, rt.inv_q1_mod_q2, res)[:, 0], want)


def test_rns_signed_digits_recompose():
    """Approximate balanced decomposition against Q_eff: digits recompose
    to the centered value minus the dropped low digit, exactly as
    ops.decompose.signed_digit_decompose does for native Q."""
    from mkfhe_tpu.ops.rns import (
        make_rns_tables, pick_limbs, rns_signed_digits, to_residues)

    limbs = pick_limbs(34, 1024)
    rt = make_rns_tables(512, limbs)
    Q, base = rt.Q, 1 << 12
    digits = 2     # digitsG - 1 with digitsG = ceil(35/12) = 3
    v = RNG.integers(0, Q, size=256, dtype=np.int64)
    res = to_residues(v.reshape(-1, 1), limbs)
    dig = np.asarray(rns_signed_digits(rt, res, base, digits))[:, :, 0]
    assert np.abs(dig).max() <= base // 2
    centered = np.where(v > Q // 2, v - Q, v)
    # reproduce the two dropped-digit extractions host-side
    def extract(d):
        r = ((d + base // 2) & (base - 1)) - base // 2
        return r, (d - r) >> 12
    _, rem = extract(centered)
    recomposed = rem.copy()
    # digits recompose rem = sum_j dig[j] * base^j + base^digits * final_rem
    acc = np.zeros_like(rem)
    cur = rem
    for j in range(digits):
        r, cur = extract(cur)
        acc += r * (base ** j)
        np.testing.assert_array_equal(r, dig[j])
    np.testing.assert_array_equal(acc + (base ** digits) * cur, recomposed)


def test_host_round_switch_matches_python():
    from mkfhe_tpu.ops.rns import host_round_switch

    Q = (1 << 34) + 12345
    q_to = 1 << 14
    v = np.concatenate([
        RNG.integers(-(Q // 2), Q // 2, size=300, dtype=np.int64),
        np.array([0, 1, -1, Q // 2, -(Q // 2) + 1], dtype=np.int64)])
    got = host_round_switch(Q, v, q_to)
    import math
    want = np.array(
        [math.floor((int(x) * q_to) / Q + 0.5) % q_to for x in v],
        dtype=np.int64)
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def bigq_ctx():
    cc = BinFHEContext(seed=7)
    cc.GenerateBinFHEContextCustom(TOY_BIGQ, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


def test_bigq_params(bigq_ctx):
    cc, sk = bigq_ctx
    rg = cc.params.rgsw
    # the composite sits just BELOW 2^number_bits, mirroring the
    # reference's PreviousPrime(FirstPrime(nb)) choice (r5 pick_limbs —
    # the r4 overshoot inflated digits_g vs the NATIVE_SIZE=64 build)
    assert rg.limbs and (1 << 33) < rg.Q < (1 << 34)
    assert rg.digits_g == int(np.ceil(np.log(rg.Q) / np.log(rg.base_g)))


@pytest.mark.parametrize("gate,truth", [
    (BINGATE.NAND, lambda a, b: 1 - (a & b)),
    (BINGATE.AND, lambda a, b: a & b),
    (BINGATE.OR, lambda a, b: a | b),
    (BINGATE.XOR_FAST, lambda a, b: a ^ b),
])
def test_bigq_gates(bigq_ctx, gate, truth):
    cc, sk = bigq_ctx
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    out = cc.EvalBinGate(gate, ct1, ct2)
    np.testing.assert_array_equal(
        np.asarray(cc.Decrypt(sk, out)), truth(m1, m2))


def test_bigq_gate_chain(bigq_ctx):
    cc, sk = bigq_ctx
    ct = cc.Encrypt(sk, np.array([1]))
    one = cc.Encrypt(sk, np.array([1]))
    val = 1
    for _ in range(3):
        ct = cc.EvalBinGate(BINGATE.NAND, ct, one)
        val = 1 - (val & 1)
        np.testing.assert_array_equal(np.asarray(cc.Decrypt(sk, ct)), [val])


@pytest.mark.parametrize("name", ["STD192", "STD128Q_4"])
def test_real_bigq_sets_nand(name):
    """The reference's NATIVE_SIZE=64-only sets, end to end: STD192
    (numberBits=37) and STD128Q_4 (numberBits=50, baseG=2^25) — keygen,
    encrypt, NAND, decrypt (~60s each on CPU)."""
    from mkfhe_tpu.constants import BINFHE_PARAMSET

    cc = BinFHEContext(seed=5)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET[name], BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = np.array([0, 1])
    m2 = np.array([1, 1])
    out = cc.EvalBinGate(BINGATE.NAND, cc.Encrypt(sk, m1), cc.Encrypt(sk, m2))
    np.testing.assert_array_equal(
        np.asarray(cc.Decrypt(sk, out)), 1 - (m1 & m2))


def test_bigq_ap_gates():
    """AP (DM) accumulator over the dual-limb pair at the TOY 34-bit row."""
    cc = BinFHEContext(seed=8)
    cc.GenerateBinFHEContextCustom(TOY_BIGQ, BINFHE_METHOD.AP)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    out = cc.EvalBinGate(BINGATE.NAND, cc.Encrypt(sk, m1), cc.Encrypt(sk, m2))
    np.testing.assert_array_equal(
        np.asarray(cc.Decrypt(sk, out)), 1 - (m1 & m2))


def test_bigq_lmkcdey_gates():
    """LMKCDEY op tape over the dual-limb pair (q == N row)."""
    from mkfhe_tpu.constants import ContextParams

    row = ContextParams(
        num_user=1, number_bits=34, cycl_order=1024, lattice_param=64,
        mod=512, mod_ks=1 << 14, std_dev=1.9, base_ks=25, base_g=1 << 12,
        base_rk=23, num_auto_keys=9,
        key_dist=SecretKeyDist.GAUSSIAN)
    cc = BinFHEContext(seed=10)
    cc.GenerateBinFHEContextCustom(row, BINFHE_METHOD.LMKCDEY)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    out = cc.EvalBinGate(BINGATE.NAND, cc.Encrypt(sk, m1), cc.Encrypt(sk, m2))
    np.testing.assert_array_equal(
        np.asarray(cc.Decrypt(sk, out)), 1 - (m1 & m2))
