"""End-to-end multi-key gate bootstrapping (TOY-sized MK param sets).

The reference has NO unit tests for the MK path (SURVEY.md §4); its only
verification is the two example binaries (boolean-mkntru.cpp,
boolean-mklwe.cpp: keygen, encrypt two bits, one NAND, decrypt). These
tests cover the same flow, batched over all four input combinations, at
2 and 4 parties, plus fresh-encryption roundtrips and gate chaining.
"""

import pytest as _pytest

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
