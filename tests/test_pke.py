"""Public-key encryption path (UnitTestFHEWPKE.cpp analogue)."""

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import (
    BINFHE_METHOD, BINFHE_PARAMSET, BINGATE, KEYGEN_MODE, ContextParams,
    SecretKeyDist,
)
from mkfhe_tpu.schemes import lwe


@pytest.fixture(scope="module")
def ctx():
    cc = BinFHEContext(seed=31)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk, keygen_mode=KEYGEN_MODE.PUB_ENCRYPT)
    return cc, sk


def test_pub_encrypt_small_dim_gate(ctx):
    """Encrypt under the bootstrap public key, switch to (n, q), run NAND."""
    cc, sk = ctx
    pk = cc.bt_key.pk
    assert pk is not None
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = cc.Encrypt(pk, m1)                       # SMALL_DIM default
    ct2 = cc.Encrypt(pk, m2)
    np.testing.assert_array_equal(cc.Decrypt(sk, ct1), m1)
    out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), 1 - (m1 & m2))


def test_pub_encrypt_large_dim(ctx):
    cc, sk = ctx
    pk, skN = cc.KeyGenPair()
    m = np.array([0, 1, 1, 0])
    ct = cc.Encrypt(pk, m, output="LARGE_DIM")
    got = lwe.decrypt_N(cc.params.lwe, skN, ct)
    np.testing.assert_array_equal(got, m)


def test_custom_context_params():
    """Fully-custom parameter overload builds a working context."""
    cp = ContextParams(
        num_user=1, number_bits=27, cycl_order=1024, lattice_param=64,
        mod=512, mod_ks=0, std_dev=1.9, base_ks=25, base_g=1 << 9,
        base_rk=23, num_auto_keys=9, key_dist=SecretKeyDist.UNIFORM_TERNARY)
    cc = BinFHEContext(seed=32)
    cc.GenerateBinFHEContextCustom(cp, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m = np.array([1, 0])
    ct1 = cc.Encrypt(sk, m)
    ct2 = cc.Encrypt(sk, np.array([1, 1]))
    out = cc.EvalBinGate(BINGATE.AND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), m & 1)
