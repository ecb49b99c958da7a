"""Single-key NTRU (XZDDF) bootstrap tests at TOY_NTRU params."""

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE


@pytest.fixture(scope="module")
def ctx():
    cc = BinFHEContext(seed=6)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY_NTRU, BINFHE_METHOD.XZDDF)
    sk = cc.KeyGen()
    cc.NBTKeyGen(sk)
    return cc, sk


def test_ntru_nand_batched(ctx):
    cc, sk = ctx
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), [1, 1, 1, 0])


def test_ntru_nand_chain(ctx):
    cc, sk = ctx
    ct = cc.Encrypt(sk, np.array([1]))
    ct_one = cc.Encrypt(sk, np.array([1]))
    val = 1
    for _ in range(3):
        ct = cc.EvalBinGate(BINGATE.NAND, ct, ct_one)
        val = 1 - (val & 1)
        np.testing.assert_array_equal(cc.Decrypt(sk, ct), [val])
