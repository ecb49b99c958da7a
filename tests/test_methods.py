"""Gate truth tables across accumulator methods (AP / LMKCDEY), mirroring
UnitTestFHEW.cpp's (PARAMSET x METHOD x gate) matrix at TOY."""

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE

M1 = np.array([0, 0, 1, 1])
M2 = np.array([0, 1, 0, 1])
TRUTH = {
    BINGATE.AND: M1 & M2,
    BINGATE.OR: M1 | M2,
    BINGATE.NAND: 1 - (M1 & M2),
    BINGATE.NOR: 1 - (M1 | M2),
}


@pytest.fixture(scope="module", params=["AP", "LMKCDEY"])
def ctx(request):
    cc = BinFHEContext(seed=13)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY, BINFHE_METHOD[request.param])
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


@pytest.mark.parametrize(
    "gate", [BINGATE.AND, BINGATE.OR, BINGATE.NAND, BINGATE.NOR])
def test_gates(ctx, gate):
    cc, sk = ctx
    ct1 = cc.Encrypt(sk, M1)
    ct2 = cc.Encrypt(sk, M2)
    out = cc.EvalBinGate(gate, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), TRUTH[gate])
