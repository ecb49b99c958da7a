"""End-to-end single-key GINX gate bootstrapping at TOY params.

Mirrors the reference's UnitTestFHEW.cpp truth-table strategy
(src/binfhe/unittest/UnitTestFHEW.cpp:173-199) with a batched twist: all
four (m1, m2) input combinations are evaluated in ONE batched gate call.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE

TRUTH = {
    BINGATE.AND: [0, 0, 0, 1],
    BINGATE.OR: [0, 1, 1, 1],
    BINGATE.NAND: [1, 1, 1, 0],
    BINGATE.NOR: [1, 0, 0, 0],
    BINGATE.XOR_FAST: [0, 1, 1, 0],
    BINGATE.XNOR_FAST: [1, 0, 0, 1],
    BINGATE.XOR: [0, 1, 1, 0],
    BINGATE.XNOR: [1, 0, 0, 1],
}

INPUTS = [(0, 0), (0, 1), (1, 0), (1, 1)]


@pytest.fixture(scope="module")
def ctx():
    cc = BinFHEContext(seed=1)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


@pytest.mark.parametrize(
    "gate",
    [BINGATE.AND, BINGATE.OR, BINGATE.NAND, BINGATE.NOR,
     BINGATE.XOR_FAST, BINGATE.XNOR_FAST],
)
def test_two_input_gates_batched(ctx, gate):
    cc, sk = ctx
    m1 = np.array([a for a, _ in INPUTS])
    m2 = np.array([b for _, b in INPUTS])
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    ct_out = cc.EvalBinGate(gate, ct1, ct2)
    res = cc.Decrypt(sk, ct_out)
    np.testing.assert_array_equal(res, TRUTH[gate])


def test_xor_via_composition(ctx):
    cc, sk = ctx
    m1 = np.array([a for a, _ in INPUTS])
    m2 = np.array([b for _, b in INPUTS])
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    res = cc.Decrypt(sk, cc.EvalBinGate(BINGATE.XOR, ct1, ct2))
    np.testing.assert_array_equal(res, TRUTH[BINGATE.XOR])


def test_not_and_bootstrap(ctx):
    cc, sk = ctx
    m = np.array([0, 1])
    ct = cc.Encrypt(sk, m)
    res = cc.Decrypt(sk, cc.EvalNOT(ct))
    np.testing.assert_array_equal(res, 1 - m)
    res2 = cc.Decrypt(sk, cc.Bootstrap(ct))
    np.testing.assert_array_equal(res2, m)


def test_eval_constant(ctx):
    """EvalConstant (binfhecontext.cpp:440-442): noiseless trivial
    encryption of a boolean, decryptable without any key material."""
    cc, sk = ctx
    for v in (False, True):
        ct = cc.EvalConstant(v)
        res = np.asarray(cc.Decrypt(sk, ct))
        assert int(res) == int(v)


def test_generate_profile_reuse_resets_meta(ctx):
    """A reused context that switches Generate* flavors must not keep
    stale per-profile serialization metadata (ADVICE r4)."""
    from mkfhe_tpu.constants import PARAM_SETS

    cc = BinFHEContext(seed=3)
    row = PARAM_SETS[BINFHE_PARAMSET.TOY]
    cc.GenerateBinFHEContextCustom(row, BINFHE_METHOD.GINX)
    assert getattr(cc, "_custom_row", None) is row
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY, BINFHE_METHOD.GINX)
    assert not hasattr(cc, "_custom_row")


def test_three_input_majority(ctx):
    cc, sk = ctx
    combos = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    m = np.array(combos)  # [8, 3]
    cts = [cc.Encrypt(sk, m[:, i], p=4) for i in range(3)]
    out = cc.EvalBinGateMulti(BINGATE.MAJORITY, cts)
    res = cc.Decrypt(sk, out)
    want = (m.sum(axis=1) >= 2).astype(np.int64)
    np.testing.assert_array_equal(res, want)


def test_chained_gates(ctx):
    """Depth test (UnitTestFHEWDeep.cpp analogue): NAND chain of length 8."""
    cc, sk = ctx
    m = np.array([1])
    ct = cc.Encrypt(sk, m)
    ct_one = cc.Encrypt(sk, np.array([1]))
    val = 1
    for _ in range(8):
        ct = cc.EvalBinGate(BINGATE.NAND, ct, ct_one)
        val = 1 - (val & 1)
    np.testing.assert_array_equal(cc.Decrypt(sk, ct), [val])
