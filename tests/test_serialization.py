"""Checkpoint round-trip tests (UnitTestFHEWSerial.cpp analogue), covering
the MK types the reference never registered (SURVEY.md §5)."""

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext, serial
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
from mkfhe_tpu.schemes import lwe, mntru


def test_ciphertext_roundtrip(tmp_path):
    cc = BinFHEContext(seed=21)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    ct = cc.Encrypt(sk, np.array([0, 1, 1]))
    p = tmp_path / "ct.npz"
    serial.save(str(p), ct, meta={"kind": "lwe"})
    ct2, meta = serial.load(str(p))
    assert meta["kind"] == "lwe"
    np.testing.assert_array_equal(np.asarray(ct.a), np.asarray(ct2.a))
    np.testing.assert_array_equal(np.asarray(ct.b), np.asarray(ct2.b))


def test_mk_context_checkpoint_resume(tmp_path):
    """Full MK context checkpoint: keygen once, save, reload, evaluate."""
    cc = BinFHEContext(seed=22)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY_MKNTRU, BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)

    path = tmp_path / "ctx.npz"
    serial.save_context(str(path), cc)

    cc2 = serial.load_context(str(path))
    sk2 = cc2.mntru_sk
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = cc2.Encrypt(sk2, m1)
    ct2 = cc2.Encrypt(sk2, m2)
    out = cc2.EvalBinGate(BINGATE.NAND, ct1, ct2)
    np.testing.assert_array_equal(cc2.Decrypt(sk2, out), [1, 1, 1, 0])


def test_bt_key_roundtrip(tmp_path):
    cc = BinFHEContext(seed=23)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    ek = cc.BTKeyGen(sk)
    p = tmp_path / "btkey.npz"
    serial.save(str(p), ek)
    ek2, _ = serial.load(str(p))
    np.testing.assert_array_equal(
        np.asarray(ek.bs.key), np.asarray(ek2.bs.key))
    # named reference API: BTKeyLoad installs the deserialized keys
    # (binfhecontext.h:300-318); ClearBTKeys drops them
    cc.ClearBTKeys()
    assert cc.bt_key is None
    cc.BTKeyLoad(ek2)
    cc.BTKeyMapLoadSingleElement(cc.params.rgsw.base_g, ek2)
    ct1 = cc.Encrypt(sk, np.array([1]))
    ct2 = cc.Encrypt(sk, np.array([1]))
    out = cc.EvalBinGate(BINGATE.AND, ct1, ct2)
    np.testing.assert_array_equal(cc.Decrypt(sk, out), [1])


def test_ext_profile_context_roundtrip(tmp_path):
    """Large-precision profile contexts (GenerateBinFHEContextExt)
    round-trip through save_context/load_context (r4)."""
    import numpy as np
    from mkfhe_tpu import BinFHEContext, serial
    from mkfhe_tpu.constants import BINFHE_PARAMSET

    cc = BinFHEContext(seed=33)
    cc.GenerateBinFHEContextExt(BINFHE_PARAMSET.TOY, arb_func=False,
                                logQ=17)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    p = str(tmp_path / "ctx_ext.npz")
    serial.save_context(p, cc)
    cc2 = serial.load_context(p)
    assert cc2.params == cc.params
    assert cc2.params.lwe.q_ks == 1 << 35
    # restored keys drive EvalSign end to end
    mod = 1 << 17
    P = mod // 512
    m = np.array([1, P // 2 + 1])
    ct = cc.Encrypt(sk, m, p=P, mod=mod)
    out = cc2.EvalSign(ct, mod)
    res = cc2.Decrypt(sk, out, p=2)
    np.testing.assert_array_equal(res, (m >= P // 2).astype(np.int64))


def test_custom_params_context_roundtrip(tmp_path):
    """Fully-custom contexts (GenerateBinFHEContextCustom) round-trip —
    including a dual-limb RNS row. Before r4 the loader reconstructed the
    TOY table row and the restored keys had mismatched shapes."""
    import numpy as np
    from mkfhe_tpu import BinFHEContext, serial
    from mkfhe_tpu.constants import (
        BINFHE_METHOD, BINGATE, ContextParams, SecretKeyDist)

    row = ContextParams(1, 34, 1024, 64, 512, 1 << 14, 1.9, 25, 1 << 12,
                        23, 9, SecretKeyDist.UNIFORM_TERNARY)
    cc = BinFHEContext(seed=7)
    cc.GenerateBinFHEContextCustom(row, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    p = str(tmp_path / "ctx_custom.npz")
    serial.save_context(p, cc)
    cc2 = serial.load_context(p)
    assert cc2.params == cc.params
    m1 = np.array([0, 1])
    m2 = np.array([1, 1])
    out = cc2.EvalBinGate(
        BINGATE.NAND, cc.Encrypt(sk, m1), cc.Encrypt(sk, m2))
    np.testing.assert_array_equal(
        np.asarray(cc2.Decrypt(sk, out)), 1 - (m1 & m2))
