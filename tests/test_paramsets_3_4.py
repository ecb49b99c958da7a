"""3-bit / 4-bit plaintext-space parameter sets (binfhecontext.cpp:101-113)
exercised the way the reference's unittests use them: multi-input gates at
spec precision (UnitTestFHEW.cpp:43-62, :206-216) and EvalFunc
(UnitTestFunc.cpp).
"""

import numpy as np
import pytest

from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import (
    BINFHE_METHOD, BINFHE_PARAMSET, BINGATE, PARAM_SETS, SecretKeyDist)


def test_new_rows_match_reference_table():
    """Spot-check the transcribed rows against binfhecontext.cpp:101-113."""
    r = PARAM_SETS[BINFHE_PARAMSET.STD128_3]
    assert (r.num_user, r.number_bits, r.cycl_order, r.lattice_param,
            r.mod, r.mod_ks, r.base_ks, r.base_g) == (
        1, 27, 2048, 541, 1024, 1 << 15, 32, 1 << 7)
    r = PARAM_SETS[BINFHE_PARAMSET.STD128_4_LMKCDEY]
    assert (r.number_bits, r.lattice_param, r.mod, r.base_g,
            r.key_dist) == (28, 522, 2048, 1 << 10, SecretKeyDist.GAUSSIAN)
    r = PARAM_SETS[BINFHE_PARAMSET.STD256Q_4]
    assert (r.number_bits, r.lattice_param, r.mod, r.mod_ks, r.base_ks,
            r.base_g) == (27, 1625, 4096, 1 << 21, 16, 1 << 6)
    r = PARAM_SETS[BINFHE_PARAMSET.STD128_LMKCDEY_New]
    assert (r.number_bits, r.lattice_param, r.base_g) == (28, 446, 1 << 7)
    # all 12 VERDICT-listed sets present
    for name in ("STD128_3", "STD128_3_LMKCDEY", "STD128Q_3_LMKCDEY",
                 "STD192Q_3", "STD256Q_3", "STD128_4", "STD128_4_LMKCDEY",
                 "STD128Q_4", "STD128Q_4_LMKCDEY", "STD192Q_4", "STD256Q_4",
                 "STD128_LMKCDEY_New"):
        assert BINFHE_PARAMSET[name] in PARAM_SETS


def test_over_28bit_sets_resolve_to_rns_limbs():
    """numberBits > 28 (the reference's NATIVE_SIZE=64 territory) resolves
    to a dual-limb RNS modulus with both limbs NTT friendly (r4; was a
    clean rejection through r3). r5: the composite sits just BELOW
    2^numberBits, matching the reference's PreviousPrime(FirstPrime(nb))
    choice so derived digit counts agree with the NATIVE_SIZE=64 build
    (tests/test_ext64_oracle.py). Non-GINX methods at these sets still
    reject clearly."""
    from mkfhe_tpu.constants import PARAM_SETS
    from mkfhe_tpu.params import build_params

    for name in ("STD128Q_4", "STD192Q_3", "STD192", "STD192Q",
                 "STD192Q_4", "STD256"):
        p = PARAM_SETS[BINFHE_PARAMSET[name]]
        params = build_params(BINFHE_PARAMSET[name], BINFHE_METHOD.GINX)
        q1, q2 = params.rgsw.limbs
        assert q1 != q2
        assert q1 * q2 == params.rgsw.Q
        assert (1 << (p.number_bits - 1)) < params.rgsw.Q \
            < (1 << p.number_bits)
        m = p.cycl_order
        assert q1 % m == 1 and q2 % m == 1
        assert max(q1, q2) < (1 << 28)

    cc = BinFHEContext(seed=3)
    with pytest.raises(NotImplementedError, match="number_bits"):
        cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD192,
                                 BINFHE_METHOD.MKNTRU)


@pytest.fixture(scope="module")
def ctx_std128_3():
    cc = BinFHEContext(seed=31)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128_3, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


@pytest.fixture(scope="module")
def ctx_std128_4():
    cc = BinFHEContext(seed=41)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128_4, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    return cc, sk


@pytest.mark.parametrize("gate,reduce_fn", [
    (BINGATE.AND3, lambda m: m.all(axis=1)),
    (BINGATE.OR3, lambda m: m.any(axis=1)),
])
def test_three_input_gates_std128_3(ctx_std128_3, gate, reduce_fn):
    """AND3/OR3 at the set built for them, p=6 (UnitTestFHEW.cpp:206-212
    uses num_input=3, p=6)."""
    cc, sk = ctx_std128_3
    combos = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    m = np.array(combos)                                  # [8, 3]
    cts = [cc.Encrypt(sk, m[:, i], p=6) for i in range(3)]
    out = cc.EvalBinGateMulti(gate, cts, p=6)
    res = cc.Decrypt(sk, out, p=6)   # reference decrypts at ptmodulus

    np.testing.assert_array_equal(res, reduce_fn(m).astype(np.int64))


@pytest.mark.parametrize("gate,reduce_fn", [
    (BINGATE.AND4, lambda m: m.all(axis=1)),
    (BINGATE.OR4, lambda m: m.any(axis=1)),
])
def test_four_input_gates_std128_4(ctx_std128_4, gate, reduce_fn):
    """AND4/OR4 at the set built for them, p=8 (UnitTestFHEW.cpp:214-216
    uses num_input=4, p=8)."""
    cc, sk = ctx_std128_4
    combos = [(a, b, c, d) for a in (0, 1) for b in (0, 1)
              for c in (0, 1) for d in (0, 1)]
    m = np.array(combos)                                  # [16, 4]
    cts = [cc.Encrypt(sk, m[:, i], p=8) for i in range(4)]
    out = cc.EvalBinGateMulti(gate, cts, p=8)
    res = cc.Decrypt(sk, out, p=8)   # reference decrypts at ptmodulus

    np.testing.assert_array_equal(res, reduce_fn(m).astype(np.int64))


def test_eval_func_std128_3(ctx_std128_3):
    """EvalFunc at STD128_3 spec precision (UnitTestFunc.cpp:50-72)."""
    cc, sk = ctx_std128_3
    p = cc.GetMaxPlaintextSpace()
    lut = cc.GenerateLUTviaFunction(lambda m, pp: (m * m + 1) % pp, p)
    m = np.arange(p)
    ct = cc.Encrypt(sk, m, p=p)
    res = cc.Decrypt(sk, cc.EvalFunc(ct, lut), p=p)
    np.testing.assert_array_equal(res, (m * m + 1) % p)


def test_lmkcdey_and3_std128_3_lmkcdey():
    """The LMKCDEY 3-bit set with its own method (Gaussian secrets).

    Margin note: LMKCDEY at p=6 runs ~2.4 sigma of headroom (round-to-odd
    rounding noise with Gaussian secrets + dG=2 gadget truncation; measured
    err std ~35 vs q/12 = 85 margin — same class as the reference, whose
    own unittests only exercise 3-input gates at TOY). The seeded RNG makes
    the outcome deterministic; the op tape itself is verified
    schedule-exact against a transcription of rgsw-acc-lmkcdey.cpp:71-159
    and oracle-bit-exact at STD128_LMKCDEY (test_bitexact_oracle)."""
    cc = BinFHEContext(seed=35)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.STD128_3_LMKCDEY, BINFHE_METHOD.LMKCDEY)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    combos = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    m = np.array(combos)
    cts = [cc.Encrypt(sk, m[:, i], p=6) for i in range(3)]
    out = cc.EvalBinGateMulti(BINGATE.AND3, cts, p=6)
    res = cc.Decrypt(sk, out, p=6)
    np.testing.assert_array_equal(res, m.all(axis=1).astype(np.int64))


def test_majority_gate_std128_3():
    """MAJORITY runs at p=4 (UnitTestFHEW.cpp:222: num_inputs=3,
    ptmodulus=4) — caught by the r4 error-rate artifact: feeding p=6
    inputs makes MAJORITY behave like AND3."""
    cc = BinFHEContext(seed=31)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128_3, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    combos = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    m = np.array(combos)
    cts = [cc.Encrypt(sk, m[:, i], p=4) for i in range(3)]
    out = cc.EvalBinGateMulti(BINGATE.MAJORITY, cts)   # p inferred: 4
    res = cc.Decrypt(sk, out, p=4)
    np.testing.assert_array_equal(res, (m.sum(1) >= 2).astype(np.int64))
