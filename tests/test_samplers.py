"""Sampler statistics (UnitTestDistrGen.cpp analogue) and batch noise
margins via utils.metrics."""

import numpy as np

from mkfhe_tpu.rng import Sampler


def test_discrete_gaussian_moments():
    s = Sampler(seed=100)
    for std in (0.75, 1.9, 3.19):
        x = s.discrete_gaussian(std, 200_000)
        assert abs(x.mean()) < 0.05 * std + 0.02
        assert abs(x.std() - std) < 0.05 * std + 0.02


def test_discrete_gaussian_mod_lift():
    s = Sampler(seed=101)
    q = 1024
    x = s.discrete_gaussian(1.9, 10_000, q=q)
    assert x.min() >= 0 and x.max() < q
    signed = np.where(x > q // 2, x - q, x)
    assert abs(signed.mean()) < 0.1


def test_ternary_uniform():
    s = Sampler(seed=102)
    x = s.ternary(90_000)
    counts = [(x == v).sum() for v in (-1, 0, 1)]
    for c in counts:
        assert abs(c - 30_000) < 1500


def test_binary():
    s = Sampler(seed=103)
    x = s.binary(50_000)
    assert set(np.unique(x)) <= {0, 1}
    assert abs(x.mean() - 0.5) < 0.02


def test_uniform_range():
    s = Sampler(seed=104)
    q = 45181
    x = s.uniform(q, 100_000)
    assert x.min() >= 0 and x.max() < q
    assert abs(x.mean() - q / 2) < q * 0.01


def test_gate_output_noise_margin():
    """Batch noise of bootstrapped outputs stays well inside q/8
    (the WITH_NOISE_DEBUG check, structured)."""
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.utils.metrics import noise_lwe, noise_stats

    cc = BinFHEContext(seed=105)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    m1 = np.resize([0, 0, 1, 1], 16)
    m2 = np.resize([0, 1, 0, 1], 16)
    out = cc.EvalBinGate(BINGATE.AND, cc.Encrypt(sk, m1), cc.Encrypt(sk, m2))
    noise = noise_lwe(cc.params.lwe, sk, out, m1 & m2)
    stats = noise_stats(noise, cc.params.lwe.q)
    assert stats["margin_frac"] < 1.0, stats


def test_mk_gate_noise_margin():
    """MK NAND output noise stays inside the q/8 margin (structured
    WITH_NOISE_DEBUG for the MNTRU path, mntru-pke.cpp:239-252)."""
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.utils.metrics import noise_mntru, noise_stats

    cc = BinFHEContext(seed=106)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY_MKNTRU, BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)
    m1 = np.resize([0, 0, 1, 1], 8)
    m2 = np.resize([0, 1, 0, 1], 8)
    out = cc.EvalBinGate(BINGATE.NAND, cc.Encrypt(sk, m1), cc.Encrypt(sk, m2))
    noise = noise_mntru(cc.params.mntru, sk, out, 1 - (m1 & m2))
    stats = noise_stats(noise, cc.params.mntru.q)
    assert stats["margin_frac"] < 1.0, stats


def test_karney_matches_inversion_distribution():
    """Karney (Algorithm D) vs the Peikert-inversion table: same discrete
    Gaussian. Chi-square-style bin comparison at sigma=3.19 (the
    reference's default keygen sigma) + exact-tail property (values
    beyond the 8-sigma CDF table are reachable in principle)."""
    from mkfhe_tpu.rng import Sampler

    n = 6000
    a = Sampler(21).karney(3.19, n)
    b = Sampler(22).discrete_gaussian(3.19, n)
    assert abs(a.mean()) < 0.2
    assert abs(a.std() - 3.19) < 0.15
    # distribution agreement: bin probabilities within 3 sigma of binomial
    for lo, hi in ((-1, 1), (-3, 3), (-6, 6)):
        pa = ((a >= lo) & (a <= hi)).mean()
        pb = ((b >= lo) & (b <= hi)).mean()
        se = (pa * (1 - pa) / n) ** 0.5 + (pb * (1 - pb) / n) ** 0.5
        assert abs(pa - pb) < 5 * se + 1e-3, (lo, hi, pa, pb)


def test_karney_mod_q_lift():
    from mkfhe_tpu.rng import Sampler

    v = Sampler(23).karney(2.0, 500, q=97)
    assert ((v >= 0) & (v < 97)).all()


def test_generic_sampler_moments():
    """DiscreteGaussianGeneratorGeneric port: arbitrary (center, std)
    from fixed base samplers (discretegaussiangeneratorgeneric.cpp:
    270-356). Moment check at two configurations."""
    from mkfhe_tpu.rng import GenericSampler, Sampler

    g = GenericSampler(Sampler(24), base_std=34.0, log_base=10)
    n = 3000
    vals = np.array([g.generate_integer(0.0, 300.0) for _ in range(n)])
    assert abs(vals.mean()) < 5 * 300 / n ** 0.5
    assert abs(vals.std() - 300.0) < 15
    vals2 = np.array([g.generate_integer(10.25, 150.0) for _ in range(n)])
    assert abs(vals2.mean() - 10.25) < 5 * 150 / n ** 0.5
    assert abs(vals2.std() - 150.0) < 10
