"""Deterministic host-side samplers.

Replaces the reference's blake2-based PRNG (utils/prng, distributiongenerator
.cpp:44) and — deliberately — the wall-clock-seeded std::default_random_engine
it uses for NTRU secret generation (binfhe-base-scheme.cpp:111,
mntru-pke.cpp:27), which SURVEY.md flags as a reproducibility hazard. All
sampling here flows from a single seeded numpy Generator owned by the
context, so keygen/encrypt streams are reproducible end to end.

Distribution semantics match the reference:
  * discrete Gaussian: exact inversion sampling from the +/-8*sigma CDF
    table (DiscreteGaussianGeneratorImpl's Peikert inversion,
    discretegaussiangenerator-impl.h:104-226)
  * 'truncated normal' secrets: double sampled from N(0, sigma) then
    truncated toward zero by the NTL double->ZZ conversion in
    Get_invertible_NativeVector / Get_invertible_Matrix
  * ternary/binary/uniform: uniform over {-1,0,1} / {0,1} / [0, q)
"""

import numpy as np


class Sampler:
    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self._dg_tables: dict[float, tuple[np.ndarray, np.ndarray]] = {}

    # -------------------------------------------------------------- gaussian
    def _dg_table(self, std: float):
        tab = self._dg_tables.get(std)
        if tab is None:
            t = int(np.ceil(std * 8)) + 1
            xs = np.arange(-t, t + 1)
            ps = np.exp(-(xs.astype(np.float64) ** 2) / (2.0 * std * std))
            cdf = np.cumsum(ps / ps.sum())
            tab = (xs, cdf)
            self._dg_tables[std] = tab
        return tab

    def discrete_gaussian(self, std: float, size, q: int | None = None):
        """Integer Gaussian; if q given, negatives map to q - |x| (int64)."""
        xs, cdf = self._dg_table(std)
        u = self.rng.random(size)
        v = xs[np.searchsorted(cdf, u)]
        if q is not None:
            v = np.where(v < 0, v + q, v)
        return v.astype(np.int64)

    def truncated_normal_int(self, std: float, size):
        """int(trunc(N(0, std))) — the NTL conversion used for NTRU secrets."""
        return np.trunc(self.rng.normal(0.0, std, size)).astype(np.int64)

    # ------------------------------------------------------------- uniforms
    def ternary(self, size, q: int | None = None):
        v = self.rng.integers(-1, 2, size=size)
        if q is not None:
            v = np.where(v < 0, v + q, v)
        return v.astype(np.int64)

    def binary(self, size):
        return self.rng.integers(0, 2, size=size).astype(np.int64)

    def uniform(self, q: int, size):
        return self.rng.integers(0, q, size=size).astype(np.int64)
