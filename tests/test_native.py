"""Native C++ keygen math vs numpy reference (both must be exact)."""

import numpy as np
import pytest

from mkfhe_tpu import native
from mkfhe_tpu.keygen import invert_matrix_mod_p
from mkfhe_tpu.ops import ntt

RNG = np.random.default_rng(17)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_matrix_inverse_matches_numpy():
    p = 45181
    n = 48
    M = RNG.integers(0, p, (n, n))
    got = native.invert_matrix_mod_p(M, p)
    want = invert_matrix_mod_p(M.astype(np.int64), p)
    if want is None:
        assert got is None
        return
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal((M @ got) % p, np.eye(n, dtype=np.int64))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_ring_inverse_matches_jax_ntt():
    import jax.numpy as jnp

    N = 64
    Q = ntt.previous_prime(ntt.first_prime(27, 2 * N), 2 * N)
    t = ntt.make_ntt_tables(N, Q)
    f = RNG.integers(0, 3, N).astype(np.int64)  # ternary-ish
    res = native.invert_ring_mod_q(f, t)
    if res is None:
        pytest.skip("sampled non-invertible f")
    f_inv, f_eval, f_inv_eval = res
    want_eval = np.asarray(ntt.ntt_fwd(t, jnp.asarray(f, jnp.int32)), np.int64)
    np.testing.assert_array_equal(f_eval, want_eval)
    # f * f_inv == 1 in the ring
    prod = ntt.negacyclic_mul_naive(f, f_inv, Q)
    one = np.zeros(N, np.int64)
    one[0] = 1
    np.testing.assert_array_equal(prod, one)
