import numpy as np
import jax.numpy as jnp
import pytest

from mkfhe_tpu.ops import ntt
from mkfhe_tpu.ops.poly import (
    automorphism_coeff,
    automorphism_eval,
    monomial_eval,
    monomial_minus_one_eval,
    transpose_eval,
)

RNG = np.random.default_rng(42)


def params(N=64, bits=27):
    Q = ntt.previous_prime(ntt.first_prime(bits, 2 * N), 2 * N)
    return ntt.make_ntt_tables(N, Q)


@pytest.mark.parametrize("N", [8, 64, 512, 2048])
def test_ntt_roundtrip(N):
    t = params(N)
    a = RNG.integers(0, t.Q, size=(3, N))
    fa = ntt.ntt_fwd(t, jnp.asarray(a, jnp.int32))
    back = ntt.ntt_inv(t, fa)
    np.testing.assert_array_equal(np.asarray(back), a)


@pytest.mark.parametrize("N", [8, 64, 256])
def test_negacyclic_mul_vs_naive(N):
    t = params(N)
    a = RNG.integers(0, t.Q, size=N)
    b = RNG.integers(0, t.Q, size=N)
    got = ntt.negacyclic_mul_coeff(
        t, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)
    )
    want = ntt.negacyclic_mul_naive(a, b, t.Q)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)


def test_monomial_eval_matches_ntt_of_onehot():
    t = params(64)
    for c in [0, 1, 5, 63, 64, 100, 127]:
        # X^c in coeff form (negacyclic fold for c >= N)
        coeffs = np.zeros(64, dtype=np.int64)
        if c < 64:
            coeffs[c] = 1
        else:
            coeffs[c - 64] = t.Q - 1
        want = ntt.ntt_fwd(t, jnp.asarray(coeffs, jnp.int32))
        got = monomial_eval(t, c)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        got_m1 = monomial_minus_one_eval(t, c)
        one = np.zeros(64, dtype=np.int64)
        one[0] = 1
        want_m1 = ntt.ntt_fwd(
            t, jnp.asarray((coeffs - one) % t.Q, jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(got_m1), np.asarray(want_m1))


@pytest.mark.parametrize("k", [3, 63, 127])
def test_automorphism_eval_vs_coeff(k):
    N = 64
    t = params(N)
    a = RNG.integers(0, t.Q, size=N)
    # coefficient-domain automorphism as ground truth
    want = np.zeros(N, dtype=np.int64)
    for j in range(N):
        jk = (j * k) % (2 * N)
        if jk < N:
            want[jk] = a[j]
        else:
            want[jk - N] = (t.Q - a[j]) % t.Q
    a_eval = ntt.ntt_fwd(t, jnp.asarray(a, jnp.int32))
    got_eval = automorphism_eval(t, a_eval, k)
    got = ntt.ntt_inv(t, got_eval)
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)
    got2 = automorphism_coeff(t, jnp.asarray(a, jnp.int32), k)
    np.testing.assert_array_equal(np.asarray(got2, np.int64), want)


def test_transpose_is_x_inverse():
    N = 32
    t = params(N)
    a = RNG.integers(0, t.Q, size=N)
    a_eval = ntt.ntt_fwd(t, jnp.asarray(a, jnp.int32))
    got = np.asarray(ntt.ntt_inv(t, transpose_eval(t, a_eval)), np.int64)
    want = np.zeros(N, dtype=np.int64)
    want[0] = a[0]
    for j in range(1, N):
        want[N - j] = (t.Q - a[j]) % t.Q
    np.testing.assert_array_equal(got, want)


@pytest.mark.smoke
@pytest.mark.parametrize("N", [256, 512, 1024, 2048])
def test_ntt4_xla_bit_exact(N):
    """XLA-level 4-step factorized transforms (ops.ntt.get_ntt4_tables)
    vs the butterfly reference: fwd / inv / signed-digit fwd, all
    bit-exact. The table builder also self-verifies the factorization
    against the dense matrices at construction."""
    t = params(N)
    a = jnp.asarray(RNG.integers(0, t.Q, (3, N)), jnp.int32)
    d = jnp.asarray(RNG.integers(-256, 256, (3, N)), jnp.int32)
    ntt.set_default_impl("butterfly")
    ref_f = np.asarray(ntt.ntt_fwd(t, a))
    ref_i = np.asarray(ntt.ntt_inv(t, a))
    ref_d = np.asarray(ntt.ntt_fwd_digits(t, d, 512))
    ntt.set_default_impl("mxu_s8")     # routes through the 4-step path
    try:
        assert ntt._use_ntt4_xla(N)
        np.testing.assert_array_equal(np.asarray(ntt.ntt_fwd(t, a)), ref_f)
        np.testing.assert_array_equal(np.asarray(ntt.ntt_inv(t, a)), ref_i)
        np.testing.assert_array_equal(
            np.asarray(ntt.ntt_fwd_digits(t, d, 512)), ref_d)
    finally:
        ntt.set_default_impl("butterfly")
