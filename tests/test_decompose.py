import pytest as _pytest

pytestmark = _pytest.mark.smoke

import numpy as np
import jax.numpy as jnp

from mkfhe_tpu.ops.decompose import (
    base_digits_unsigned,
    signed_digit_decompose,
    signed_digit_decompose_pair,
)

RNG = np.random.default_rng(7)


def ref_signed_decompose(vals, q, base, digits):
    """Direct transcription of mk-acc.cpp:54-80 for testing."""
    gbits = base.bit_length() - 1
    out = np.zeros((digits, len(vals)), dtype=np.int64)
    for k, t0 in enumerate(vals):
        d0 = int(t0) if t0 < q // 2 else int(t0) - q
        r0 = ((d0 + base // 2) % base) - base // 2
        d0 = (d0 - r0) >> gbits
        for d in range(digits):
            r0 = ((d0 + base // 2) % base) - base // 2
            d0 = (d0 - r0) >> gbits
            out[d, k] = r0 + q if r0 < 0 else r0
    return out


def test_signed_decompose_matches_reference_semantics():
    q = 134215681  # 27-bit prime
    base = 512
    digits = 2
    vals = np.concatenate(
        [
            RNG.integers(0, q, size=100),
            np.array([0, 1, q - 1, q // 2, q // 2 + 1, base, base - 1]),
        ]
    )
    got = signed_digit_decompose(jnp.asarray(vals, jnp.int32), q, base, digits)
    want = ref_signed_decompose(vals, q, base, digits)
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_recomposition_error_bound():
    """sum_d digit_d * B^(d+1) must equal the input up to the dropped digit
    (|err| <= B/2 * B = B^2/2 in balanced form)."""
    q = 134215681
    base = 512
    digits = 2
    vals = RNG.integers(0, q, size=1000)
    dig = np.asarray(
        signed_digit_decompose(jnp.asarray(vals, jnp.int32), q, base, digits),
        np.int64,
    )
    recomposed = np.zeros(len(vals), dtype=np.int64)
    for d in range(digits):
        recomposed += dig[d] * base ** (d + 1)
    err = (recomposed - vals) % q
    err = np.where(err > q // 2, err - q, err)
    assert np.abs(err).max() <= base // 2 + 1


def test_pair_interleaving():
    q = 134215681
    base = 512
    digits = 2
    a0 = RNG.integers(0, q, size=(16,))
    a1 = RNG.integers(0, q, size=(16,))
    got = signed_digit_decompose_pair(
        jnp.asarray(a0, jnp.int32), jnp.asarray(a1, jnp.int32), q, base, digits
    )
    d0 = ref_signed_decompose(a0, q, base, digits)
    d1 = ref_signed_decompose(a1, q, base, digits)
    np.testing.assert_array_equal(np.asarray(got[0::2], np.int64), d0)
    np.testing.assert_array_equal(np.asarray(got[1::2], np.int64), d1)


def test_unsigned_digits():
    q = 45181
    base = 32
    digits = 4  # ceil(log_32(45181)) = 4? log: 32^3=32768 < 45181 -> 4
    vals = RNG.integers(0, q, size=50)
    got = np.asarray(
        base_digits_unsigned(jnp.asarray(vals, jnp.int32), base, digits),
        np.int64,
    )
    recomposed = sum(got[d] * base**d for d in range(digits))
    np.testing.assert_array_equal(recomposed, vals)
