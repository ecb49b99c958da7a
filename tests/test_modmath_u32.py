"""Exactness of the pure-u32 modular arithmetic (ops/modmath.py) used on
every TPU hot path — adversarial operands at the modulus edges."""

import pytest as _pytest

pytestmark = _pytest.mark.smoke

import numpy as np
import jax.numpy as jnp

from mkfhe_tpu.ops.modmath import (
    U32, barrett_reduce_u32, mulhi_u32, mulmod_u32, shoup_mul_lazy_u32)
from mkfhe_tpu.ops.ntt import first_prime, previous_prime


def _edge_values(q, rng, n):
    vals = np.concatenate([
        np.array([0, 1, 2, q - 1, q - 2, q // 2, q // 2 + 1]),
        rng.integers(0, q, n),
    ])
    return vals.astype(np.uint32)


def test_mulhi_u32():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        np.array([0, 1, 0xFFFFFFFF, 0x80000000, 0x7FFFFFFF]),
        rng.integers(0, 1 << 32, 4096),
    ]).astype(np.uint32)
    y = np.concatenate([
        np.array([0xFFFFFFFF, 0x80000000, 1, 0, 0xFFFF0001]),
        rng.integers(0, 1 << 32, 4096),
    ]).astype(np.uint32)
    got = np.asarray(mulhi_u32(jnp.asarray(x), jnp.asarray(y)))
    want = ((x.astype(np.uint64) * y.astype(np.uint64)) >> np.uint64(32)
            ).astype(np.uint32)
    assert np.array_equal(got, want)


def test_shoup_and_barrett_and_mulmod():
    rng = np.random.default_rng(1)
    for q in (134176769, previous_prime(first_prime(27, 4096), 4096),
              (1 << 28) - 57, 12289):
        x = _edge_values(q, rng, 2048)
        y = _edge_values(q, rng, 2048)
        ysh = ((y.astype(np.uint64) << np.uint64(32)) // np.uint64(q)
               ).astype(np.uint32)
        want = (x.astype(np.uint64) * y.astype(np.uint64) % q
                ).astype(np.uint32)

        lazy = np.asarray(shoup_mul_lazy_u32(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(ysh), q))
        assert lazy.max() < 2 * q
        assert np.array_equal(lazy % q, want)

        # shoup holds for ANY u32 x (not just x < q)
        xbig = rng.integers(0, 1 << 32, 4096).astype(np.uint32)
        lazy2 = np.asarray(shoup_mul_lazy_u32(
            jnp.asarray(xbig), jnp.asarray(y[:1]), jnp.asarray(ysh[:1]), q))
        assert lazy2.max() < 2 * q
        assert np.array_equal(
            lazy2 % q,
            (xbig.astype(np.uint64) * int(y[0]) % q).astype(np.uint32))

        r = np.concatenate([
            np.array([0, q - 1, q, 2 * q - 1, 0xFFFFFFFF]),
            rng.integers(0, 1 << 32, 4096)]).astype(np.uint32)
        red = np.asarray(barrett_reduce_u32(jnp.asarray(r), q))
        assert np.array_equal(red, (r % np.uint32(q)))

        mm = np.asarray(mulmod_u32(jnp.asarray(x), jnp.asarray(y), q))
        assert np.array_equal(mm, want)
