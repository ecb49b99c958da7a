"""Exact modular arithmetic primitives over int32 lanes.

All ring/vector elements are int32 in [0, Q) with Q < 2**28 (the reference
builds with NATIVE_SIZE=32, MAX_MODULUS_SIZE=28 — basicint.h:56-61).
Products use int64 intermediates; XLA lowers these to 32-bit pairs on TPU.
A Pallas kernel path with explicit 16-bit-limb Montgomery arithmetic is the
planned optimization for the hottest call sites.

Conventions:
  * `q` arguments are python ints (static under jit) unless noted.
  * results are int32 in [0, q).
"""

import jax.numpy as jnp

I32 = jnp.int32
I64 = jnp.int64


def mod_add(a, b, q: int):
    """(a + b) mod q for a, b in [0, q). Single conditional subtract."""
    s = a + b  # < 2q <= 2**29, no overflow in int32
    return jnp.where(s >= q, s - q, s)


def mod_sub(a, b, q: int):
    d = a - b
    return jnp.where(d < 0, d + q, d)


def mod_neg(a, q: int):
    return jnp.where(a == 0, a, q - a)


def mod_mul(a, b, q: int):
    """(a * b) mod q via int64 intermediate."""
    t = a.astype(I64) * b.astype(I64)
    return (t % q).astype(I32)


def mod_mul_scalar(a, s, q: int):
    """a * s mod q where s may be a traced scalar."""
    t = a.astype(I64) * jnp.asarray(s, I64)
    return (t % q).astype(I32)


def to_signed(a, q: int):
    """Lift [0, q) to the balanced representative in (-q/2, q/2]."""
    half = q >> 1
    return jnp.where(a.astype(I64) > half, a.astype(I64) - q, a.astype(I64))


def from_signed(a, q: int):
    """Map signed int64 back to [0, q)."""
    return jnp.where(a < 0, a + q, a).astype(I32)


def round_q_Q(v, q: int, Q: int):
    """RoundqQ(v) = floor(0.5 + v*q/Q) mod q  (lwe-pke.cpp:42-47).

    The reference computes this in double precision; exact for Q < 2**28
    since v*q fits 2**56 and we emulate round-half-up in integers:
    floor(0.5 + vq/Q) = floor((2vq + Q) / (2Q)).
    """
    t = v.astype(I64) * q
    r = (2 * t + Q) // (2 * Q)
    return (r % q).astype(I32)


def switch_modulus(a, q_from: int, q_to: int):
    """NativeVector::SwitchModulus semantics (mubintvecnat): map value x to
    x mod q_to if x <= q_from/2 else q_to - ((q_from - x) mod q_to).

    I.e. preserve the *signed* representative, then reduce mod the new
    modulus. Used when reinterpreting secret keys / F^-1 columns at a
    different modulus.
    """
    s = to_signed(a, q_from)
    # jnp % follows python semantics: result in [0, q_to) even for s < 0
    return (s % q_to).astype(I32)


def barrett_mul(a, b, q: int, mu: int | None = None):
    """Barrett (a*b) mod q. `mu = floor(2**56 / q)` precomputable.

    Kept for the Pallas port; the int64-`%` path above is what XLA sees
    today and compiles to comparable code.
    """
    if mu is None:
        mu = (1 << 56) // q
    t = a.astype(I64) * b.astype(I64)
    est = ((t >> 27) * mu) >> 29
    r = t - est * q
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    return r.astype(I32)
