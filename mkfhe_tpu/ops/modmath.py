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

    The reference computes this in double precision; exact here in
    integers: floor(0.5 + vq/Q) = floor((2vq + Q) / (2Q)), valid while
    2*v*q fits s64. Beyond that (the qKS=2^35 large-precision profile,
    binfhecontext.cpp:66) both moduli are powers of two and the rounding
    collapses to an exact shift.
    """
    if Q.bit_length() + q.bit_length() > 61:
        if (Q & (Q - 1)) == 0 and (q & (q - 1)) == 0 and Q > q:
            sh = Q.bit_length() - q.bit_length()
            r = (v.astype(I64) + (1 << (sh - 1))) >> sh
            return (r % q).astype(I32)
        raise NotImplementedError(
            f"RoundqQ overflow: Q={Q}, q={q} need a wide path")
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


def exact_mod_matmul(a, b, q: int, a_bits: int, b_bits: int = None):
    """(a @ b) mod q computed EXACTLY via bf16 MXU passes.

    a: int32 [..., K] with values in [0, 2**a_bits); b: int32 [K, N] or
    batched [..., K, N] matching a's leading dims; returns int32 [..., N].

    TPU has no s64 dot (the X64 rewrite rejects s64 dot_general), so b is
    split into limbs small enough that every bf16xbf16->f32 MXU pass
    accumulates exactly (sum_K a*limb < 2**24, bf16 exact for ints < 256):
    limb_bits chosen so a_bits + limb_bits + log2(K) <= 24.
    """
    import math

    K = a.shape[-1]
    if b_bits is None:
        b_bits = max(1, int(math.ceil(math.log2(q))))
    limb_bits = 24 - a_bits - int(math.ceil(math.log2(K)))
    limb_bits = min(limb_bits, 8)   # bf16 integer-exactness bound (2**8)
    if limb_bits < 1:
        raise ValueError("operands too wide for exact bf16 passes")
    n_limbs = -(-b_bits // limb_bits)
    mask = (1 << limb_bits) - 1

    a16 = a.astype(jnp.bfloat16)
    acc = None
    for l in range(n_limbs):
        limb = ((b >> (l * limb_bits)) & mask).astype(jnp.bfloat16)
        part = jnp.matmul(a16, limb, preferred_element_type=jnp.float32)
        part = part.astype(I64) * pow(2, l * limb_bits, q)
        acc = part if acc is None else acc + part
    return (acc % q).astype(I32)


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


# ---------------------------------------------------- pure-u32 arithmetic
#
# TPU VPUs have no 64-bit lanes: XLA emulates every s64/u64 op as a long
# 32-bit sequence, and inside lax.scan bodies this dominates the whole
# MKNTRU gate (measured 0.02-0.08 Gmulmod/s for the s64 `%` path vs
# 1.0-1.2 G for the u32 forms below — tools/tpu_session5.py). The hot paths
# therefore use ONLY u32 ops: mulhi via 16-bit partial products, Shoup
# multiplication where one operand is precomputed, Barrett reduction for
# dynamic x dynamic products. All are exact for q < 2**28.

U32 = jnp.uint32


def mulhi_u32(x, y):
    """floor(x * y / 2^32) for uint32 x, y — four 16x16 partial products,
    no 64-bit types anywhere."""
    xl = x & U32(0xFFFF)
    xh = x >> U32(16)
    yl = y & U32(0xFFFF)
    yh = y >> U32(16)
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    mid = (ll >> U32(16)) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
    return hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))


def shoup_mul_lazy_u32(x, y, ysh, q: int):
    """x*y mod q in [0, 2q), all-u32 Shoup. x: ANY uint32 (the classic
    w=32 analysis bounds the error for every x < 2^32); y < q with
    precomputed companion ysh = floor(y*2^32/q)."""
    q_est = mulhi_u32(x, ysh)
    return x * y - q_est * U32(q)


def barrett_reduce_u32(r, q: int):
    """r mod q -> [0, q) for ANY uint32 r, via mu = floor(2^32/q):
    r - mulhi(r, mu)*q lands in [0, 3q); two conditional subtracts."""
    mu = U32((1 << 32) // q)
    t = r - mulhi_u32(r, mu) * U32(q)
    t = jnp.where(t >= U32(2 * q), t - U32(2 * q), t)
    return jnp.where(t >= U32(q), t - U32(q), t)


def mulmod_u32(a, b, q: int):
    """(a * b) mod q -> [0, q) for a, b uint32 in [0, 2^28) — full 56-bit
    product as (hi, lo) u32 pair, reduced with constant-companion Shoup on
    hi (by 2^32 mod q) + Barrett on lo. ~29 VPU ops, no 64-bit types."""
    hi = mulhi_u32(a, b)             # < 2^24
    lo = a * b                       # low 32 bits (wrapping)
    r2 = (1 << 32) % q
    r2sh = (r2 << 32) // q
    t = shoup_mul_lazy_u32(hi, U32(r2), U32(r2sh), q)   # [0, 2q)
    mu = U32((1 << 32) // q)
    lo_red = lo - mulhi_u32(lo, mu) * U32(q)            # [0, 3q)
    s = t + lo_red                                      # < 5q < 2^31
    return barrett_reduce_u32(s, q)


def reduce_once_u32(r, q: int):
    """[0, 2q) -> [0, q) single conditional subtract."""
    return jnp.where(r >= U32(q), r - U32(q), r)


# ------------------------------------------------------------------- Shoup

def shoup_precompute(y, q: int):
    """floor(y * 2^32 / q) as uint32 for Shoup multiplication. y: any
    int array with values in [0, q). Host-side (numpy in, numpy out)."""
    import numpy as np

    return ((np.asarray(y, np.uint64) << np.uint64(32)) //
            np.uint64(q)).astype(np.uint32)


def shoup_mul(x, y, y_sh, q: int):
    """(x * y) mod q with precomputed y_sh = floor(y*2^32/q) — ONE u64
    multiply (for mulhi) + two u32 multiplies instead of an emulated s64
    mul + s64 constant-division chain. Exact for x, y in [0, q), q < 2^31.

    r = x*y - floor(x*y_sh / 2^32)*q  lies in [0, 2q) (Shoup's bound), so
    the low 32 bits of the wrapped u32 arithmetic recover it exactly.
    """
    xu64 = x.astype(jnp.uint64)
    q_est = ((xu64 * y_sh.astype(jnp.uint64)) >> jnp.uint64(32)).astype(
        jnp.uint32)
    lo = (x.astype(jnp.uint32) * y.astype(jnp.uint32)
          - q_est * jnp.uint32(q))
    r = lo.astype(I32)           # < 2q < 2^29: sign-safe
    return jnp.where(r >= q, r - q, r)
