"""Dual-limb RNS (CRT) ring arithmetic for moduli beyond 28 bits.

The reference's default NATIVE_SIZE=64 build runs six parameter sets with
numberBits in 29..50 (STD256, STD192, STD192Q, STD192Q_3, STD128Q_4,
STD192Q_4 — binfhecontext.cpp:91-146) on a single ~2^50 prime Q held in a
64-bit word. TPU vector lanes are 32-bit, so the TPU-native answer is the
one the reference itself ships for big moduli in its lattice layer: an RNS
tower (DCRTPoly, lattice/hal/default/dcrtpoly.h) — here a PAIR of NTT
friendly <=28-bit primes q1*q2 = Q_eff >= 2^numberBits.

Every per-limb operation (NTT, pointwise mul, monomial multiply,
automorphism) reuses the existing exact u32/s8-MXU machinery unchanged,
with a limb axis [..., L, N] directly before the coefficient axis. The
only genuinely new math:

  * Garner/mixed-radix recombination x = x1 + q1 * ((x2-x1)/q1 mod q2)
    producing the centered integer value in int64 lanes (|x| < 2^55;
    XLA emulates s64 on TPU — exact, and only on the decompose path),
  * exact balanced digit extraction from that value (same digit semantics
    as ops.decompose against the composite Q_eff),
  * the Q_eff -> qKS ModSwitch rounding, whose product c*qKS needs ~72
    bits: computed host-side with exact python-int numpy (the tail is a
    [B, N] array per gate batch — microseconds next to the rotation).

This is NOT bit-exact with the reference at these sets (the reference
uses a single prime Q; we use a composite of the same magnitude — the
scheme is modulus-agnostic, correctness is verified end-to-end by gate
truth tables and noise margins instead of oracle vectors; see
tests/test_rns_bigq.py).
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .modmath import I32, I64
from .ntt import (
    NTTTables, first_prime, is_prime, make_ntt_tables, ntt_fwd,
    ntt_inv, previous_prime,
)


def pick_limbs(number_bits: int, cycl_order: int) -> tuple[int, int]:
    """Two distinct NTT-friendly primes (== 1 mod cyclOrder) whose product
    is a MINIMAL cover of 2^number_bits (both limbs <= 28 bits, the
    u32-kernel ceiling).

    Splitting the bit budget as ceil/floor halves and taking FirstPrime
    at each half guarantees q1*q2 >= 2^b1 * 2^b2 = 2^number_bits with no
    slack bump — the composite stays within ~1 bit of the reference's
    single prime, so derived quantities (digits_g in particular) match
    the NATIVE_SIZE=64 build's (r5: the +2/+3-slack split used through
    r4 produced a 53-bit cover for STD128Q_4's 50-bit requirement and
    inflated digits_g to 3 vs the reference's 2 — a 33% rotation-work
    parity gap caught by oracle/vectors/std128q4_64)."""
    if number_bits > 54:
        raise NotImplementedError(
            f"number_bits={number_bits} > 54 exceeds the dual-limb design")
    b1 = -(-number_bits // 2)
    hi = 1 << number_bits
    best = None
    # search a few q1 candidates upward from 2^ceil(nb/2); for each take
    # the largest NTT-friendly q2 with q1*q2 < 2^nb, and keep the pair
    # whose composite is closest below 2^nb (NTT-friendly primes are
    # sparse at small bit sizes, so a single greedy pick can undershoot)
    q1 = first_prime(b1, cycl_order)
    for _ in range(32):
        if q1 >= (1 << 28):
            break
        q2_max = (hi - 1) // q1
        q2 = q2_max - ((q2_max - 1) % cycl_order)
        while q2 >= 3 and (q2 == q1 or not is_prime(q2)):
            q2 -= cycl_order
        if q2 >= 3:
            prod = q1 * q2
            if best is None or prod > best[0]:
                best = (prod, q1, q2)
            if prod * 2 > hi:       # within 1 bit of the target: done
                break
        q1 += cycl_order
        while not is_prime(q1):
            q1 += cycl_order
    if best is None or best[0] * 2 <= hi:
        raise NotImplementedError(
            f"no dual-limb cover near 2^{number_bits} with both limbs "
            f"< 2^28 for cyclOrder={cycl_order}")
    _, q1, q2 = best
    assert (1 << (number_bits - 1)) < q1 * q2 < hi and q1 != q2
    return q1, q2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("tables",),
    meta_fields=("Q", "limbs", "inv_q1_mod_q2"),
)
@dataclass(frozen=True)
class RNSTables:
    """Per-limb NTT tables + Garner constants for one composite modulus.

    A pytree (like NTTTables): the per-limb twiddle bundles are data
    leaves, the moduli stay static python ints across jit boundaries."""

    tables: tuple          # (NTTTables, NTTTables)
    Q: int                 # q1 * q2
    limbs: tuple           # (q1, q2)
    inv_q1_mod_q2: int     # q1^-1 mod q2 (Garner step)


def make_rns_tables(N: int, limbs: tuple[int, int]) -> RNSTables:
    q1, q2 = limbs
    return RNSTables(
        tables=tuple(make_ntt_tables(N, q) for q in limbs),
        Q=q1 * q2,
        limbs=tuple(limbs),
        inv_q1_mod_q2=pow(q1, -1, q2),
    )


# ----------------------------------------------------------------- residues

def to_residues(v, limbs) -> np.ndarray:
    """Host: integer array (any width, python ints allowed) ->
    [..., L, N] int32 residues."""
    v = np.asarray(v, dtype=object)
    out = [np.asarray(v % q, np.int64) for q in limbs]
    return np.stack(out, axis=-2).astype(np.int32)


def scalar_residues(c: int, limbs) -> np.ndarray:
    """[L] int32 residues of one python int."""
    return np.asarray([c % q for q in limbs], np.int32)


# ------------------------------------------------------- per-limb transforms

def rns_ntt_fwd(rt: RNSTables, a):
    """a: [..., L, N] COEFF -> EVAL, per limb."""
    outs = [ntt_fwd(rt.tables[i], a[..., i, :]) for i in range(len(rt.limbs))]
    return jnp.stack(outs, axis=-2)


def rns_ntt_inv(rt: RNSTables, a):
    outs = [ntt_inv(rt.tables[i], a[..., i, :]) for i in range(len(rt.limbs))]
    return jnp.stack(outs, axis=-2)


def rns_host_ntt_fwd(rt: RNSTables, a: np.ndarray) -> np.ndarray:
    from .ntt import host_ntt_fwd

    outs = [host_ntt_fwd(rt.tables[i], a[..., i, :])
            for i in range(len(rt.limbs))]
    return np.stack(outs, axis=-2)


def rns_add(rt: RNSTables, a, b):
    q = jnp.asarray(np.asarray(rt.limbs, np.int32)[:, None])
    s = a + b
    return jnp.where(s >= q, s - q, s)


def rns_sub(rt: RNSTables, a, b):
    q = jnp.asarray(np.asarray(rt.limbs, np.int32)[:, None])
    d = a - b
    return jnp.where(d < 0, d + q, d)


# ------------------------------------------------------ Garner recombination

def garner_centered(rt: RNSTables, x):
    """x: [..., L, N] int32 residues -> int64 centered values in
    (-Q/2, Q/2]. Exact: q1*q2 < 2^56 fits s64 (emulated on TPU lanes)."""
    q1, q2 = rt.limbs
    x1 = x[..., 0, :].astype(I64)
    x2 = x[..., 1, :].astype(I64)
    y = ((x2 - x1) * rt.inv_q1_mod_q2) % q2        # s64 exact: < 2^55
    v = x1 + q1 * y                                # in [0, Q)
    return jnp.where(v > rt.Q >> 1, v - rt.Q, v)


def rns_signed_digits_u32(rt: RNSTables, x, base: int, digits: int):
    """All-u32 form of rns_signed_digits (r5): Garner on u32 lanes with a
    constant-companion Shoup, the wide value kept as a (hi, lo) u32 pair,
    and the balanced digit chain run in two's-complement pair arithmetic.
    TPU VPUs have no 64-bit lanes — the s64 form below costs ~30x per op
    in emulation and dominated the r4 RNS step (tools/rns_probe.json).

    x: [..., L, N] canonical residues -> [digits, ..., N] int32 balanced
    digits of the CENTERED value, low digit dropped (identical outputs to
    rns_signed_digits)."""
    from .modmath import (
        U32, barrett_reduce_u32, mulhi_u32, reduce_once_u32,
        shoup_mul_lazy_u32)

    assert base & (base - 1) == 0 and base <= (1 << 25)
    q1, q2 = rt.limbs
    Q = rt.Q
    inv = rt.inv_q1_mod_q2
    invsh = (inv << 32) // q2
    x1 = x[..., 0, :].astype(U32)
    x2 = x[..., 1, :].astype(U32)

    # y = (x2 - x1) * q1^-1 mod q2
    x1m = barrett_reduce_u32(x1, q2)
    t = x2 + U32(q2) - x1m                       # < 2^29, congruent
    y = reduce_once_u32(
        shoup_mul_lazy_u32(t, U32(inv), U32(invsh), q2), q2)

    # v = x1 + q1*y as a u32 (hi, lo) pair; v in [0, Q), Q < 2^56
    # (carry from the low word: it wrapped iff lo < x1)
    lo = x1 + y * U32(q1)
    hi = mulhi_u32(y, U32(q1)) + (lo < x1).astype(U32)

    # center: v > Q/2 -> v - Q (two's complement pair arithmetic)
    Qh = Q >> 1
    qh_hi, qh_lo = U32(Qh >> 32), U32(Qh & 0xFFFFFFFF)
    q_hi, q_lo = U32(Q >> 32), U32(Q & 0xFFFFFFFF)
    gt = (hi > qh_hi) | ((hi == qh_hi) & (lo > qh_lo))
    borrow = (lo < q_lo).astype(U32)
    lo = jnp.where(gt, lo - q_lo, lo)
    hi = jnp.where(gt, hi - q_hi - borrow, hi)

    half = base // 2
    mask = U32(base - 1)
    g = base.bit_length() - 1
    outs = []
    for it in range(digits + 1):                 # iteration 0 is dropped
        r = (((lo + U32(half)) & mask).astype(I32) - half)   # [-B/2, B/2)
        ru = r.astype(U32)
        lo2 = lo - ru                            # wrap = 2s-complement sub
        # borrow/carry into hi: r>=0 and lo<r -> borrow; r<0 (subtracting
        # a negative = adding) and lo2<lo (wrapped) -> carry
        hi = hi - ((r >= 0) & (lo < ru)).astype(U32) \
                + ((r < 0) & (lo2 < lo)).astype(U32)
        # (v - r) >> g, arithmetic shift in the high word
        lo = (lo2 >> U32(g)) | (hi << U32(32 - g))
        hi = (hi.astype(I32) >> g).astype(U32)
        if it > 0:
            outs.append(r.astype(I32))
    return jnp.stack(outs, axis=0)


def rns_signed_digits(rt: RNSTables, x, base: int, digits: int):
    """Approximate balanced decomposition of [..., L, N] residues against
    the composite Q_eff: centered lift, DROP the first digit, emit `digits`
    balanced digits as int32 in [-base/2, base/2) (same semantics as
    ops.decompose.signed_digit_decompose with signed=True)."""
    assert base & (base - 1) == 0, \
        f"rns_signed_digits requires a power-of-2 base (got {base})"
    half_base = base // 2
    mask = base - 1
    gbits = base.bit_length() - 1

    d = garner_centered(rt, x)

    def extract(d):
        r = ((d + half_base) & mask) - half_base
        return r, (d - r) >> gbits

    r, d = extract(d)      # dropped low digit
    outs = []
    for _ in range(digits):
        r, d = extract(d)
        outs.append(r.astype(I32))
    return jnp.stack(outs, axis=0)     # [digits, ..., N]


def rns_mulsum_u32(rt: RNSTables, x, y, axis: int):
    """sum over `axis` of (x * y) mod q_l, per limb, ALL-u32 (r5).

    x, y: broadcast-compatible [..., L, N] canonical residue arrays
    (every limb < 2^28); returns int32 [..., L, N] with `axis` reduced.
    Replaces the emulated-s64 `(x.astype(I64)*y).sum % q` pattern that
    dominated the r4 RNS accumulators (TPU VPUs have no 64-bit lanes)."""
    from .modmath import U32, barrett_reduce_u32, mulmod_u32

    outs = []
    for li, ql in enumerate(rt.limbs):
        xl = x[..., li, :].astype(U32)
        yl = y[..., li, :].astype(U32)
        p = mulmod_u32(xl, yl, ql)            # canonical [0, ql)
        s = p.sum(axis=axis)                  # < D*ql < 2^32 for D <= 16
        outs.append(barrett_reduce_u32(s, ql).astype(I32))
    return jnp.stack(outs, axis=-2)


def rns_digits_to_eval(rt: RNSTables, dig):
    """Balanced digits [D, ..., N] (small ints) -> EVAL residues
    [D, ..., L, N]: lift per limb then per-limb NTT."""
    outs = []
    for i, q in enumerate(rt.limbs):
        d = jnp.where(dig < 0, dig + q, dig)
        outs.append(ntt_fwd(rt.tables[i], d))
    return jnp.stack(outs, axis=-2)


# ------------------------------------------------------------- ModSwitch tail

def host_round_switch(Q: int, v_centered: np.ndarray, q_to: int) -> np.ndarray:
    """round-half-up((v * q_to) / Q) mod q_to on the host, exact.

    v_centered: int64 centered values (the rounding is shift-invariant mod
    q_to, so the centered representative gives the same result as the
    [0, Q) one — floor((v + dQ) * q_to / Q + 1/2) = floor(v*q_to/Q + 1/2)
    + d*q_to). The product needs up to ~73 bits -> exact python-int numpy
    (object dtype); the arrays here are ciphertext-sized, not key-sized."""
    v = np.asarray(v_centered).astype(object)
    out = ((v * int(q_to) * 2 + int(Q)) // (2 * int(Q))) % int(q_to)
    return out.astype(np.int64)


def host_garner_centered(Q: int, limbs, inv_q1_mod_q2: int,
                         x: np.ndarray) -> np.ndarray:
    """Host twin of garner_centered: [..., L, N] residues (any int dtype)
    -> int64 centered values."""
    q1, q2 = limbs
    x1 = np.asarray(x[..., 0, :], np.int64)
    x2 = np.asarray(x[..., 1, :], np.int64)
    y = ((x2 - x1) * inv_q1_mod_q2) % q2
    v = x1 + q1 * y
    return np.where(v > Q >> 1, v - Q, v)
