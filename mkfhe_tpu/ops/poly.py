"""Ring-element operations on EVAL/COEFF arrays.

TPU re-design of PolyImpl (lattice/hal/default/poly.h): monomial multiply
and automorphism are pure gathers on the EVAL representation, using the
slot-exponent map recovered in NTTTables — no 2N x N monomial table needed
(the reference precomputes all X^m - 1 polys, mk-cryptoparameters.cpp:53-70).
"""

import jax.numpy as jnp

from .modmath import I32, mod_sub
from .ntt import NTTTables, eval_mul  # noqa: F401  (re-export)


def monomial_eval(tables: NTTTables, c):
    """EVAL image of X^c for (possibly traced, possibly batched) integer c
    in [0, 2N). c shape [...] -> result [..., N].

    slot j of X^c = psi^{e_j * c mod 2N}; X^{N+i} = -X^i holds automatically.
    """
    twoN = 2 * tables.N
    c = jnp.asarray(c, jnp.int64)[..., None]
    idx = (tables.slot_exp.astype(jnp.int64) * c) % twoN
    return tables.psi_pows[idx]


def monomial_minus_one_eval(tables: NTTTables, c):
    """EVAL image of X^c - 1 (the reference's GetMonomial table entries).

    On the MXU backends this is a one-hot s8 matmul against the
    precomputed [2N, N] monomial table (exact; see ntt.
    monomial_minus_one_mxu) — measured ~35x faster than the dynamic
    slot-exponent gather, which dominates the whole blind-rotation step
    on real TPUs. The butterfly (CPU) backend keeps the gather.
    """
    from . import ntt as _ntt

    if _ntt._DEFAULT_IMPL in ("mxu", "mxu_s8"):
        return _ntt.monomial_minus_one_mxu(tables, jnp.asarray(c))
    one = jnp.ones((), I32)
    return mod_sub(monomial_eval(tables, c), one, tables.Q)


def automorphism_eval(tables: NTTTables, a, t):
    """X -> X^t automorphism in EVAL format (t odd, possibly traced and
    batched: t [...] applies per-row to a [..., N]).

    p'(psi^{e_j}) = p(psi^{e_j * t}); a pure gather. Matches
    PolyImpl::AutomorphismTransform on EVALUATION format
    (poly-impl.h:344-366) up to the internal slot ordering.
    """
    twoN = 2 * tables.N
    t = jnp.asarray(t, jnp.int64)
    if t.ndim == 0:
        src_exp = (tables.slot_exp.astype(jnp.int64) * t) % twoN
        perm = tables.exp_to_slot[src_exp]
        return jnp.take(a, perm, axis=-1)
    src_exp = (tables.slot_exp.astype(jnp.int64) * t[..., None]) % twoN
    perm = tables.exp_to_slot[src_exp]          # [..., N]
    return jnp.take_along_axis(a, perm, axis=-1)


def transpose_eval(tables: NTTTables, a):
    """PolyImpl::Transpose(): automorphism by 2N-1, i.e. X -> X^-1
    (poly-interface.h:443-450)."""
    return automorphism_eval(tables, a, 2 * tables.N - 1)


def automorphism_coeff(tables: NTTTables, a, t):
    """X -> X^t automorphism in COEFF format (gather + sign flip).

    out[(j*t) mod N] = +/- a[j] with sign from floor(j*t / N) parity.
    Implemented as a gather: out[i] = sign * a[j(i)] with j(i) = i * t^-1.
    """
    N = tables.N
    twoN = 2 * N
    t = jnp.asarray(t, jnp.int64)
    # t^-1 mod 2N via Newton (t odd); 5 iterations exact for 2N <= 2**32
    inv = t
    for _ in range(5):
        inv = (inv * (2 - t * inv)) % twoN
    i = jnp.arange(N, dtype=jnp.int64)
    ji = (i * inv) % twoN
    neg = ji >= N
    src = jnp.where(neg, ji - N, ji)
    vals = jnp.take(a, src, axis=-1)
    return jnp.where(neg, mod_sub(jnp.zeros((), I32), vals, tables.Q), vals)


def monomial_minus_one_shoup(tables: NTTTables, c):
    """(X^c - 1) EVAL values together with their uint32 Shoup companions —
    both pure gathers from precomputed tables, enabling shoup_mul against
    dynamic operands on the hot path. c: [...] -> ([..., N], [..., N])."""
    twoN = 2 * tables.N
    c = jnp.asarray(c, jnp.int64)[..., None]
    idx = (tables.slot_exp.astype(jnp.int64) * c) % twoN
    return tables.pm1[idx], tables.pm1_sh[idx]
