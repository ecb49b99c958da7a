"""Negacyclic NTT/INTT over Z_Q[X]/(X^N + 1).

TPU-native re-design of the reference's ChineseRemainderTransformFTT
(transformnat-impl.h:124-400): the psi-twisted Cooley-Tukey forward /
Gentleman-Sande inverse butterflies, fully vectorized over a leading batch
dimension. Each of the log2(N) stages is a reshape + one modular multiply +
add/sub over the whole [..., N] array — ideal VPU shape, and trivially
batched: callers stack as many polynomials as possible in leading dims.

Representation:
  * COEFF:  a[..., j] = coefficient of X^j, int32 in [0, Q)
  * EVAL:   bit-reversed-order evaluations at odd powers of psi (the
    2N-th primitive root), exactly like the reference's EVALUATION format,
    so pointwise multiply in EVAL == negacyclic convolution in COEFF.

Forward: natural-order input -> bit-reversed output (CT butterflies with
psi powers folded in). Inverse: bit-reversed input -> natural output
(GS butterflies), with N^-1 folded into the last stage's twiddles.

Tables are small (N int32 per direction) and precomputed host-side in
`NTTTables`, mirroring transformnat PreCompute (transformnat.h:331).
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .modmath import I32, I64, mod_add, mod_sub


# ---------------------------------------------------------------- host-side

def is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def first_prime(bits: int, m: int) -> int:
    """Smallest prime >= 2**bits with p == 1 (mod m) (nbtheory FirstPrime)."""
    lo = 1 << bits
    r = lo % m
    p = lo + ((1 - r) % m)
    while not is_prime(p):
        p += m
    return p


def previous_prime(p: int, m: int) -> int:
    """Largest prime < p with p == 1 (mod m) (nbtheory PreviousPrime)."""
    p -= m
    while not is_prime(p):
        p -= m
    return p


def first_prime_above(p: int, m: int) -> int:
    """Smallest prime > p with p == 1 (mod m) (nbtheory NextPrime)."""
    p += m
    while not is_prime(p):
        p += m
    return p


def _primitive_root(q: int) -> int:
    """Smallest generator of Z_q^* for prime q."""
    fac = []
    n = q - 1
    d = 2
    while d * d <= n:
        if n % d == 0:
            fac.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        fac.append(n)
    for g in range(2, q):
        if all(pow(g, (q - 1) // f, q) != 1 for f in fac):
            return g
    raise ValueError("no generator")


def root_of_unity(order: int, q: int) -> int:
    """A primitive `order`-th root of unity mod prime q (q == 1 mod order)."""
    assert (q - 1) % order == 0
    g = _primitive_root(q)
    return pow(g, (q - 1) // order, q)


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("psi_brv", "ipsi_brv", "brv", "psi_pows", "slot_exp",
                 "exp_to_slot", "pm1", "pm1_sh"),
    meta_fields=("N", "Q", "n_inv"),
)
@dataclass(frozen=True)
class NTTTables:
    """Precomputed twiddles for one (N, Q) pair.

    Registered as a pytree with (N, Q, n_inv) as static metadata so a table
    bundle can cross jit boundaries while moduli stay python ints.
    """

    N: int                 # static
    Q: int                 # static
    n_inv: int             # N^-1 mod Q (static python int)
    psi_brv: jnp.ndarray   # [N] psi powers in bit-reversed order (CT fwd)
    ipsi_brv: jnp.ndarray  # [N] psi^-1 powers in bit-reversed order (GS inv)
    brv: jnp.ndarray       # [N] bit-reversal permutation
    psi_pows: jnp.ndarray  # [2N] psi^i — monomial evaluation helper
    slot_exp: jnp.ndarray  # [N] e_j: EVAL slot j holds p(psi^{e_j})
    exp_to_slot: jnp.ndarray  # [2N] inverse map (odd exponents -> slot)
    pm1: jnp.ndarray       # [2N] (psi^i - 1) mod Q — X^c-1 gather values
    pm1_sh: jnp.ndarray    # [2N] uint32 Shoup companions of pm1


def _np_ntt_fwd_1(a: np.ndarray, psi_brv: np.ndarray, N: int, Q: int):
    """Pure-numpy forward NTT of one vector (table construction only —
    must not touch jax so it can run from inside a jit trace)."""
    x = a.astype(np.int64).copy()
    t = N
    m = 1
    while m < N:
        t //= 2
        x = x.reshape(m, 2, t)
        w = psi_brv[m: 2 * m].reshape(m, 1)
        u = x[:, 0, :]
        v = x[:, 1, :] * w % Q
        x = np.stack([(u + v) % Q, (u - v) % Q], axis=1)
        m *= 2
    return x.reshape(N)


def _np_ntt_inv_1(a: np.ndarray, ipsi_brv: np.ndarray, N: int, Q: int,
                  n_inv: int):
    x = a.astype(np.int64).copy()
    t = 1
    m = N
    while m > 1:
        h = m // 2
        x = x.reshape(h, 2, t)
        w = ipsi_brv[h: 2 * h].reshape(h, 1)
        u = x[:, 0, :]
        v = x[:, 1, :]
        x = np.stack([(u + v) % Q, (u - v) * w % Q], axis=1)
        t *= 2
        m = h
    return x.reshape(N) * n_inv % Q


def make_ntt_tables(N: int, Q: int) -> NTTTables:
    psi = root_of_unity(2 * N, Q)
    ipsi = pow(psi, Q - 2, Q)
    pows = np.ones(2 * N, dtype=np.int64)
    ipows = np.ones(N, dtype=np.int64)
    for i in range(1, 2 * N):
        pows[i] = pows[i - 1] * psi % Q
    for i in range(1, N):
        ipows[i] = ipows[i - 1] * ipsi % Q
    brv = _bit_reverse_indices(N)
    psi_brv = pows[:N][brv]
    ipsi_brv = ipows[brv]
    n_inv = pow(N, Q - 2, Q)

    # Empirically recover the slot->evaluation-point map: the EVAL image of
    # the monomial X has slot values psi^{e_j}; discrete-log against the
    # power table gives e_j. This makes monomial multiply and automorphism
    # pure gathers, independent of the butterfly ordering above.
    one_hot_x = np.zeros(N, dtype=np.int64)
    one_hot_x[1] = 1
    img = _np_ntt_fwd_1(one_hot_x, psi_brv, N, Q)
    dlog = {int(pows[i]): i for i in range(2 * N)}
    slot_exp = np.array([dlog[int(v)] for v in img], dtype=np.int64)
    exp_to_slot = np.zeros(2 * N, dtype=np.int64)
    exp_to_slot[slot_exp] = np.arange(N)

    from .modmath import shoup_precompute

    pm1 = (pows - 1) % Q
    return NTTTables(
        N=N,
        Q=Q,
        psi_brv=jnp.asarray(psi_brv, I32),
        ipsi_brv=jnp.asarray(ipsi_brv, I32),
        n_inv=n_inv,
        brv=jnp.asarray(brv, jnp.int32),
        psi_pows=jnp.asarray(pows, I32),
        slot_exp=jnp.asarray(slot_exp, jnp.int32),
        exp_to_slot=jnp.asarray(exp_to_slot, jnp.int32),
        pm1=jnp.asarray(pm1, I32),
        pm1_sh=jnp.asarray(shoup_precompute(pm1, Q)),
    )


# ------------------------------------------------------------- device-side

def _mm(a, b, q):
    return ((a.astype(I64) * b.astype(I64)) % q).astype(I32)


@partial(jax.jit, static_argnames=("N", "Q"))
def _ntt_fwd(a, psi_brv, N: int, Q: int):
    """CT forward butterflies; natural coeff input, bit-reversed EVAL out.

    Mirrors the loop structure of NumberTheoreticTransformNat::
    ForwardTransformToBitReverseInPlace (transformnat-impl.h:197-238) with
    each (m, t) stage vectorized across the full array.
    """
    lead = a.shape[:-1]
    x = a.reshape(-1, N)
    t = N
    m = 1
    while m < N:
        t //= 2
        x = x.reshape(-1, m, 2, t)
        w = psi_brv[m: 2 * m].reshape(1, m, 1)  # twiddle per block
        u = x[:, :, 0, :]
        v = _mm(x[:, :, 1, :], w, Q)
        x = jnp.stack([mod_add(u, v, Q), mod_sub(u, v, Q)], axis=2)
        m *= 2
    return x.reshape(*lead, N)


@partial(jax.jit, static_argnames=("N", "Q", "n_inv"))
def _ntt_inv(a, ipsi_brv, N: int, Q: int, n_inv: int):
    """GS inverse butterflies; bit-reversed EVAL input, natural coeff out."""
    lead = a.shape[:-1]
    x = a.reshape(-1, N)
    t = 1
    m = N
    while m > 1:
        h = m // 2
        x = x.reshape(-1, h, 2, t)
        w = ipsi_brv[h: 2 * h].reshape(1, h, 1)
        u = x[:, :, 0, :]
        v = x[:, :, 1, :]
        x = jnp.stack(
            [mod_add(u, v, Q), _mm(mod_sub(u, v, Q), w, Q)], axis=2
        )
        t *= 2
        m = h
    x = x.reshape(-1, N)
    x = ((x.astype(I64) * n_inv) % Q).astype(I32)
    return x.reshape(*lead, N)


_DEFAULT_IMPL = "butterfly"


def set_default_impl(impl: str) -> None:
    """Select the transform backend: "butterfly" (VPU stages), "mxu"
    (exact bf16-limb matmul) or "mxu_s8" (exact int8-limb matmul — the
    fastest on real TPUs). Takes effect at trace time."""
    global _DEFAULT_IMPL
    assert impl in ("butterfly", "mxu", "mxu_s8")
    if impl != _DEFAULT_IMPL:
        # the impl is read at trace time but is NOT part of any jit cache
        # key — drop compiled functions so the switch actually applies
        jax.clear_caches()
    _DEFAULT_IMPL = impl


def ntt_fwd(tables: NTTTables, a):
    """COEFF -> EVAL (bit-reversed), any leading batch dims."""
    if _DEFAULT_IMPL == "mxu":
        return ntt_fwd_mxu(tables, get_mxu_tables(tables), a)
    if _DEFAULT_IMPL == "mxu_s8":
        if _use_ntt4_xla(tables.N):
            return _ntt4_fwd_xla(tables, a)
        return _mxu_transform_s8(
            a, get_mxu_tables(tables).W_fwd_s8, tables.Q)
    return _ntt_fwd(a, tables.psi_brv, tables.N, tables.Q)


def ntt_inv(tables: NTTTables, a):
    """EVAL (bit-reversed) -> COEFF, any leading batch dims."""
    if _DEFAULT_IMPL == "mxu":
        return ntt_inv_mxu(tables, get_mxu_tables(tables), a)
    if _DEFAULT_IMPL == "mxu_s8":
        if _use_ntt4_xla(tables.N):
            return _ntt4_inv_xla(tables, a)
        return _mxu_transform_s8(
            a, get_mxu_tables(tables).W_inv_s8, tables.Q)
    return _ntt_inv(a, tables.ipsi_brv, tables.N, tables.Q, tables.n_inv)


def negacyclic_mul_coeff(tables: NTTTables, a, b):
    """Full negacyclic product of COEFF-format inputs (reference check)."""
    fa = ntt_fwd(tables, a)
    fb = ntt_fwd(tables, b)
    return ntt_inv(tables, _mm(fa, fb, tables.Q))


def eval_mul(tables: NTTTables, a, b):
    """Pointwise product in EVAL format (PolyImpl::Times, poly.h:249-259)."""
    return _mm(a, b, tables.Q)


# reference implementation for tests: O(N^2) exact negacyclic convolution
def negacyclic_mul_naive(a: np.ndarray, b: np.ndarray, Q: int) -> np.ndarray:
    """Row-at-a-time schoolbook product, reduced mod Q per row so int64
    never overflows (products < 2^56, N rows)."""
    N = a.shape[-1]
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    ext = np.concatenate([b, (-b) % Q])  # X^N == -1 wraparound
    out = np.zeros(N, dtype=np.int64)
    for i in range(N):
        if a[i] == 0:
            continue
        # a[i] * X^i * b contributes a[i]*ext[(j - i) mod 2N] at position j
        shifted = np.roll(ext, i)[:N]
        out = (out + a[i] * shifted) % Q
    return out


# ----------------------------------------------------- MXU matmul backend

"""Exact NTT-as-matmul on the MXU.

The negacyclic NTT is a fixed linear map: out = a @ W with W[i, :] =
NTT(delta_i). On TPU the VPU pays ~an emulated 64-bit multiply per
butterfly, while the MXU runs bf16 matmuls at full rate; splitting a and W
into limbs small enough that each bf16xbf16->f32 pass accumulates exactly
(sum_K < 2**24, limbs < 2**8) makes the matmul bit-exact. ~20 passes for
Q < 2**27, N = 2048 — measured ~2-5x faster than the butterfly path on
v5e, and it keeps XLA in its happiest code path (large static matmuls).

Enable per-call with ntt_fwd/ntt_inv(..., impl="mxu") after building the
limb tables via `with_mxu_tables(tables)`.
"""


_MXU_MARGIN_BITS = 0   # worst-case accumulation bound 2^(24 - margin).
                       # v5e MXU f32 accumulation is exact right up to 2^24
                       # (tools/tpu_probe_mxu.py); the earlier N=2048 failure was
                       # an int64 overflow in limb recombination, fixed by
                       # multiplying with (2^shift mod Q)


def set_mxu_margin_bits(m: int) -> None:
    global _MXU_MARGIN_BITS
    _MXU_MARGIN_BITS = m
    _MXU_CACHE.clear()


def _limb_split_bits(N: int, q_bits: int) -> tuple[int, int]:
    """(a_bits, w_bits) such that (2^a-1)(2^w-1)*N stays under the f32-exact
    accumulation bound (2^24 with safety margin) and both <= 8."""
    bound = 1 << (24 - _MXU_MARGIN_BITS)
    best = None
    for a_bits in range(8, 0, -1):
        for w_bits in range(8, 0, -1):
            if ((1 << a_bits) - 1) * ((1 << w_bits) - 1) * N < bound:
                passes = -(-q_bits // a_bits) * (-(-q_bits // w_bits))
                if best is None or passes < best[0]:
                    best = (passes, a_bits, w_bits)
    return best[1], best[2]


@dataclass(frozen=True)
class MXUTables:
    """Limb decompositions of the forward/inverse transform matrices.

    bf16 limbs (a_bits, w_bits) accumulate exactly in f32 (< 2^24); int8
    limbs of 7 bits accumulate exactly in s32 (< 2^31) and run the MXU at
    2x the bf16 rate with fewer passes — the preferred TPU path.
    """

    N: int
    Q: int
    a_bits: int
    w_bits: int
    W_fwd: jnp.ndarray   # [n_wlimbs, N, N] bf16
    W_inv: jnp.ndarray   # [n_wlimbs, N, N] bf16
    ones_fwd: jnp.ndarray  # [N] int64: NTT(1,...,1) (UNreduced integer sum)
    W_fwd_s8: jnp.ndarray  # [n_s8limbs, N, N] int8 (7-bit limbs)
    W_inv_s8: jnp.ndarray  # [n_s8limbs, N, N] int8


jax.tree_util.register_dataclass(
    MXUTables,
    data_fields=("W_fwd", "W_inv", "ones_fwd", "W_fwd_s8", "W_inv_s8"),
    meta_fields=("N", "Q", "a_bits", "w_bits"))

_MXU_CACHE: dict = {}
_HOST_TABLES: dict = {}


class _HostTables:
    """Numpy-only twiddle tables for host precompute — safe to build and
    use from inside a jit trace (no jax arrays anywhere)."""

    def __init__(self, N: int, Q: int):
        self.N, self.Q = N, Q
        psi = root_of_unity(2 * N, Q)
        ipsi = pow(psi, Q - 2, Q)
        pows = np.ones(2 * N, dtype=np.int64)
        ipows = np.ones(N, dtype=np.int64)
        for i in range(1, 2 * N):
            pows[i] = pows[i - 1] * psi % Q
        for i in range(1, N):
            ipows[i] = ipows[i - 1] * ipsi % Q
        brv = _bit_reverse_indices(N)
        self.psi_brv = pows[:N][brv]
        self.ipsi_brv = ipows[brv]
        self.n_inv = pow(N, Q - 2, Q)


def _host_tables(N: int, Q: int) -> "_HostTables":
    key = (N, Q)
    if key not in _HOST_TABLES:
        _HOST_TABLES[key] = _HostTables(N, Q)
    return _HOST_TABLES[key]


def get_mxu_tables(tables: "NTTTables") -> MXUTables:
    key = (tables.N, tables.Q)
    hit = _MXU_CACHE.get(key)
    if hit is not None:
        return hit
    N, Q = tables.N, tables.Q
    q_bits = (Q - 1).bit_length()
    a_bits, w_bits = _limb_split_bits(N, q_bits)
    host = _host_tables(N, Q)
    eye_np = np.eye(N, dtype=np.int64)
    Wf = host_ntt_fwd(host, eye_np)
    Wi = host_ntt_inv(host, eye_np)
    nw = -(-q_bits // w_bits)
    mask = (1 << w_bits) - 1
    Wfl = np.stack([(Wf >> (l * w_bits)) & mask for l in range(nw)])
    Wil = np.stack([(Wi >> (l * w_bits)) & mask for l in range(nw)])
    ones_fwd = Wf.sum(axis=0)   # integer column sums of the raw W matrix
    n8 = -(-q_bits // 7)
    Wfl8 = np.stack([(Wf >> (l * 7)) & 127 for l in range(n8)])
    Wil8 = np.stack([(Wi >> (l * 7)) & 127 for l in range(n8)])
    # NUMPY-backed (ml_dtypes bf16): the cache may be populated from inside
    # a jit trace, where jnp.asarray would capture leaking tracers; numpy
    # constants embed cleanly into any later trace
    import ml_dtypes

    out = MXUTables(
        N=N, Q=Q, a_bits=a_bits, w_bits=w_bits,
        W_fwd=np.asarray(Wfl, dtype=ml_dtypes.bfloat16),
        W_inv=np.asarray(Wil, dtype=ml_dtypes.bfloat16),
        ones_fwd=np.asarray(ones_fwd, np.int64),
        W_fwd_s8=np.asarray(Wfl8, np.int8),
        W_inv_s8=np.asarray(Wil8, np.int8),
    )
    _MXU_CACHE[key] = out
    return out


def _mxu_transform(x, W_limbs, a_bits: int, w_bits: int, q_bits: int, Q: int):
    lead = x.shape[:-1]
    N = x.shape[-1]
    x2 = x.reshape(-1, N)
    na = -(-q_bits // a_bits)
    amask = (1 << a_bits) - 1
    acc = None
    for la in range(na):
        xl = ((x2 >> (la * a_bits)) & amask).astype(jnp.bfloat16)
        for lw in range(W_limbs.shape[0]):
            part = jnp.matmul(
                xl, jnp.asarray(W_limbs[lw]),
                preferred_element_type=jnp.float32)
            # recombine via (2^shift mod Q): raw shifts overflow int64 at
            # N = 2048 (sum can reach 2^65); part*smod < 2^51 stays exact
            smod = pow(2, la * a_bits + lw * w_bits, Q)
            part = part.astype(I64) * smod
            acc = part if acc is None else acc + part
    return ((acc % Q).astype(I32)).reshape(*lead, N)


def ntt_fwd_mxu(tables: "NTTTables", mxu: MXUTables, a):
    q_bits = (tables.Q - 1).bit_length()
    return _mxu_transform(
        a, mxu.W_fwd, mxu.a_bits, mxu.w_bits, q_bits, tables.Q)


def ntt_inv_mxu(tables: "NTTTables", mxu: MXUTables, a):
    q_bits = (tables.Q - 1).bit_length()
    return _mxu_transform(
        a, mxu.W_inv, mxu.a_bits, mxu.w_bits, q_bits, tables.Q)


# ------------------------------------------------ folded-constant tables

_FOLDED_CACHE: dict = {}


def get_folded_tables(tables: "NTTTables", base_g: int):
    """Input-limb-folded s8 weight planes (r4 VERDICT perf lever (b)).

    The plain s8 transform computes diag[s] = sum_{la+lw=s} xl_la @ W_lw
    and pays one Shoup multiply per diagonal s (weights 2^(7s) mod Q) in
    the recombination. Folding the input-limb constant into the WEIGHTS
    removes the la axis from the weights' recombination: for each input
    limb la precompute W^(la) = (2^(7*la) * W) mod Q and decompose THAT
    into 7-bit planes, so

        x @ W = sum_lw ( sum_la xl_la @ W^(la)_lw ) * 2^(7*lw)

    — identical MXU MAC count, but only nw output diagonals (weights
    2^(7*lw)) instead of na+nw-1, and the lw=0 partial needs no Shoup at
    all. For Q < 2^28 this cuts the INTT recombination from 7 Shoup
    chains to 3 per row.

    Returns (W_inv_f, W_fwd_f): int8 arrays of shape [na, nw, N, N] and
    [nd, nw, N, N] where nd = input limbs of a base_g digit. Cached per
    (N, Q, base_g); ~(na+nd)*nw MB at N=1024.
    """
    key = (tables.N, tables.Q, base_g)
    hit = _FOLDED_CACHE.get(key)
    if hit is not None:
        return hit
    N, Q = tables.N, tables.Q
    q_bits = (Q - 1).bit_length()
    na = -(-q_bits // 7)
    nd = -(-max(1, (base_g - 1).bit_length()) // 7)
    host = _host_tables(N, Q)
    eye_np = np.eye(N, dtype=np.int64)
    Wf = host_ntt_fwd(host, eye_np)
    Wi = host_ntt_inv(host, eye_np)

    def fold(W, n_in):
        planes = np.empty((n_in, na, N, N), np.int8)
        for la in range(n_in):
            Wla = (W * pow(2, 7 * la, Q)) % Q
            for lw in range(na):
                planes[la, lw] = ((Wla >> (lw * 7)) & 127).astype(np.int8)
        return planes

    out = (fold(Wi, na), fold(Wf, nd))
    _FOLDED_CACHE[key] = out
    return out


# --------------------------------------------- 4-step factorized transform

_NTT4_CACHE: dict = {}


def ntt4_supported(N: int) -> bool:
    return N >= 256 and N % 128 == 0 and (N // 128) & (N // 128 - 1) == 0


def get_ntt4_tables(tables: "NTTTables"):
    """Block-factorized NTT tables (the r5 MAC-cutting lever, PLAN.md
    'Perf frontier' #1).

    For N = G*128 the standard CT forward butterfly network splits at
    stage boundary G: the first g = log2(G) stages mix 128-aligned lane
    tiles with ONE scalar twiddle per block pair (psi_brv[m:2m],
    transformnat-impl.h:197-238 loop structure), and every later stage is
    local to a 128-tile — so stages g.. compose into G dense 128x128
    matrices V_r, one per tile. Likewise the GS inverse runs its
    block-local stages first (pair distance < 128) and its last g stages
    cross-tile with scalar twiddles; N^-1 folds into the block matrices.

    MXU cost per element drops from N to 128 MACs per limb pass (8x at
    N=1024, 16x at N=2048) while the butterfly stages cost ~8 VPU
    ops/element/stage; the 128x128 MXU matmuls run at full utilization
    (K = lane tile, no padding). EVAL slot order is IDENTICAL to the
    direct path (the factorization reproduces the same dense W exactly —
    verified at build on random vectors), so keys, monomial tables and
    oracle bit-exactness are untouched.

    Returns a dict with:
      G, g:       tile count / stage count
      vi_planes:  [G, na, nw, 128, 128] int8 — input-limb-FOLDED planes
                  of the inverse block matrices (plane (r, la, lw) = limb
                  lw of 2^(7 la) * Vi_r mod Q), n_inv folded in
      vf_planes:  same for the forward block matrices
      inv_tw:     tuple of GS stages (h, t, ws, wshs) — python-int
                  scalar twiddles + u32 Shoup companions
      fwd_tw:     tuple of CT stages (m, t, ws, wshs)
    """
    N, Q = tables.N, tables.Q
    key = (N, Q)
    hit = _NTT4_CACHE.get(key)
    if hit is not None:
        return hit
    assert ntt4_supported(N), f"N={N} not factorizable as pow2*128"
    G = N // 128
    host = _host_tables(N, Q)
    psi_brv = np.asarray(host.psi_brv, np.int64)
    ipsi_brv = np.asarray(host.ipsi_brv, np.int64)

    # ---- forward: cross-tile CT stages m = 1..G/2 (scalar twiddles)
    fwd_tw = []
    m = 1
    while m < G:
        t = N // (2 * m)
        ws = [int(psi_brv[m + b]) for b in range(m)]
        fwd_tw.append((m, t, tuple(ws),
                       tuple((w << 32) // Q for w in ws)))
        m *= 2

    # ---- forward block matrices: stages m = G.. applied tile-locally
    def fwd_rest(x):
        xx = x.astype(np.int64).copy()
        mm = G
        tt = N // (2 * G)
        while mm < N:
            xx = xx.reshape(-1, mm, 2, tt)
            w = psi_brv[mm:2 * mm].reshape(1, mm, 1)
            u = xx[:, :, 0, :]
            v = xx[:, :, 1, :] * w % Q
            xx = np.stack([(u + v) % Q, (u - v) % Q], axis=2)
            mm *= 2
            tt //= 2
        return xx.reshape(-1, N)

    Vf = np.empty((G, 128, 128), np.int64)
    for r in range(G):
        E = np.zeros((128, N), np.int64)
        E[np.arange(128), r * 128 + np.arange(128)] = 1
        img = fwd_rest(E)
        Vf[r] = img[:, r * 128:(r + 1) * 128]

    # ---- inverse: tile-local GS stages first -> block matrices (n_inv in)
    def inv_local(x):
        xx = x.astype(np.int64).copy()
        tt = 1
        mm = N
        while mm > G:
            h = mm // 2
            xx = xx.reshape(-1, h, 2, tt)
            w = ipsi_brv[h:2 * h].reshape(1, h, 1)
            u = xx[:, :, 0, :]
            v = xx[:, :, 1, :]
            xx = np.stack([(u + v) % Q, (u - v) * w % Q], axis=2)
            tt *= 2
            mm = h
        return xx.reshape(-1, N)

    Vi = np.empty((G, 128, 128), np.int64)
    for r in range(G):
        E = np.zeros((128, N), np.int64)
        E[np.arange(128), r * 128 + np.arange(128)] = 1
        img = inv_local(E)
        Vi[r] = img[:, r * 128:(r + 1) * 128] * host.n_inv % Q

    # ---- inverse cross-tile GS stages m = G..2 (scalar twiddles)
    inv_tw = []
    m = G
    while m > 1:
        h = m // 2
        t = N // m
        ws = [int(ipsi_brv[h + b]) for b in range(h)]
        inv_tw.append((h, t, tuple(ws),
                       tuple((w << 32) // Q for w in ws)))
        m = h

    # ---- verify the factorization reproduces the dense transforms
    rng = np.random.default_rng(12345)
    a = rng.integers(0, Q, (2, N))
    ref_f = np.stack(
        [_np_ntt_fwd_1(row, psi_brv, N, Q) for row in a])
    y = a.astype(np.int64).copy()
    for (mm, tt, ws, _) in fwd_tw:
        y = y.reshape(-1, mm, 2, tt)
        w = np.asarray(ws, np.int64).reshape(1, mm, 1)
        u, v = y[:, :, 0, :], y[:, :, 1, :] * w % Q
        y = np.stack([(u + v) % Q, (u - v) % Q], axis=2)
    y = y.reshape(-1, N)
    got_f = np.concatenate(
        [y[:, r * 128:(r + 1) * 128] @ Vf[r] % Q for r in range(G)], axis=1)
    assert np.array_equal(got_f, ref_f), "ntt4 forward factorization broken"
    X = rng.integers(0, Q, (2, N))
    ref_i = np.stack(
        [_np_ntt_inv_1(row, ipsi_brv, N, Q, host.n_inv) for row in X])
    yi = np.concatenate(
        [X[:, r * 128:(r + 1) * 128] @ Vi[r] % Q for r in range(G)], axis=1)
    for (h, tt, ws, _) in inv_tw:
        yi = yi.reshape(-1, h, 2, tt)
        w = np.asarray(ws, np.int64).reshape(1, h, 1)
        u, v = yi[:, :, 0, :], yi[:, :, 1, :]
        yi = np.stack([(u + v) % Q, (u - v) * w % Q], axis=2)
    yi = yi.reshape(-1, N)
    assert np.array_equal(yi, ref_i), "ntt4 inverse factorization broken"

    # ---- input-limb-folded int8 planes (get_folded_tables trick per tile)
    q_bits = (Q - 1).bit_length()
    na = -(-q_bits // 7)

    def fold_blocks(V):
        planes = np.empty((G, na, na, 128, 128), np.int8)
        for r in range(G):
            for la in range(na):
                Vla = (V[r] * pow(2, 7 * la, Q)) % Q
                for lw in range(na):
                    planes[r, la, lw] = ((Vla >> (lw * 7)) & 127).astype(
                        np.int8)
        return planes

    out = {
        "G": G, "g": G.bit_length() - 1,
        "vi_planes": fold_blocks(Vi),
        "vf_planes": fold_blocks(Vf),
        "inv_tw": tuple(inv_tw),
        "fwd_tw": tuple(fwd_tw),
    }
    _NTT4_CACHE[key] = out
    return out


# ---- XLA-level 4-step transforms (the non-Pallas scan paths: RNS big-Q,
# raw ntt_fwd/ntt_inv device calls). Same factorization as the fused
# kernels use in-kernel; bit-identical outputs to _mxu_transform_s8.

_NTT4_XLA = True


def set_ntt4_xla(on: bool) -> None:
    global _NTT4_XLA
    if on != _NTT4_XLA:
        jax.clear_caches()
    _NTT4_XLA = on


def _t4_stages_fwd(x_u32, Q: int, fwd_tw):
    from .modmath import U32, reduce_once_u32, shoup_mul_lazy_u32

    for (m, t, ws, wshs) in fwd_tw:
        parts = []
        for b in range(m):
            u = x_u32[:, (2 * b) * t:(2 * b) * t + t]
            v = x_u32[:, (2 * b + 1) * t:(2 * b + 1) * t + t]
            wv = reduce_once_u32(
                shoup_mul_lazy_u32(v, U32(ws[b]), U32(wshs[b]), Q), Q)
            parts.append(reduce_once_u32(u + wv, Q))
            parts.append(reduce_once_u32(u + (U32(Q) - wv), Q))
        x_u32 = jnp.concatenate(parts, axis=1)
    return x_u32


def _t4_stages_inv(x_u32, Q: int, inv_tw):
    from .modmath import U32, reduce_once_u32, shoup_mul_lazy_u32

    for (h, t, ws, wshs) in inv_tw:
        parts = []
        for b in range(h):
            u = x_u32[:, (2 * b) * t:(2 * b) * t + t]
            v = x_u32[:, (2 * b + 1) * t:(2 * b + 1) * t + t]
            parts.append(reduce_once_u32(u + v, Q))
            d = u + (U32(Q) - v)
            parts.append(reduce_once_u32(
                shoup_mul_lazy_u32(d, U32(ws[b]), U32(wshs[b]), Q), Q))
        x_u32 = jnp.concatenate(parts, axis=1)
    return x_u32


def _t4_stageB_xla(y_u32, planes, Q: int, extra_row=None):
    from .modmath import U32

    G, n_in, nw = planes.shape[0], planes.shape[1], planes.shape[2]
    outs = []
    for r in range(G):
        yr = y_u32[:, r * 128:(r + 1) * 128]
        diag = {}
        for la in range(n_in):
            yl = ((yr >> U32(7 * la)) & U32(127)).astype(I32).astype(
                jnp.int8)
            for lw in range(nw):
                part = jax.lax.dot_general(
                    yl, planes[r, la, lw], (((1,), (0,)), ((), ())),
                    preferred_element_type=I32)
                diag[lw] = part if lw not in diag else diag[lw] + part
        ex = (None if extra_row is None
              else extra_row[:, r * 128:(r + 1) * 128])
        outs.append(_recombine_diagonals_u32(diag, Q, extra=ex))
    return jnp.concatenate(outs, axis=1)


def _ntt4_fwd_xla(tables: "NTTTables", a):
    t4 = get_ntt4_tables(tables)
    Q = tables.Q
    lead, N = a.shape[:-1], a.shape[-1]
    x = a.reshape(-1, N).astype(jnp.uint32)
    y = _t4_stages_fwd(x, Q, t4["fwd_tw"])
    out = _t4_stageB_xla(y, jnp.asarray(t4["vf_planes"]), Q)
    return out.astype(I32).reshape(*lead, N)


def _ntt4_inv_xla(tables: "NTTTables", a):
    t4 = get_ntt4_tables(tables)
    Q = tables.Q
    lead, N = a.shape[:-1], a.shape[-1]
    x = a.reshape(-1, N).astype(jnp.uint32)
    y = _t4_stageB_xla(x, jnp.asarray(t4["vi_planes"]), Q).astype(
        jnp.uint32)
    out = _t4_stages_inv(y, Q, t4["inv_tw"])
    return out.astype(I32).reshape(*lead, N)


def _ntt4_fwd_digits_xla(tables: "NTTTables", d_signed, base: int):
    t4 = get_ntt4_tables(tables)
    Q = tables.Q
    mxu = get_mxu_tables(tables)
    half = base // 2
    lead, N = d_signed.shape[:-1], d_signed.shape[-1]
    x = (d_signed + half).astype(jnp.uint32).reshape(-1, N)
    y = _t4_stages_fwd(x, Q, t4["fwd_tw"])
    shift_img = jnp.asarray(
        (-half * np.asarray(mxu.ones_fwd, np.int64)) % Q, I32)[None, :]
    out = _t4_stageB_xla(y, jnp.asarray(t4["vf_planes"]), Q,
                         extra_row=shift_img)
    return out.astype(I32).reshape(*lead, N)


def _use_ntt4_xla(N: int) -> bool:
    return _NTT4_XLA and ntt4_supported(N)


# ------------------------------------------------- one-hot monomial table

_PM_HILO_CACHE: dict = {}
_MONO_LO = 64     # low-table size; hi table is 2N/_MONO_LO rows


def _get_pm_hilo_s8(tables: "NTTTables"):
    """Two-level monomial tables, s8 limb planes.

    T_lo[m, j] = psi^{e_j * m}            for m in [0, 64)
    T_hi[h, j] = psi^{e_j * 64 * h}       for h in [0, 2N/64)

    so the EVAL image of X^c is T_hi[c >> 6] * T_lo[c & 63] pointwise
    mod Q. Replaces the flat [2N, N] table whose [R, 2N] one-hot build
    dominated the gate profile (or_select fusion, ~18% of device time).
    """
    key = (tables.N, tables.Q)
    hit = _PM_HILO_CACHE.get(key)
    if hit is not None:
        return hit
    N, Q = tables.N, tables.Q
    L = _MONO_LO
    H = (2 * N) // L
    psi = root_of_unity(2 * N, Q)
    pows = np.ones(2 * N, dtype=np.int64)
    for i in range(1, 2 * N):
        pows[i] = pows[i - 1] * psi % Q
    host = _host_tables(N, Q)
    one_hot_x = np.zeros(N, dtype=np.int64)
    one_hot_x[1] = 1
    img = _np_ntt_fwd_1(one_hot_x, host.psi_brv, N, Q)
    dlog = {int(pows[i]): i for i in range(2 * N)}
    slot_exp = np.array([dlog[int(v)] for v in img], dtype=np.int64)

    m_lo = np.arange(L, dtype=np.int64)[:, None]
    m_hi = np.arange(H, dtype=np.int64)[:, None]
    T_lo = pows[(slot_exp[None, :] * m_lo) % (2 * N)]          # [L, N]
    T_hi = pows[(slot_exp[None, :] * (L * m_hi)) % (2 * N)]    # [H, N]
    T_lo_sh = (T_lo.astype(object) << 32) // Q                 # Shoup comp.
    T_lo_sh = np.asarray(T_lo_sh.astype(np.int64))
    T_hi_sh = (T_hi.astype(object) << 32) // Q
    T_hi_sh = np.asarray(T_hi_sh.astype(np.int64))
    q_bits = (Q - 1).bit_length()
    nl = -(-q_bits // 7)
    lo = np.stack([((T_lo >> (l * 7)) & 127).astype(np.int8)
                   for l in range(nl)])
    hi = np.stack([((T_hi >> (l * 7)) & 127).astype(np.int8)
                   for l in range(nl)])
    losh = np.stack([((T_lo_sh >> (l * 7)) & 127).astype(np.int8)
                     for l in range(5)])                       # 32-bit comp.
    hish = np.stack([((T_hi_sh >> (l * 7)) & 127).astype(np.int8)
                     for l in range(5)])
    _PM_HILO_CACHE[key] = (hi, lo, losh, hish)
    return hi, lo, losh, hish


def _onehot_rows_s8(idx, limbs):
    """Select rows of a limb-decomposed table by one-hot s8 matmul.
    idx: [M] int32 in [0, K); limbs: [nl, K, N] int8 -> [M, N] i32 exact
    (single selected row per dot, so shifts+adds need no reduction)."""
    K = limbs.shape[1]
    iota = jax.lax.broadcasted_iota(I32, (idx.shape[0], K), 1)
    onehot = (idx[:, None] == iota).astype(jnp.int8)
    acc = None
    for l in range(limbs.shape[0]):
        part = jax.lax.dot_general(
            onehot, jnp.asarray(limbs[l]), (((1,), (0,)), ((), ())),
            preferred_element_type=I32)
        part = part << (l * 7)
        acc = part if acc is None else acc + part
    return acc


def monomial_minus_one_mxu(tables: "NTTTables", c):
    """(X^c - 1) in EVAL form — exact, via one-hot s8 MXU dots against the
    hi/lo split tables plus one pointwise Shoup multiply.

    c: int array [...] in [0, 2N) -> [..., N] int32 in [0, Q).

    The lo rows come with one-hot-selected Shoup companions, so the
    pointwise combine is a single lazy Shoup product + one conditional
    subtract (~10 VPU ops/element) instead of a generic Barrett mulmod.
    """
    from .modmath import U32, reduce_once_u32, shoup_mul_lazy_u32

    N, Q = tables.N, tables.Q
    lead = c.shape
    c2 = c.reshape(-1).astype(I32)                            # [M]
    hi_l, lo_l, losh_l, _ = _get_pm_hilo_s8(tables)
    c_lo = c2 & (_MONO_LO - 1)
    hi = _onehot_rows_s8(c2 >> 6, hi_l)                       # [M, N] in [0,Q)
    lo = _onehot_rows_s8(c_lo, lo_l)
    # 32-bit Shoup companions: low 4 planes (28 bits) sum exactly in s32,
    # plane 4 carries bits 28..31
    lo_sh28 = _onehot_rows_s8(c_lo, losh_l[:4]).astype(U32)
    sh4 = _onehot_rows_s8(c_lo, losh_l[4:5])                  # plane 4 value
    lo_sh = lo_sh28 | (sh4.astype(U32) << 28)
    r = shoup_mul_lazy_u32(hi.astype(U32), lo.astype(U32), lo_sh, Q)
    r = reduce_once_u32(r, Q)                                 # psi^{e_j c}
    out = jnp.where(r == 0, U32(Q - 1), r - U32(1)).astype(I32)
    return out.reshape(*lead, N)


# ------------------------------------------------------------ host keygen

def host_ntt_fwd(tables: NTTTables, a) -> np.ndarray:
    """Batched forward NTT on the HOST (numpy in/out, int64).

    Keygen transforms thousands of polynomials once; routing them through
    the native C++ NTT keeps key generation off the device entirely (no
    transfers, no compiles). Falls back to the jax path without the lib.
    """
    from .. import native

    a = np.asarray(a, np.int64) % tables.Q
    out = native.ntt_fwd_batch(a, tables)
    if out is None:   # no native toolchain: pure-numpy row loop
        psi = np.asarray(tables.psi_brv, np.int64)
        flat = a.reshape(-1, tables.N)
        out = np.stack([
            _np_ntt_fwd_1(row, psi, tables.N, tables.Q) for row in flat
        ]).reshape(a.shape)
    return out


def host_ntt_inv(tables: NTTTables, a) -> np.ndarray:
    from .. import native

    a = np.asarray(a, np.int64) % tables.Q
    out = native.ntt_inv_batch(a, tables)
    if out is None:   # no native toolchain: pure-numpy row loop
        ipsi = np.asarray(tables.ipsi_brv, np.int64)
        flat = a.reshape(-1, tables.N)
        out = np.stack([
            _np_ntt_inv_1(row, ipsi, tables.N, tables.Q, tables.n_inv)
            for row in flat
        ]).reshape(a.shape)
    return out


def ntt_fwd_digits(tables: NTTTables, d_signed, base: int):
    """Forward NTT of SIGNED balanced digits in [-base/2, base/2).

    Butterfly path: lift to [0, Q) and transform as usual. MXU path:
    transform the shifted non-negative digits (log2(base) bits instead of
    log2(Q) — ~2.5x fewer limb passes) and subtract the constant-shift
    image (base/2) * NTT(1...1), exactly in int64.
    """
    Q = tables.Q
    half = base // 2
    if _DEFAULT_IMPL == "mxu_s8":
        if _use_ntt4_xla(tables.N):
            return _ntt4_fwd_digits_xla(tables, d_signed, base)
        return _digits_fwd_s8(tables, d_signed, base)
    if _DEFAULT_IMPL != "mxu":
        lifted = jnp.where(d_signed < 0, d_signed + Q, d_signed).astype(I32)
        return _ntt_fwd(lifted, tables.psi_brv, tables.N, tables.Q)

    mxu = get_mxu_tables(tables)
    x = (d_signed + half).astype(I32)          # in [0, base)
    q_bits = max(1, (base - 1).bit_length())
    lead = x.shape[:-1]
    N = x.shape[-1]
    x2 = x.reshape(-1, N)
    bound = 1 << (24 - _MXU_MARGIN_BITS)
    # choose a_bits for the small input range against the same W limbs
    a_bits = mxu.a_bits
    for ab in range(8, 0, -1):
        if ((1 << ab) - 1) * ((1 << mxu.w_bits) - 1) * N < bound:
            a_bits = ab
            break
    na = -(-q_bits // a_bits)
    amask = (1 << a_bits) - 1
    acc = None
    for la in range(na):
        xl = ((x2 >> (la * a_bits)) & amask).astype(jnp.bfloat16)
        for lw in range(mxu.W_fwd.shape[0]):
            part = jnp.matmul(
                xl, jnp.asarray(mxu.W_fwd[lw]),
                preferred_element_type=jnp.float32)
            smod = pow(2, la * a_bits + lw * mxu.w_bits, Q)
            part = part.astype(I64) * smod
            acc = part if acc is None else acc + part
    # subtract the shift: NTT(x - half*ones) = NTT(x) - half*NTT(ones),
    # with the ones image pre-reduced mod Q (raw column sums fit easily)
    acc = acc - half * jnp.asarray(
        np.asarray(mxu.ones_fwd, np.int64) % Q, I64)[None, :]
    return ((acc % Q).astype(I32)).reshape(*lead, N)


def _recombine_diagonals_u32(diag: dict, Q: int, extra=None):
    """Sum diagonal s32 partials with weights 2^(7s) mod Q — all-u32
    constant-companion Shoup (each term in [0, 2Q)); optional `extra`
    term already in [0, Q). Lazy sum < (2*len+1)*Q < 2^32 for <= 7
    diagonals, then one Barrett reduce.

    The s=0 diagonal (weight 1) skips its Shoup multiply: the raw s32
    partial is non-negative and < 2^27, so it joins the lazy u32 sum
    directly — one fewer Shoup chain per transform."""
    from .modmath import U32, barrett_reduce_u32, shoup_mul_lazy_u32

    acc = None
    for s_, part in diag.items():
        if s_ == 0:
            term = part.astype(U32)       # weight 1: raw, < 2^27
        else:
            c = pow(2, 7 * s_, Q)
            csh = (c << 32) // Q
            term = shoup_mul_lazy_u32(part.astype(U32), U32(c), U32(csh), Q)
        acc = term if acc is None else acc + term
    if extra is not None:
        acc = acc + extra.astype(U32)
    return barrett_reduce_u32(acc, Q).astype(I32)


def _mxu_transform_s8(x, W_limbs_s8, Q: int):
    """Exact transform via int8 MXU passes: 7-bit limbs on both sides,
    s32 accumulation (worst case 127*127*N < 2^31 for N <= 2^16).

    Recombination groups the (la, lw) passes by diagonal s = la + lw
    (same 2^(7s) weight): s32 partial sums within a diagonal (bounded by
    ~4 * 127^2 * N < 2^28 < Q-safe u32), then one all-u32 Shoup multiply
    per diagonal and a single Barrett reduce — no 64-bit ops (TPU VPUs
    emulate s64 at ~30x the cost, tools/tpu_session5.py)."""
    q_bits = (Q - 1).bit_length()
    na = -(-q_bits // 7)
    nw = W_limbs_s8.shape[0]
    lead = x.shape[:-1]
    N = x.shape[-1]
    x2 = x.reshape(-1, N)
    diag = {}
    for la in range(na):
        xl = ((x2 >> (la * 7)) & 127).astype(jnp.int8)
        for lw in range(nw):
            part = jax.lax.dot_general(
                xl, jnp.asarray(W_limbs_s8[lw]), (((1,), (0,)), ((), ())),
                preferred_element_type=I32)
            s_ = la + lw
            diag[s_] = part if s_ not in diag else diag[s_] + part
    return _recombine_diagonals_u32(diag, Q).reshape(*lead, N)


def _digits_fwd_s8(tables: NTTTables, d_signed, base: int):
    """Signed-digit forward NTT on the int8 MXU path."""
    Q = tables.Q
    half = base // 2
    mxu = get_mxu_tables(tables)
    x = (d_signed + half).astype(I32)
    q_bits = max(1, (base - 1).bit_length())
    na = -(-q_bits // 7)
    lead = x.shape[:-1]
    N = x.shape[-1]
    x2 = x.reshape(-1, N)
    diag = {}
    for la in range(na):
        xl = ((x2 >> (la * 7)) & 127).astype(jnp.int8)
        for lw in range(mxu.W_fwd_s8.shape[0]):
            part = jax.lax.dot_general(
                xl, jnp.asarray(mxu.W_fwd_s8[lw]), (((1,), (0,)), ((), ())),
                preferred_element_type=I32)
            s_ = la + lw
            diag[s_] = part if s_ not in diag else diag[s_] + part
    # the shift correction NTT(x - half*ones) = NTT(x) - half*NTT(ones),
    # folded in as a precomputed [0, Q) constant row added to the lazy sum
    shift_img = jnp.asarray(
        (-half * np.asarray(mxu.ones_fwd, np.int64)) % Q, I32)[None, :]
    return _recombine_diagonals_u32(
        diag, Q, extra=jnp.broadcast_to(shift_img, x2.shape)
    ).reshape(*lead, N)
