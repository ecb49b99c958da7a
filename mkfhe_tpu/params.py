"""Static parameter objects + precomputed device state.

The reference's CryptoParams class web (LWECryptoParams, RingGSWCryptoParams
rgsw-cryptoparameters.h:312, UniEncCryptoParams mk-cryptoparameters.h:37,
MNTRU/MKLWE/VectorNTRU params) collapses into two layers here:

  * frozen dataclasses of python ints (hashable -> usable as jit static
    arguments and dict keys), derived from the named set table
  * a `Precomp` bundle of device arrays (NTT tables, gadget powers, CRS)
    built once per context

Q is derived exactly like binfhecontext.cpp:157-158:
Q = PreviousPrime(FirstPrime(number_bits, cycl_order), cycl_order).
"""

import math
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .constants import (
    BINFHE_METHOD,
    BINFHE_PARAMSET,
    PARAM_SETS,
    SecretKeyDist,
    gate_constants,
)
from .ops.ntt import NTTTables, first_prime, make_ntt_tables, previous_prime


def derive_Q(number_bits: int, cycl_order: int) -> int:
    return previous_prime(first_prime(number_bits, cycl_order), cycl_order)


def digit_count(q: int, base: int) -> int:
    """ceil(log_base(q)) computed via float log, exactly like the reference
    (lwe-pke.cpp:298-299 etc.)."""
    return int(math.ceil(math.log(q) / math.log(base)))


@dataclass(frozen=True)
class LWEParams:
    """LWECryptoParams (lwe-cryptoparameters.h)."""

    n: int
    N: int
    q: int
    Q: int
    q_ks: int
    std: float
    base_ks: int
    key_dist: SecretKeyDist

    @property
    def digits_ks(self) -> int:
        return digit_count(self.q_ks, self.base_ks)


@dataclass(frozen=True)
class RGSWParams:
    """RingGSWCryptoParams (rgsw-cryptoparameters.h:312).

    limbs: () for native single-prime Q (<= 28 bits, u32 kernels); a pair
    of NTT-friendly primes with q1*q2 == Q for >28-bit sets (the
    reference's NATIVE_SIZE=64 territory) — see ops/rns.py."""

    N: int
    Q: int
    q: int
    base_g: int
    base_r: int
    method: BINFHE_METHOD
    std: float
    key_dist: SecretKeyDist
    num_auto_keys: int = 10
    limbs: tuple = ()

    @property
    def digits_g(self) -> int:
        return digit_count(self.Q, self.base_g)

    @property
    def digits_r(self) -> int:
        return digit_count(self.q, self.base_r)


@dataclass(frozen=True)
class UniEncParams:
    """UniEncCryptoParams (mk-cryptoparameters.h:37-181).

    sigma_e / sigma_r are the hardcoded UniEnc noise widths
    (mk-cryptoparameters.h:143-144).
    """

    k: int
    N: int
    Q: int
    q: int
    base_g: int
    method: BINFHE_METHOD
    key_dist: SecretKeyDist
    sigma_e: float = 0.25
    sigma_r: float = 0.15

    @property
    def digits_g(self) -> int:
        return digit_count(self.Q, self.base_g)


@dataclass(frozen=True)
class MNTRUParams:
    """MNTRUCryptoParams (mntru-cryptoparameters.h).

    ks_signed: consume the j-linear KSK2 with exact balanced digits
    (production default; ~2x lower key-switch noise — decisive at k=8/16).
    False reproduces the reference's unsigned digit loop
    (mntru-pke.cpp:782-791) for bit-exact oracle comparison."""

    k: int
    n: int
    N: int
    q: int
    Q: int
    q_ks: int
    std: float
    base_ks: int
    key_dist: SecretKeyDist
    ks_signed: bool = True

    @property
    def digits_ks(self) -> int:
        return digit_count(self.q_ks, self.base_ks)


@dataclass(frozen=True)
class MKLWEParams:
    """MKLWECryptoParams (mklwe-cryptoparameters.h).

    ks_compact: use the r5 j-linear signed-digit switching key
    (schemes/mklwe.MKLWECompactSwitchingKey) instead of the reference's
    expanded per-digit-value table (mklwe-pke.cpp:176-256). Default True
    for k >= 8, where the expanded table is 3-6+ GB and blocks k=16
    outright; False keeps the reference-shaped table for bit-exact
    oracle comparison at k <= 4."""

    k: int
    n: int
    N: int
    q: int
    Q: int
    q_ks: int
    std: float
    base_ks: int
    key_dist: SecretKeyDist
    ks_compact: bool = False

    @property
    def digits_ks(self) -> int:
        return digit_count(self.q_ks, self.base_ks)

    @property
    def base_c(self) -> int:
        from .schemes.mklwe import COMPACT_BASE

        return COMPACT_BASE

    @property
    def digits_c(self) -> int:
        from .schemes.mklwe import signed_digit_count

        return signed_digit_count(self.q_ks, self.base_c)


@dataclass(frozen=True)
class VNTRUParams:
    """VectorNTRUCryptoParams (vntru-cryptoparameters.h:58-185)."""

    N: int
    Q: int
    q: int
    base_g: int
    std: float
    key_dist: SecretKeyDist

    @property
    def digits_g(self) -> int:
        return digit_count(self.Q, self.base_g)


@dataclass(frozen=True)
class BinFHEParams:
    """BinFHECryptoParams: the full static bundle for one context."""

    paramset: BINFHE_PARAMSET
    method: BINFHE_METHOD
    lwe: LWEParams | None = None
    rgsw: RGSWParams | None = None
    unienc: UniEncParams | None = None
    mntru: MNTRUParams | None = None
    mklwe: MKLWEParams | None = None
    vntru: VNTRUParams | None = None


def build_params(set_: BINFHE_PARAMSET, method: BINFHE_METHOD) -> BinFHEParams:
    """GenerateBinFHEContext(set, method) — binfhecontext.cpp:83-194."""
    p = PARAM_SETS[set_]
    return build_params_from(p, method, set_)


def build_params_from(
    p, method: BINFHE_METHOD, set_: BINFHE_PARAMSET | None = None
) -> BinFHEParams:
    """Build from an explicit ContextParams row (the fully-custom context
    overload, binfhecontext.h:94-118 / binfhecontext.cpp:196-216)."""
    set_ = set_ or BINFHE_PARAMSET.TOY
    limbs: tuple = ()
    if p.number_bits > 28:
        # Beyond the u32 single-prime ceiling (MAX_MODULUS_SIZE=28 at the
        # reference's NATIVE_SIZE=32, basicint.h:56-61): run the ring at a
        # dual-limb RNS modulus q1*q2 >= 2^number_bits (ops/rns.py) — the
        # TPU-native counterpart of the reference's NATIVE_SIZE=64 build
        # (and of its own DCRTPoly RNS layer). Supported for the GINX,
        # AP, and LMKCDEY accumulators.
        if method not in (BINFHE_METHOD.GINX, BINFHE_METHOD.AP,
                          BINFHE_METHOD.LMKCDEY):
            raise NotImplementedError(
                f"{set_}: number_bits={p.number_bits} > 28 is supported "
                "via the dual-limb RNS path for GINX/AP/LMKCDEY only")
        from .ops.rns import pick_limbs

        limbs = pick_limbs(p.number_bits, p.cycl_order)
        Q = limbs[0] * limbs[1]
    else:
        Q = derive_Q(p.number_bits, p.cycl_order)
    N = p.cycl_order // 2
    q_ks = Q if p.mod_ks == 0 else p.mod_ks

    lwe = LWEParams(
        n=p.lattice_param, N=N, q=p.mod, Q=Q, q_ks=q_ks, std=p.std_dev,
        base_ks=p.base_ks, key_dist=p.key_dist,
    )
    if method in (BINFHE_METHOD.MKNTRU, BINFHE_METHOD.MKNTRU_B):
        mntru = MNTRUParams(
            k=p.num_user, n=p.lattice_param, N=N, q=p.mod, Q=Q, q_ks=q_ks,
            std=p.std_dev, base_ks=p.base_ks, key_dist=p.key_dist,
        )
        unienc = UniEncParams(
            k=p.num_user, N=N, Q=Q, q=p.mod, base_g=p.base_g, method=method,
            key_dist=p.key_dist,
        )
        return BinFHEParams(set_, method, lwe=lwe, mntru=mntru, unienc=unienc)
    if method == BINFHE_METHOD.MKNTRU_LWE:
        mklwe = MKLWEParams(
            k=p.num_user, n=p.lattice_param, N=N, q=p.mod, Q=Q, q_ks=q_ks,
            std=p.std_dev, base_ks=p.base_ks, key_dist=p.key_dist,
            ks_compact=p.num_user >= 8,
        )
        unienc = UniEncParams(
            k=p.num_user, N=N, Q=Q, q=p.mod, base_g=p.base_g, method=method,
            key_dist=p.key_dist,
        )
        return BinFHEParams(set_, method, lwe=lwe, mklwe=mklwe, unienc=unienc)
    if method == BINFHE_METHOD.XZDDF:
        vntru = VNTRUParams(
            N=N, Q=Q, q=p.mod, base_g=p.base_g, std=p.std_dev,
            key_dist=p.key_dist,
        )
        return BinFHEParams(set_, method, lwe=lwe, vntru=vntru)
    rgsw = RGSWParams(
        N=N, Q=Q, q=p.mod, base_g=p.base_g, base_r=p.base_rk, method=method,
        std=p.std_dev, key_dist=p.key_dist, num_auto_keys=p.num_auto_keys,
        limbs=limbs,
    )
    return BinFHEParams(set_, method, lwe=lwe, rgsw=rgsw)


# ------------------------------------------------------------------ precomp

@lru_cache(maxsize=None)
def get_tables(N: int, Q: int) -> NTTTables:
    return make_ntt_tables(N, Q)


@lru_cache(maxsize=None)
def get_rns_tables(N: int, limbs: tuple):
    from .ops.rns import make_rns_tables

    return make_rns_tables(N, limbs)


def g_power(Q: int, base_g: int, digits_g: int) -> np.ndarray:
    """baseG^i mod Q for i in [0, digitsG) (PreCompute,
    mk-cryptoparameters.cpp:27-34)."""
    out = np.ones(digits_g, dtype=np.int64)
    for i in range(1, digits_g):
        out[i] = out[i - 1] * base_g % Q
    return out


@dataclass(frozen=True)
class Precomp:
    """Device-array state shared by a context's kernels."""

    tables: NTTTables
    gpow: jnp.ndarray           # [digits_g] int32
    gate_const: tuple           # python ints, indexed by BINGATE


def build_precomp(N: int, Q: int, q: int, base_g: int, digits_g: int) -> Precomp:
    return Precomp(
        tables=get_tables(N, Q),
        gpow=jnp.asarray(g_power(Q, base_g, digits_g), jnp.int32),
        gate_const=tuple(gate_constants(q)),
    )
