"""Pointwise mulmod strategy shootout on the real TPU (session 5).

The step profile (tpu_profile_step.py) shows ~100% of the MKNTRU scan
step is VPU pointwise modular arithmetic: the uj/v contraction (1.17 ms)
and the monomial*acc multiply (1.59 ms) — the MXU matmuls are free.
Compare, at the exact in-gate shapes:

  A. amortized s64 products + one %Q     (current production path)
  B. Shoup via u64 mulhi                 (known in-gate regression)
  C. Shoup via 16-bit-split u32 mulhi    (no 64-bit types anywhere)
  D. Pallas kernel of C (fused contraction in VMEM)
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mkfhe_tpu.ops import ntt as ntt_mod
from mkfhe_tpu.ops.modmath import I32, I64

N = 2048
Q = ntt_mod.previous_prime(ntt_mod.first_prime(27, 2 * N), 2 * N)
B, K, DG = 128, 2, 2
REPS = 50
U32 = jnp.uint32

rng = np.random.default_rng(0)
dctn0 = jnp.asarray(rng.integers(0, Q, (B, K, DG, N)), I32)
keys0 = jnp.asarray(rng.integers(0, Q, (DG, N)), I32)
keys_sh0 = jnp.asarray(
    (np.asarray(rng.integers(0, Q, (DG, N)), np.uint64) << np.uint64(32))
    // np.uint64(Q), np.uint32)
# real companions for exactness check
keys_sh0 = jnp.asarray(
    (np.asarray(keys0, np.uint64) << np.uint64(32)) // np.uint64(Q),
    np.uint32)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    n_mulmod = B * K * DG * N / 1e9
    print(f"{name:44s} {dt:8.3f} ms   {n_mulmod / (dt / 1e3):6.2f} Gmul/s")
    return out, dt


# ---------------------------------------------------------------- variants

@jax.jit
def contract_s64(dctn, keys):
    prod = (dctn.astype(I64) * keys[None, None].astype(I64)).sum(axis=2)
    return ((prod % Q)).astype(I32)


@jax.jit
def contract_shoup_u64(dctn, keys, keys_sh):
    x = dctn.astype(jnp.uint64)
    q_est = ((x * keys_sh[None, None].astype(jnp.uint64)) >> jnp.uint64(32)
             ).astype(U32)
    lo = (dctn.astype(U32) * keys[None, None].astype(U32)
          - q_est * U32(Q))
    r = lo.astype(I32)
    r = jnp.where(r >= Q, r - Q, r)
    s = r.sum(axis=2)   # < dG*Q fits s32
    return jnp.where(s >= Q, s - Q, s)


def _mulhi32(x, ysh):
    """floor(x * ysh / 2^32) with x, ysh uint32 — 16-bit split, u32 ops."""
    xl = x & U32(0xFFFF)
    xh = x >> U32(16)
    yl = ysh & U32(0xFFFF)
    yh = ysh >> U32(16)
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    mid = (ll >> U32(16)) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
    return hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))


def _shoup32(x, y, ysh):
    """(x*y) mod Q -> [0, 2Q), all u32. x any u32; y < Q precomputed."""
    q_est = _mulhi32(x, ysh)
    return x * y - q_est * U32(Q)


@jax.jit
def contract_shoup_u32(dctn, keys, keys_sh):
    x = dctn.astype(U32)
    r = _shoup32(x, keys[None, None].astype(U32), keys_sh[None, None])
    s = r.sum(axis=2)                   # < dG*2Q < 2^30, fits u32
    s = jnp.where(s >= U32(2 * Q), s - U32(2 * Q), s)
    s = jnp.where(s >= U32(Q), s - U32(Q), s)
    return s.astype(I32)


# ------------------------------------------------------------- Pallas of C

def _contract_kernel(dctn_ref, keys_ref, keys_sh_ref, out_ref):
    # dctn [TK, DG*N] int32, keys/keys_sh [1, DG*N]
    x = dctn_ref[:].astype(U32)
    y = keys_ref[:].astype(U32)
    ysh = keys_sh_ref[:].astype(U32)
    acc = jnp.zeros((x.shape[0], N), U32)
    for d in range(DG):
        r = _shoup32(x[:, d * N:(d + 1) * N], y[:, d * N:(d + 1) * N],
                     ysh[:, d * N:(d + 1) * N])
        acc = acc + r
    acc = jnp.where(acc >= U32(2 * Q), acc - U32(2 * Q), acc)
    acc = jnp.where(acc >= U32(Q), acc - U32(Q), acc)
    out_ref[:] = acc.astype(I32)


@jax.jit
def contract_pallas(dctn, keys, keys_sh):
    M = B * K
    x = dctn.reshape(M, DG * N)
    TK = 8
    with jax.enable_x64(False):
        return _contract_pallas_inner(x, keys, keys_sh)


def _contract_pallas_inner(x, keys, keys_sh):
    M = B * K
    TK = 8
    return pl.pallas_call(
        _contract_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), I32),
        grid=(M // TK,),
        in_specs=[
            pl.BlockSpec((TK, DG * N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DG * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DG * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TK, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, keys.reshape(1, DG * N), keys_sh.reshape(1, DG * N)
      ).reshape(B, K, N)


# ------------------------------------------------- pointwise monomial mult

mon0 = jnp.asarray(rng.integers(0, Q, (B, N)), I32)
mon_sh0 = jnp.asarray(
    (np.asarray(mon0, np.uint64) << np.uint64(32)) // np.uint64(Q), U32)
acc0 = jnp.asarray(rng.integers(0, Q, (B, K, N)), I32)


@jax.jit
def pw_s64(acc, mon):
    return ((acc.astype(I64) * mon[:, None].astype(I64)) % Q).astype(I32)


@jax.jit
def pw_shoup_u32(acc, mon, mon_sh):
    r = _shoup32(acc.astype(U32), mon[:, None].astype(U32),
                 mon_sh[:, None])
    r = jnp.where(r >= U32(Q), r - U32(Q), r)
    return r.astype(I32)


def main():
    print(f"Q={Q}  shapes: dctn [B={B},K={K},DG={DG},N={N}]")
    ref, _ = timeit("A. contract s64 (current)", contract_s64, dctn0, keys0)
    o, _ = timeit("B. contract shoup u64-mulhi", contract_shoup_u64,
                  dctn0, keys0, keys_sh0)
    print("   exact:", bool(jnp.array_equal(ref, o)))
    o, _ = timeit("C. contract shoup u32-split", contract_shoup_u32,
                  dctn0, keys0, keys_sh0)
    print("   exact:", bool(jnp.array_equal(ref, o)))
    try:
        o, _ = timeit("D. contract pallas u32-split", contract_pallas,
                      dctn0, keys0, keys_sh0)
        print("   exact:", bool(jnp.array_equal(ref, o)))
    except Exception as e:
        print("   pallas failed:", repr(e)[:300])

    ref2, _ = timeit("E. pointwise s64 (current)", pw_s64, acc0, mon0)
    o, _ = timeit("F. pointwise shoup u32-split", pw_shoup_u32,
                  acc0, mon0, mon_sh0)
    print("   exact:", bool(jnp.array_equal(ref2, o)))


if __name__ == "__main__":
    main()


# ------------------------------------------- fori-loop (in-gate) variants

def loop(body, n=REPS):
    @jax.jit
    def run(x, *consts):
        return jax.lax.fori_loop(0, n, lambda i, z: body(z, *consts), x)
    return run


def main_loop():
    print(f"fori-loop x{REPS} (in-gate conditions), Q={Q}")

    def b_s64(d):
        o = contract_s64(d, keys0)
        return d.at[:, :, 0, :].set(o)  # feed back to defeat CSE

    def b_u32(d):
        o = contract_shoup_u32(d, keys0, keys_sh0)
        return d.at[:, :, 0, :].set(o)

    def b_pallas(d):
        o = contract_pallas(d, keys0, keys_sh0)
        return d.at[:, :, 0, :].set(o)

    def p_s64(a):
        return pw_s64(a, mon0)

    def p_u32(a):
        return pw_shoup_u32(a, mon0, mon_sh0)

    timeit("contract s64 in-loop", loop(b_s64), dctn0)
    timeit("contract shoup-u32 in-loop", loop(b_u32), dctn0)
    try:
        timeit("contract pallas in-loop", loop(b_pallas), dctn0)
    except Exception as e:
        print("   pallas failed:", repr(e)[:200])
    timeit("pointwise s64 in-loop", loop(p_s64), acc0)
    timeit("pointwise shoup-u32 in-loop", loop(p_u32), acc0)
