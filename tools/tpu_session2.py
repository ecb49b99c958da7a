"""TPU session 2: pointwise-mulmod strategy shootout (in-jit scan loops so
dispatch overhead is amortized), to pick the hot-path arithmetic."""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    print("device:", jax.devices(), flush=True)
    from mkfhe_tpu.ops import ntt as nttm
    from mkfhe_tpu.ops.modmath import I32, I64

    N = 2048
    Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
    B = 256
    STEPS = 100
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.integers(0, Q, (B, N)), I32)
    b = jnp.asarray(rng.integers(0, Q, (B, N)), I32)
    bsh = jnp.asarray(
        ((np.asarray(b, np.uint64) << 32) // Q).astype(np.int64))

    def timed(name, fn, *args):
        out = fn(*args)
        out.block_until_ready()
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        ops = B * N * STEPS
        print(json.dumps({
            "kernel": name, "ms": round(dt * 1e3, 2),
            "Gmulmod_per_s": round(ops / dt / 1e9, 2)}), flush=True)
        return out

    @jax.jit
    def loop_s64(x):
        def step(x, _):
            y = ((x.astype(I64) * b.astype(I64)) % Q).astype(I32)
            return y, None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    mu = (1 << 56) // Q

    @jax.jit
    def loop_barrett(x):
        def step(x, _):
            t = x.astype(I64) * b.astype(I64)
            est = ((t >> 27) * mu) >> 29
            r = t - est * Q
            r = jnp.where(r >= Q, r - Q, r)
            r = jnp.where(r >= Q, r - Q, r)
            return r.astype(I32), None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    @jax.jit
    def loop_shoup(x):
        def step(x, _):
            q_est = ((x.astype(I64) * bsh) >> 32)          # mulhi32-ish
            r = x.astype(I64) * b.astype(I64) - q_est * Q  # in [0, 2Q)
            r = jnp.where(r >= Q, r - Q, r)
            return r.astype(I32), None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    @jax.jit
    def loop_shoup32(x):
        """32-bit-only variant: r computed from LOW 32-bit products."""
        bu = b.astype(jnp.uint32)
        bshu = bsh.astype(jnp.uint32)  # low 32 of shoup constant
        bsh_hi = (bsh >> 32).astype(jnp.uint32)  # zero for Q<2^28? no: keep

        def step(x, _):
            xu = x.astype(jnp.uint32)
            # mulhi via u64 (XLA emulates with 32-bit mulhi pairs)
            q_est = ((x.astype(jnp.uint64) * bsh.astype(jnp.uint64))
                     >> 32).astype(jnp.uint32)
            lo = xu * bu - q_est * jnp.uint32(Q)           # wraps mod 2^32
            r = lo.astype(jnp.int64)
            r = jnp.where(r >= Q, r - Q, r)
            return r.astype(I32), None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    r0 = timed("s64_mod", loop_s64, a0)
    r1 = timed("barrett_s64", loop_barrett, a0)
    r2 = timed("shoup_s64hi", loop_shoup, a0)
    r3 = timed("shoup_u32", loop_shoup32, a0)
    for name, r in [("barrett", r1), ("shoup", r2), ("shoup32", r3)]:
        ok = np.array_equal(np.asarray(r0), np.asarray(r))
        print(f"{name} exact vs s64: {ok}", flush=True)

    # the HbProd-style contraction: sum over dG of elementwise products
    dG = 2
    k = 2
    dct = jnp.asarray(rng.integers(0, Q, (B, k, dG, N)), I32)
    ek = jnp.asarray(rng.integers(0, Q, (dG, N)), I32)

    @jax.jit
    def loop_contract(x):
        def step(x, _):
            prod = (x.astype(I64) * ek[None, None].astype(I64)).sum(axis=2)
            y = (prod % Q).astype(I32)
            return x.at[:, :, 0, :].set(y), None
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    out = loop_contract(dct)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = loop_contract(dct)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "kernel": "contract_dG_s64",
        "ms": round(dt * 1e3, 2),
        "Gmulmod_per_s": round(B * k * dG * N * STEPS / dt / 1e9, 2)}),
        flush=True)


def gates():
    import sys
    sys.argv = [sys.argv[0]]
    from tpu_session import bench_gate
    for impl in ("mxu_s8",):
        for batch in (32, 128, 256):
            bench_gate("mkntru", "STD100_MKNTRU", impl, batch)
        for batch in (128, 512):
            bench_gate("ginx", "STD128", impl, batch)


if __name__ == "__main__":
    main()
    gates()
