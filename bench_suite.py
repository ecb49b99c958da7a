"""Kernel microbenchmarks (roofline exploration) — run ONE process on the
target device and measure every mulmod/NTT strategy, so device-session
setup cost is paid once.

python bench_suite.py [--device tpu|cpu] [--quick]
"""

import argparse
import json
import time

import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    print("devices:", jax.devices(), flush=True)

    from mkfhe_tpu.ops import ntt as nttm
    from mkfhe_tpu.ops.modmath import I32, I64

    N = 2048
    Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
    t = nttm.make_ntt_tables(N, Q)
    B = args.batch
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, Q, (B, N)), I32)
    b = jnp.asarray(rng.integers(0, Q, (B, N)), I32)

    results = {}

    # 1. elementwise mulmod via s64 %
    @jax.jit
    def mulmod_s64(x, y):
        return ((x.astype(I64) * y.astype(I64)) % Q).astype(I32)

    dt = timeit(mulmod_s64, a, b)
    results["mulmod_s64_pct"] = dt
    print(f"mulmod s64%%: {dt*1e3:.3f} ms for {B}x{N} "
          f"({B*N/dt/1e9:.2f} Gop/s)", flush=True)

    # 2. Barrett with s64 shifts (no division)
    mu = (1 << 56) // Q

    @jax.jit
    def mulmod_barrett(x, y):
        tt = x.astype(I64) * y.astype(I64)
        est = ((tt >> 27) * mu) >> 29
        r = tt - est * Q
        r = jnp.where(r >= Q, r - Q, r)
        r = jnp.where(r >= Q, r - Q, r)
        return r.astype(I32)

    dt = timeit(mulmod_barrett, a, b)
    results["mulmod_barrett"] = dt
    print(f"mulmod barrett: {dt*1e3:.3f} ms ({B*N/dt/1e9:.2f} Gop/s)",
          flush=True)

    # sanity
    w1 = np.asarray(mulmod_s64(a, b))
    w2 = np.asarray(mulmod_barrett(a, b))
    assert np.array_equal(w1, w2), "barrett mismatch"

    # 3. Shoup mulmod (precomputed multiplicand): b fixed with bshoup
    bshoup = jnp.asarray(
        (np.asarray(b, np.uint64) << 32) // Q, jnp.uint64).astype(I64)

    @jax.jit
    def mulmod_shoup(x, y, ysh):
        # q_est = mulhi32(x, ysh)
        q_est = (x.astype(I64) * ysh) >> 32
        r = x.astype(I64) * y.astype(I64) - q_est * Q
        r = jnp.where(r >= Q, r - Q, r)
        return r.astype(I32)

    dt = timeit(mulmod_shoup, a, b, bshoup)
    results["mulmod_shoup"] = dt
    w3 = np.asarray(mulmod_shoup(a, b, bshoup))
    ok3 = np.array_equal(w1, w3)
    print(f"mulmod shoup: {dt*1e3:.3f} ms ({B*N/dt/1e9:.2f} Gop/s) "
          f"exact={ok3}", flush=True)

    # 4. current NTT fwd
    f_ntt = jax.jit(lambda x: nttm.ntt_fwd(t, x))
    dt = timeit(f_ntt, a)
    results["ntt_butterfly"] = dt
    print(f"ntt butterflies: {dt*1e3:.3f} ms/batch "
          f"({B/dt:.0f} NTT/s)", flush=True)

    # 5. NTT as exact limb matmul on MXU (int8 path)
    # W[i, j] = psi-twisted DFT matrix: out = a @ W. Build from the
    # definition: out_slot = sum_j a_j psi_pows[(e_slot * j) ... ] — use
    # brute force: columns are ntt of unit vectors.
    eye = jnp.eye(N, dtype=I32)
    W = np.asarray(nttm.ntt_fwd(t, eye)).astype(np.int64).T  # out = a @ W
    limb_bits = 7
    n_limbs = -(-27 // limb_bits)
    Wl = np.stack([(W >> (l * limb_bits)) & ((1 << limb_bits) - 1)
                   for l in range(n_limbs)])
    Wl8 = jnp.asarray(Wl, jnp.int8)

    a_bits = 7
    a_limbs = -(-27 // a_bits)

    @jax.jit
    def ntt_mxu_s8(x):
        # recombine with (2^shift mod Q) — raw shifts overflow int64 at
        # N = 2048 (the r1 bug; production fix at ops/ntt.py)
        acc = jnp.zeros((x.shape[0], N), I64)
        for la in range(a_limbs):
            xl = ((x >> (la * a_bits)) & ((1 << a_bits) - 1)).astype(jnp.int8)
            for lb in range(n_limbs):
                part = jax.lax.dot_general(
                    xl, Wl8[lb], (((1,), (0,)), ((), ())),
                    preferred_element_type=I32)
                smod = pow(2, la * a_bits + lb * limb_bits, Q)
                acc = acc + part.astype(I64) * smod
        return (acc % Q).astype(I32)

    try:
        dt = timeit(ntt_mxu_s8, a)
        w5 = np.asarray(ntt_mxu_s8(a))
        ok5 = np.array_equal(w5, np.asarray(f_ntt(a)))
        results["ntt_mxu_s8"] = dt
        print(f"ntt s8-MXU matmul: {dt*1e3:.3f} ms/batch ({B/dt:.0f} NTT/s) "
              f"exact={ok5}", flush=True)
    except Exception as e:
        print("ntt s8-MXU failed:", repr(e)[:200], flush=True)

    # 6. NTT as bf16 limb matmul
    limb_bits_bf = 6   # K=2048 -> la+lb <= 24-11 = 13; 7+6 works
    nl_bf = -(-27 // limb_bits_bf)

    Wbf = jnp.asarray(
        np.stack([(W >> (l * limb_bits_bf)) & ((1 << limb_bits_bf) - 1)
                  for l in range(nl_bf)]), jnp.bfloat16)

    a_bits_bf = 7
    al_bf = -(-27 // a_bits_bf)

    @jax.jit
    def ntt_mxu_bf16(x):
        acc = jnp.zeros((x.shape[0], N), I64)
        for la in range(al_bf):
            xl = ((x >> (la * a_bits_bf)) & ((1 << a_bits_bf) - 1)
                  ).astype(jnp.bfloat16)
            for lb in range(nl_bf):
                part = jax.lax.dot_general(
                    xl, Wbf[lb], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                smod = pow(2, la * a_bits_bf + lb * limb_bits_bf, Q)
                acc = acc + part.astype(I64) * smod
        return (acc % Q).astype(I32)

    try:
        dt = timeit(ntt_mxu_bf16, a)
        w6 = np.asarray(ntt_mxu_bf16(a))
        ok6 = np.array_equal(w6, np.asarray(f_ntt(a)))
        results["ntt_mxu_bf16"] = dt
        print(f"ntt bf16-MXU matmul: {dt*1e3:.3f} ms/batch ({B/dt:.0f} NTT/s)"
              f" exact={ok6}", flush=True)
    except Exception as e:
        print("ntt bf16-MXU failed:", repr(e)[:200], flush=True)

    print(json.dumps({k: round(v, 6) for k, v in results.items()}),
          flush=True)


if __name__ == "__main__":
    main()
