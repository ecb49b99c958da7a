"""Consolidated TPU experiment session — one process, one device claim.

1. MXU exactness spot-checks at the current margin.
2. Gate benches: MKNTRU STD100 + GINX STD128, butterfly vs mxu, two batch
   sizes, with correctness verification. JSON line per result.
"""

import json
import time

import numpy as np


def bench_gate(kind, paramset, impl, batch, reps=1):
    import jax
    from mkfhe_tpu import BinFHEContext, boot
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.ops import ntt as nttm

    nttm.set_default_impl(impl)
    cc = BinFHEContext(seed=11)
    m1 = np.resize(np.array([0, 0, 1, 1]), batch)
    m2 = np.resize(np.array([0, 1, 0, 1]), batch)

    if kind == "mkntru":
        cc.GenerateBinFHEContext(
            BINFHE_PARAMSET[paramset], BINFHE_METHOD.MKNTRU)
        sk = cc.MNTRU_KeyGen()
        cc.MKBTKeyGen(sk)
        cc.ctGateGen(sk, BINGATE.NAND)
        ct1, ct2 = cc.Encrypt(sk, m1), cc.Encrypt(sk, m2)
        fn = lambda: boot._mk_gate_mntru_jit(
            cc.tables, cc.params, cc.mk_bt_key, cc.ct_nand.c, ct1.c, ct2.c).c
        dec = lambda out: cc.Decrypt(sk, type(cc.ct_nand)(out))
    else:
        cc.GenerateBinFHEContext(
            BINFHE_PARAMSET[paramset], BINFHE_METHOD.GINX)
        sk = cc.KeyGen()
        cc.BTKeyGen(sk)
        ct1, ct2 = cc.Encrypt(sk, m1), cc.Encrypt(sk, m2)
        fn = lambda: boot._gate_jit(
            cc.tables, cc.params, BINGATE.NAND, cc.bt_key,
            ct1.a, ct1.b, ct2.a, ct2.b)
        dec = lambda out: cc.Decrypt(sk, out)

    t_c0 = time.perf_counter()
    out = fn()
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    res = np.asarray(dec(out if kind != "mkntru" else np.asarray(out)))
    correct = bool(np.array_equal(res, 1 - (m1 & m2)))
    print(json.dumps({
        "bench": f"{kind}:{paramset}", "impl": impl, "batch": batch,
        "gates_per_sec": round(batch / dt, 2), "sec_per_batch": round(dt, 3),
        "compile_s": round(compile_s, 1), "correct": correct,
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mkfhe_tpu.ops import ntt as nttm

    print("device:", jax.devices(), flush=True)

    # 1. exactness spot check at current margin
    for N in (1024, 2048):
        Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
        t = nttm.make_ntt_tables(N, Q)
        mxu = nttm.get_mxu_tables(t)
        rng = np.random.default_rng(2)
        a_np = rng.integers(0, Q, (8, N))
        a = jnp.asarray(a_np, jnp.int32)
        got = np.asarray(nttm.ntt_fwd_mxu(t, mxu, a), np.int64)
        want = nttm.host_ntt_fwd(t, a_np)
        print(f"mxu N={N} limbs=({mxu.a_bits},{mxu.w_bits}) exact="
              f"{np.array_equal(got, want)}", flush=True)

    # 1b. s8 exactness
    for N in (2048,):
        Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
        t = nttm.make_ntt_tables(N, Q)
        rng = np.random.default_rng(3)
        a_np = np.concatenate(
            [np.full((1, N), Q - 1), rng.integers(0, Q, (7, N))])
        a = jnp.asarray(a_np, jnp.int32)
        nttm.set_default_impl("mxu_s8")
        got = np.asarray(nttm.ntt_fwd(t, a), np.int64)
        nttm.set_default_impl("butterfly")
        print(f"mxu_s8 N={N} exact="
              f"{np.array_equal(got, nttm.host_ntt_fwd(t, a_np))}",
              flush=True)

    # 2. gate benches
    for impl in ("mxu_s8", "mxu", "butterfly"):
        for batch in (32, 128):
            bench_gate("mkntru", "STD100_MKNTRU", impl, batch)
    for impl in ("mxu_s8",):
        for batch in (128, 512):
            bench_gate("ginx", "STD128", impl, batch)


if __name__ == "__main__":
    main()
