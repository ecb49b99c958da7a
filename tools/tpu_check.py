"""Kernel-by-kernel exactness validation on the current default device
(run on TPU to localize emulation/precision faults vs the numpy ground
truth). Prints PASS/FAIL per kernel."""

import numpy as np


def check(name, got, want):
    got = np.asarray(got, np.int64)
    want = np.asarray(want, np.int64)
    ok = np.array_equal(got, want)
    n_bad = int((got != want).sum()) if got.shape == want.shape else -1
    print(f"{name}: {'PASS' if ok else f'FAIL ({n_bad}/{want.size} bad)'}",
          flush=True)
    return ok


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices(), flush=True)
    from mkfhe_tpu.ops import ntt as nttm
    from mkfhe_tpu.ops.decompose import signed_digit_decompose
    from mkfhe_tpu.ops.modmath import exact_mod_matmul, round_q_Q
    from mkfhe_tpu.ops.poly import monomial_minus_one_eval, transpose_eval

    N = 2048
    Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
    t = nttm.make_ntt_tables(N, Q)
    host = nttm._host_tables(N, Q)
    rng = np.random.default_rng(7)
    a_np = rng.integers(0, Q, (4, N))
    a = jnp.asarray(a_np, jnp.int32)

    # ground truth via native host NTT
    want_f = nttm.host_ntt_fwd(t, a_np)
    want_i = nttm.host_ntt_inv(t, a_np)

    nttm.set_default_impl("butterfly")
    check("ntt_fwd butterfly", nttm.ntt_fwd(t, a), want_f)
    check("ntt_inv butterfly", nttm.ntt_inv(t, a), want_i)

    nttm.set_default_impl("mxu")
    check("ntt_fwd mxu", nttm.ntt_fwd(t, a), want_f)
    check("ntt_inv mxu", nttm.ntt_inv(t, a), want_i)
    nttm.set_default_impl("butterfly")

    # s64 elementwise mulmod
    b_np = rng.integers(0, Q, (4, N))
    b = jnp.asarray(b_np, jnp.int32)
    got = ((a.astype(jnp.int64) * b.astype(jnp.int64)) % Q).astype(jnp.int32)
    check("s64 mulmod", got, a_np * b_np % Q)

    # signed digit decompose
    got = signed_digit_decompose(a, Q, 512, 2)
    d0 = a_np.astype(np.int64)
    d0 = np.where(d0 >= Q // 2, d0 - Q, d0)
    outs = []
    r = ((d0 + 256) & 511) - 256
    d0 = (d0 - r) >> 9
    for _ in range(2):
        r = ((d0 + 256) & 511) - 256
        d0 = (d0 - r) >> 9
        outs.append(np.where(r < 0, r + Q, r))
    check("decompose", got, np.stack(outs))

    # exact_mod_matmul (key-switch shape)
    qks = 45181
    dig = rng.integers(0, 32, (3, 6144))
    ksk = rng.integers(0, qks, (6144, 560))
    want = np.stack([
        (dig[i].astype(object) @ ksk.astype(object)) % qks for i in range(3)
    ]).astype(np.int64)
    got = exact_mod_matmul(
        jnp.asarray(dig, jnp.int32), jnp.asarray(ksk, jnp.int32),
        qks, a_bits=5)
    check("exact_mod_matmul", got, want)

    # round_q_Q
    v = rng.integers(0, Q, 10000)
    want = ((2 * v * qks + Q) // (2 * Q)) % qks
    got = round_q_Q(jnp.asarray(v, jnp.int32), qks, Q)
    check("round_q_Q", got, want)

    # monomial gather + transpose
    c = jnp.asarray(rng.integers(0, 2 * N, 4), jnp.int32)
    mon = monomial_minus_one_eval(t, c)
    mon_coeff = nttm.host_ntt_inv(t, np.asarray(mon, np.int64))
    ok = True
    for i, cv in enumerate(np.asarray(c)):
        w = np.zeros(N, np.int64)
        w[0] = (w[0] - 1) % Q
        cv = int(cv) % (2 * N)
        if cv < N:
            w[cv] = (w[cv] + 1) % Q
        else:
            w[cv - N] = (w[cv - N] - 1) % Q
        ok &= np.array_equal(mon_coeff[i], w)
    print("monomial gather:", "PASS" if ok else "FAIL", flush=True)

    # full TOY MK gate
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE

    for impl in ("butterfly", "mxu"):
        nttm.set_default_impl(impl)
        cc = BinFHEContext(seed=3)
        cc.GenerateBinFHEContext(
            BINFHE_PARAMSET.TOY_MKNTRU, BINFHE_METHOD.MKNTRU)
        sk = cc.MNTRU_KeyGen()
        cc.MKBTKeyGen(sk)
        cc.ctGateGen(sk, BINGATE.NAND)
        m1 = np.array([0, 0, 1, 1])
        m2 = np.array([0, 1, 0, 1])
        out = cc.EvalBinGate(
            BINGATE.NAND, cc.Encrypt(sk, m1), cc.Encrypt(sk, m2))
        res = cc.Decrypt(sk, out)
        print(f"TOY MK gate [{impl}]: "
              f"{'PASS' if np.array_equal(res, [1, 1, 1, 0]) else 'FAIL'} "
              f"{np.asarray(res)}", flush=True)


if __name__ == "__main__":
    main()
