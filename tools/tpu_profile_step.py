"""Per-component timing of the MKNTRU EvalAcc scan step on the real TPU.

Times each phase of acc/xzw.py's `step` in isolation (jitted, realistic
shapes, block_until_ready) to find where the ~13 ms/step goes. Each phase
is wrapped in a lax.fori loop of REPS iterations inside one jit so
dispatch overhead doesn't dominate, mirroring the in-gate conditions
(PLAN.md: microbenches mislead; this stays as close to in-gate as
possible while still attributing time).
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mkfhe_tpu.ops import ntt as ntt_mod
from mkfhe_tpu.ops.decompose import signed_digit_decompose
from mkfhe_tpu.ops.modmath import I32, I64, mod_add, mod_sub
from mkfhe_tpu.ops.ntt import make_ntt_tables, ntt_fwd_digits, ntt_inv
from mkfhe_tpu.ops.poly import monomial_minus_one_eval

ntt_mod.set_default_impl("mxu_s8")

N = 2048
Q = ntt_mod.previous_prime(ntt_mod.first_prime(27, 2 * N), 2 * N)
B, K, DG = 128, 2, 2
BASE_G = 1 << 9
REPS = 50

tables = make_ntt_tables(N, Q)
rng = np.random.default_rng(0)
acc0 = jnp.asarray(rng.integers(0, Q, (B, K, N)), I32)
df0 = jnp.asarray(rng.integers(0, Q, (B, DG, 2, N)), I32)
pkey = jnp.asarray(rng.integers(0, Q, (K, DG, N)), I32)
c0 = jnp.asarray(rng.integers(0, 2 * N, (B,)), I32)
dctn0 = jnp.asarray(rng.integers(-BASE_G // 2, BASE_G // 2, (B, K, DG, N)),
                    I32)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:38s} {dt:8.3f} ms")
    return dt


def loop(body):
    @jax.jit
    def run(x, *consts):
        def f(i, x):
            y = body(x, *consts)
            # keep same shape/dtype as x for fori carry by re-projecting
            return y
        return jax.lax.fori_loop(0, REPS, f, x)
    return run


# 1. INTT of the full acc [B,K,N]
def p_intt(acc):
    out = ntt_inv(tables, acc)
    return out.astype(I32) % Q  # keep in range for next iter

timeit("INTT acc [B,K,N]", loop(p_intt), acc0)


# 2. decompose only ([B,K,N] -> [DG,B,K,N]) then collapse back
def p_dec(acc):
    d = signed_digit_decompose(acc, Q, BASE_G, DG, signed=True)
    return (d.sum(axis=0) % Q).astype(I32)

timeit("decompose [B,K,N]", loop(p_dec), acc0)


# 3. forward digit NTT [DG,B,K,N]
def p_fwd(acc):
    d = signed_digit_decompose(acc, Q, BASE_G, DG, signed=True)
    f = ntt_fwd_digits(tables, d, BASE_G)
    return (f.sum(axis=0) % Q).astype(I32)

timeit("decompose+fwdNTT [DG,B,K,N]", loop(p_fwd), acc0)


# 4. contraction uj+v ([B,K,DG,N] x keys)
def p_contract(dctn):
    d64 = dctn.astype(I64)
    uj = (d64 * df0[:, None, :, 0, :].astype(I64)).sum(axis=2) % Q
    v = (d64 * pkey[None].astype(I64)).sum(axis=2) % Q
    return ((uj + v) % Q).astype(I32)[..., None, :] + dctn * 0

timeit("contract uj+v", loop(p_contract), dctn0)


# 5. monomial gather + pointwise mult
def p_monmul(acc):
    mon = monomial_minus_one_eval(tables, c0)
    t = (acc.astype(I64) * mon[:, None, :].astype(I64)) % Q
    return t.astype(I32)

timeit("monomial gather+mult", loop(p_monmul), acc0)


# 6. the full step (from xzw.step, ternary branch) for reference
from mkfhe_tpu.acc import xzw
from mkfhe_tpu.params import UniEncParams

params = UniEncParams(k=K, N=N, Q=Q, q=45181, base_g=BASE_G, digits_g=3,
                      sigma_e=0.25, sigma_r=0.15)


def p_fullstep(acc):
    mon_p = monomial_minus_one_eval(tables, c0)
    mon_n = monomial_minus_one_eval(tables, (2 * N - c0) % (2 * N))
    ek0 = df0[0, :, 0, :][None]
    ek1 = df0[0, :, 1, :][None]
    t2 = ((ek1.astype(I64) * mon_n[:, None, :].astype(I64)) % Q).astype(I32)
    df_d = mod_sub(mod_sub(jnp.broadcast_to(ek0, (B, DG, N)), t2, Q),
                   jnp.broadcast_to(ek1, (B, DG, N)), Q)
    acctemp = ((acc.astype(I64) * mon_p[:, None, :].astype(I64)) % Q
               ).astype(I32)
    ct = ntt_inv(tables, acctemp)
    dct = signed_digit_decompose(ct, Q, BASE_G, DG, signed=True)
    dct = ntt_fwd_digits(tables, dct, BASE_G)
    dctn = jnp.moveaxis(dct, 0, 2)
    d64 = dctn.astype(I64)
    uj = ((d64 * df_d[:, None].astype(I64)).sum(axis=2) % Q).astype(I32)
    v = ((d64 * pkey[None].astype(I64)).sum(axis=2) % Q).astype(I32)
    sum_v = mod_add(v[:, 0], v[:, 1], Q)
    sv_coeff = ntt_inv(tables, sum_v)
    dct2 = signed_digit_decompose(sv_coeff, Q, BASE_G, DG, signed=True)
    dct2 = ntt_fwd_digits(tables, dct2, BASE_G)
    dct2 = jnp.moveaxis(dct2, 0, 1)
    w = ((dct2.astype(I64) * df_d.astype(I64)).sum(axis=1) % Q).astype(I32)
    uhot = jnp.zeros((B, K), I32).at[:, 0].set(1)
    acctemp2 = jnp.where((uhot == 1)[:, :, None],
                         mod_add(uj, w[:, None, :], Q), uj)
    return mod_add(acc, acctemp2, Q)

t_full = timeit("FULL STEP", loop(p_fullstep), acc0)
print(f"\nprojected scan: {t_full * (K * 560 - 1):8.1f} ms "
      f"-> {B / (t_full * (K * 560 - 1) / 1e3):7.1f} gates/s")
