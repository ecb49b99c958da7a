"""Component timing of the fused single-key GINX gate on the real TPU:
(a) one-hot monomial build, (b) the pallas blind-rotation kernel,
(c) full gate. Drives the round-3 perf attack (VERDICT r2 next #1)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mkfhe_tpu.ops import ntt as nttm
nttm.set_default_impl("mxu_s8")
from mkfhe_tpu import BinFHEContext, boot
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
from mkfhe_tpu.ops import fused
from mkfhe_tpu.ops.modmath import I32

B = 128
cc = BinFHEContext(seed=12)
cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
sk = cc.KeyGen(); cc.BTKeyGen(sk)
params = cc.params.rgsw
tables = cc.tables
key = cc.bt_key.bs.key
n = key.shape[0]; N = params.N; Q = params.Q
rng = np.random.default_rng(0)
acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)), I32)
c_pos = jnp.asarray(rng.integers(0, 2*N, (B, n)), I32)
c_neg = (2*N - c_pos) % (2*N)

def timeit(name, fn, *a, reps=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/reps
    print(f"{name:30s} {dt*1e3:8.2f} ms  ({dt/B*1e6:7.1f} us/ct)")
    return dt

mono = jax.jit(lambda c: nttm.monomial_minus_one_mxu(tables, c.T))
t_mono = timeit("monomial one-hot [n,B,N] x2", lambda c1, c2: (mono(c1), mono(c2)), c_pos, c_neg)

full = jax.jit(lambda a_, cp, cn: fused.cggi_scan_fused(tables, params, key, a_, cp, cn))
t_full = timeit("cggi_scan_fused (incl mono)", full, acc, c_pos, c_neg)

# kernel alone: reuse prebuilt monomials by calling the inner pallas path
monp = mono(c_pos); monn = mono(c_neg)
eksh = fused._shoup_companions(key, Q)
from functools import partial
dg = params.digits_g - 1
mxu = nttm.get_mxu_tables(tables)
winv = jnp.asarray(mxu.W_inv_s8); wfwd = jnp.asarray(mxu.W_fwd_s8)
shift = jnp.asarray(fused._shift_row(tables, params.base_g).astype(np.int32))
n_limbs_q = -(-(Q-1).bit_length()//7)
kernel = partial(fused._cggi_kernel, Q=Q, base_g=params.base_g, dg=dg,
                 n_steps=n, n_limbs_q=n_limbs_q)
BT = min(B, 128)
def pal(acc_, key_, eksh_, monp_, monn_):
    with jax.enable_x64(False):
        return fused._pallas_cggi(kernel, (B//BT,), B, BT, N, 2*dg, mxu,
                                  acc_, key_, eksh_, monp_, monn_, winv, wfwd, shift)
pal_j = jax.jit(pal)
t_pal = timeit("pallas kernel only", pal_j, acc, key, eksh, monp, monn)
print(f"per-step kernel: {t_pal/n*1e6:.1f} us for {B} cts")
# roofline: kernel MACs/step
macs_step = (2*B*16 + 2*dg*B*2*4) * N * N
print(f"kernel MACs/step {macs_step/1e9:.2f}G -> at peak {macs_step/1.97e14*1e6:.1f} us")

# ---- tail breakdown
from mkfhe_tpu.schemes import lwe
lp = cc.params.lwe
b_in = jnp.asarray(rng.integers(0, lp.q, (B,)), I32)
tv = jax.jit(lambda b: boot.make_gate_test_vector(cc.params, BINGATE.NAND, b))
t_tv = timeit("test vector build", tv, b_in)
m_coeff = tv(b_in)
tvn = jax.jit(lambda m: nttm.ntt_fwd(tables, m))
t_tvn = timeit("test vector NTT", tvn, m_coeff)
accf = pal_j(acc, key, eksh, monp, monn)
ext = jax.jit(lambda a_: boot.extract_and_switch(tables, cc.params, cc.bt_key.ks, a_, (lp.Q>>3)+1))
t_ext = timeit("extract+ms+keyswitch+ms", ext, accf)
# keyswitch alone
a_coeff = jnp.asarray(rng.integers(0, lp.q_ks, (B, N)), I32)
b_c = jnp.asarray(rng.integers(0, lp.q_ks, (B,)), I32)
ksj = jax.jit(lambda a_, b_: lwe.key_switch(lwe.LWECiphertext(a_, b_), cc.bt_key.ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n))
t_ks = timeit("key_switch alone", ksj, a_coeff, b_c)
