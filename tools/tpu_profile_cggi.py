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

def _sync(out):
    # scalar fetch: block_until_ready returns early over the axon tunnel
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])

def timeit(name, fn, *a, reps=5):
    out = fn(*a); _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
        _sync(out)
    dt = (time.perf_counter()-t0)/reps
    print(f"{name:30s} {dt*1e3:8.2f} ms  ({dt/B*1e6:7.1f} us/ct)")
    return dt

# r4: monomials live IN the kernel (r3 optimization), so the
# decomposition is (full fused rotation) for both variants of the
# digit-transform/contraction schedule
full = jax.jit(lambda a_, cp, cn: fused.cggi_scan_fused(
    tables, params, key, a_, cp, cn))
t_full = timeit("cggi_scan_fused (interleave)", full, acc, c_pos, c_neg)
print(f"per-step: {t_full/n*1e6:.1f} us for {B} cts")
fused.set_cggi_interleave(False)
full2 = jax.jit(lambda a_, cp, cn: fused.cggi_scan_fused(
    tables, params, key, a_, cp, cn))
t_full2 = timeit("cggi_scan_fused (batched)", full2, acc, c_pos, c_neg)
print(f"per-step: {t_full2/n*1e6:.1f} us for {B} cts")
fused.set_cggi_interleave(True)
t_pal = t_full
dg = params.digits_g - 1
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
accf = full(acc, c_pos, c_neg)
ext = jax.jit(lambda a_: boot.extract_and_switch(tables, cc.params, cc.bt_key.ks, a_, (lp.Q>>3)+1))
t_ext = timeit("extract+ms+keyswitch+ms", ext, accf)
# keyswitch alone
a_coeff = jnp.asarray(rng.integers(0, lp.q_ks, (B, N)), I32)
b_c = jnp.asarray(rng.integers(0, lp.q_ks, (B,)), I32)
ksj = jax.jit(lambda a_, b_: lwe.key_switch(lwe.LWECiphertext(a_, b_), cc.bt_key.ks, lp.q_ks, lp.base_ks, lp.digits_ks, lp.n))
t_ks = timeit("key_switch alone", ksj, a_coeff, b_c)
