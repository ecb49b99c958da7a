"""r5 probe: A/B the 4-step factorized transform (PLAN 'Perf frontier'
lever #1 — ops.ntt.get_ntt4_tables) against the folded direct NTT on the
fused single-key GINX rotation kernel, plus the full-gate number.

Writes tools/ntt4_probe.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mkfhe_tpu.ops import ntt as nttm

nttm.set_default_impl("mxu_s8")
from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
from mkfhe_tpu.ops import fused
from mkfhe_tpu.ops.modmath import I32

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
cc = BinFHEContext(seed=12)
cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
sk = cc.KeyGen()
cc.BTKeyGen(sk)
params = cc.params.rgsw
tables = cc.tables
bs = cc.bt_key.bs
key = bs.key
key_sh = bs.key_sh
n, N, Q = key.shape[0], params.N, params.Q
rng = np.random.default_rng(0)
acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)), I32)
c_pos = jnp.asarray(rng.integers(0, 2 * N, (B, n)), I32)
c_neg = (2 * N - c_pos) % (2 * N)


def _sync(out):
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *a, reps=3):
    t0 = time.perf_counter()
    out = fn(*a)
    _sync(out)
    warm = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), warm, out


rows = []
ref_out = None
for mode in ("folded", "ntt4"):
    fused.set_4step(cggi=(mode == "ntt4"))
    fn = jax.jit(lambda a_, cp, cn: fused.cggi_scan_fused(
        tables, params, key, a_, cp, cn, key_sh,
        winv_f=bs.winv_f, wfwd_f=bs.wfwd_f, vi4=bs.vi4, vf4=bs.vf4))
    dt, warm, out = timeit(fn, acc, c_pos, c_neg)
    out_np = np.asarray(out)
    if ref_out is None:
        ref_out = out_np
        exact = True
    else:
        exact = bool(np.array_equal(out_np, ref_out))
    row = {
        "mode": mode,
        "batch": B,
        "rotation_sec": round(dt, 4),
        "warm_incl_compile_sec": round(warm, 1),
        "us_per_step_per_tile": round(
            dt / n / (B / min(B, fused.get_batch_tile())) * 1e6, 2),
        "rot_gates_per_sec": round(B / dt, 1),
        "bit_equal_to_folded": exact,
    }
    print(row, flush=True)
    rows.append(row)

# full-gate number with the winner (4-step stays on)
m1 = np.resize(np.array([0, 0, 1, 1]), B)
m2 = np.resize(np.array([0, 1, 0, 1]), B)
cts = [(cc.Encrypt(sk, np.roll(m1, r)), cc.Encrypt(sk, m2))
       for r in range(3)]
t0 = time.perf_counter()
out = cc.EvalBinGate(BINGATE.NAND, *cts[0])
_ = int(np.asarray(out.b.ravel()[0]))
warm = time.perf_counter() - t0
times = []
for r in (1, 2):
    t0 = time.perf_counter()
    out = cc.EvalBinGate(BINGATE.NAND, *cts[r])
    _ = int(np.asarray(out.b.ravel()[0]))
    times.append(time.perf_counter() - t0)
dt = float(np.median(times))
res = np.asarray(cc.Decrypt(sk, out))
grow = {
    "mode": "ntt4_full_gate", "batch": B,
    "gates_per_sec": round(B / dt, 1),
    "warm_incl_compile_sec": round(warm, 1),
    "rep_times_sec": [round(t, 3) for t in times],
    "correct": bool(np.array_equal(res, 1 - (np.roll(m1, 2) & m2))),
}
print(grow, flush=True)
rows.append(grow)

with open("/root/repo/tools/ntt4_probe.json", "w") as f:
    json.dump({"note": "fused CGGI rotation A/B folded-direct vs 4-step "
                       "factorized NTT + full NAND gate, STD128", "rows": rows},
              f, indent=1)
print("written tools/ntt4_probe.json")
