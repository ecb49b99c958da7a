"""r5 probe: A/B the input-limb-folded weight tables (VERDICT r4 task #1b)
on the fused single-key GINX rotation kernel, at a batch large enough to
amortize the ~25 ms tunnel dispatch floor (BASELINE.md r4).

Writes tools/folded_probe.json.
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
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET
from mkfhe_tpu.ops import fused
from mkfhe_tpu.ops.modmath import I32

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
cc = BinFHEContext(seed=12)
cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
sk = cc.KeyGen()
cc.BTKeyGen(sk)
params = cc.params.rgsw
tables = cc.tables
key = cc.bt_key.bs.key
key_sh = cc.bt_key.bs.key_sh
n, N, Q = key.shape[0], params.N, params.Q
rng = np.random.default_rng(0)
acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)), I32)
c_pos = jnp.asarray(rng.integers(0, 2 * N, (B, n)), I32)
c_neg = (2 * N - c_pos) % (2 * N)


def _sync(out):
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *a, reps=3):
    out = fn(*a)
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


rows = []
ref_out = None
for folded in (False, True):
    fused.set_folded(cggi=folded)
    wf = (cc.bt_key.bs.winv_f, cc.bt_key.bs.wfwd_f) if folded else (None, None)
    fn = jax.jit(lambda a_, cp, cn, _wf=wf: fused.cggi_scan_fused(
        tables, params, key, a_, cp, cn, key_sh,
        winv_f=_wf[0], wfwd_f=_wf[1]))
    dt, out = timeit(fn, acc, c_pos, c_neg)
    out_np = np.asarray(out)
    if ref_out is None:
        ref_out = out_np
        exact = True
    else:
        exact = bool(np.array_equal(out_np, ref_out))
    row = {
        "folded": folded,
        "batch": B,
        "rotation_sec": round(dt, 4),
        "us_per_step_per_tile": round(
            dt / n / (B / min(B, fused.get_batch_tile())) * 1e6, 2),
        "rot_gates_per_sec": round(B / dt, 1),
        "bit_equal_to_unfolded": exact,
    }
    print(row, flush=True)
    rows.append(row)

fused.set_folded(cggi=True)
with open("/root/repo/tools/folded_probe.json", "w") as f:
    json.dump({"note": "fused CGGI rotation only (no keyswitch), STD128, "
                       "r5 folded-table A/B", "rows": rows}, f, indent=1)
print("written tools/folded_probe.json")
