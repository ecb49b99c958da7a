"""r5 probe: tuning sweep on the 4-step fused CGGI rotation — batch tile
BT in {256, 512} (the block planes freed ~20 MB of VMEM vs the folded
tables, so bigger tiles may now fit well) x interleave on/off.

Writes tools/ntt4_tune.json.
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
bs = cc.bt_key.bs
n, N, Q = bs.key.shape[0], params.N, params.Q
rng = np.random.default_rng(0)
acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)), I32)
c_pos = jnp.asarray(rng.integers(0, 2 * N, (B, n)), I32)
c_neg = (2 * N - c_pos) % (2 * N)


def _sync(out):
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


rows = []
for bt in (256, 512):
    for inter in (True, False):
        fused.set_batch_tile(bt)
        fused.set_cggi_interleave(inter)
        fn = jax.jit(lambda a_, cp, cn: fused.cggi_scan_fused(
            tables, params, bs.key, a_, cp, cn, bs.key_sh,
            winv_f=bs.winv_f, wfwd_f=bs.wfwd_f, vi4=bs.vi4, vf4=bs.vf4))
        try:
            t0 = time.perf_counter()
            out = fn(acc, c_pos, c_neg)
            _sync(out)
            warm = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(acc, c_pos, c_neg)
                _sync(out)
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            row = {"bt": bt, "interleave": inter, "batch": B,
                   "rot_gates_per_sec": round(B / dt, 1),
                   "warm_incl_compile_sec": round(warm, 1)}
        except Exception as e:  # noqa: BLE001 - record compile failures
            row = {"bt": bt, "interleave": inter, "batch": B,
                   "error": str(e)[:200]}
        print(row, flush=True)
        rows.append(row)
        jax.clear_caches()

fused.set_batch_tile(256)
fused.set_cggi_interleave(True)
with open("/root/repo/tools/ntt4_tune.json", "w") as f:
    json.dump({"note": "4-step fused CGGI rotation tuning sweep",
               "rows": rows}, f, indent=1)
print("written tools/ntt4_tune.json")
