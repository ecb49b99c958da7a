"""r5 probe: A/B the 4-step factorized transform on the fused XZW
multi-key gate (STD100_MKNTRU k=2, N=2048 -> G=16, the 16x MAC cut).
Full NAND gate through the public API, decrypt-checked.

Writes tools/ntt4_mk_probe.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from mkfhe_tpu.ops import ntt as nttm

nttm.set_default_impl("mxu_s8")
from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
from mkfhe_tpu.ops import fused

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["direct", "ntt4"]

cc = BinFHEContext(seed=7)
cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD100_MKNTRU,
                         BINFHE_METHOD.MKNTRU)
sk = cc.MNTRU_KeyGen()
cc.MKBTKeyGen(sk)
cc.ctGateGen(sk)

m1 = np.resize(np.array([0, 0, 1, 1]), B)
m2 = np.resize(np.array([0, 1, 0, 1]), B)
rows = []
for mode in modes:
    fused.set_4step(xzw=(mode == "ntt4"))
    cts = [(cc.Encrypt(sk, np.roll(m1, r)), cc.Encrypt(sk, m2))
           for r in range(3)]
    t0 = time.perf_counter()
    out = cc.EvalBinGate(BINGATE.NAND, *cts[0])
    _ = int(np.asarray(out.c.ravel()[0]))
    warm = time.perf_counter() - t0
    times = []
    for r in (1, 2):
        t0 = time.perf_counter()
        out = cc.EvalBinGate(BINGATE.NAND, *cts[r])
        _ = int(np.asarray(out.c.ravel()[0]))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    res = np.asarray(cc.Decrypt(sk, out))
    row = {
        "mode": mode, "batch": B,
        "gates_per_sec": round(B / dt, 1),
        "warm_incl_compile_sec": round(warm, 1),
        "rep_times_sec": [round(t, 3) for t in times],
        "correct": bool(np.array_equal(res, 1 - (np.roll(m1, 2) & m2))),
    }
    print(row, flush=True)
    rows.append(row)
    jax.clear_caches()

fused.set_4step(xzw=True)
with open("/root/repo/tools/ntt4_mk_probe.json", "w") as f:
    json.dump({"note": "full MK NAND gate (STD100_MKNTRU k=2) A/B: "
                       "direct s8 NTT vs 4-step factorized", "rows": rows},
              f, indent=1)
print("written tools/ntt4_mk_probe.json")
