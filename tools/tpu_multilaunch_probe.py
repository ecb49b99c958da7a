"""r5 probe: the 64k-batch GINX config via multi-launch (VERDICT r4 task
#1a — PLAN.md's own fallback for the 64k single-launch compile failure).

Measures the full STD128 GINX NAND gate:
  sync4   : 4 x 16384 sequential launches, each awaited (the naive form)
  queued4 : 4 x 16384 launches issued back-to-back, awaited at the end
            (jax async dispatch queues them -> device-side back-to-back
            execution; host gaps and the ~25 ms tunnel dispatch floor
            overlap with device compute)
  single  : one 16384 launch (reference point)

Writes tools/multilaunch_probe.json.
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
from mkfhe_tpu import BinFHEContext, boot
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE

CHUNK = 16384
N_CHUNKS = 4

cc = BinFHEContext(seed=12)
cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
sk = cc.KeyGen()
cc.BTKeyGen(sk)

m1 = np.resize(np.array([0, 0, 1, 1]), CHUNK)
m2 = np.resize(np.array([0, 1, 0, 1]), CHUNK)
cts1 = [cc.Encrypt(sk, np.roll(m1, i)) for i in range(N_CHUNKS)]
ct2 = cc.Encrypt(sk, m2)

# NOTE: call the already-jitted gate directly so tables/params/key stay
# ARGUMENTS — an outer jax.jit closure would embed the ~100 MB of key
# material as HLO constants and blow the remote-compile request (413).
def fn(a1, b1, a2, b2):
    return boot._gate_jit(
        cc.tables, cc.params, BINGATE.NAND, cc.bt_key, a1, b1, a2, b2)


def sync(out):
    _ = int(np.asarray(out.b[0]))


# warmup + compile
out = fn(cts1[0].a, cts1[0].b, ct2.a, ct2.b)
sync(out)

rows = {}

# single 16k launch
times = []
for _ in range(3):
    t0 = time.perf_counter()
    out = fn(cts1[0].a, cts1[0].b, ct2.a, ct2.b)
    sync(out)
    times.append(time.perf_counter() - t0)
dt = float(np.median(times))
rows["single_16k"] = {"sec": round(dt, 3),
                      "gates_per_sec": round(CHUNK / dt, 1)}
print(rows["single_16k"], flush=True)

# 4 x 16k, awaited one by one
times = []
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(N_CHUNKS):
        out = fn(cts1[i].a, cts1[i].b, ct2.a, ct2.b)
        sync(out)
    times.append(time.perf_counter() - t0)
dt = float(np.median(times))
rows["sync4_64k"] = {"sec": round(dt, 3),
                     "gates_per_sec": round(N_CHUNKS * CHUNK / dt, 1)}
print(rows["sync4_64k"], flush=True)

# 4 x 16k queued (async dispatch), awaited at the end
times = []
for _ in range(2):
    t0 = time.perf_counter()
    outs = [fn(cts1[i].a, cts1[i].b, ct2.a, ct2.b) for i in range(N_CHUNKS)]
    for o in outs:
        sync(o)
    times.append(time.perf_counter() - t0)
dt = float(np.median(times))
rows["queued4_64k"] = {"sec": round(dt, 3),
                       "gates_per_sec": round(N_CHUNKS * CHUNK / dt, 1)}
print(rows["queued4_64k"], flush=True)

# decrypt-check the last chunk
res = np.asarray(cc.Decrypt(sk, outs[-1]))
want = 1 - (np.roll(m1, N_CHUNKS - 1) & m2)
rows["correct"] = bool(np.array_equal(res, want))
print("correct:", rows["correct"], flush=True)

with open("/root/repo/tools/multilaunch_probe.json", "w") as f:
    json.dump({"note": "r5 multi-launch 64k config (folded tables on)",
               "chunk": CHUNK, "n_chunks": N_CHUNKS, "rows": rows},
              f, indent=1)
print("written tools/multilaunch_probe.json")
