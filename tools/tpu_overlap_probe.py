"""MXU/VPU overlap experiment (PLAN 'Perf frontier' #1, r3 VERDICT #2):
measure the fused single-key GINX kernel with the batched contraction vs
the interleaved per-digit-row variant (fused.set_cggi_interleave) on the
real TPU. Chained reps, decrypt-checked.

Usage: python tools/tpu_overlap_probe.py [--batch 512] [--reps 3]
Appends one JSON line per variant to tools/overlap_probe.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(cc, sk, batch, reps):
    from mkfhe_tpu import boot
    from mkfhe_tpu.constants import BINGATE

    m1 = np.resize(np.array([0, 0, 1, 1]), batch)
    m2 = np.resize(np.array([0, 1, 0, 1]), batch)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    fn = lambda a1, b1, a2, b2: boot._gate_jit(
        cc.tables, cc.params, BINGATE.NAND, cc.bt_key, a1, b1, a2, b2)
    out = fn(ct1.a, ct1.b, ct2.a, ct2.b)
    _ = int(out.b[0])       # warmup + await (tunnel-safe)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(out.a, out.b, ct2.a, ct2.b)
        _ = int(out.b[0])               # scalar fetch forces completion
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    want = 1 - (m1 & m2)
    for _ in range(reps):
        want = 1 - (want & m2)
    res = np.asarray(cc.Decrypt(sk, out))
    return dt, bool(np.array_equal(res, want)), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET
    from mkfhe_tpu.ops import fused, ntt as _ntt
    _ntt.set_default_impl(
        "butterfly" if jax.default_backend() == "cpu" else "mxu_s8")

    cc = BinFHEContext(seed=12)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)

    rows = []
    for variant, on in (("batched", False), ("interleave", True)):
        fused.set_cggi_interleave(on)
        dt, ok, times = measure(cc, sk, args.batch, args.reps)
        rows.append({
            "variant": variant, "batch": args.batch,
            "gates_per_sec": round(args.batch / dt, 1),
            "sec_per_batch": round(dt, 4), "correct": ok,
            "rep_times_sec": [round(t, 4) for t in times],
        })
        print(json.dumps(rows[-1]), flush=True)
    fused.set_cggi_interleave(False)

    with open(os.path.join(os.path.dirname(__file__),
                           "overlap_probe.json"), "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
