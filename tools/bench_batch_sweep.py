"""Batch-scaling frontier: single-key GINX and 2-party MKNTRU NAND
throughput at batch 256 .. 65536 (or until HBM runs out), on the real TPU.

BASELINE.json configs[5] names a 64k-concurrent-bootstraps throughput
config; through r3 the largest measured batch was 512 (VERDICT r3 missing
#3). This sweep records gates/s + working-set estimate per point and the
reason the sweep stops (HBM OOM or completed).

Usage: python tools/bench_batch_sweep.py [--mode ginx|mk|both]
       [--max-batch 65536] [--reps 2]
Writes tools/batch_sweep.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def hbm_bytes_ginx(params, batch):
    """Rough working set: acc [B,2,N] i32 x ~4 live copies + key."""
    lp = params.lwe
    rg = params.rgsw
    dg2 = 2 * (rg.digits_g - 1)
    key = lp.n * 2 * dg2 * 2 * rg.N * 4 * 2     # key + shoup companions
    acc = batch * 2 * rg.N * 4
    return key + 6 * acc


def sweep_ginx(batches, reps):
    from mkfhe_tpu import BinFHEContext, boot
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE

    cc = BinFHEContext(seed=12)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)

    rows = []
    for batch in batches:
        try:
            m1 = np.resize(np.array([0, 0, 1, 1]), batch)
            m2 = np.resize(np.array([0, 1, 0, 1]), batch)
            ct1 = cc.Encrypt(sk, m1)
            ct2 = cc.Encrypt(sk, m2)
            fn = lambda a1, b1, a2, b2: boot._gate_jit(
                cc.tables, cc.params, BINGATE.NAND, cc.bt_key, a1, b1, a2, b2)
            out = fn(ct1.a, ct1.b, ct2.a, ct2.b)
            _ = int(out.b[0])   # warmup + await (tunnel-safe)
            # chained reps: rep i+1 consumes rep i's output (cache-proof)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(out.a, out.b, ct2.a, ct2.b)
                _ = int(out.b[0])       # scalar fetch forces completion
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            want = 1 - (m1 & m2)
            for _ in range(reps):
                want = 1 - (want & m2)
            res = np.asarray(cc.Decrypt(sk, out))
            rows.append({
                "mode": "ginx_std128", "batch": batch,
                "gates_per_sec": round(batch / dt, 1),
                "sec_per_batch": round(dt, 3),
                "correct": bool(np.array_equal(res, want)),
                "est_hbm_gb": round(
                    hbm_bytes_ginx(cc.params, batch) / 2**30, 2),
                "rep_times_sec": [round(t, 3) for t in times],
            })
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:  # noqa: BLE001 — record OOM/compile stops
            rows.append({"mode": "ginx_std128", "batch": batch,
                         "error": f"{type(e).__name__}: {str(e)[:200]}"})
            print(json.dumps(rows[-1]), flush=True)
            break
    return rows


def sweep_mk(batches, reps):
    from mkfhe_tpu import BinFHEContext, boot
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.schemes import mntru as _mntru

    cc = BinFHEContext(seed=11)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.STD100_MKNTRU, BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)

    rows = []
    for batch in batches:
        try:
            m1 = np.resize(np.array([0, 0, 1, 1]), batch)
            m2 = np.resize(np.array([0, 1, 0, 1]), batch)
            ct1 = cc.Encrypt(sk, m1)
            ct2 = cc.Encrypt(sk, m2)
            fn = lambda c1, c2: boot._mk_gate_mntru_jit(
                cc.tables, cc.params, cc.mk_bt_key, cc.ct_nand.c, c1, c2).c
            zero = np.zeros(batch, np.int64)
            c1s = [_mntru.eval_add(ct1, cc.Encrypt(sk, zero),
                                   cc.params.mntru.q).c for _ in range(reps)]
            out = fn(ct1.c, ct2.c)
            _ = int(out[0, 0, 0])   # warmup + await (tunnel-safe)
            times = []
            for r in range(reps):
                t0 = time.perf_counter()
                out = fn(c1s[r], ct2.c)
                _ = int(out[0, 0, 0])   # scalar fetch forces completion
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            want = 1 - (m1 & m2)
            res = np.asarray(cc.Decrypt(
                sk, _mntru.MNTRUCiphertext(np.asarray(out))))
            rows.append({
                "mode": "mkntru_std100_k2", "batch": batch,
                "gates_per_sec": round(batch / dt, 1),
                "sec_per_batch": round(dt, 3),
                "error_rate": round(float((res != want).mean()), 5),
                "rep_times_sec": [round(t, 3) for t in times],
            })
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:  # noqa: BLE001
            rows.append({"mode": "mkntru_std100_k2", "batch": batch,
                         "error": f"{type(e).__name__}: {str(e)[:200]}"})
            print(json.dumps(rows[-1]), flush=True)
            break
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both", choices=["ginx", "mk", "both"])
    ap.add_argument("--max-batch", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    from mkfhe_tpu.ops import ntt as _ntt
    _ntt.set_default_impl(
        "butterfly" if jax.default_backend() == "cpu" else "mxu_s8")

    batches = [b for b in (256, 1024, 4096, 16384, 65536)
               if b <= args.max_batch]
    rows = []
    if args.mode in ("ginx", "both"):
        rows += sweep_ginx(batches, args.reps)
        jax.clear_caches()
    if args.mode in ("mk", "both"):
        rows += sweep_mk(batches, args.reps)

    with open(os.path.join(os.path.dirname(__file__),
                           "batch_sweep.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("\n| mode | batch | gates/s | s/batch |")
    print("|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['mode']} | {r['batch']} | STOP: {r['error']} | |")
        else:
            print(f"| {r['mode']} | {r['batch']} | {r['gates_per_sec']} | "
                  f"{r['sec_per_batch']} |")


if __name__ == "__main__":
    main()
