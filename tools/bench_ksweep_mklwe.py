"""MKLWE (MKNTRU_LWE method) k-scaling: NAND correctness + throughput at
k = 2/4 (STD100_MKNTRU_LWE, _2) on the real TPU — the MKLWE story beyond
k=2 (r3 VERDICT missing #4). Writes tools/ksweep_mklwe.json.

Usage: python tools/bench_ksweep_mklwe.py [--batch 64] [--reps 2]
"""

import argparse
import json
import os
import sys
import time

# --fused off: k=16 shapes fail the remote compile helper on the fused
# XZW_B kernel; the lax.scan path still runs them

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_one(paramset: str, batch: int, reps: int,
              ks: str = "auto") -> dict:
    import dataclasses

    from mkfhe_tpu import BinFHEContext, boot
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.schemes import mklwe as _mklwe
    from mkfhe_tpu.utils import metrics

    t0 = time.perf_counter()
    cc = BinFHEContext(seed=13)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET[paramset], BINFHE_METHOD.MKNTRU_LWE)
    if ks != "auto":
        # force the keyswitch flavor (r5: compact j-linear signed-digit
        # vs the reference-shaped expanded table)
        cc.params = dataclasses.replace(
            cc.params, mklwe=dataclasses.replace(
                cc.params.mklwe, ks_compact=(ks == "compact")))
    sk = cc.MKLWE_KeyGen()
    cc.MKBTKeyGen(sk)
    t_keygen = time.perf_counter() - t0

    k = cc.params.mklwe.k
    m1 = np.resize(np.array([0, 0, 1, 1]), batch)
    m2 = np.resize(np.array([0, 1, 0, 1]), batch)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)

    fn = lambda a1, b1, a2, b2: boot._mk_gate_mklwe_jit(
        cc.tables, cc.params, cc.mk_bt_key, a1, b1, a2, b2)
    zero = np.zeros(batch, np.int64)
    ct1s = [_mklwe.eval_add(ct1, cc.Encrypt(sk, zero), cc.params.mklwe.q)
            for _ in range(reps)]

    out = fn(ct1.a, ct1.b, ct2.a, ct2.b)
    _ = int(out.b[0])       # warmup + await (tunnel-safe)
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(ct1s[r].a, ct1s[r].b, ct2.a, ct2.b)
        _ = int(out.b[0])               # scalar fetch forces completion
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    want = 1 - (m1 & m2)
    out_host = _mklwe.MKLWECiphertext(np.asarray(out.a), np.asarray(out.b))
    res = np.asarray(cc.Decrypt(sk, out_host))
    noise = metrics.noise_stats(
        metrics.noise_mklwe(cc.params.mklwe, sk, out_host, want),
        cc.params.mklwe.q)
    return {
        "paramset": paramset, "k": k, "batch": batch,
        "keyswitch": ("compact" if cc.params.mklwe.ks_compact
                      else "expanded"),
        "gates_per_sec": round(batch / dt, 2),
        "sec_per_batch": round(dt, 3),
        "keygen_sec": round(t_keygen, 1),
        "error_rate": round(float((res != want).mean()), 4),
        "correct": bool(np.array_equal(res, want)),
        "noise_p99": round(noise["p99"], 1),
        "noise_std": round(noise["std"], 1),
        "noise_margin_frac": round(noise["margin_frac"], 4),
        "rep_times_sec": [round(t, 3) for t in times],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sets", nargs="*",
                    default=["STD100_MKNTRU_LWE", "STD100_MKNTRU_LWE_2"],
                    help="paramset, or paramset:compact / :expanded to "
                         "force a keyswitch flavor")
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--out", default=None,
                    help="output json (default tools/ksweep_mklwe.json)")
    args = ap.parse_args()

    from mkfhe_tpu.ops import fused as _fused
    if args.fused != "auto":
        _fused.set_mode(args.fused)

    import jax
    from mkfhe_tpu.ops import ntt as _ntt
    _ntt.set_default_impl(
        "butterfly" if jax.default_backend() == "cpu" else "mxu_s8")

    rows = []
    for s in args.sets:
        s, _, ks = s.partition(":")
        try:
            r = bench_one(s, args.batch, args.reps, ks or "auto")
        except Exception as e:
            r = {"paramset": s, "keyswitch": ks or "auto",
                 "error": f"{type(e).__name__}: {e}"[:400]}
        rows.append(r)
        print(json.dumps(r), flush=True)
        jax.clear_caches()

    out = args.out or os.path.join(os.path.dirname(__file__),
                                   "ksweep_mklwe.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
