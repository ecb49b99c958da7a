"""Benchmark: gate bootstraps/sec per chip.

Default run prints TWO JSON lines — the MK 2-party MKNTRU NAND row first,
then the single-key GINX row LAST (the driver parses the final line, which
must carry the north-star metric):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline semantics (BASELINE.md), PER ROW:
  * MK row: vs_baseline == vs_ref_cpu — speedup over the measured
    reference CPU (435 ms/gate, MK k=2 NAND; the reference publishes no
    numbers of its own).
  * single-key row: vs_baseline == vs_north_star — fraction of the
    BASELINE.json target of 10,000 single-key bootstraps/sec/chip.
Use --mk-only / --single-key to run one row.
Each run also carries MXU-roofline fields (mxu_macs_per_sec,
efficiency_vs_peak vs the v5e int8 peak) and batch noise statistics
(noise_p99, noise_margin_frac) — the "every modular kernel profiled
against roofline" BASELINE bullet.

Usage: python bench.py [--paramset STD100_MKNTRU] [--batch N] [--reps 3]
       [--single-key]   (bench STD128 GINX instead)
Default batches are the measured saturation points (1024 MK / 4096
single-key, tools/batch_sweep.json).
"""

import argparse
import json
import sys
import time

import numpy as np


def bench_mkntru(paramset: str, batch: int, reps: int):
    import jax
    from mkfhe_tpu import BinFHEContext, boot
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.utils import metrics

    cc = BinFHEContext(seed=11)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET[paramset], BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)

    m1 = np.resize(np.array([0, 0, 1, 1]), batch)
    m2 = np.resize(np.array([0, 1, 0, 1]), batch)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)

    fn = lambda c1, c2: boot._mk_gate_mntru_jit(
        cc.tables, cc.params, cc.mk_bt_key, cc.ct_nand.c, c1, c2).c

    # distinct input per rep (fresh Enc(0) randomizer added to ct1) so no
    # layer (XLA or the device tunnel) can serve a cached result. MK NAND
    # outputs are NAND-shifted (DecryptNAND decode) and thus NOT directly
    # composable, so rep-chaining is not an option here.
    from mkfhe_tpu.schemes import mntru as _mntru
    zero = np.zeros(batch, np.int64)
    c1s = [_mntru.eval_add(
               ct1, cc.Encrypt(sk, zero), cc.params.mntru.q).c
           for _ in range(reps)]

    out = fn(ct1.c, ct2.c)
    _ = int(out[0, 0, 0])   # warmup AND await it (block_until_ready
                            # returns early over the tunnel)
    # per-rep wall time with a SCALAR host fetch (median): over the axon
    # tunnel block_until_ready returns before execution completes (0.0s
    # readings with distinct inputs, r4 k=4 ksweep) and a full-array fetch
    # costs ~0.2s of transfer; fetching one element forces completion at
    # roundtrip cost only
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(c1s[r], ct2.c)
        _ = int(out[0, 0, 0])           # scalar fetch (see note below)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    want = 1 - (m1 & m2)
    ct_out = type(cc.ct_nand)(np.asarray(out))
    res = np.asarray(cc.Decrypt(sk, ct_out))
    correct = bool(np.array_equal(res, want))
    noise = metrics.noise_stats(
        metrics.noise_mntru(cc.params.mntru, sk, ct_out, want),
        cc.params.mntru.q)
    return batch / dt, correct, dt, cc.params, noise


def bench_ginx(paramset: str, batch: int, reps: int):
    import jax
    from mkfhe_tpu import BinFHEContext, boot
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.utils import metrics

    cc = BinFHEContext(seed=12)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET[paramset], BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)

    m1 = np.resize(np.array([0, 0, 1, 1]), batch)
    m2 = np.resize(np.array([0, 1, 0, 1]), batch)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)

    fn = lambda a1, b1, a2, b2: boot._gate_jit(
        cc.tables, cc.params, BINGATE.NAND, cc.bt_key, a1, b1, a2, b2)

    out = fn(ct1.a, ct1.b, ct2.a, ct2.b)
    _ = int(out.b[0])       # warmup + await (tunnel-safe)
    # chained reps (see bench_mkntru): cache-proof timing
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
    correct = bool(np.array_equal(res, want))
    noise = metrics.noise_stats(
        metrics.noise_lwe(cc.params.lwe, sk, out, want), cc.params.lwe.q)
    return batch / dt, correct, dt, cc.params, noise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paramset", default="STD100_MKNTRU")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: measured saturation per mode (1024 MK / "
                         "4096 single-key; tools/batch_sweep.json r4)")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--single-key", action="store_true",
                    help="bench ONLY the single-key GINX row")
    ap.add_argument("--mk-only", action="store_true",
                    help="bench ONLY the MK 2-party row")
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--party", type=int, default=2)
    ap.add_argument("--ntt", default="auto",
                    choices=["auto", "mxu_s8", "mxu", "butterfly"])
    ap.add_argument("--fused", default="auto",
                    choices=["auto", "on", "off"],
                    help="fused Pallas blind-rotation kernels")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace into DIR")
    args = ap.parse_args()

    import jax
    from mkfhe_tpu.ops import ntt as _ntt
    from mkfhe_tpu.utils import metrics
    impl = args.ntt
    if impl == "auto":
        impl = "butterfly" if jax.default_backend() == "cpu" else "mxu_s8"
    _ntt.set_default_impl(impl)

    from mkfhe_tpu.ops import fused as _fused
    if args.fused != "auto":
        _fused.set_mode(args.fused)

    # modes to run this invocation. Default (no selector flag): BOTH
    # flagship rows — MK 2-party first, single-key GINX LAST so the
    # driver-parsed final line carries the north-star metric (r4 VERDICT
    # weak #4 / task #7).
    if args.sharded:
        modes = ["sharded"]
    elif args.single_key:
        modes = ["single_key"]
    elif args.mk_only:
        modes = ["mk"]
    else:
        modes = ["mk", "single_key"]

    def run(mode, batch):
        if mode == "sharded":
            value, correct, dt, n_dev, party, params, noise = bench_sharded(
                args.paramset, batch, args.reps, args.party)
            metric = (f"sharded gate bootstraps/sec ({n_dev} devices, "
                      f"dp x party={party}, {args.paramset})")
        elif mode == "single_key":
            value, correct, dt, params, noise = bench_ginx(
                "STD128", batch, args.reps)
            metric = "single-key GINX NAND bootstraps/sec/chip (STD128)"
        else:
            value, correct, dt, params, noise = bench_mkntru(
                args.paramset, batch, args.reps)
            metric = ("gate bootstraps/sec/chip (NAND, 2-party MKNTRU, %s)"
                      % args.paramset)
        return metric, value, correct, dt, params, noise

    def run_safe(mode, batch):
        try:
            return run(mode, batch)
        except Exception as e:
            if not _fused.enabled():
                raise
            # fused-kernel compile/runtime failure: fall back to the
            # lax.scan path rather than losing the bench datapoint
            print(f"# fused path failed ({type(e).__name__}); "
                  "falling back to scan", file=sys.stderr, flush=True)
            _fused.set_mode("off")
            return run(mode, batch)

    north_star = 10_000.0
    ref_gates_per_sec = 1000.0 / 435.0  # measured reference CPU, MK k=2

    rows = []
    for mode in modes:
        if args.batch is not None:
            batch = args.batch
        else:
            # measured saturation points (tools/batch_sweep r4): MK flat
            # from 1024; single-key GINX peaks 4096-16384
            batch = 4096 if mode == "single_key" else 1024
        cur_impl = impl
        _ntt.set_default_impl(cur_impl)
        if args.profile:
            import jax.profiler

            with jax.profiler.trace(args.profile):
                out = run_safe(mode, batch)
            print(f"# trace written to {args.profile}", flush=True)
        else:
            out = run_safe(mode, batch)
        metric, value, correct, dt, params, noise = out
        if not correct and _fused.enabled():
            # exactness guard stage 0: drop the fused kernels first
            _fused.set_mode("off")
            metric, value, correct, dt, params, noise = run(mode, batch)
        while not correct and cur_impl != "butterfly":
            # exactness guard: step down mxu_s8 -> mxu -> butterfly
            cur_impl = {"mxu_s8": "mxu", "mxu": "butterfly"}[cur_impl]
            _ntt.set_default_impl(cur_impl)
            metric, value, correct, dt, params, noise = run(mode, batch)

        roof = metrics.mxu_roofline(params, 1.0 / value)
        row = {
            "metric": metric,
            "value": round(value, 3),
            "unit": "bootstraps/sec",
            "batch": batch,
            "sec_per_batch": round(dt, 3),
            "ntt": cur_impl,
            "fused": _fused.enabled(),
            "correct": correct,
            "mxu_macs_per_gate": roof["mxu_macs"],
            "mxu_macs_per_sec": float(f"{roof['mxu_macs_per_sec']:.4g}"),
            "efficiency_vs_peak": round(roof["efficiency_vs_peak"], 4),
            "noise_p99": round(noise["p99"], 1),
            "noise_margin_frac": round(noise["margin_frac"], 4),
        }
        if mode == "single_key":
            # the BASELINE.json north star is a SINGLE-KEY target; this is
            # the only row where the ratio is meaningful
            row["vs_baseline"] = round(value / north_star, 4)
            row["vs_north_star"] = round(value / north_star, 4)
            row["baseline_ref"] = "north_star_10k_single_key_per_chip"
        else:
            # vs the measured reference CPU (435 ms/gate, MK k=2 NAND,
            # BASELINE.md 'Measured round 1')
            row["vs_baseline"] = round(value / ref_gates_per_sec, 3)
            row["vs_ref_cpu"] = round(value / ref_gates_per_sec, 3)
            row["baseline_ref"] = "ref_cpu_435ms_per_gate_mk2"
        rows.append(row)
        print(json.dumps(row), flush=True)




def bench_sharded(paramset: str, batch: int, reps: int, party: int):
    """Batched MK gates over a (dp, party) mesh of ALL local devices —
    the BASELINE '64k concurrent bootstraps with ICI collectives' config,
    scaled to the available chip count."""
    import jax
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.parallel import make_mesh, shard_mk_gate
    from mkfhe_tpu.schemes import mntru as mntru_mod
    from mkfhe_tpu.utils import metrics

    cc = BinFHEContext(seed=11)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET[paramset], BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)

    n_dev = len(jax.devices())
    party = party if n_dev % party == 0 else 1
    mesh = make_mesh(n_dev, party=party)

    m1 = np.resize(np.array([0, 0, 1, 1]), batch)
    m2 = np.resize(np.array([0, 1, 0, 1]), batch)
    ct1, ct2 = cc.Encrypt(sk, m1), cc.Encrypt(sk, m2)

    # distinct input per rep (fresh Enc(0) randomizer, same scheme as
    # bench_mkntru) so no layer can serve a cached execution (r3 VERDICT
    # weak #3)
    zero = np.zeros(batch, np.int64)
    c1s = [mntru_mod.eval_add(
               ct1, cc.Encrypt(sk, zero), cc.params.mntru.q).c
           for _ in range(reps)]

    with mesh:
        fn, _ = shard_mk_gate(mesh, cc.tables, cc.params, cc.mk_bt_key)
        out = fn(cc.ct_nand.c, ct1.c, ct2.c)
        _ = int(out[0, 0, 0])   # warmup + await (tunnel-safe)
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            out = fn(cc.ct_nand.c, c1s[r], ct2.c)
            _ = int(out[0, 0, 0])       # scalar fetch forces completion
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        out_np = np.asarray(out)

    ct_out = mntru_mod.MNTRUCiphertext(out_np)
    res = mntru_mod.decrypt(cc.params.mntru, sk, ct_out)
    want = 1 - (m1 & m2)
    correct = bool(np.array_equal(res, want))
    noise = metrics.noise_stats(
        metrics.noise_mntru(cc.params.mntru, sk, ct_out, want),
        cc.params.mntru.q)
    return batch / dt, correct, dt, n_dev, party, cc.params, noise


if __name__ == "__main__":
    main()
