"""Batch-tile probe: single-key GINX at batch 16384 with BT=256 (default)
vs BT=512 — does a bigger tile amortize per-step overheads at saturation?
Writes tools/bt512_probe.json."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

def measure(cc, sk, batch, reps):
    from mkfhe_tpu import boot
    from mkfhe_tpu.constants import BINGATE
    m1 = np.resize(np.array([0, 0, 1, 1]), batch)
    m2 = np.resize(np.array([0, 1, 0, 1]), batch)
    ct1 = cc.Encrypt(sk, m1); ct2 = cc.Encrypt(sk, m2)
    fn = lambda a1, b1, a2, b2: boot._gate_jit(
        cc.tables, cc.params, BINGATE.NAND, cc.bt_key, a1, b1, a2, b2)
    out = fn(ct1.a, ct1.b, ct2.a, ct2.b)
    _ = int(out.b[0])
    times = []
    for _r in range(reps):
        t0 = time.perf_counter()
        out = fn(out.a, out.b, ct2.a, ct2.b)
        _ = int(out.b[0])
        times.append(time.perf_counter() - t0)
    want = 1 - (m1 & m2)
    for _r in range(reps):
        want = 1 - (want & m2)
    res = np.asarray(cc.Decrypt(sk, out))
    return float(np.median(times)), bool(np.array_equal(res, want)), times

def main():
    import jax
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET
    from mkfhe_tpu.ops import fused, ntt as _ntt
    _ntt.set_default_impl("mxu_s8")
    cc = BinFHEContext(seed=12)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
    sk = cc.KeyGen(); cc.BTKeyGen(sk)
    batch = 16384
    rows = []
    for bt in (256, 512):
        try:
            fused.set_batch_tile(bt)
            dt, ok, times = measure(cc, sk, batch, 2)
            rows.append({"bt": bt, "batch": batch,
                         "gates_per_sec": round(batch / dt, 1),
                         "sec_per_batch": round(dt, 3), "correct": ok,
                         "rep_times_sec": [round(t, 3) for t in times]})
        except Exception as e:
            rows.append({"bt": bt, "batch": batch,
                         "error": f"{type(e).__name__}: {str(e)[:160]}"})
        print(json.dumps(rows[-1]), flush=True)
    fused.set_batch_tile(256)
    with open(os.path.join(os.path.dirname(__file__),
                           "bt512_probe.json"), "w") as fh:
        json.dump(rows, fh, indent=1)

if __name__ == "__main__":
    main()
