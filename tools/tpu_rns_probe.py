"""Drive the dual-limb RNS big-Q path on the real TPU: STD128Q_4
(numberBits=50) NAND through the public API, decrypt-checked, plus the
large-precision EvalSign profile at TOY/logQ=17.

Usage: python tools/tpu_rns_probe.py
Writes tools/rns_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.ops import ntt as _ntt
    _ntt.set_default_impl(
        "butterfly" if jax.default_backend() == "cpu" else "mxu_s8")

    rows = []

    # ---- STD128Q_4 (50-bit) NAND, batch ladder (r5: all-u32 step +
    # minimal composite with reference-parity digits_g)
    cc = BinFHEContext(seed=9)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128Q_4, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    for batch in (64, 256, 1024):
        m1 = np.resize(np.array([0, 0, 1, 1]), batch)
        m2 = np.resize(np.array([0, 1, 0, 1]), batch)
        cts = [(cc.Encrypt(sk, np.roll(m1, r)), cc.Encrypt(sk, m2))
               for r in range(3)]
        t0 = time.perf_counter()
        out = cc.EvalBinGate(BINGATE.NAND, *cts[0])
        _ = int(np.asarray(out.b.ravel()[0]))       # tunnel-safe sync
        warm = time.perf_counter() - t0
        times = []
        for r in (1, 2):
            t0 = time.perf_counter()
            out = cc.EvalBinGate(BINGATE.NAND, *cts[r])
            _ = int(np.asarray(out.b.ravel()[0]))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        res = np.asarray(cc.Decrypt(sk, out))
        rows.append({
            "probe": "STD128Q_4_nand", "batch": batch,
            "limbs": list(cc.params.rgsw.limbs),
            "digits_g": cc.params.rgsw.digits_g,
            "gates_per_sec": round(batch / dt, 2),
            "sec_warm_incl_compile": round(warm, 1),
            "rep_times_sec": [round(t, 3) for t in times],
            "correct": bool(np.array_equal(res, 1 - (np.roll(m1, 2) & m2))),
        })
        print(json.dumps(rows[-1]), flush=True)
    jax.clear_caches()

    # ---- large-precision EvalSign (logQprime=54, qKS=2^35)
    cc = BinFHEContext(seed=21)
    cc.GenerateBinFHEContextExt(BINFHE_PARAMSET.TOY, arb_func=False,
                                logQ=17)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    mod = 1 << 17
    P = mod // 512
    half = P // 2
    m = np.array([half - 1, half, half + 1, 1])
    ct = cc.Encrypt(sk, m, p=P, mod=mod)
    t0 = time.perf_counter()
    ct_out = cc.EvalSign(ct, mod)
    dt = time.perf_counter() - t0
    res = np.asarray(cc.Decrypt(sk, ct_out, p=2))
    rows.append({
        "probe": "ext_profile_eval_sign_logQ17",
        "qks": cc.params.lwe.q_ks,
        "sec_incl_compile": round(dt, 1),
        "correct": bool(np.array_equal(res, (m >= half).astype(np.int64))),
    })
    print(json.dumps(rows[-1]), flush=True)

    with open(os.path.join(os.path.dirname(__file__),
                           "rns_probe.json"), "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
