"""Measured error-rate artifact for the thin-margin single-key sets
(r3 VERDICT weak #7): 3/4-input gates at their spec sets, >=1k random
trials each, so the '~2.4 sigma margin' comments become recorded rates.

Usage: python tools/bench_errrate_multi.py [--batch 1024]
Writes tools/errrate_multi.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASES = [
    # (paramset, method, gate, n_inputs, p)
    ("STD128_3", "GINX", "AND3", 3, 6),
    ("STD128_3", "GINX", "OR3", 3, 6),
    ("STD128_3", "GINX", "MAJORITY", 3, 4),   # ptmodulus 4 per
                                              # UnitTestFHEW.cpp:222
    ("STD128_4", "GINX", "AND4", 4, 8),
    ("STD128_4", "GINX", "OR4", 4, 8),
    ("STD128_3_LMKCDEY", "LMKCDEY", "AND3", 3, 6),
    ("STD128_3_LMKCDEY", "LMKCDEY", "OR3", 3, 6),
    ("STD128_4_LMKCDEY", "LMKCDEY", "AND4", 4, 8),
]

TRUTH = {
    "AND3": lambda m: (m.sum(0) == 3).astype(np.int64),
    "OR3": lambda m: (m.sum(0) > 0).astype(np.int64),
    "MAJORITY": lambda m: (m.sum(0) >= 2).astype(np.int64),
    "AND4": lambda m: (m.sum(0) == 4).astype(np.int64),
    "OR4": lambda m: (m.sum(0) > 0).astype(np.int64),
}


def run_case(paramset, method, gate, n_inputs, p, batch, ctx_cache):
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE

    key = (paramset, method)
    if key not in ctx_cache:
        cc = BinFHEContext(seed=sum(map(ord, paramset)))
        cc.GenerateBinFHEContext(
            BINFHE_PARAMSET[paramset], BINFHE_METHOD[method])
        sk = cc.KeyGen()
        cc.BTKeyGen(sk)
        ctx_cache[key] = (cc, sk)
    cc, sk = ctx_cache[key]

    rng = np.random.default_rng(1234)
    ms = rng.integers(0, 2, size=(n_inputs, batch))
    cts = [cc.Encrypt(sk, ms[i], p=p) for i in range(n_inputs)]
    out = cc.EvalBinGateMulti(BINGATE[gate], cts, p=p)
    # decode at the input ptmodulus, exactly as the reference unittests
    # (UnitTestFHEW.cpp:476 Decrypt(..., ptmodulus)); a p=4 decode of a
    # p=8-encoded output sits ON the rounding boundary and reads ~half
    # the batch wrong (measured before this fix)
    res = np.asarray(cc.Decrypt(sk, out, p=p))
    want = TRUTH[gate](ms)
    from mkfhe_tpu.utils import metrics
    e = metrics.noise_lwe(cc.params.lwe, sk, out, want, p=p)
    q = cc.params.lwe.q
    margin = q / (2 * p)            # p-input margin, not the q/8 default
    a = np.abs(e.astype(np.float64))
    p99 = float(np.percentile(a, 99))
    return {
        "paramset": paramset, "method": method, "gate": gate,
        "trials": batch, "p": p,
        "errors": int((res != want).sum()),
        "error_rate": round(float((res != want).mean()), 5),
        "noise_std": round(float(e.std()), 1),
        "noise_p99": round(p99, 1),
        "noise_max": round(float(a.max()), 1),
        "margin_q_2p": round(margin, 1),
        "noise_margin_frac": round(p99 / margin, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax
    from mkfhe_tpu.ops import ntt as _ntt
    _ntt.set_default_impl(
        "butterfly" if jax.default_backend() == "cpu" else "mxu_s8")

    rows, cache = [], {}
    for case in CASES:
        try:
            r = run_case(*case, args.batch, cache)
        except Exception as e:  # noqa: BLE001
            r = {"paramset": case[0], "gate": case[2],
                 "error": f"{type(e).__name__}: {str(e)[:160]}"}
        rows.append(r)
        print(json.dumps(r), flush=True)

    with open(os.path.join(os.path.dirname(__file__),
                           "errrate_multi.json"), "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
