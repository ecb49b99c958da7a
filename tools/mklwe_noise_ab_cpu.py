"""CPU noise A/B: expanded vs compact MKLWE keyswitch at the SAME k and
seeds (r4 VERDICT task #2's 'noise comparison vs the expanded-table
path'). The expanded k=8 gather graph no longer compiles through the
TPU tunnel (3.1 GB table — tools/ksweep_mklwe.json error row), so the
controlled comparison runs on CPU at a reduced batch.

Writes tools/mklwe_noise_ab.json.
"""
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from mkfhe_tpu import BinFHEContext, boot
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET
from mkfhe_tpu.schemes import mklwe as _mklwe
from mkfhe_tpu.utils import metrics

BATCH = 16
SET = sys.argv[1] if len(sys.argv) > 1 else "STD100_MKNTRU_LWE_3"

rows = []
for ks in ("expanded", "compact"):
    cc = BinFHEContext(seed=13)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET[SET], BINFHE_METHOD.MKNTRU_LWE)
    cc.params = dataclasses.replace(
        cc.params, mklwe=dataclasses.replace(
            cc.params.mklwe, ks_compact=(ks == "compact")))
    sk = cc.MKLWE_KeyGen()
    cc.MKBTKeyGen(sk)
    rng = np.random.default_rng(1)
    m1 = rng.integers(0, 2, BATCH)
    m2 = rng.integers(0, 2, BATCH)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    out = boot._mk_gate_mklwe_jit(
        cc.tables, cc.params, cc.mk_bt_key, ct1.a, ct1.b, ct2.a, ct2.b)
    want = 1 - (m1 & m2)
    out_h = _mklwe.MKLWECiphertext(np.asarray(out.a), np.asarray(out.b))
    res = np.asarray(cc.Decrypt(sk, out_h))
    noise = metrics.noise_stats(
        metrics.noise_mklwe(cc.params.mklwe, sk, out_h, want),
        cc.params.mklwe.q)
    row = {"paramset": SET, "k": cc.params.mklwe.k, "keyswitch": ks,
           "batch": BATCH,
           "errors": int((res != want).sum()),
           "noise_std": round(noise["std"], 1),
           "noise_p99": round(noise["p99"], 1),
           "noise_margin_frac": round(noise["margin_frac"], 4)}
    print(json.dumps(row), flush=True)
    rows.append(row)
    jax.clear_caches()

# analytic expectation: KS variance ratio ~ dc*Bc^2/12 / d_exp (compact
# signed base-4, 8 digits vs one fresh-encryption error per of 3 digits)
mp = cc.params.mklwe
pred = (mp.digits_c * mp.base_c ** 2 / 12.0) / mp.digits_ks
out = {"rows": rows,
       "analytic_ks_variance_ratio_compact_over_expanded": round(pred, 3)}
with open(os.path.join(os.path.dirname(__file__),
                       "mklwe_noise_ab.json"), "w") as fh:
    json.dump(out, fh, indent=1)
print("written tools/mklwe_noise_ab.json")
