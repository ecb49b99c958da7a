"""Minimal TOY_MKNTRU NAND repro with phase timing (round-2 debugging)."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env may force 'axon'
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()


def tic(msg):
    global t0
    t1 = time.time()
    print(f"[{t1 - t0:7.2f}s] {msg}", flush=True)
    t0 = t1


from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
tic("imports")

cc = BinFHEContext(seed=3)
cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY_MKNTRU, BINFHE_METHOD.MKNTRU)
tic("context gen")
sk = cc.MNTRU_KeyGen()
tic("MNTRU_KeyGen")
cc.MKBTKeyGen(sk)
tic("MKBTKeyGen")
cc.ctGateGen(sk, BINGATE.NAND)
tic("ctGateGen")

M1 = np.array([0, 0, 1, 1])
M2 = np.array([0, 1, 0, 1])
ct1 = cc.Encrypt(sk, M1)
ct2 = cc.Encrypt(sk, M2)
tic("encrypt")
out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
tic("EvalBinGate (incl compile)")
dec = cc.Decrypt(sk, out)
tic("decrypt")
print("result:", dec, "expected: [1 1 1 0]",
      "OK" if list(dec) == [1, 1, 1, 0] else "FAIL", flush=True)
