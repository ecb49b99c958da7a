"""Mirror of the reference example src/binfhe/examples/boolean-mkntru.cpp:
2-party matrix-NTRU multi-key NAND gate bootstrap.

python examples/boolean_mkntru.py [--paramset STD100_MKNTRU] [--batch 1]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paramset", default="STD100_MKNTRU")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cc = BinFHEContext(seed=args.seed)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET[args.paramset], BINFHE_METHOD.MKNTRU)

    print("Generating sk")
    sk = cc.MNTRU_KeyGen()

    m0, m1 = 1, 0

    print("Generating the bootstrapping keys...")
    cc.MKBTKeyGen(sk)
    print("Completed the key generation.")
    cc.ctGateGen(sk, BINGATE.NAND)
    print("Completed the ctNAND.")

    print("encrypting")
    ct1 = cc.Encrypt(sk, np.full(args.batch, m0))
    ct2 = cc.Encrypt(sk, np.full(args.batch, m1))

    t0 = time.perf_counter()
    ct_out = cc.EvalBinGate(BINGATE.NAND, ct1, ct2)
    ct_out.c.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"Time of gate bootstrapping:\t{dt*1000:.1f}ms "
          f"({args.batch} gate(s), {dt*1000/args.batch:.2f} ms/gate)")

    result = cc.Decrypt(sk, ct_out)
    print(f"Result of encrypted computation of ( {m0} NAND {m1} ) = "
          f"{np.asarray(result)[0]}")


if __name__ == "__main__":
    main()
