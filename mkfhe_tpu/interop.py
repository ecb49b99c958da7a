"""Cross-library serialization interop (PLAN #6).

Exports this framework's key/ciphertext containers in the raw int64 dump
layout shared with the oracle capture harnesses, so the C++ bridge
(oracle/interop_cereal.cpp) can lift them into the reference's own cereal
BINARY serialization (utils/serial.h, binfhecontext-ser.h) and back.
Combined with the bridge's reference-side Decrypt, this gives key/ct
exchange with the reference through its native serialization layer —
no capture binaries involved.
"""

import os

import numpy as np

from .ops.ntt import host_ntt_inv


def _write(path: str, name: str, arr) -> None:
    np.asarray(arr, np.int64).tofile(os.path.join(path, name + ".bin"))


def export_ginx_dir(cc, sk, path: str, cts: dict | None = None) -> None:
    """Dump a GINX context's bootstrapping key, switching key, LWE secret
    and optional ciphertexts in the capture-harness layout
    (capture_ginx.cpp): bskey [n, 2, dg2, 2, N] COEFFICIENT, ksk_a
    [N, bks, dks, n], ksk_b [N, bks, dks], sk [n], ct [n+1]."""
    os.makedirs(path, exist_ok=True)
    lp = cc.params.lwe
    rp = cc.params.rgsw
    dg2 = 2 * (rp.digits_g - 1)
    dks = lp.digits_ks
    with open(os.path.join(path, "meta.txt"), "w") as fh:
        fh.write(f"paramset {cc.params.paramset.value}\nn {lp.n}\nN {lp.N}"
                 f"\nq {lp.q}\nQ {lp.Q}\nqks {lp.q_ks}\nbks {lp.base_ks}"
                 f"\nbaseG {rp.base_g}\ndigitsG {rp.digits_g}\ndks {dks}\n")
    # our BSkey is EVAL; the interchange layout is COEFFICIENT
    bs_eval = np.asarray(cc.bt_key.bs.key, np.int64)
    _write(path, "bskey", host_ntt_inv(cc.tables, bs_eval))
    _write(path, "ksk_a", np.asarray(cc.bt_key.ks.A))
    _write(path, "ksk_b", np.asarray(cc.bt_key.ks.B))
    _write(path, "sk", np.asarray(sk))
    for name, ct in (cts or {}).items():
        v = np.concatenate([np.asarray(ct.a, np.int64).reshape(-1),
                            np.asarray(ct.b, np.int64).reshape(1)])
        _write(path, name, v)


def read_raw(path: str, name: str, shape=None):
    a = np.fromfile(os.path.join(path, name + ".bin"), dtype=np.int64)
    return a.reshape(shape) if shape is not None else a
