"""BinFHEContext — the user-facing API (reference: binfhecontext.h:51-495).

Mirrors the reference surface: GenerateBinFHEContext(paramset, method),
KeyGen, BTKeyGen, Encrypt/Decrypt, EvalBinGate, EvalNOT, Bootstrap, and the
extended single-key ops. Every Eval* accepts ciphertexts with an arbitrary
leading batch shape — the TPU-native axis the reference lacks.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import boot
from .constants import (
    BINFHE_METHOD,
    BINFHE_PARAMSET,
    BINGATE,
    KEYGEN_MODE,
)
from .ops.modmath import I32
from .params import BinFHEParams, build_params, get_tables
from .rng import Sampler
from .schemes import lwe


class BinFHEContext:
    """Stateful convenience wrapper over the functional layers. Holds the
    sampler (deterministic, seeded), static params, NTT tables, and keys."""

    def __init__(self, seed: int = 0):
        self.sampler = Sampler(seed)
        self.params: BinFHEParams | None = None
        self.tables = None
        self.bt_key: boot.RingGSWBTKey | None = None

    # ------------------------------------------------------------ contexts
    def GenerateBinFHEContext(
        self,
        paramset: BINFHE_PARAMSET | str,
        method: BINFHE_METHOD = BINFHE_METHOD.GINX,
    ) -> "BinFHEContext":
        if isinstance(paramset, str):
            paramset = BINFHE_PARAMSET[paramset]
        self.params = build_params(paramset, method)
        lp = self.params.lwe
        self.tables = get_tables(lp.N, lp.Q)
        return self

    # -------------------------------------------------------------- keygen
    def KeyGen(self) -> np.ndarray:
        """LWE secret key (binfhecontext.cpp:231)."""
        self.lwe_sk = lwe.key_gen(self.sampler, self.params.lwe)
        return self.lwe_sk

    def BTKeyGen(
        self, sk: np.ndarray | None = None,
        keygen_mode: KEYGEN_MODE = KEYGEN_MODE.SYM_ENCRYPT,
    ) -> boot.RingGSWBTKey:
        """Bootstrapping key generation (binfhecontext.cpp:475-490)."""
        sk = self.lwe_sk if sk is None else sk
        self.bt_key = boot.bt_key_gen(
            self.sampler, self.params, self.tables, sk, keygen_mode)
        return self.bt_key

    # ------------------------------------------------------------- enc/dec
    def Encrypt(self, sk: np.ndarray, m, p: int = 4, mod: int | None = None):
        return lwe.encrypt(self.sampler, self.params.lwe, sk, m, p, mod)

    def Decrypt(self, sk: np.ndarray, ct: lwe.LWECiphertext, p: int = 4):
        return lwe.decrypt(self.params.lwe, sk, ct, p)

    # ---------------------------------------------------------------- eval
    def EvalBinGate(self, gate: BINGATE, ct1, ct2) -> lwe.LWECiphertext:
        return boot.eval_bin_gate(
            self.tables, self.params, gate, self.bt_key, ct1, ct2)

    def EvalBinGateMulti(self, gate: BINGATE, cts: list) -> lwe.LWECiphertext:
        return boot.eval_bin_gate_multi(
            self.tables, self.params, gate, self.bt_key, cts)

    def EvalNOT(self, ct) -> lwe.LWECiphertext:
        return boot.eval_not(self.params, ct)

    def Bootstrap(self, ct, p: int = 4) -> lwe.LWECiphertext:
        return boot.bootstrap(self.tables, self.params, self.bt_key, ct, p)

    # ----------------------------------------------------------- constants
    def GetMaxPlaintextSpace(self) -> int:
        return self.params.lwe.q // (2 * self.params.lwe.N // self.params.lwe.q)

    def GetBeta(self) -> int:
        return 128
