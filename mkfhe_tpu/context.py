"""BinFHEContext — the user-facing API (reference: binfhecontext.h:51-495).

Mirrors the reference surface: GenerateBinFHEContext(paramset, method),
KeyGen, BTKeyGen, Encrypt/Decrypt, EvalBinGate, EvalNOT, Bootstrap, and the
extended single-key ops. Every Eval* accepts ciphertexts with an arbitrary
leading batch shape — the TPU-native axis the reference lacks.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import boot, security
from .constants import (
    BINFHE_METHOD,
    BINFHE_PARAMSET,
    BINGATE,
    KEYGEN_MODE,
)
from .ops.modmath import I32
from .params import BinFHEParams, build_params, get_tables
from .rng import Sampler
from .schemes import lwe, mklwe, mntru


class BinFHEContext:
    """Stateful convenience wrapper over the functional layers. Holds the
    sampler (deterministic, seeded), static params, NTT tables, and keys."""

    def __init__(self, seed: int = 0):
        self.sampler = Sampler(seed)
        self.params: BinFHEParams | None = None
        self.tables = None
        self.bt_key: boot.RingGSWBTKey | None = None
        self.mk_bt_key: boot.UniEncBTKey | None = None
        self.crs = None
        self.ct_nand = None

    # ------------------------------------------------------------ contexts
    def _reset_profile_meta(self):
        """Clear per-profile serialization metadata so a reused context
        that switches Generate* flavors never saves stale meta (a custom
        row or ext-profile attrs from a previous Generate call)."""
        for attr in ("_custom_row", "_ext_time_opt", "_ext_logQ",
                     "_ext_arb_func", "_ext_N"):
            if hasattr(self, attr):
                delattr(self, attr)

    def GenerateBinFHEContext(
        self,
        paramset: BINFHE_PARAMSET | str,
        method: BINFHE_METHOD = BINFHE_METHOD.GINX,
    ) -> "BinFHEContext":
        self._reset_profile_meta()
        if isinstance(paramset, str):
            paramset = BINFHE_PARAMSET[paramset]
        self.params = build_params(paramset, method)
        self._init_tables()
        return self

    def GenerateBinFHEContextCustom(
        self,
        ctx_params,
        method: BINFHE_METHOD = BINFHE_METHOD.GINX,
        paramset: BINFHE_PARAMSET | None = None,
    ) -> "BinFHEContext":
        """Fully-custom parameter overload (binfhecontext.h:94-118,
        binfhecontext.cpp:196-216). ctx_params: a constants.ContextParams."""
        from .params import build_params_from

        self._reset_profile_meta()
        self.params = build_params_from(ctx_params, method, paramset)
        self._custom_row = ctx_params     # for save/load_context round-trip
        self._init_tables()
        return self

    def GenerateBinFHEContextExt(
        self,
        paramset: BINFHE_PARAMSET | str,
        arb_func: bool,
        logQ: int = 11,
        N: int = 0,
        method: BINFHE_METHOD = BINFHE_METHOD.GINX,
        time_optimization: bool = False,
    ) -> "BinFHEContext":
        """Large-precision profile for EvalFunc/Floor/Sign/Decomp —
        GenerateBinFHEContext(set, arbFunc, logQ, N, method, timeOpt)
        (binfhecontext.h:96-97, binfhecontext.cpp:28-80): ciphertext
        modulus q = 2^logQ (11..29), intermediate prime of logQprime = 54
        bits (27 for logQ == 11) over the dual-limb RNS pair, qKS = 2^35
        (s64-wide keyswitch), baseG stepped by logQ, ring dim from the
        HE-standard table.
        """
        self._reset_profile_meta()
        if isinstance(paramset, str):
            paramset = BINFHE_PARAMSET[paramset]
        if logQ > 29:
            raise NotImplementedError("logQ > 29 is not supported")
        if logQ < 11:
            raise NotImplementedError("logQ < 11 is not supported")
        log_qprime = 54
        if logQ > 25:
            base_g = 1 << 14
        elif logQ > 16:
            base_g = 1 << 18
        elif logQ > 11:
            base_g = 1 << 27
        else:
            base_g = 1 << 5
            log_qprime = 27
        if method != BINFHE_METHOD.GINX:
            raise NotImplementedError(
                "large-precision profile supports GINX (reference default)")

        from .constants import SecretKeyDist
        from .params import (
            BinFHEParams, LWEParams, RGSWParams, derive_Q)

        ring_dim = security.find_ring_dim("ternary", "128_classic",
                                          log_qprime)
        if N >= ring_dim:
            ring_dim = N
        limbs: tuple = ()
        if log_qprime > 28:
            from .ops.rns import pick_limbs

            limbs = pick_limbs(log_qprime, 2 * ring_dim)
            Q = limbs[0] * limbs[1]
        else:
            Q = derive_Q(log_qprime, 2 * ring_dim)
        q = ring_dim if arb_func else 2 * ring_dim
        q_ks = 1 << 35
        n = 32 if paramset == BINFHE_PARAMSET.TOY else 1305

        lwe_p = LWEParams(
            n=n, N=ring_dim, q=q, Q=Q, q_ks=q_ks, std=3.19, base_ks=32,
            key_dist=SecretKeyDist.UNIFORM_TERNARY)
        rgsw_p = RGSWParams(
            N=ring_dim, Q=Q, q=q, base_g=base_g, base_r=23, method=method,
            std=3.19, key_dist=SecretKeyDist.UNIFORM_TERNARY, limbs=limbs)
        self.params = BinFHEParams(paramset, method, lwe=lwe_p, rgsw=rgsw_p)
        self._ext_time_opt = bool(time_optimization) and logQ != 11
        self._ext_logQ = logQ
        self._ext_arb_func = bool(arb_func)
        self._ext_N = N
        self._init_tables()
        return self

    def _init_tables(self):
        lp = self.params.lwe
        rg = self.params.rgsw
        if rg is not None and rg.limbs:
            # >28-bit modulus: per-limb RNS tables (ops/rns.py)
            from .params import get_rns_tables

            self.tables = get_rns_tables(lp.N, rg.limbs)
        else:
            self.tables = get_tables(lp.N, lp.Q)
        if self.params.unienc is not None:
            self.crs = boot.make_crs(self.sampler, self.params, self.tables)

    # -------------------------------------------------------------- keygen
    def KeyGen(self) -> np.ndarray:
        """LWE secret key (binfhecontext.cpp:231)."""
        self.lwe_sk = lwe.key_gen(self.sampler, self.params.lwe)
        return self.lwe_sk

    def BTKeyGen(
        self, sk: np.ndarray | None = None,
        keygen_mode: KEYGEN_MODE = KEYGEN_MODE.SYM_ENCRYPT,
        time_optimization: bool = False,
    ) -> boot.RingGSWBTKey:
        """Bootstrapping key generation (binfhecontext.cpp:375-398). With
        time_optimization, keys for the EvalSign/EvalDecomp dynamic gadget
        bases {2^14, 2^18, 2^27} are generated too (the reference's
        GPowerMap / Change_BaseG machinery, binfhecontext.cpp:381-389)."""
        import dataclasses

        sk = self.lwe_sk if sk is None else sk

        def gen(params):
            if params.rgsw.limbs:
                return boot.bt_key_gen_rns(
                    self.sampler, params, self.tables, sk)
            return boot.bt_key_gen(
                self.sampler, params, self.tables, sk, keygen_mode)

        self.bt_key = gen(self.params)
        self.bt_key_map = {self.params.rgsw.base_g: self.bt_key}
        if time_optimization or getattr(self, "_ext_time_opt", False):
            for base in (1 << 14, 1 << 18, 1 << 27):
                if base in self.bt_key_map:
                    continue
                p2 = dataclasses.replace(
                    self.params,
                    rgsw=dataclasses.replace(self.params.rgsw, base_g=base))
                self.bt_key_map[base] = gen(p2)
        return self.bt_key

    def NBTKeyGen(self, sk: np.ndarray | None = None) -> "boot.VectorNTRUBTKey":
        """NTRU (XZDDF) bootstrapping keys (binfhecontext.cpp:492-518)."""
        sk = self.lwe_sk if sk is None else sk
        self.nbt_key = boot.nbt_key_gen(
            self.sampler, self.params, self.tables, sk)
        return self.nbt_key

    # ------------------------------------- deserialized-key installation
    def BTKeyLoad(self, key: "boot.RingGSWBTKey") -> None:
        """Install deserialized bootstrapping keys
        (binfhecontext.h:300-302)."""
        self.bt_key = key
        self.bt_key_map = {self.params.rgsw.base_g: key}

    def NBTKeyLoad(self, key: "boot.VectorNTRUBTKey") -> None:
        """(binfhecontext.h:303-305)."""
        self.nbt_key = key

    def BTKeyMapLoadSingleElement(self, base_g: int,
                                  key: "boot.RingGSWBTKey") -> None:
        """Insert one (baseG -> BTKey) map entry after deserializing
        (binfhecontext.h:313-315)."""
        if not hasattr(self, "bt_key_map"):
            self.bt_key_map = {}
        self.bt_key_map[base_g] = key
        if base_g == self.params.rgsw.base_g:
            self.bt_key = key

    def ClearBTKeys(self) -> None:
        """(binfhecontext.h:322-332)."""
        self.bt_key = None
        self.bt_key_map = {}
        self.nbt_key = None

    # ----------------------------------------------------------- MK keygen
    def MNTRU_KeyGen(self):
        """k-user matrix-NTRU secret (binfhecontext.cpp:235-241)."""
        self.mntru_sk = mntru.key_gen(self.sampler, self.params.mntru)
        return self.mntru_sk

    def MKLWE_KeyGen(self):
        """k-user binary MKLWE secret (binfhecontext.cpp:244-249)."""
        self.mklwe_sk = mklwe.key_gen_binary(self.sampler, self.params.mklwe)
        return self.mklwe_sk

    def MKBTKeyGen(self, sk=None) -> boot.UniEncBTKey:
        """Multi-key bootstrapping keys (binfhecontext.cpp:520-570)."""
        from .constants import BINFHE_METHOD as M

        if self.params.method in (M.MKNTRU, M.MKNTRU_B):
            sk = self.mntru_sk if sk is None else sk
            self.mk_bt_key = boot.mk_bt_key_gen_mntru(
                self.sampler, self.params, self.tables, sk, self.crs)
        else:
            sk = self.mklwe_sk if sk is None else sk
            self.mk_bt_key = boot.mk_bt_key_gen_mklwe(
                self.sampler, self.params, self.tables, sk, self.crs)
        return self.mk_bt_key

    def ctGateGen(self, sk, gate: BINGATE = BINGATE.NAND):
        """Precompute the NAND offset ciphertext (binfhecontext.cpp:573)."""
        self.ct_nand = boot.ct_gate_gen(self.sampler, self.params, sk, gate)
        return self.ct_nand

    def KeyGenPair(self):
        """(pk, skN) pair at ring dimension (binfhecontext.cpp:251-254)."""
        skN = lwe.key_gen_N(self.sampler, self.params.lwe)
        pk = lwe.pub_key_gen(self.sampler, self.params.lwe, skN)
        return pk, skN

    def PubKeyGen(self, skN):
        return lwe.pub_key_gen(self.sampler, self.params.lwe, skN)

    # ------------------------------------------------------------- enc/dec
    def Encrypt(self, sk, m, p: int = 4, mod: int | None = None,
                output: str = "SMALL_DIM"):
        if isinstance(sk, lwe.LWEPublicKey):
            ct = lwe.encrypt_N(self.sampler, self.params.lwe, sk, m, p, mod)
            if output == "SMALL_DIM":
                return self.SwitchCTtoqn(ct)
            return ct
        if isinstance(sk, mntru.MNTRUPrivateKey):
            return mntru.encrypt(
                self.sampler, self.params.mntru, sk, m, p, mod)
        if self.params.mklwe is not None and isinstance(sk, np.ndarray) \
                and sk.ndim == 2:
            return mklwe.encrypt(
                self.sampler, self.params.mklwe, sk, m, p, mod)
        return lwe.encrypt(self.sampler, self.params.lwe, sk, m, p, mod)

    def SwitchCTtoqn(self, ct):
        """(N, Q) -> (n, q) via the bootstrap switching key
        (binfhecontext.cpp:312-325)."""
        return lwe.switch_ct_to_qn(ct, self.bt_key.ks, self.params.lwe)

    def Decrypt(self, sk, ct, p: int = 4):
        if isinstance(ct, mntru.MNTRUCiphertext):
            return mntru.decrypt(self.params.mntru, sk, ct, p)
        if isinstance(ct, mklwe.MKLWECiphertext):
            return mklwe.decrypt(self.params.mklwe, sk, ct, p)
        return lwe.decrypt(self.params.lwe, sk, ct, p)

    def Decrypt2(self, sk, ct, p: int = 4):
        """Fresh-encryption decode for MNTRU (mntru-pke.cpp:208-253)."""
        return mntru.decrypt2(self.params.mntru, sk, ct, p)

    def DecryptNAND(self, sk, ct, p: int = 4):
        """NAND-output decode (mntru-pke.cpp:255-304 /
        mklwe-pke.cpp:115-156)."""
        if isinstance(ct, mntru.MNTRUCiphertext):
            return mntru.decrypt_nand(self.params.mntru, sk, ct, p)
        return mklwe.decrypt_nand(self.params.mklwe, sk, ct, p)

    # ---------------------------------------------------------------- eval
    def EvalBinGate(self, gate: BINGATE, ct1, ct2):
        if isinstance(ct1, mntru.MNTRUCiphertext):
            return boot.eval_bin_gate_mntru(
                self.tables, self.params, gate, self.mk_bt_key,
                ct1, ct2, self.ct_nand)
        if isinstance(ct1, mklwe.MKLWECiphertext):
            return boot.eval_bin_gate_mklwe(
                self.tables, self.params, gate, self.mk_bt_key, ct1, ct2)
        if self.params.vntru is not None:
            return boot.eval_bin_gate_ntru(
                self.tables, self.params, gate, self.nbt_key, ct1, ct2)
        if self.params.rgsw.limbs:
            return boot.eval_bin_gate_rns(
                self.tables, self.params, gate, self.bt_key, ct1, ct2)
        return boot.eval_bin_gate(
            self.tables, self.params, gate, self.bt_key, ct1, ct2)

    def EvalBinGateMulti(self, gate: BINGATE, cts: list,
                         p: int | None = None) -> lwe.LWECiphertext:
        """3/4-input gates + CMUX (binfhe-base-scheme.cpp:636-692). p is
        the inputs' plaintext modulus (the reference reads it off the
        ciphertexts' ptModulus: 6 for 3-input, 8 for 4-input gates); when
        not given it is inferred from the gate so a forgotten p cannot
        silently produce wrong outputs.

        MARGIN WARNING: 3-input gates on the *_3_LMKCDEY parameter rows
        measure 1.5-1.7% per-gate error (~2.4 sigma margin, 1024 TPU
        trials — tools/errrate_multi.json); the GINX *_3 rows measure
        error-free. See the note in constants.PARAM_SETS."""
        if p is None:
            # MAJORITY runs at p=4 (UnitTestFHEW.cpp:222: 3 inputs,
            # ptmodulus 4 — distinguishing sum<2 from sum>=2 fits the
            # p=4 encoding); AND3/OR3 need p=6, AND4/OR4 p=8.
            if gate in (BINGATE.AND3, BINGATE.OR3):
                p = 6
            elif gate in (BINGATE.AND4, BINGATE.OR4):
                p = 8
            else:
                p = 4
        return boot.eval_bin_gate_multi(
            self.tables, self.params, gate, self.bt_key, cts, p)

    def EvalNOT(self, ct) -> lwe.LWECiphertext:
        return boot.eval_not(self.params, ct)

    def EvalConstant(self, value: bool) -> lwe.LWECiphertext:
        """Noiseless trivial encryption of a boolean constant
        (binfhecontext.cpp:440-442)."""
        return lwe.noiseless_embedding(self.params.lwe, int(bool(value)))

    def Bootstrap(self, ct, p: int = 4) -> lwe.LWECiphertext:
        return boot.bootstrap(self.tables, self.params, self.bt_key, ct, p)

    # ------------------------------------------------------- extended ops
    def GenerateLUTviaFunction(self, f, p: int) -> list[int]:
        """LUT over Z_q from f: Z_p -> Z_p (binfhecontext.cpp:468-489)."""
        if p & (p - 1):
            raise ValueError("plaintext space must be a power of two")
        q = self.params.lwe.q
        interval = q // p
        return [(f(i // interval, p) % p) * interval for i in range(q)]

    def EvalFunc(self, ct, lut: list[int]):
        from . import extended

        return extended.eval_func(
            self.tables, self.params, self.bt_key, ct, lut, self.GetBeta())

    def EvalFloor(self, ct, ct_mod: int, roundbits: int = 0):
        from . import extended

        return extended.eval_floor(
            self.tables, self.params, self.bt_key, ct, self.GetBeta(),
            ct_mod, roundbits)

    def EvalSign(self, ct, ct_mod: int):
        from . import extended

        if len(getattr(self, "bt_key_map", {})) > 1:
            return extended.eval_sign_dynamic(
                self.tables, self.params, self.bt_key_map, ct,
                self.GetBeta(), ct_mod)
        return extended.eval_sign(
            self.tables, self.params, self.bt_key, ct, self.GetBeta(), ct_mod)

    def EvalDecomp(self, ct, ct_mod: int):
        from . import extended

        return extended.eval_decomp(
            self.tables, self.params, self.bt_key, ct, self.GetBeta(), ct_mod)

    # ----------------------------------------------------------- constants
    def GetMaxPlaintextSpace(self) -> int:
        """q / 2beta (binfhecontext.h:482-485)."""
        return self.params.lwe.q // (self.GetBeta() << 1)

    def GetBeta(self) -> int:
        return 128
