"""Observability: timers, noise measurement, roofline accounting.

Replaces the reference's ad-hoc machinery (SURVEY.md §5): TIC/TOC macros
(utils/debug.h:126-130), the WITH_NOISE_DEBUG stderr noise dumps
(mntru-pke.cpp:239-252, lwe-pke.cpp:237-242), and the absent structured
metrics. Everything here returns data (dicts/arrays), never prints.
"""

import time

import numpy as np


class Timer:
    """TIC/TOC with named laps; `with Timer() as t: ...; t.laps`."""

    def __init__(self):
        self.laps = {}
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.laps.setdefault("total", time.perf_counter() - self._t0)

    def lap(self, name: str):
        now = time.perf_counter()
        self.laps[name] = now - self._t0
        self._t0 = now


def _signed(x, q):
    x = np.asarray(x, np.int64) % q
    return np.where(x > q // 2, x - q, x)


def noise_lwe(params, sk, ct, m, p: int = 4):
    """Signed noise of an LWE ciphertext batch given the true message
    (the WITH_NOISE_DEBUG quantity, lwe-pke.cpp:237-242)."""
    q = params.q
    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    qks = params.q_ks
    s = _signed(sk, qks) % q
    phase = (b - a @ s) % q
    want = (np.asarray(m, np.int64) % p) * (q // p)
    return _signed(phase - want, q)


def noise_mntru(params, sk, ct, m, p: int = 4, nand_shifted: bool = True):
    """Signed noise of an MNTRU ciphertext batch (mntru-pke.cpp:343-356).
    nand_shifted: gate outputs encode m*q/4 - q/8."""
    q = params.q
    f0 = _signed(sk.F_col0, params.q_ks) % q
    c = np.asarray(ct.c, np.int64)
    phase = np.einsum("...kn,kn->...", c, f0) % q
    want = (np.asarray(m, np.int64) % p) * (q // p)
    if nand_shifted:
        want = (want - q // (2 * p)) % q
    return _signed(phase - want, q)


def noise_mklwe(params, sk, ct, m, p: int = 4):
    """Signed noise of an MKLWE ciphertext batch (the WITH_NOISE_DEBUG
    quantity). Unlike the MNTRU decode, MKLWE's Decrypt adds q/2p
    (mklwe-pke.cpp:66-112), so both fresh AND gate ciphertexts are
    centered at m*q/p — no NAND shift; the margin is q/2p."""
    q = params.q
    s = _signed(sk, params.q_ks) % q
    a = np.asarray(ct.a, np.int64)
    b = np.asarray(ct.b, np.int64)
    phase = (b - np.einsum("...kn,kn->...", a, s)) % q
    want = (np.asarray(m, np.int64) % p) * (q // p)
    return _signed(phase - want, q)


def noise_stats(noise: np.ndarray, q: int) -> dict:
    """Batch noise summary: std, max, p99, margin utilisation vs q/8."""
    a = np.abs(noise.astype(np.float64))
    margin = q / 8
    return {
        "std": float(noise.std()),
        "max": float(a.max()),
        "p99": float(np.percentile(a, 99)),
        "margin_frac": float(a.max() / margin),
    }


# ------------------------------------------------------------------ roofline

def gate_op_counts(params) -> dict:
    """Analytical op counts for ONE gate bootstrap (per ciphertext) —
    the denominator for roofline efficiency.

    Counts 'modmul' = one exact modular multiply (the unit the VPU path
    pays ~an emulated 64-bit multiply + constant-mod for).
    """
    if params.unienc is not None:
        up = params.unienc
        k, N = up.k, up.N
        n = (params.mntru or params.mklwe).n
        dg = up.digits_g - 1
        steps = k * n
        ntt_cost = (N // 2) * int(np.log2(N))
        # per step (HbProd): k INTTs + k*dg NTTs + 1 INTT + dg NTTs
        transforms = steps * ((k + 1) + (k + 1) * dg)
        pointwise = steps * (k * dg * 2 + dg + 2 * k) * N
        return {
            "transforms": transforms,
            "modmul": transforms * ntt_cost + pointwise,
            "steps": steps,
        }
    rp = params.rgsw
    N = rp.N
    n = params.lwe.n
    dg2 = 2 * (rp.digits_g - 1)
    ntt_cost = (N // 2) * int(np.log2(N))
    transforms = n * (2 + dg2)
    pointwise = n * (dg2 * 4 + 4) * N
    return {
        "transforms": transforms,
        "modmul": transforms * ntt_cost + pointwise,
        "steps": n,
    }


def roofline_report(params, sec_per_gate: float,
                    peak_modmul_per_sec: float = 2.0e11) -> dict:
    """Measured gate time vs the analytical modmul count and an assumed
    device peak (default ~0.2 Tmodmul/s for emulated-s64 VPU lanes; refine
    with bench_suite measurements)."""
    ops = gate_op_counts(params)
    achieved = ops["modmul"] / sec_per_gate
    return {
        **ops,
        "sec_per_gate": sec_per_gate,
        "modmul_per_sec": achieved,
        "efficiency_vs_peak": achieved / peak_modmul_per_sec,
    }


# v5e MXU int8 peak: 394.1 TOPS = 1.97e14 MAC/s (1 MAC = 2 ops).
V5E_S8_MAC_PER_SEC = 1.97e14


def mxu_gate_macs(params) -> dict:
    """Analytical int8-MXU MAC count for ONE gate bootstrap on the fused
    TPU path (ops/fused.py + ops/ntt.py s8 backend) — the numerator for
    MXU roofline efficiency.

    Counts one s8 multiply-accumulate as 1 MAC. Every exact transform of
    R rows costs R * passes * N^2 MACs where passes = (input limbs) x
    (twiddle-matrix limbs); the one-hot monomial matmul costs
    rows * n_limbs * 2N * N.
    """
    if params.unienc is not None:
        up = params.unienc
        k, N, Q = up.k, up.N, up.Q
        n = (params.mntru or params.mklwe).n
        dG = up.digits_g - 1
        base_g = up.base_g
        steps = k * n
        binary = params.mklwe is not None
    else:
        rp = params.rgsw
        N, Q = rp.N, rp.Q
        n = params.lwe.n
        dG = rp.digits_g - 1
        base_g = rp.base_g
        steps = n
        k = None
        binary = False
    qbits = (Q - 1).bit_length()
    nq = -(-qbits // 7)            # limbs of a full-width [0, Q) input
    nd = -(-max(1, (base_g - 1).bit_length()) // 7)  # digit-input limbs
    # 4-step factorized transforms (ops.ntt.get_ntt4_tables): per row a
    # transform contracts K=128 per limb pass instead of K=N, and the
    # digit forward's stage-B input is full-width (nq limbs, not nd)
    from ..ops import fused as _fused
    from ..ops.ntt import ntt4_supported
    use4 = ntt4_supported(N) and (
        _fused._XZW_4STEP if k is not None else _fused._CGGI_4STEP)
    K = 128 if use4 else N
    nd_eff = nq if use4 else nd
    # in-kernel hi/lo monomial build (fused._mono_from_tables): per sign
    # per ct, 4 planes vs the [2N/64, N] hi table + (4 value + 5 Shoup)
    # planes vs the [64, N] lo table
    mono_ct = nq * ((2 * N) // 64) * N + (nq + 5) * 64 * N
    if k is None:
        # CGGI: per step INTT 2 rows @ nq*nq passes, digit fwd 2*dG rows
        # @ nd_eff*nq passes
        kernel = steps * (2 * nq * nq + 2 * dG * nd_eff * nq) * N * K
        monomial = steps * 2 * mono_ct
    else:
        # XZW: per step INTT (k+1) rows @ nq*nq, digit fwd dG*(k+1) rows
        # @ nd_eff*nq passes (HbProd both decompositions)
        kernel = steps * ((k + 1) * nq * nq
                          + dG * (k + 1) * nd_eff * nq) * N * K
        monomial = steps * (1 if binary else 2) * mono_ct
    return {"mxu_macs": kernel + monomial, "steps": steps,
            "limbs_q": nq, "limbs_digit": nd, "ntt4": use4}


def mxu_roofline(params, sec_per_gate: float,
                 peak_mac_per_sec: float = V5E_S8_MAC_PER_SEC) -> dict:
    """Fused-path roofline: achieved s8 MAC/s vs the v5e MXU peak."""
    ops = mxu_gate_macs(params)
    achieved = ops["mxu_macs"] / sec_per_gate
    return {
        **ops,
        "mxu_macs_per_sec": achieved,
        "efficiency_vs_peak": achieved / peak_mac_per_sec,
    }
