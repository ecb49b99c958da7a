"""Fused Pallas blind-rotation kernels (TPU).

The scan-based accumulators (acc/cggi.py, acc/xzw.py) bounce every
per-step intermediate ([B, dg2, N] digit tensors, recombination partials)
through HBM and pay XLA scan dispatch per step. These kernels run the
ENTIRE blind rotation inside one pallas_call:

  * the int8 limb matrices of the inverse/forward NTT (ops.ntt
    MXUTables.W_inv_s8/W_fwd_s8) stay VMEM-resident for all n steps
  * the accumulator is a loop-carried VMEM value — zero HBM traffic
  * the per-step key slice and the (X^c - 1) monomial rows stream from
    HBM through double-buffered async DMA, fully hidden behind the MXU
  * ALL modular arithmetic is 32-bit (mulhi/Shoup/Barrett from
    ops.modmath) — the TPU VPU has no native 64-bit lanes

Bit-exactness contract: identical [0, Q) outputs to the lax.scan paths
(verified coefficient-exact in tests/test_fused.py and by the oracle
suite). Reference anchors: AddToAccCGGI rgsw-acc-cggi.cpp:102-152,
EvalAcc/HbProd mk-acc-xzw.cpp:89-130,231-345.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import (
    I32, U32, barrett_reduce_u32, mulmod_u32, reduce_once_u32,
    shoup_mul_lazy_u32)
from . import ntt as nttm

# ------------------------------------------------------------------ config

_MODE = "auto"   # "auto": fused on TPU backends only; "on": everywhere
                 # (CPU runs in interpret mode — slow, test-only); "off"


def set_mode(mode: str) -> None:
    assert mode in ("auto", "on", "off")
    global _MODE
    if mode != _MODE:
        jax.clear_caches()   # mode is read at trace time, not a cache key
    _MODE = mode


def enabled() -> bool:
    if _MODE == "off":
        return False
    if _MODE == "on":
        return True
    return jax.default_backend() not in ("cpu",)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


_BT_MAX = 256    # batch-tile cap (measured best on v5e; see BASELINE.md);
                 # overridable for tests (padding paths)


def set_batch_tile(bt: int) -> None:
    global _BT_MAX
    if bt != _BT_MAX:
        jax.clear_caches()
    _BT_MAX = bt


def get_batch_tile() -> int:
    return _BT_MAX


# r4 MXU/VPU-overlap experiment (see _cggi_kernel): per-digit-row
# transform with streamed contraction terms. Measured on v5e (batch 512,
# tools/overlap_probe.json): 2669 vs 2632 gates/s — Mosaic does NOT
# overlap the exposed MXU/VPU independence (the ~1.4% is schedule noise
# at best), confirming r3's finding from the other direction; kept as
# default since it is bit-equal and never slower.
_CGGI_INTERLEAVE = True


def set_cggi_interleave(on: bool) -> None:
    global _CGGI_INTERLEAVE
    if on != _CGGI_INTERLEAVE:
        jax.clear_caches()
    _CGGI_INTERLEAVE = on


# r5: input-limb-folded weight planes (ops.ntt.get_folded_tables) — the
# recombination constants 2^(7*la) live in the s8 weight tables, so the
# per-step VPU Shoup chains shrink (INTT 7->4 diagonals, digit NTT 5->4)
# at identical MXU MAC count. VMEM cost: ~24 MB of tables at N=1024
# (CGGI); the N=2048 XZW tables (~96 MB) get their own switch.
_CGGI_FOLDED = True
_XZW_FOLDED = False

# r5: 4-step factorized transforms (ops.ntt.get_ntt4_tables) — cross-tile
# scalar-twiddle butterflies + per-128-tile folded s8 block matmuls. Cuts
# transform MACs N/128-fold (8x at N=1024, 16x at N=2048) at identical
# bit-exact output; see tools/ntt4_probe.json for the measured A/B.
_CGGI_4STEP = True
_XZW_4STEP = True


def set_4step(cggi: bool | None = None, xzw: bool | None = None) -> None:
    global _CGGI_4STEP, _XZW_4STEP
    changed = False
    if cggi is not None and cggi != _CGGI_4STEP:
        _CGGI_4STEP = cggi
        changed = True
    if xzw is not None and xzw != _XZW_4STEP:
        _XZW_4STEP = xzw
        changed = True
    if changed:
        jax.clear_caches()


def set_folded(cggi: bool | None = None, xzw: bool | None = None) -> None:
    global _CGGI_FOLDED, _XZW_FOLDED
    changed = False
    if cggi is not None and cggi != _CGGI_FOLDED:
        _CGGI_FOLDED = cggi
        changed = True
    if xzw is not None and xzw != _XZW_FOLDED:
        _XZW_FOLDED = xzw
        changed = True
    if changed:
        jax.clear_caches()


class batch_tile:
    """Context manager that overrides the batch tile and restores the
    prior value (and compilation caches) on exit — for tests that
    exercise the padding paths without leaking global state."""

    def __init__(self, bt: int):
        self.bt = bt

    def __enter__(self):
        self.prev = _BT_MAX
        set_batch_tile(self.bt)

    def __exit__(self, *exc):
        set_batch_tile(self.prev)
        return False


# ------------------------------------------------- in-kernel exact helpers

def _limbs_s8(x_u32, n_limbs: int):
    """7-bit limb planes of a non-negative u32 array, as int8."""
    out = []
    for la in range(n_limbs):
        out.append(((x_u32 >> U32(7 * la)) & U32(127))
                   .astype(I32).astype(jnp.int8))
    return out


def _recombine(diag: dict, Q: int, extra=None, lazy: bool = False,
               raw_shift_max: int = 0):
    """Diagonal s32 partials -> u32 (ops.ntt _recombine_diagonals_u32,
    inlined so the kernel has no module dep). With lazy=True the final
    Barrett is skipped and the result is a congruent value < 2^31 —
    valid as the arbitrary-u32 x operand of shoup_mul_lazy_u32 /
    mulmod_u32 downstream.

    The s=0 diagonal (weight 1) joins the sum RAW: its s32 partial is
    non-negative and < na*N*127^2 < 2^28 for every supported shape, so
    it needs no Shoup chain. Total bound: 2^28 + 2*(D-1)*Q + Q < 2^31
    for D <= 5 diagonals and Q < 2^28.

    raw_shift_max: when > 0, the s=1 diagonal's partial is bounded by it
    and (max << 7) plus the rest of the sum fits u32, so D_1 joins the
    sum as a plain left shift too (2^7 < Q, so the shifted value is the
    exact contribution, no reduction needed). Used by the folded DIGIT
    transform, where D_1 <= N*127*130 < 2^25 (N <= 1024)."""
    acc = None
    for s_, part in diag.items():
        if s_ == 0:
            term = part.astype(U32)       # weight 1: raw partial
        elif s_ == 1 and raw_shift_max and (
                (raw_shift_max << 7) + (len(diag) - 2) * 2 * Q + 2 * Q
                + raw_shift_max < (1 << 32)):
            term = part.astype(U32) << U32(7)   # exact: 2^7 < Q
        else:
            c = pow(2, 7 * s_, Q)
            csh = (c << 32) // Q
            term = shoup_mul_lazy_u32(part.astype(U32), U32(c), U32(csh), Q)
        acc = term if acc is None else acc + term
    if extra is not None:
        acc = acc + extra
    return acc if lazy else barrett_reduce_u32(acc, Q)


def _transform_s8(x_u32, w_ref, Q: int, n_limbs: int):
    """Exact NTT/INTT: x [R, N] u32 in [0, Q) -> [R, N] u32 in [0, Q).

    w_ref [nw, N, N] int8: plain limb planes (ops.ntt._mxu_transform_s8
    semantics, diagonals s = la + lw).
    w_ref [na, nw, N, N] int8: FOLDED planes (ops.ntt.get_folded_tables)
    — plane (la, lw) holds limb lw of (2^(7*la) * W mod Q), so the
    output diagonals are just lw and the recombination shrinks from
    na+nw-1 Shoup chains to nw-1 (lw=0 is raw). Same MXU MAC count."""
    folded = len(w_ref.shape) == 4
    nw = w_ref.shape[1] if folded else w_ref.shape[0]
    diag = {}
    for la, xl in enumerate(_limbs_s8(x_u32, n_limbs)):
        for lw in range(nw):
            w_plane = (w_ref[np.int32(la), np.int32(lw)] if folded
                       else w_ref[np.int32(lw)])
            part = jax.lax.dot_general(
                xl, w_plane, (((1,), (0,)), ((), ())),
                preferred_element_type=I32)
            s_ = lw if folded else la + lw
            diag[s_] = part if s_ not in diag else diag[s_] + part
    return _recombine(diag, Q)


def _digits_transform_s8(dsh_u32, wf_ref, shift_row_u32, Q: int,
                         base: int, lazy: bool = False):
    """Forward NTT of SHIFTED digits in [0, base): fewer input limbs +
    the constant-shift image folded into the lazy sum (ops.ntt
    _digits_fwd_s8). dsh: [R, N]; shift_row: [1, N] u32 in [0, Q).
    wf_ref: [nw, N, N] plain or [nd, nw, N, N] folded planes (see
    _transform_s8). lazy=True returns congruent values < 2^31."""
    n_limbs = -(-max(1, (base - 1).bit_length()) // 7)
    folded = len(wf_ref.shape) == 4
    nw = wf_ref.shape[1] if folded else wf_ref.shape[0]
    diag = {}
    for la, xl in enumerate(_limbs_s8(dsh_u32, n_limbs)):
        for lw in range(nw):
            w_plane = (wf_ref[np.int32(la), np.int32(lw)] if folded
                       else wf_ref[np.int32(lw)])
            part = jax.lax.dot_general(
                xl, w_plane, (((1,), (0,)), ((), ())),
                preferred_element_type=I32)
            s_ = lw if folded else la + lw
            diag[s_] = part if s_ not in diag else diag[s_] + part
    extra = jnp.broadcast_to(shift_row_u32, dsh_u32.shape)
    # tight s=1 partial bound: the la-th input limb carries at most
    # (base-1) >> 7*la (digits < base) and weight-plane entries are
    # <= 127 — small enough at N <= 1024 that D_1 << 7 joins the lazy
    # sum raw (no Shoup chain); _recombine re-checks the full u32 bound
    N = dsh_u32.shape[-1]
    d1_max = N * 127 * sum(
        min(base - 1, 127) if la_ == 0 else (base - 1) >> (7 * la_)
        for la_ in range(n_limbs))
    return _recombine(diag, Q, extra=extra, lazy=lazy,
                      raw_shift_max=d1_max)


# ---------------------------------------------- 4-step factorized transform
#
# In-kernel form of ops.ntt.get_ntt4_tables: cross-tile butterfly stages
# with SCALAR twiddles (compile-time python ints -> no table loads) + per
# 128-tile folded s8 block matmuls at full MXU utilization. MACs per
# element drop N/128-fold vs the direct _transform_s8; the butterflies
# cost ~8 VPU ops/element/stage on canonical u32 values.


def _stageA_fwd_u32(x, Q: int, fwd_tw):
    """Cross-tile CT stages (m, t, ws, wshs): canonical u32 in/out."""
    for (m, t, ws, wshs) in fwd_tw:
        parts = []
        for b in range(m):
            u = x[:, (2 * b) * t:(2 * b) * t + t]
            v = x[:, (2 * b + 1) * t:(2 * b + 1) * t + t]
            wv = reduce_once_u32(
                shoup_mul_lazy_u32(v, U32(ws[b]), U32(wshs[b]), Q), Q)
            parts.append(reduce_once_u32(u + wv, Q))
            parts.append(reduce_once_u32(u + (U32(Q) - wv), Q))
        x = jnp.concatenate(parts, axis=1)
    return x


def _stageA_inv_u32(x, Q: int, inv_tw):
    """Cross-tile GS stages (h, t, ws, wshs): canonical u32 in/out."""
    for (h, t, ws, wshs) in inv_tw:
        parts = []
        for b in range(h):
            u = x[:, (2 * b) * t:(2 * b) * t + t]
            v = x[:, (2 * b + 1) * t:(2 * b + 1) * t + t]
            parts.append(reduce_once_u32(u + v, Q))
            d = u + (U32(Q) - v)          # [0, 2Q): fine as Shoup x
            parts.append(reduce_once_u32(
                shoup_mul_lazy_u32(d, U32(ws[b]), U32(wshs[b]), Q), Q))
        x = jnp.concatenate(parts, axis=1)
    return x


def _stageB_s8(y_u32, v_ref, Q: int, n_limbs: int, lazy: bool = False):
    """Per-tile folded block matmuls: y [R, N] u32 canonical ->
    [R, N] ([0, Q) or lazy congruent). v_ref: [G, na, nw, 128, 128] s8
    (plane (r, la, lw) = limb lw of 2^(7 la) * V_r mod Q)."""
    G = v_ref.shape[0]
    nw = v_ref.shape[2]
    # s=1 partial bound: K=128 contraction of 7-bit x 7-bit products
    d1_max = n_limbs * 128 * 127 * 127
    outs = []
    for r in range(G):
        yr = y_u32[:, r * 128:(r + 1) * 128]
        diag = {}
        for la, yl in enumerate(_limbs_s8(yr, n_limbs)):
            for lw in range(nw):
                part = jax.lax.dot_general(
                    yl, v_ref[np.int32(r), np.int32(la), np.int32(lw)],
                    (((1,), (0,)), ((), ())), preferred_element_type=I32)
                diag[lw] = part if lw not in diag else diag[lw] + part
        outs.append(_recombine(diag, Q, lazy=lazy, raw_shift_max=d1_max))
    return jnp.concatenate(outs, axis=1)


def _transform4_inv(x_u32, vi_ref, Q: int, n_limbs: int, inv_tw):
    """EVAL -> COEFF, canonical: block matmuls then cross-tile GS."""
    return _stageA_inv_u32(
        _stageB_s8(x_u32, vi_ref, Q, n_limbs), Q, inv_tw)


def _digits4_fwd(dsh_u32, vf_ref, shift_row_u32, Q: int, fwd_tw,
                 lazy: bool = False):
    """Forward NTT of SHIFTED digits: cross-tile CT stages (input values
    < base stay canonical) then block matmuls; the constant-shift image
    is added on the full [R, N] result (a per-tile sliced broadcast of
    the [1, N] row trips a Mosaic layout check). Stage-A output is
    full-width, so stage B always uses the full limb count."""
    n_limbs = vf_ref.shape[1]
    y = _stageA_fwd_u32(dsh_u32, Q, fwd_tw)
    out = _stageB_s8(y, vf_ref, Q, n_limbs, lazy=True)
    # lazy bound: stage-B sum < 2^31 plus one row < Q stays in u32
    out = out + jnp.broadcast_to(shift_row_u32, dsh_u32.shape)
    return out if lazy else barrett_reduce_u32(out, Q)


def _signed_digits(a_u32, Q: int, base: int, digits: int):
    """Balanced digits of a in [0, Q), low digit dropped — the i32 port of
    ops.decompose.signed_digit_decompose. Returns `digits` arrays of
    SHIFTED digits in [0, base) as u32 (ready for _digits_transform_s8)."""
    half_base = base // 2
    mask = base - 1
    halfq = Q >> 1
    gbits = base.bit_length() - 1
    d0 = a_u32.astype(I32)
    d0 = jnp.where(d0 >= halfq, d0 - Q, d0)

    def extract(d):
        r = ((d + half_base) & mask) - half_base
        return r, (d - r) >> gbits

    r, d0 = extract(d0)     # dropped low digit
    outs = []
    for _ in range(digits):
        r, d0 = extract(d0)
        outs.append((r + half_base).astype(U32))   # shift to [0, base)
    return outs


def _shift_row(tables, base: int) -> np.ndarray:
    """(-base/2 * NTT(1..1)) mod Q as a [1, N] u32 row (digit-NTT shift
    correction)."""
    mxu = nttm.get_mxu_tables(tables)
    v = (-(base // 2) * np.asarray(mxu.ones_fwd, np.int64)) % tables.Q
    return np.asarray(v, np.uint32)[None, :]


def _shoup_companions(y, Q: int):
    """floor(y * 2^32 / Q) as u32, computed on-device OUTSIDE the kernel
    (u64 ops are fine in XLA; only the kernel body must stay 32-bit)."""
    return ((y.astype(jnp.uint64) << jnp.uint64(32))
            // jnp.uint64(Q)).astype(U32)


# ------------------------------------------------------ fused CGGI (GINX)

def _select_rows(oh, planes_ref, n_planes, shoup32: bool):
    """Reassemble table rows picked by a one-hot s8 matrix from 7-bit limb
    planes. shoup32: planes carry a 32-bit value (4 low planes summed in
    s32 + plane 4 at bits 28..31)."""
    acc = None
    n_sum = 4 if shoup32 else n_planes
    for l in range(n_sum):
        part = jax.lax.dot_general(
            oh, planes_ref[np.int32(l)], (((1,), (0,)), ((), ())),
            preferred_element_type=I32)
        part = part << (l * 7)
        acc = part if acc is None else acc + part
    if not shoup32:
        return acc.astype(U32)
    p4 = jax.lax.dot_general(
        oh, planes_ref[np.int32(4)], (((1,), (0,)), ((), ())),
        preferred_element_type=I32)
    return acc.astype(U32) | (p4.astype(U32) << U32(28))


def _mono_selects(ci, hi_ref, lo_ref, losh_ref, hish_ref):
    """One-hot select the (hi, hi_sh, lo, lo_sh) rows of X^ci from the
    VMEM hi/lo monomial tables (ops.ntt._get_pm_hilo_s8). The caller
    applies X^ci to a value v as shoup(shoup(v, hi, hi_sh), lo, lo_sh) —
    i.e. (X^ci - 1)*v = that minus v, with no per-element table build.
    ci: [BT] i32 in [0, 2N)."""
    BT = ci.shape[0]
    H = hi_ref.shape[1]
    L = lo_ref.shape[1]
    c_hi = ci >> 6
    c_lo = ci & (L - 1)
    iota_h = jax.lax.broadcasted_iota(I32, (BT, H), 1)
    oh_h = (c_hi[:, None] == iota_h).astype(jnp.int8)
    iota_l = jax.lax.broadcasted_iota(I32, (BT, L), 1)
    oh_l = (c_lo[:, None] == iota_l).astype(jnp.int8)
    hi = _select_rows(oh_h, hi_ref, hi_ref.shape[0], False)
    hish = _select_rows(oh_h, hish_ref, 5, True)
    lo = _select_rows(oh_l, lo_ref, lo_ref.shape[0], False)
    losh = _select_rows(oh_l, losh_ref, 5, True)
    return hi, hish, lo, losh


def _mono_from_tables(ci, hi_ref, lo_ref, losh_ref, hish_ref, Q: int):
    """(X^ci - 1) rows in [0, Q) — materialized form (XZW acctemp path).
    ci: [BT] i32 in [0, 2N) -> [BT, N] u32 in [0, Q)."""
    hi, _, lo, losh = _mono_selects(ci, hi_ref, lo_ref, losh_ref, hish_ref)
    r = shoup_mul_lazy_u32(hi, lo, losh, Q)
    r = jnp.where(r >= U32(Q), r - U32(Q), r)
    return jnp.where(r == 0, U32(Q - 1), r - U32(1))


def _cggi_kernel(acc_ref, ek_hbm, eksh_hbm, cpos_ref, cneg_ref,
                 winv_ref, wfwd_ref, shift_ref, hi_ref, lo_ref, losh_ref,
                 hish_ref, out_ref, ek_buf, eksh_buf, sems,
                 *, Q: int, base_g: int, dg: int, n_steps: int,
                 n_limbs_q: int, tw_inv=None, tw_fwd=None):
    BT = acc_ref.shape[0]
    N = acc_ref.shape[2]
    dg2 = 2 * dg

    # transform dispatch: 5-D weight refs = 4-step block planes
    def intt(rows):
        if len(winv_ref.shape) == 5:
            return _transform4_inv(rows, winv_ref, Q, n_limbs_q, tw_inv)
        return _transform_s8(rows, winv_ref, Q, n_limbs_q)

    def fwd_digits(rows, shift_u32, lazy=True):
        if len(wfwd_ref.shape) == 5:
            return _digits4_fwd(rows, wfwd_ref, shift_u32, Q, tw_fwd,
                                lazy=lazy)
        return _digits_transform_s8(rows, wfwd_ref, shift_u32, Q, base_g,
                                    lazy=lazy)

    def dmas(i, slot):
        i = jnp.asarray(i, I32)
        slot = jnp.asarray(slot, I32)
        return (
            pltpu.make_async_copy(ek_hbm.at[i], ek_buf.at[slot],
                                  sems.at[np.int32(0), slot]),
            pltpu.make_async_copy(eksh_hbm.at[i], eksh_buf.at[slot],
                                  sems.at[np.int32(1), slot]),
        )

    for d in dmas(0, 0):
        d.start()

    acc0 = acc_ref[...].astype(U32)          # [BT, 2, N], values in [0, Q)

    def step(i, acc):
        slot = i % 2

        @pl.when(i + 1 < n_steps)
        def _():
            for d in dmas(i + 1, (i + 1) % 2):
                d.start()

        for d in dmas(i, slot):
            d.wait()

        ek = ek_buf[slot]                    # [2, dg2, 2, N] i32
        eksh = eksh_buf[slot]                # [2, dg2, 2, N] u32
        hp, hpsh, lp, lpsh = _mono_selects(
            cpos_ref[i], hi_ref, lo_ref, losh_ref, hish_ref)
        hn, hnsh, ln, lnsh = _mono_selects(
            cneg_ref[i], hi_ref, lo_ref, losh_ref, hish_ref)

        # INTT both RLWE components at once (canonical [0, Q) — the digit
        # extraction below needs exact values)
        coeff = intt(acc.reshape(BT * 2, N)).reshape(BT, 2, N)

        # balanced digits, interleaved (d2 = 2*d + component,
        # rgsw-acc.cpp:37-49), shifted to [0, base)
        digs0 = _signed_digits(coeff[:, 0, :], Q, base_g, dg)
        digs1 = _signed_digits(coeff[:, 1, :], Q, base_g, dg)
        rows = []
        for d in range(dg):
            rows.append(digs0[d])
            rows.append(digs1[d])
        dsh = jnp.concatenate(rows, axis=0)              # [dg2*BT, N]

        # tmp[t, c] = sum_d2 dct[d2] * ek[t, d2, c], kept lazy < 2*dg2*Q;
        # u_t = tmp * (X^c - 1) = shoup(shoup(tmp, hi), lo) - tmp, so the
        # monomial multiply costs 2 lazy Shoups instead of a 29-op Barrett
        # mulmod and tmp never pays its own reduction.
        lazy_bound = 2 * dg2 * Q
        full_lazy = (acc_bound := Q + 4 * Q + 2 * lazy_bound) < (1 << 32)

        if _CGGI_INTERLEAVE:
            # r4 MXU/VPU-overlap experiment (PLAN 'Perf frontier' #1):
            # transform ONE digit row at a time and issue its 4 Shoup
            # contraction terms immediately, so row d2's VPU work is
            # independent of row d2+1's MXU matmuls and Mosaic's
            # scheduler CAN overlap them (the batched form serializes:
            # all-MXU transform -> all-VPU contraction). Identical math,
            # identical bounds — bit-equal by test_fused.
            shift_u32 = shift_ref[...].astype(U32)
            sums = {}
            for d2 in range(dg2):
                row = dsh[d2 * BT:(d2 + 1) * BT]
                dct_d = fwd_digits(row, shift_u32, lazy=True)
                for t in range(2):
                    for c in range(2):
                        term = shoup_mul_lazy_u32(
                            dct_d, ek[t, d2, c][None].astype(U32),
                            eksh[t, d2, c][None], Q)
                        sums[(t, c)] = (
                            term if (t, c) not in sums
                            else sums[(t, c)] + term)    # < 2*dg2*Q

            def contract(t, c):
                s = sums[(t, c)]
                return s if full_lazy else barrett_reduce_u32(s, Q)
        else:
            # LAZY digit NTT: values < (2D+1)*Q, congruent mod Q — fine
            # as the arbitrary-u32 x of the Shoup contraction below
            dct = fwd_digits(
                dsh, shift_ref[...].astype(U32), lazy=True
            ).reshape(dg2, BT, N)

            def contract(t, c):
                s = None
                for d2 in range(dg2):
                    term = shoup_mul_lazy_u32(
                        dct[d2], ek[t, d2, c][None].astype(U32),
                        eksh[t, d2, c][None], Q)
                    s = term if s is None else s + term  # < 2*dg2*Q
                return s if full_lazy else barrett_reduce_u32(s, Q)

        sub = lazy_bound if full_lazy else Q             # -tmp offset
        new = []
        for c in range(2):
            t0 = contract(0, c)
            t1 = contract(1, c)
            a0 = shoup_mul_lazy_u32(
                shoup_mul_lazy_u32(t0, hp, hpsh, Q), lp, lpsh, Q)
            a1 = shoup_mul_lazy_u32(
                shoup_mul_lazy_u32(t1, hn, hnsh, Q), ln, lnsh, Q)
            s = (acc[:, c, :] + a0 + a1
                 + (U32(2 * sub) - t0 - t1))             # < acc_bound
            new.append(barrett_reduce_u32(s, Q))
        return jnp.stack(new, axis=1)                    # [BT, 2, N]

    # i32 loop bounds: with x64 enabled a python-int fori_loop carries an
    # int64 induction var, which Mosaic cannot lower (no 64-bit lanes)
    acc = jax.lax.fori_loop(
        jnp.asarray(0, I32), jnp.asarray(n_steps, I32), step, acc0)
    out_ref[...] = acc.astype(I32)


@partial(jax.jit, static_argnames=("params",))
def cggi_scan_fused(tables, params, key_arr, acc, c_pos, c_neg,
                    key_sh=None, winv_f=None, wfwd_f=None,
                    vi4=None, vf4=None):
    """Full GINX blind rotation in one pallas_call.

    key_arr: [n, 2, dg2, 2, N] i32; acc: [B, 2, N] i32 EVAL;
    c_pos/c_neg: [B, n] i32 rotation indices in [0, 2N).
    winv_f/wfwd_f: folded weight planes, vi4/vf4: 4-step block planes —
    passed as runtime args (from CGGIKey; the in-trace constant fallback
    below is for raw test keys — large constants overflow the
    remote-compile request at big batch).
    Returns [B, 2, N] i32 EVAL — bit-equal to the lax.scan path.
    """
    Q, N = params.Q, params.N
    dg = params.digits_g - 1
    dg2 = 2 * dg
    # even the non-full_lazy fallback accumulates dg2 lazy Shoup terms
    # (each < 2Q) in u32 before its Barrett reduction — fail loudly for
    # custom params where that intermediate would wrap (ADVICE r3)
    assert 2 * dg2 * Q < (1 << 32), (
        f"2*dg2*Q = {2 * dg2 * Q:#x} overflows the u32 lazy accumulator "
        f"(Q={Q}, digits_g={params.digits_g}); use a larger base_g")
    B = acc.shape[0]
    n_steps = key_arr.shape[0]
    n_limbs_q = -(-(Q - 1).bit_length() // 7)

    mxu = nttm.get_mxu_tables(tables)
    tw_inv = tw_fwd = None
    if _CGGI_4STEP and nttm.ntt4_supported(N):
        t4 = nttm.get_ntt4_tables(tables)
        tw_inv, tw_fwd = t4["inv_tw"], t4["fwd_tw"]
        if vi4 is not None and vf4 is not None:
            winv, wfwd = vi4, vf4
        else:
            winv = jnp.asarray(t4["vi_planes"])
            wfwd = jnp.asarray(t4["vf_planes"])
    elif _CGGI_FOLDED:
        if winv_f is not None and wfwd_f is not None:
            winv, wfwd = winv_f, wfwd_f
        else:
            winv_np, wfwd_np = nttm.get_folded_tables(tables, params.base_g)
            winv, wfwd = jnp.asarray(winv_np), jnp.asarray(wfwd_np)
    else:
        winv = jnp.asarray(mxu.W_inv_s8)
        wfwd = jnp.asarray(mxu.W_fwd_s8)
    shift = jnp.asarray(
        _shift_row(tables, params.base_g).astype(np.int32))

    # pad the batch up to a BT multiple (the kernel tiles the batch into
    # fixed [BT, ...] blocks); the pad rows run on zeros and are sliced off
    BT = min(B, _BT_MAX)
    pad = (-B) % BT
    if pad:
        acc = jnp.concatenate(
            [acc, jnp.zeros((pad,) + acc.shape[1:], acc.dtype)])
        zc = jnp.zeros((pad, c_pos.shape[1]), c_pos.dtype)
        c_pos = jnp.concatenate([c_pos, zc])
        c_neg = jnp.concatenate([c_neg, zc])
    Bp = B + pad

    # Shoup companions: precomputed at keygen (CGGIKey.key_sh); the
    # in-graph u64-divide fallback only runs for raw test keys
    eksh = key_sh if key_sh is not None else _shoup_companions(key_arr, Q)

    # hi/lo monomial tables (VMEM-resident in the kernel; (X^c - 1) rows
    # are computed in-kernel per step — no HBM monomial stream)
    hi_l, lo_l, losh_l, hish_l = nttm._get_pm_hilo_s8(tables)
    hi_t, lo_t, losh_t, hish_t = (jnp.asarray(hi_l), jnp.asarray(lo_l),
                                  jnp.asarray(losh_l), jnp.asarray(hish_l))

    grid = (Bp // BT,)
    kernel = partial(
        _cggi_kernel, Q=Q, base_g=params.base_g, dg=dg,
        n_steps=n_steps, n_limbs_q=n_limbs_q, tw_inv=tw_inv,
        tw_fwd=tw_fwd)

    # Trace the kernel with x64 OFF: under the package-wide x64 mode,
    # python-int literals/loop counters trace as int64, and Mosaic has no
    # 64-bit lanes (its i64->i32 convert fallback recurses forever). The
    # kernel is all-32-bit by design, so 32-bit tracing is the truth.
    with jax.enable_x64(False):
        out = _pallas_cggi(kernel, grid, Bp, BT, N, dg2, mxu, acc, key_arr,
                           eksh, c_pos.T, c_neg.T, winv, wfwd, shift,
                           hi_t, lo_t, losh_t, hish_t)
    return out[:B] if pad else out


def _pallas_cggi(kernel, grid, B, BT, N, dg2, mxu, acc, key_arr, eksh,
                 cpos, cneg, winv, wfwd, shift, hi_t, lo_t, losh_t,
                 hish_t):
    n_steps = cpos.shape[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, 2, N), I32),
        in_specs=[
            pl.BlockSpec((BT, 2, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # ek (HBM)
            pl.BlockSpec(memory_space=pl.ANY),     # ek_sh
            pl.BlockSpec((n_steps, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # c_pos
            pl.BlockSpec((n_steps, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # c_neg
            pl.BlockSpec(winv.shape, lambda i, _n=winv.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wfwd.shape, lambda i, _n=wfwd.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hi_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),  # monomial hi planes
            pl.BlockSpec(lo_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),  # monomial lo planes
            pl.BlockSpec(losh_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),  # lo Shoup planes
            pl.BlockSpec(hish_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),  # hi Shoup planes
        ],
        out_specs=pl.BlockSpec((BT, 2, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, dg2, 2, N), I32),   # ek double buffer
            pltpu.VMEM((2, 2, dg2, 2, N), U32),   # ek_sh
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(acc, key_arr, eksh, cpos, cneg, winv, wfwd, shift, hi_t, lo_t,
      losh_t, hish_t)


# ------------------------------------------------- fused XZW / XZW_B (MK)

def _xzw_kernel(acc_ref, ek_hbm, eksh_hbm, c_ref,
                pkey_ref, pkeysh_ref, winv_ref, wfwd_ref, shift_ref,
                hi_ref, lo_ref, losh_ref, hish_ref,
                out_ref, ek_buf, eksh_buf, sems,
                *, Q: int, base_g: int, dG: int, n_steps: int,
                n_limbs_q: int, k: int, n_per_user: int, binary: bool,
                tw_inv=None, tw_fwd=None):
    """Steps 1..k*n-1 of UniEnc EvalAcc (mk-acc-xzw.cpp:89-130; HbProd
    :231-290), congruence-exact to the scan path in acc/xzw.py (same
    canonical [0, Q) outputs).

    V2 arithmetic: df = ev1 - ev2*(X^{-c}-1) - ev2 == ev1 - ev2*X^{-c}
    exactly, and the EVAL-domain monomial is diagonal, so
      <g^-1(acc), df_j> = A_j - X^{-c} * B_j,
      A_j = sum_d shoup(dct_d, ev1[d,j]),  B_j likewise with ev2,
    with X^{-c} applied as two table Shoups to the LAZY sum. The
    [BT, dG, 2, N] df materialization and every Barrett mulmod of the
    old step disappear; key Shoup companions stream with the key DMA."""
    BT = acc_ref.shape[0]
    N = acc_ref.shape[2]
    nb = 1 if binary else 2

    # transform dispatch: 5-D weight refs = 4-step block planes
    def intt(rows):
        if len(winv_ref.shape) == 5:
            return _transform4_inv(rows, winv_ref, Q, n_limbs_q, tw_inv)
        return _transform_s8(rows, winv_ref, Q, n_limbs_q)

    def fwd_digits(rows, shift_u32, lazy=True):
        if len(wfwd_ref.shape) == 5:
            return _digits4_fwd(rows, wfwd_ref, shift_u32, Q, tw_fwd,
                                lazy=lazy)
        return _digits_transform_s8(rows, wfwd_ref, shift_u32, Q, base_g,
                                    lazy=lazy)

    def dmas(i, slot):
        i = jnp.asarray(i, I32)
        slot = jnp.asarray(slot, I32)
        return [
            pltpu.make_async_copy(ek_hbm.at[i], ek_buf.at[slot],
                                  sems.at[np.int32(0), slot]),
            pltpu.make_async_copy(eksh_hbm.at[i], eksh_buf.at[slot],
                                  sems.at[np.int32(1), slot]),
        ]

    for d in dmas(0, 0):
        d.start()

    acc0 = acc_ref[...].astype(U32)            # [BT, k, N] in [0, Q)
    pkey = pkey_ref[...].astype(U32)           # [k, dG, N]
    pkeysh = pkeysh_ref[...]                   # [k, dG, N] u32
    shift_row = shift_ref[...].astype(U32)     # [1, N]

    lazy_term = 2 * dG * Q + 2 * Q             # uj/w lazy bound
    full_lazy = Q + 2 * lazy_term < (1 << 32)

    def step(i, acc):
        slot = i % 2

        @pl.when(i + 1 < n_steps)
        def _():
            for d in dmas(i + 1, (i + 1) % 2):
                d.start()

        for d in dmas(i, slot):
            d.wait()

        ek = ek_buf[slot]                      # [nb, dG, 2, N] i32
        eksh = eksh_buf[slot]                  # [nb, dG, 2, N] u32
        # per-tile c block is lane-padded to 128 (the VMEM lane rule);
        # compute the mono selects at width 128, slice to BT
        ci = c_ref[0, i]                       # [128] in [0, 2N)
        hp, hpsh, lp, lpsh = (a[:BT] for a in _mono_selects(
            ci, hi_ref, lo_ref, losh_ref, hish_ref))
        if not binary:
            ci_neg = jnp.where(ci == 0, I32(0), I32(2 * N) - ci)
            hn, hnsh, ln, lnsh = (a[:BT] for a in _mono_selects(
                ci_neg, hi_ref, lo_ref, losh_ref, hish_ref))

        def apply_xc_neg(x_lazy, lead1):
            """X^{-c} * x for lazy u32 x; lead1: x is [BT, 1?, N] vs
            [BT, k, N] — broadcast the [BT, N] mono rows accordingly."""
            h, hs = (hn[:, None, :], hnsh[:, None, :]) if lead1 else (hn, hnsh)
            l, ls = (ln[:, None, :], lnsh[:, None, :]) if lead1 else (ln, lnsh)
            t = shoup_mul_lazy_u32(x_lazy, h, hs, Q)
            return shoup_mul_lazy_u32(t, l, ls, Q)          # [0, 2Q)

        # acctemp = acc*(X^c - 1) = (acc*hi_p)*lo_p - acc, canonical for
        # the digit extraction
        t = shoup_mul_lazy_u32(acc, hp[:, None, :], hpsh[:, None, :], Q)
        t = shoup_mul_lazy_u32(t, lp[:, None, :], lpsh[:, None, :], Q)
        acctemp = barrett_reduce_u32(t + (U32(2 * Q) - acc), Q)

        # HbProd: INTT (canonical) -> digits -> fwd NTT (lazy)
        coeff = intt(acctemp.reshape(BT * k, N))
        digs = _signed_digits(coeff, Q, base_g, dG)
        dsh = jnp.concatenate(digs, axis=0)                 # [dG*BT*k, N]
        dct = fwd_digits(dsh, shift_row, lazy=True
                         ).reshape(dG, BT, k, N)

        # A/B contractions over the streamed key (+ pkey for v)
        def contract(rows, comp, branch):
            s = None
            for d in range(dG):
                term = shoup_mul_lazy_u32(
                    rows[d], ek[branch, d, comp][None].astype(U32)
                    if rows[d].ndim == 2 else
                    ek[branch, d, comp][None, None].astype(U32),
                    eksh[branch, d, comp][None]
                    if rows[d].ndim == 2 else
                    eksh[branch, d, comp][None, None], Q)
                s = term if s is None else s + term
            return s                                        # < 2*dG*Q

        A0 = contract(dct, 0, 0)                            # [BT, k, N]
        v = None
        for d in range(dG):
            tv = shoup_mul_lazy_u32(
                dct[d], pkey[:, d][None], pkeysh[:, d][None], Q)
            v = tv if v is None else v + tv                 # < 2*dG*Q
        v = barrett_reduce_u32(v, Q)

        if binary:
            uj = A0 if full_lazy else barrett_reduce_u32(A0, Q)
        else:
            XB0 = apply_xc_neg(contract(dct, 0, 1), True)   # [0, 2Q)
            uj = A0 + (U32(2 * Q) - XB0)                    # < 2dGQ + 2Q
            if not full_lazy:
                uj = barrett_reduce_u32(uj, Q)

        sum_v = v[:, 0]
        for u in range(1, k):
            sum_v = sum_v + v[:, u]
        sum_v = barrett_reduce_u32(sum_v, Q)                # [BT, N]

        coeff2 = intt(sum_v)
        digs2 = _signed_digits(coeff2, Q, base_g, dG)
        dsh2 = jnp.concatenate(digs2, axis=0)               # [dG*BT, N]
        dct2 = fwd_digits(dsh2, shift_row, lazy=True
                          ).reshape(dG, BT, N)

        A1 = contract(dct2, 1, 0)                           # [BT, N]
        if binary:
            w = A1 if full_lazy else barrett_reduce_u32(A1, Q)
        else:
            XB1 = apply_xc_neg(contract(dct2, 1, 1), False)
            w = A1 + (U32(2 * Q) - XB1)
            if not full_lazy:
                w = barrett_reduce_u32(w, Q)

        # acc += uj (+ w on this step's user row); user = (i+1)//n
        u_idx = jnp.asarray((i + 1) // n_per_user, I32)
        kiota = jax.lax.broadcasted_iota(I32, (1, k, 1), 1)
        add_w = jnp.where(kiota == u_idx, w[:, None, :], U32(0))
        return barrett_reduce_u32(acc + uj + add_w, Q)

    acc = jax.lax.fori_loop(
        jnp.asarray(0, I32), jnp.asarray(n_steps, I32), step, acc0)
    out_ref[...] = acc.astype(I32)


@partial(jax.jit, static_argnames=("params", "binary"))
def xzw_scan_fused(tables, params, ek_steps, pkey, acc, c_steps, binary,
                   ek_sh=None):
    """Steps 1..k*n-1 of the XZW blind rotation in one pallas_call.

    ek_steps: [S, nb, dG, 2, N] i32 (S = k*n - 1, step-major rows of the
    UniEnc key, the scan's ek_flat[1:]); pkey: [k, dG, N]; acc: [B, k, N]
    EVAL after the unrolled KDM step 0; c_steps: [S, B] rotation indices;
    ek_sh: u32 Shoup companions of ek_steps (precomputed at keygen — the
    in-graph u64 fallback is for raw test keys only).
    Bit-equal to the lax.scan path in acc/xzw.py.
    """
    Q, N = params.Q, params.N
    dG = params.digits_g - 1
    # the uj/w contractions hold up to 2*dG*Q (+2Q slack) in u32 before
    # reduction even when full_lazy is off — guard custom params (ADVICE r3)
    assert 2 * dG * Q + 2 * Q < (1 << 32), (
        f"2*dG*Q+2Q = {2 * dG * Q + 2 * Q:#x} overflows the u32 lazy "
        f"accumulator (Q={Q}, digits_g={params.digits_g})")
    B = acc.shape[0]
    k = acc.shape[1]
    S = ek_steps.shape[0]
    n_per_user = (S + 1) // k
    n_limbs_q = -(-(Q - 1).bit_length() // 7)

    mxu = nttm.get_mxu_tables(tables)
    tw_inv = tw_fwd = None
    if _XZW_4STEP and nttm.ntt4_supported(N):
        t4 = nttm.get_ntt4_tables(tables)
        tw_inv, tw_fwd = t4["inv_tw"], t4["fwd_tw"]
        # [G, na, nw, 128, 128] block planes: ~4 MB at N=2048 — small
        # enough to ride as in-trace constants (the direct tables were 16)
        winv = jnp.asarray(t4["vi_planes"])
        wfwd = jnp.asarray(t4["vf_planes"])
    elif _XZW_FOLDED:
        winv_np, wfwd_np = nttm.get_folded_tables(tables, params.base_g)
        winv, wfwd = jnp.asarray(winv_np), jnp.asarray(wfwd_np)
    else:
        winv = jnp.asarray(mxu.W_inv_s8)
        wfwd = jnp.asarray(mxu.W_fwd_s8)
    shift = jnp.asarray(
        _shift_row(tables, params.base_g).astype(np.int32))

    # tile scales down with party count: the step works on [k*BT, N] rows,
    # so k*BT is what VMEM/compile time see (BT=256 at k=2/N=2048 blew
    # Mosaic compile time)
    BT = min(B, _BT_MAX, max(8, 256 // k))
    pad = (-B) % BT
    if pad:
        acc = jnp.concatenate(
            [acc, jnp.zeros((pad,) + acc.shape[1:], acc.dtype)])
        c_steps = jnp.concatenate(
            [c_steps, jnp.zeros((S, pad), c_steps.dtype)], axis=1)
    Bp = B + pad

    pkeysh = _shoup_companions(pkey, Q)
    if ek_sh is None:
        ek_sh = _shoup_companions(ek_steps, Q)
    hi_l, lo_l, losh_l, hish_l = nttm._get_pm_hilo_s8(tables)
    hi_t, lo_t, losh_t, hish_t = (jnp.asarray(hi_l), jnp.asarray(lo_l),
                                  jnp.asarray(losh_l), jnp.asarray(hish_l))

    nb = 1 if binary else 2

    kernel = partial(
        _xzw_kernel, Q=Q, base_g=params.base_g, dG=dG, n_steps=S,
        n_limbs_q=n_limbs_q, k=k, n_per_user=n_per_user, binary=binary,
        tw_inv=tw_inv, tw_fwd=tw_fwd)

    scratch = [
        pltpu.VMEM((2, nb, dG, 2, N), I32),   # ek double buffer
        pltpu.VMEM((2, nb, dG, 2, N), U32),   # ek_sh double buffer
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    # per-tile c block, lane-padded to 128: [G, S, 128] (the [S, BT]
    # layout violates the VMEM lane rule when BT < 128)
    G = Bp // BT
    c_tiles = c_steps.T.reshape(G, BT, S)
    if BT < 128:
        c_tiles = jnp.concatenate(
            [c_tiles, jnp.zeros((G, 128 - BT, S), c_steps.dtype)], axis=1)
    c_tiles = c_tiles.transpose(0, 2, 1)                  # [G, S, 128]
    with jax.enable_x64(False):   # 32-bit kernel tracing (see cggi note)
        out = _pallas_xzw(kernel, scratch, Bp, BT, k, dG, N, mxu, acc,
                          ek_steps, ek_sh, c_tiles, pkey, pkeysh, winv,
                          wfwd, shift, hi_t, lo_t, losh_t, hish_t)
    return out[:B] if pad else out


def _pallas_xzw(kernel, scratch, B, BT, k, dG, N, mxu, acc, ek_steps,
                ek_sh, c_tiles, pkey, pkeysh, winv, wfwd, shift, hi_t,
                lo_t, losh_t, hish_t):
    S = c_tiles.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(B // BT,),
        out_shape=jax.ShapeDtypeStruct((B, k, N), I32),
        in_specs=[
            pl.BlockSpec((BT, k, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # ek steps (HBM)
            pl.BlockSpec(memory_space=pl.ANY),     # ek_sh (HBM)
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # c per tile
            pl.BlockSpec((k, dG, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, dG, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(winv.shape, lambda i, _n=winv.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wfwd.shape, lambda i, _n=wfwd.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hi_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lo_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(losh_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hish_t.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, k, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=_interpret(),
    )(acc, ek_steps, ek_sh, c_tiles, pkey, pkeysh, winv, wfwd, shift,
      hi_t, lo_t, losh_t, hish_t)
