"""r5 probe: per-phase cost inside the fused CGGI step on the 4-STEP
transform path (tpu_step_ablation.py rebuilt around _transform4_inv /
_digits4_fwd, with an extra cut that separates the stage-B block
matmuls from the stage-A butterfly VPU work).

Phases (each keeps the loop-carried structure + key DMA stream):
  stageB     : INTT block matmuls + recombination only (no GS stages)
  intt       : full 4-step INTT (adds the cross-tile GS butterflies)
  digits     : ... -> signed digits -> 4-step forward digit-NTT
  contract   : ... -> 16-term Shoup key contraction
  full       : the production kernel

Writes tools/step_ablation4.json.
"""
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mkfhe_tpu.ops import ntt as nttm

nttm.set_default_impl("mxu_s8")
from mkfhe_tpu import BinFHEContext
from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET
from mkfhe_tpu.ops import fused
from mkfhe_tpu.ops.fused import (
    _digits4_fwd, _shift_row, _signed_digits, _stageA_inv_u32,
    _stageB_s8, _transform4_inv)
from mkfhe_tpu.ops.modmath import I32, U32, barrett_reduce_u32, \
    shoup_mul_lazy_u32

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BT = 256

cc = BinFHEContext(seed=12)
cc.GenerateBinFHEContext(BINFHE_PARAMSET.STD128, BINFHE_METHOD.GINX)
sk = cc.KeyGen()
cc.BTKeyGen(sk)
params = cc.params.rgsw
tables = cc.tables
key = cc.bt_key.bs.key
key_sh = cc.bt_key.bs.key_sh
n, N, Q = key.shape[0], params.N, params.Q
dg = params.digits_g - 1
dg2 = 2 * dg
base_g = params.base_g
n_limbs_q = -(-(Q - 1).bit_length() // 7)

t4 = nttm.get_ntt4_tables(tables)
winv, wfwd = jnp.asarray(t4["vi_planes"]), jnp.asarray(t4["vf_planes"])
tw_inv, tw_fwd = t4["inv_tw"], t4["fwd_tw"]
shift = jnp.asarray(_shift_row(tables, base_g).astype(np.int32))

rng = np.random.default_rng(0)
acc0 = jnp.asarray(rng.integers(0, Q, (B, 2, N)), I32)
c_pos = jnp.asarray(rng.integers(0, 2 * N, (B, n)), I32)
c_neg = (2 * N - c_pos) % (2 * N)


def _ablate_kernel(acc_ref, ek_hbm, eksh_hbm, winv_ref, wfwd_ref,
                   shift_ref, out_ref, ek_buf, eksh_buf, sems,
                   *, phase: str):
    BTk = acc_ref.shape[0]

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
    a0 = acc_ref[...].astype(U32)

    def step(i, acc):
        slot = i % 2

        @pl.when(i + 1 < n)
        def _():
            for d in dmas(i + 1, (i + 1) % 2):
                d.start()

        for d in dmas(i, slot):
            d.wait()
        ek = ek_buf[slot]
        eksh = eksh_buf[slot]

        if phase == "stageB":
            sb = _stageB_s8(acc.reshape(BTk * 2, N), winv_ref, Q,
                            n_limbs_q).reshape(BTk, 2, N)
            return (sb + ek[0, 0, 0][None, None].astype(U32)) % U32(Q)

        coeff = _transform4_inv(
            acc.reshape(BTk * 2, N), winv_ref, Q, n_limbs_q, tw_inv
        ).reshape(BTk, 2, N)
        if phase == "intt":
            return (coeff + ek[0, 0, 0][None, None].astype(U32)) % U32(Q)

        shift_u32 = shift_ref[...].astype(U32)
        digs0 = _signed_digits(coeff[:, 0, :], Q, base_g, dg)
        digs1 = _signed_digits(coeff[:, 1, :], Q, base_g, dg)
        rows = []
        for d in range(dg):
            rows.append(digs0[d])
            rows.append(digs1[d])
        dcts = [
            _digits4_fwd(r, wfwd_ref, shift_u32, Q, tw_fwd, lazy=True)
            for r in rows
        ]
        if phase == "digits":
            s = dcts[0]
            for t in dcts[1:]:
                s = s + t
            s = s + ek[0, 0, 0][None].astype(U32)
            red = barrett_reduce_u32(s, Q)
            return jnp.stack([red, red], axis=1)

        sums = {}
        for d2 in range(dg2):
            for t in range(2):
                for c in range(2):
                    term = shoup_mul_lazy_u32(
                        dcts[d2], ek[t, d2, c][None].astype(U32),
                        eksh[t, d2, c][None], Q)
                    sums[(t, c)] = (term if (t, c) not in sums
                                    else sums[(t, c)] + term)
        n0 = barrett_reduce_u32(
            acc[:, 0, :] + sums[(0, 0)] + sums[(1, 0)], Q)
        n1 = barrett_reduce_u32(
            acc[:, 1, :] + sums[(0, 1)] + sums[(1, 1)], Q)
        return jnp.stack([n0, n1], axis=1)

    acc = jax.lax.fori_loop(
        jnp.asarray(0, I32), jnp.asarray(n, I32), step, a0)
    out_ref[...] = acc.astype(I32)


def run_variant(phase):
    kernel = partial(_ablate_kernel, phase=phase)
    grid = (B // BT,)

    @jax.jit
    def fn(acc):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                out_shape=jax.ShapeDtypeStruct((B, 2, N), I32),
                in_specs=[
                    pl.BlockSpec((BT, 2, N), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(winv.shape,
                                 lambda i, _n=winv.ndim: (0,) * _n,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(wfwd.shape,
                                 lambda i, _n=wfwd.ndim: (0,) * _n,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BT, 2, N), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, 2, dg2, 2, N), I32),
                    pltpu.VMEM((2, 2, dg2, 2, N), U32),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(acc, key, key_sh, winv, wfwd, shift)

    out = fn(acc0)
    _ = np.asarray(out.ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(acc0)
        _ = np.asarray(out.ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def sync_full():
    bs = cc.bt_key.bs
    fn = jax.jit(lambda a_, cp, cn: fused.cggi_scan_fused(
        tables, params, key, a_, cp, cn, key_sh,
        winv_f=bs.winv_f, wfwd_f=bs.wfwd_f, vi4=bs.vi4, vf4=bs.vf4))
    out = fn(acc0, c_pos, c_neg)
    _ = np.asarray(out.ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(acc0, c_pos, c_neg)
        _ = np.asarray(out.ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


results = {}
tiles = B // BT
for phase in ("stageB", "intt", "digits", "contract"):
    dt = run_variant(phase)
    results[phase] = dt
    print(f"{phase:10s} {dt*1e3:8.1f} ms  "
          f"{dt/n/tiles*1e6:7.2f} us/step/tile", flush=True)
dt = sync_full()
results["full"] = dt
print(f"{'full':10s} {dt*1e3:8.1f} ms  {dt/n/tiles*1e6:7.2f} us/step/tile",
      flush=True)

deltas = {
    "stageB_matmuls": results["stageB"],
    "stageA_butterflies": results["intt"] - results["stageB"],
    "digits+fwdNTT": results["digits"] - results["intt"],
    "contraction": results["contract"] - results["digits"],
    "monomial+update": results["full"] - results["contract"],
}
summary = {
    "batch": B, "BT": BT, "steps": int(n), "ntt4": True,
    "variant_sec": {k: round(v, 4) for k, v in results.items()},
    "us_per_step_per_tile": {
        k: round(v / n / tiles * 1e6, 2) for k, v in results.items()},
    "marginal_us_per_step_per_tile": {
        k: round(v / n / tiles * 1e6, 2) for k, v in deltas.items()},
    "mxu_peak_us_per_step_per_tile_analytic": round(
        (2 * 16 + 2 * dg * 16) * BT * N * 128 / 1.97e14 * 1e6, 2),
}
print(json.dumps(summary, indent=1))
with open("/root/repo/tools/step_ablation4.json", "w") as f:
    json.dump(summary, f, indent=1)
