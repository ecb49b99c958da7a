"""Fused Pallas blind-rotation kernels vs the lax.scan reference paths.

Runs the Pallas kernels in interpreter mode on CPU (ops.fused set_mode
"on") and asserts COEFFICIENT-EXACT equality with the scan
implementations on random keys/accumulators — bit-exactness is the
contract (the scan paths are themselves oracle-verified)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mkfhe_tpu.constants import BINFHE_METHOD, SecretKeyDist
from mkfhe_tpu.ops import fused
from mkfhe_tpu.ops import ntt as nttm
from mkfhe_tpu.ops.modmath import I32
from mkfhe_tpu.params import RGSWParams


@pytest.fixture(autouse=True)
def _mxu_impl():
    nttm.set_default_impl("mxu_s8")
    yield
    nttm.set_default_impl("butterfly")
    fused.set_mode("off")


def _mk_cggi_case(N=256, n=6, B=4, seed=0):
    Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
    params = RGSWParams(
        N=N, Q=Q, q=2 * N, base_g=1 << 9, base_r=32,
        method=BINFHE_METHOD.GINX, std=1.9,
        key_dist=SecretKeyDist.UNIFORM_TERNARY)
    tables = nttm.make_ntt_tables(N, Q)
    rng = np.random.default_rng(seed)
    dg2 = 2 * (params.digits_g - 1)
    key = jnp.asarray(rng.integers(0, Q, (n, 2, dg2, 2, N)), I32)
    acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)), I32)
    a = jnp.asarray(rng.integers(0, params.q, (B, n)), I32)
    return tables, params, key, acc, a


def test_cggi_fused_bit_exact():
    from mkfhe_tpu.acc import cggi

    tables, params, key_arr, acc, a = _mk_cggi_case()
    key = cggi.CGGIKey(key_arr)

    fused.set_mode("off")
    ref = np.asarray(cggi.eval_acc(tables, params, key, acc, a))

    fused.set_mode("on")   # interpret-mode Pallas on CPU
    got = np.asarray(cggi.eval_acc(tables, params, key, acc, a))

    np.testing.assert_array_equal(got, ref)


def _mk_xzw_case(N=256, k=2, n=3, B=4, binary=False, seed=1):
    from mkfhe_tpu.params import UniEncParams

    Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
    params = UniEncParams(
        k=k, N=N, Q=Q, q=2 * N, base_g=1 << 9,
        method=BINFHE_METHOD.MKNTRU,
        key_dist=SecretKeyDist.UNIFORM_TERNARY)
    tables = nttm.make_ntt_tables(N, Q)
    rng = np.random.default_rng(seed)
    dG = params.digits_g - 1
    nb = 1 if binary else 2
    from mkfhe_tpu.acc.xzw import UniEncKey
    key = UniEncKey(
        ek=jnp.asarray(rng.integers(0, Q, (k, nb, n, dG, 2, N)), I32),
        ekstar=jnp.asarray(rng.integers(0, Q, (dG, 2, N)), I32),
        pkey=jnp.asarray(rng.integers(0, Q, (k, dG, N)), I32))
    acc = jnp.asarray(rng.integers(0, Q, (B, k, N)), I32)
    c_all = jnp.asarray(rng.integers(0, 2 * N, (B, k, n)), I32)
    return tables, params, key, acc, c_all


@pytest.mark.parametrize("binary", [False, True])
def test_xzw_fused_bit_exact(binary):
    from mkfhe_tpu.acc import xzw

    tables, params, key, acc, c_all = _mk_xzw_case(binary=binary)

    fused.set_mode("off")
    ref = np.asarray(xzw.eval_acc(tables, params, key, acc, c_all, binary))

    fused.set_mode("on")
    got = np.asarray(xzw.eval_acc(tables, params, key, acc, c_all, binary))

    np.testing.assert_array_equal(got, ref)


def test_cggi_fused_batch_padding():
    """Batches that are not a multiple of the batch tile are padded to BT
    inside the fused wrapper and sliced back (VERDICT r2 weak #4)."""
    from mkfhe_tpu.acc import cggi

    tables, params, key_arr, acc, a = _mk_cggi_case(B=6)
    key = cggi.CGGIKey(key_arr)

    fused.set_mode("off")
    ref = np.asarray(cggi.eval_acc(tables, params, key, acc, a))

    fused.set_mode("on")
    with fused.batch_tile(4):      # 6 % 4 != 0 -> exercises the pad path
        got = np.asarray(cggi.eval_acc(tables, params, key, acc, a))

    np.testing.assert_array_equal(got, ref)


def test_xzw_fused_batch_padding():
    from mkfhe_tpu.acc import xzw

    tables, params, key, acc, c_all = _mk_xzw_case(B=6)

    fused.set_mode("off")
    ref = np.asarray(xzw.eval_acc(tables, params, key, acc, c_all, False))

    fused.set_mode("on")
    with fused.batch_tile(4):
        got = np.asarray(
            xzw.eval_acc(tables, params, key, acc, c_all, False))

    np.testing.assert_array_equal(got, ref)


def test_cggi_fused_bit_exact_dg3():
    """digitsG=4 (baseG=2^7 -> dG=3 digits) — the STD128_MKNTRU-class
    shape the fused kernels had never seen before round 3. Exercises the
    dg2=6 lazy contraction bound (29Q < 2^32)."""
    from mkfhe_tpu.acc import cggi

    tables, params, key_arr, acc, a = _mk_cggi_case(B=4, seed=7)
    import dataclasses
    params = dataclasses.replace(params, base_g=1 << 7)
    assert params.digits_g == 4
    rng = np.random.default_rng(7)
    Q, N, n = params.Q, params.N, 6
    key_arr = jnp.asarray(
        rng.integers(0, Q, (n, 2, 2 * (params.digits_g - 1), 2, N)), I32)
    key = cggi.CGGIKey(key_arr)

    fused.set_mode("off")
    ref = np.asarray(cggi.eval_acc(tables, params, key, acc, a))
    fused.set_mode("on")
    got = np.asarray(cggi.eval_acc(tables, params, key, acc, a))
    np.testing.assert_array_equal(got, ref)


def test_xzw_fused_bit_exact_dg3():
    from mkfhe_tpu.acc import xzw
    import dataclasses

    tables, params, key, acc, c_all = _mk_xzw_case(seed=9)
    params = dataclasses.replace(params, base_g=1 << 7)
    dG = params.digits_g - 1
    assert dG == 3
    rng = np.random.default_rng(9)
    k, n, N, Q = 2, 3, params.N, params.Q
    from mkfhe_tpu.acc.xzw import UniEncKey
    key = UniEncKey(
        ek=jnp.asarray(rng.integers(0, Q, (k, 2, n, dG, 2, N)), I32),
        ekstar=jnp.asarray(rng.integers(0, Q, (dG, 2, N)), I32),
        pkey=jnp.asarray(rng.integers(0, Q, (k, dG, N)), I32))

    fused.set_mode("off")
    ref = np.asarray(xzw.eval_acc(tables, params, key, acc, c_all, False))
    fused.set_mode("on")
    got = np.asarray(xzw.eval_acc(tables, params, key, acc, c_all, False))
    np.testing.assert_array_equal(got, ref)


def test_cggi_fused_interleave_variant_bit_equal():
    """The MXU/VPU-overlap variant (per-digit-row transform + streamed
    contraction terms) is bit-equal to the batched form."""
    from mkfhe_tpu.acc import cggi

    tables, params, key_arr, acc, a = _mk_cggi_case(B=5)
    key = cggi.CGGIKey(key_arr)

    fused.set_mode("on")
    ref = np.asarray(cggi.eval_acc(tables, params, key, acc, a))
    fused.set_cggi_interleave(True)
    try:
        got = np.asarray(cggi.eval_acc(tables, params, key, acc, a))
    finally:
        fused.set_cggi_interleave(False)
    np.testing.assert_array_equal(got, ref)


def test_cggi_fused_ntt4_multistage_g4():
    """N=512 (G=4) runs TWO cross-tile butterfly stages inside the
    4-step kernel path (the N=256 cases above only exercise one);
    bit-exact vs the scan reference, fused 4-step on vs off."""
    from mkfhe_tpu.acc import cggi

    tables, params, key_arr, acc, a = _mk_cggi_case(N=512, n=3, B=2)
    key = cggi.CGGIKey(key_arr)

    fused.set_mode("off")
    ref = np.asarray(cggi.eval_acc(tables, params, key, acc, a))

    fused.set_mode("on")
    fused.set_4step(cggi=True)
    got = np.asarray(cggi.eval_acc(tables, params, key, acc, a))

    np.testing.assert_array_equal(got, ref)
