"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY.md §4:
the TPU analogue of a fake distributed backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mkfhe_tpu.ops import ntt as nttm
from mkfhe_tpu.parallel.ring import sharded_ntt_fn


@pytest.fixture(scope="module")
def mesh8():
    devs = np.asarray(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs.reshape(2, 4), axis_names=("dp", "ring"))


@pytest.mark.parametrize("N", [256, 2048])
def test_ring_sharded_ntt_matches(mesh8, N):
    # N=2048/Q~2^27 is the production MK ring size — it caught the raw
    # `<<` limb-recombination int64 overflow (VERDICT r1 weak #4)
    Q = nttm.previous_prime(nttm.first_prime(27, 2 * N), 2 * N)
    t = nttm.make_ntt_tables(N, Q)
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.integers(0, Q, (8, N)), jnp.int32)

    with mesh8:
        fwd = sharded_ntt_fn(mesh8, t)
        inv = sharded_ntt_fn(mesh8, t, inverse=True)
        got_f = np.asarray(fwd(a))
        got_i = np.asarray(inv(a))

    np.testing.assert_array_equal(got_f, np.asarray(nttm.ntt_fwd(t, a)))
    np.testing.assert_array_equal(got_i, np.asarray(nttm.ntt_inv(t, a)))


def test_mk_gate_dp_party_sharded(mesh8):
    """Full MK gate over a (dp=4, party=2) mesh decrypts correctly
    (exercises the psum over the party axis)."""
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.parallel import make_mesh, shard_mk_gate
    from mkfhe_tpu.schemes import mntru

    cc = BinFHEContext(seed=41)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.TOY_MKNTRU, BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)

    mesh = make_mesh(8, party=2)
    m1 = np.resize([0, 0, 1, 1], 8)
    m2 = np.resize([0, 1, 0, 1], 8)
    ct1 = cc.Encrypt(sk, m1)
    ct2 = cc.Encrypt(sk, m2)
    with mesh:
        fn, _ = shard_mk_gate(mesh, cc.tables, cc.params, cc.mk_bt_key)
        out = np.asarray(fn(cc.ct_nand.c, ct1.c, ct2.c))
    res = mntru.decrypt(cc.params.mntru, sk, mntru.MNTRUCiphertext(out))
    np.testing.assert_array_equal(res, 1 - (m1 & m2))


def test_mk_gate_sharded_production_shape(mesh8):
    """STD100_MKNTRU (N=2048, n=560 — NOT toy) over the (dp=4, party=2)
    virtual mesh: the r2 VERDICT's 'production-shape multi-device run'.
    Decrypt-verified; exercises the party psum + dp batch split at the
    shapes the TPU bench uses."""
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET, BINGATE
    from mkfhe_tpu.parallel import make_mesh, shard_mk_gate
    from mkfhe_tpu.schemes import mntru as mntru_mod

    cc = BinFHEContext(seed=19)
    cc.GenerateBinFHEContext(
        BINFHE_PARAMSET.STD100_MKNTRU, BINFHE_METHOD.MKNTRU)
    sk = cc.MNTRU_KeyGen()
    cc.MKBTKeyGen(sk)
    cc.ctGateGen(sk, BINGATE.NAND)

    mesh = make_mesh(8, party=2)
    m1 = np.resize(np.array([0, 0, 1, 1]), 8)
    m2 = np.resize(np.array([0, 1, 0, 1]), 8)
    ct1, ct2 = cc.Encrypt(sk, m1), cc.Encrypt(sk, m2)

    with mesh:
        fn, _ = shard_mk_gate(mesh, cc.tables, cc.params, cc.mk_bt_key)
        out = np.asarray(fn(cc.ct_nand.c, ct1.c, ct2.c))

    res = mntru_mod.decrypt(
        cc.params.mntru, sk, mntru_mod.MNTRUCiphertext(out))
    np.testing.assert_array_equal(res, 1 - (m1 & m2))


import pytest as _pt


@_pt.mark.parametrize("D", [2, 4, 8])
def test_butterfly_sharded_ntt_16k(D):
    """Butterfly-ppermute pipeline (SURVEY §2.5 item 2) at N=16384 on
    2/4/8-device ring meshes: bit-identical to the single-device
    transform. Cross-device stages = log2(D) chunk exchanges; the rest
    are local."""
    import numpy as np
    import jax
    from jax.sharding import Mesh
    from mkfhe_tpu.ops import ntt as nttm
    from mkfhe_tpu.parallel.ring import butterfly_sharded_ntt_fn

    N = 16384
    q = nttm.previous_prime(nttm.first_prime(28, 2 * N), 2 * N)
    tables = nttm.make_ntt_tables(N, q)

    devs = np.array(jax.devices()[:D]).reshape(D)
    mesh = Mesh(devs, ("ring",))
    fn = butterfly_sharded_ntt_fn(mesh, tables)

    rng = np.random.default_rng(3)
    x = rng.integers(0, q, size=(4, N), dtype=np.int64).astype(np.int32)
    with mesh:
        got = np.asarray(fn(x))
    want = np.asarray(nttm.ntt_fwd(tables, x))
    np.testing.assert_array_equal(got, want)


def test_butterfly_sharded_intt_roundtrip_16k():
    """Inverse pipeline: sharded INTT(sharded NTT(x)) == x at N=16384,
    and matches the single-device ntt_inv bit-for-bit."""
    import numpy as np
    import jax
    from jax.sharding import Mesh
    from mkfhe_tpu.ops import ntt as nttm
    from mkfhe_tpu.parallel.ring import (
        butterfly_sharded_intt_fn, butterfly_sharded_ntt_fn)

    N = 16384
    q = nttm.previous_prime(nttm.first_prime(28, 2 * N), 2 * N)
    tables = nttm.make_ntt_tables(N, q)
    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("ring",))
    fwd = butterfly_sharded_ntt_fn(mesh, tables)
    inv = butterfly_sharded_intt_fn(mesh, tables)

    rng = np.random.default_rng(5)
    x = rng.integers(0, q, size=(3, N), dtype=np.int64).astype(np.int32)
    with mesh:
        ev = np.asarray(fwd(x))
        back = np.asarray(inv(ev))
    np.testing.assert_array_equal(back, x)
    want = np.asarray(nttm.ntt_inv(tables, ev))
    np.testing.assert_array_equal(back, want)
