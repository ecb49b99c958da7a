import pytest as _pytest

pytestmark = _pytest.mark.smoke

import numpy as np
import jax.numpy as jnp

from mkfhe_tpu.ops.decompose import (
    base_digits_unsigned,
    signed_digit_decompose,
    signed_digit_decompose_pair,
)

RNG = np.random.default_rng(7)


def ref_signed_decompose(vals, q, base, digits):
    """Direct transcription of mk-acc.cpp:54-80 for testing."""
    gbits = base.bit_length() - 1
    out = np.zeros((digits, len(vals)), dtype=np.int64)
    for k, t0 in enumerate(vals):
        d0 = int(t0) if t0 < q // 2 else int(t0) - q
        r0 = ((d0 + base // 2) % base) - base // 2
        d0 = (d0 - r0) >> gbits
        for d in range(digits):
            r0 = ((d0 + base // 2) % base) - base // 2
            d0 = (d0 - r0) >> gbits
            out[d, k] = r0 + q if r0 < 0 else r0
    return out


def test_signed_decompose_matches_reference_semantics():
    q = 134215681  # 27-bit prime
    base = 512
    digits = 2
    vals = np.concatenate(
        [
            RNG.integers(0, q, size=100),
            np.array([0, 1, q - 1, q // 2, q // 2 + 1, base, base - 1]),
        ]
    )
    got = signed_digit_decompose(jnp.asarray(vals, jnp.int32), q, base, digits)
    want = ref_signed_decompose(vals, q, base, digits)
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_recomposition_error_bound():
    """sum_d digit_d * B^(d+1) must equal the input up to the dropped digit
    (|err| <= B/2 * B = B^2/2 in balanced form)."""
    q = 134215681
    base = 512
    digits = 2
    vals = RNG.integers(0, q, size=1000)
    dig = np.asarray(
        signed_digit_decompose(jnp.asarray(vals, jnp.int32), q, base, digits),
        np.int64,
    )
    recomposed = np.zeros(len(vals), dtype=np.int64)
    for d in range(digits):
        recomposed += dig[d] * base ** (d + 1)
    err = (recomposed - vals) % q
    err = np.where(err > q // 2, err - q, err)
    assert np.abs(err).max() <= base // 2 + 1


def test_pair_interleaving():
    q = 134215681
    base = 512
    digits = 2
    a0 = RNG.integers(0, q, size=(16,))
    a1 = RNG.integers(0, q, size=(16,))
    got = signed_digit_decompose_pair(
        jnp.asarray(a0, jnp.int32), jnp.asarray(a1, jnp.int32), q, base, digits
    )
    d0 = ref_signed_decompose(a0, q, base, digits)
    d1 = ref_signed_decompose(a1, q, base, digits)
    np.testing.assert_array_equal(np.asarray(got[0::2], np.int64), d0)
    np.testing.assert_array_equal(np.asarray(got[1::2], np.int64), d1)


def test_unsigned_digits():
    q = 45181
    base = 32
    digits = 4  # ceil(log_32(45181)) = 4? log: 32^3=32768 < 45181 -> 4
    vals = RNG.integers(0, q, size=50)
    got = np.asarray(
        base_digits_unsigned(jnp.asarray(vals, jnp.int32), base, digits),
        np.int64,
    )
    recomposed = sum(got[d] * base**d for d in range(digits))
    np.testing.assert_array_equal(recomposed, vals)


def test_base_digits_signed_exact_recomposition():
    """Balanced digits recompose EXACTLY to the centered representative
    (zero remainder) — required by the production signed KeySwitch2."""
    from mkfhe_tpu.ops.decompose import base_digits_signed

    q = 45181  # STD100_MKNTRU qKS
    base = 32
    digits = 4  # ceil(log_32 45181)
    vals = np.concatenate([
        RNG.integers(0, q, size=2000),
        np.array([0, 1, q - 1, q // 2, q // 2 + 1, base - 1, base]),
    ])
    dig = np.asarray(
        base_digits_signed(jnp.asarray(vals, jnp.int32), q, base, digits),
        np.int64)
    assert dig.min() >= -base // 2 and dig.max() < base // 2
    pows = base ** np.arange(digits, dtype=np.int64)
    recomposed = (dig * pows[:, None]).sum(axis=0)
    centered = np.where(vals > q // 2, vals.astype(np.int64) - q, vals)
    np.testing.assert_array_equal(recomposed, centered)


def test_key_switch2_signed_equals_unsigned_with_noiseless_ksk():
    """With a zero-noise KSK both digit conventions must produce
    ciphertexts with the SAME decryption inner product mod qKS."""
    from mkfhe_tpu.keygen import sample_invertible_matrix
    from mkfhe_tpu.rng import Sampler
    from mkfhe_tpu.schemes import mntru
    from mkfhe_tpu.constants import SecretKeyDist

    qks, bks = 45181, 32
    d = 4
    k, n, N = 2, 16, 32
    s = Sampler(11)
    Fs, Finvs = [], []
    for _ in range(k):
        F, Fi = sample_invertible_matrix(
            s, n, qks, SecretKeyDist.UNIFORM_TERNARY, std=1.0)
        Fs.append(F)
        Finvs.append(Fi)
    sk = mntru.MNTRUPrivateKey(np.stack(Fs), np.stack(Finvs))
    skN = s.ternary((k, N)) % qks

    # noiseless KSK: gadget rows only
    pow_b = (bks ** np.arange(d, dtype=np.int64)) % qks
    ksk = np.zeros((k, N * d, n), dtype=np.int64)
    for u in range(k):
        E = np.zeros((N * d, n), dtype=np.int64)
        gad = (skN[u][:, None] * pow_b[None, :]).reshape(N * d) % qks
        E[:, 0] = gad
        Es = np.where(E > qks // 2, E - qks, E)
        Fi = np.where(sk.F_inv[u] > qks // 2,
                      sk.F_inv[u].astype(np.int64) - qks, sk.F_inv[u])
        ksk[u] = (Es @ Fi) % qks
    kskey = mntru.MNTRUSwitchingKey(jnp.asarray(ksk, jnp.int32))

    c = RNG.integers(0, qks, size=(3, k, N))
    ct = mntru.MNTRUCiphertext(jnp.asarray(c, jnp.int32))
    out_u = mntru.key_switch2(ct, kskey, qks, bks, d, signed=False)
    out_s = mntru.key_switch2(ct, kskey, qks, bks, d, signed=True)

    F0 = sk.F_col0.astype(np.int64)
    F0 = np.where(F0 > qks // 2, F0 - qks, F0)
    inner_u = np.einsum("bkn,kn->bk", np.asarray(out_u.c, np.int64), F0) % qks
    inner_s = np.einsum("bkn,kn->bk", np.asarray(out_s.c, np.int64), F0) % qks
    np.testing.assert_array_equal(inner_u, inner_s)
