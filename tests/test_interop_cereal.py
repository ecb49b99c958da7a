"""Cross-library serialization interop: our keys -> reference cereal ->
back, bit-identical, plus a reference-side decrypt of our ciphertext.

Drives oracle/interop_cereal.cpp (linked against the reference static
libs) on a freshly exported TOY GINX context. Skipped when the bridge
binary is absent (it needs the oracle build)."""

import os
import subprocess

import numpy as np
import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "oracle",
                    "interop_cereal")


@pytest.mark.skipif(not os.path.exists(TOOL),
                    reason="interop_cereal bridge not built")
def test_ginx_keys_roundtrip_reference_cereal(tmp_path):
    from mkfhe_tpu import BinFHEContext
    from mkfhe_tpu.constants import BINFHE_METHOD, BINFHE_PARAMSET
    from mkfhe_tpu.interop import export_ginx_dir, read_raw

    cc = BinFHEContext(seed=77)
    cc.GenerateBinFHEContext(BINFHE_PARAMSET.TOY, BINFHE_METHOD.GINX)
    sk = cc.KeyGen()
    cc.BTKeyGen(sk)
    ct1 = cc.Encrypt(sk, np.array(1))

    d = str(tmp_path)
    export_ginx_dir(cc, sk, d, cts={"ct1": ct1})

    out = subprocess.run(
        [os.path.abspath(TOOL), "roundtrip-ginx", d],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    # the reference decrypted OUR ciphertext through ITS deserialized key
    assert "reference Decrypt(imported ct1) = 1" in out.stdout, out.stdout

    # cereal round trip is bit-identical in the interchange layout
    for name in ("bskey", "ksk_a", "ksk_b", "sk", "ct1"):
        a = read_raw(d, name)
        b = read_raw(d, name + "_rt")
        np.testing.assert_array_equal(a, b, err_msg=name)
    # and the cereal files themselves exist and are non-trivial
    for f in ("ref_bskey.cereal", "ref_ksk.cereal", "ref_sk.cereal",
              "ref_ct1.cereal"):
        assert os.path.getsize(os.path.join(d, f)) > 0
