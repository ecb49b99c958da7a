"""Serialization / checkpointing (reference: cereal-based Serial::Serialize,
utils/serial.h + binfhecontext-ser.h).

The reference serializes each key/ciphertext class with cereal (JSON or
portable binary) but never registers the MK types, leaving MK key
serialization unwired (SURVEY.md §5). Here every container — including ALL
MK types — is a pytree of numpy/jax arrays, so one npz-based format covers
everything: a type registry maps class names to NamedTuple/array layouts,
and round-trips are exact (int32/int64 arrays, no floats).

Format: numpy .npz with keys
  __type__    : registered class name (0-d string array)
  __meta__    : JSON dict (paramset/method for contexts)
  f0, f1, ... : the flattened array leaves in field order
"""

import io
import json

import numpy as np
import jax.numpy as jnp

from .schemes.lwe import LWECiphertext, LWEPublicKey, LWESwitchingKey
from .schemes.mklwe import MKLWECiphertext, MKLWESwitchingKey
from .schemes.mntru import MNTRUCiphertext, MNTRUPrivateKey, MNTRUSwitchingKey
from .acc.cggi import CGGIKey
from .acc.dm import DMKey
from .acc.xzddf import XZDDFKey
from .acc.xzw import UniEncKey
from . import boot

_REGISTRY = {}


def _register(cls):
    _REGISTRY[cls.__name__] = cls
    return cls


for _cls in (
    LWECiphertext, LWEPublicKey, LWESwitchingKey, MKLWECiphertext, MKLWESwitchingKey,
    MNTRUCiphertext, MNTRUPrivateKey, MNTRUSwitchingKey,
    CGGIKey, DMKey, XZDDFKey, UniEncKey,
    boot.RingGSWBTKey, boot.UniEncBTKey, boot.VectorNTRUBTKey,
):
    _register(_cls)


def _flatten(obj, prefix, out):
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        out[prefix] = np.asarray(obj)
        return {"kind": "array"}
    if hasattr(obj, "_fields"):  # NamedTuple
        spec = {"kind": "namedtuple", "type": type(obj).__name__,
                "fields": {}}
        for f in obj._fields:
            spec["fields"][f] = _flatten(
                getattr(obj, f), f"{prefix}.{f}", out)
        return spec
    if isinstance(obj, (int, np.integer)):
        out[prefix] = np.asarray(int(obj))
        return {"kind": "scalar"}
    if obj is None:
        return {"kind": "none"}
    raise TypeError(f"cannot serialize {type(obj)}")


def _unflatten(spec, prefix, arrays, device: bool):
    kind = spec["kind"]
    if kind == "none":
        return None
    if kind == "array":
        arr = arrays[prefix]
        return jnp.asarray(arr) if device else arr
    if kind == "scalar":
        return int(arrays[prefix])
    if kind == "namedtuple":
        cls = _REGISTRY[spec["type"]]
        vals = {
            f: _unflatten(fs, f"{prefix}.{f}", arrays, device)
            for f, fs in spec["fields"].items()
        }
        return cls(**vals)
    raise TypeError(kind)


def dumps(obj, meta: dict | None = None) -> bytes:
    """Serialize a registered container (or raw array) to npz bytes."""
    out = {}
    spec = _flatten(obj, "r", out)
    out["__spec__"] = np.asarray(json.dumps(spec))
    out["__meta__"] = np.asarray(json.dumps(meta or {}))
    buf = io.BytesIO()
    np.savez_compressed(buf, **out)
    return buf.getvalue()


def loads(data: bytes, device: bool = True):
    """Deserialize npz bytes; returns (object, meta)."""
    arrays = dict(np.load(io.BytesIO(data), allow_pickle=False))
    spec = json.loads(str(arrays["__spec__"]))
    meta = json.loads(str(arrays["__meta__"]))
    return _unflatten(spec, "r", arrays, device), meta


def save(path: str, obj, meta: dict | None = None) -> None:
    with open(path, "wb") as fh:
        fh.write(dumps(obj, meta))


def load(path: str, device: bool = True):
    with open(path, "rb") as fh:
        return loads(fh.read(), device)


# ------------------------------------------------------------ context level

def save_context(path: str, cc) -> None:
    """Checkpoint a BinFHEContext's params + all generated keys (the
    reference's Serialize(cc) + BTKeyLoad flow, binfhecontext.h:300-318)."""
    payload = {}
    blobs = {}
    meta = {
        "paramset": cc.params.paramset.value,
        "method": cc.params.method.name,
    }
    if getattr(cc, "_ext_logQ", None) is not None:
        # large-precision profile context (GenerateBinFHEContextExt)
        meta["ext"] = {"logQ": cc._ext_logQ,
                       "arb_func": cc._ext_arb_func,
                       "N": cc._ext_N,
                       "time_opt": cc._ext_time_opt}
    elif getattr(cc, "_custom_row", None) is not None:
        # fully-custom parameter row (GenerateBinFHEContextCustom): the
        # paramset name alone cannot reconstruct it
        row = cc._custom_row
        meta["custom"] = {**{f: getattr(row, f) for f in row._fields
                             if f != "key_dist"},
                          "key_dist": row.key_dist.name}
    if cc.crs is not None:
        blobs["crs"] = np.asarray(cc.crs)
    for name in ("bt_key", "mk_bt_key", "nbt_key", "ct_nand"):
        obj = getattr(cc, name, None)
        if obj is not None:
            payload[name] = obj
    for name in ("lwe_sk", "mklwe_sk"):
        obj = getattr(cc, name, None)
        if obj is not None:
            blobs[name] = np.asarray(obj)
    if getattr(cc, "mntru_sk", None) is not None:
        payload["mntru_sk"] = cc.mntru_sk

    out = {"__meta__": np.asarray(json.dumps(meta))}
    specs = {}
    for key, obj in payload.items():
        specs[key] = _flatten(obj, key, out)
    for key, arr in blobs.items():
        out[key] = arr
        specs[key] = {"kind": "array"}
    out["__spec__"] = np.asarray(json.dumps(specs))
    buf = io.BytesIO()
    np.savez_compressed(buf, **out)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def load_context(path: str):
    """Restore a BinFHEContext checkpoint; returns a ready context."""
    from .constants import BINFHE_METHOD, BINFHE_PARAMSET
    from .context import BinFHEContext

    arrays = dict(np.load(path, allow_pickle=False))
    meta = json.loads(str(arrays["__meta__"]))
    specs = json.loads(str(arrays["__spec__"]))

    cc = BinFHEContext()
    if "ext" in meta:
        e = meta["ext"]
        cc.GenerateBinFHEContextExt(
            BINFHE_PARAMSET(meta["paramset"]), e["arb_func"], e["logQ"],
            e["N"], BINFHE_METHOD[meta["method"]], e["time_opt"])
    elif "custom" in meta:
        from .constants import ContextParams, SecretKeyDist

        c = dict(meta["custom"])
        c["key_dist"] = SecretKeyDist[c["key_dist"]]
        cc.GenerateBinFHEContextCustom(
            ContextParams(**c), BINFHE_METHOD[meta["method"]],
            BINFHE_PARAMSET(meta["paramset"]))
    else:
        cc.GenerateBinFHEContext(
            BINFHE_PARAMSET(meta["paramset"]), BINFHE_METHOD[meta["method"]])
    for key, spec in specs.items():
        val = _unflatten(spec, key, arrays, device=(spec["kind"] != "array"))
        if key == "crs":
            cc.crs = np.asarray(val)
        elif key in ("lwe_sk", "mklwe_sk"):
            setattr(cc, key, np.asarray(val))
        else:
            setattr(cc, key, val)
    return cc
