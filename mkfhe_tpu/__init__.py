"""mkfhe_tpu — a TPU-native multi-key FHE (gate bootstrapping) framework.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of the
SKLC-FHE/MKFHE reference (an OpenFHE v1.1.1 fork implementing NTRU-based
multi-key FHE gate bootstrapping; see SURVEY.md):

  * FHEW/TFHE-style boolean gate bootstrapping (AP / GINX / LMKCDEY methods)
  * single-key NTRU bootstrapping (XZDDF, ia.cr/2023/1564)
  * multi-key NTRU / multi-key LWE gate bootstrapping with UniEnc
    accumulators (XZW / XZW_B), matrix-NTRU and multi-key LWE linear layers
  * mod switching, key switching, extended ops (EvalFunc/Floor/Sign/Decomp)

Design stance (TPU-first, NOT a port):
  * ring elements are int32 arrays shaped [..., N] with values in [0, Q);
    all compute-path math is exact modular arithmetic under jit
  * keys / ciphertexts are NamedTuples of arrays (pytrees); a leading batch
    dimension is supported everywhere on the hot path
  * blind rotation is a lax.scan over rotation steps with users/digits
    vectorized; multi-chip scaling via jax.sharding.Mesh + shard_map
  * key generation is host-side numpy (exact; NTT-domain Fermat inversion
    replaces the reference's NTL InvMod / mat_ZZ_p::inv)

64-bit integer intermediates are required for exact modular products; this
package enables jax_enable_x64 at import.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .constants import (  # noqa: E402
    BINGATE,
    BINFHE_METHOD,
    BINFHE_PARAMSET,
    KEYGEN_MODE,
)

try:  # context pulls in the full scheme stack; keep ops importable early
    from .context import BinFHEContext  # noqa: E402
    from . import boot  # noqa: E402
    from . import serial  # noqa: E402
except ImportError:  # pragma: no cover - during partial builds only
    BinFHEContext = None

__all__ = [
    "BINGATE",
    "BINFHE_METHOD",
    "BINFHE_PARAMSET",
    "KEYGEN_MODE",
    "BinFHEContext",
]

__version__ = "0.1.0"
