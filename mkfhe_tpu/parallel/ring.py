"""Ring-dimension (N-axis) sharding of the negacyclic NTT.

SURVEY.md §2.5 item 2: for rings too large for one chip (or to cut latency
at very large batch), shard the transform itself. Strategy here is the
matmul formulation (ops.ntt.MXUTables): out = a @ W with

  * W column-sharded over the mesh axis 'ring'  -> each device holds
    W[:, shard] limbs and computes its slice of the output slots
  * a replicated (or batch-sharded over 'dp'); XLA GSPMD inserts the
    all-gather/reduce-scatter pattern over ICI

A butterfly-stage ppermute pipeline (log N stages with halving exchange
distances) is the lower-communication alternative for N >= 16k; the
matmul form wins below that because it rides the MXU and needs ONE
collective per transform.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ntt as nttm
from ..ops.modmath import I32, I64


def sharded_ntt_fn(mesh: Mesh, tables: nttm.NTTTables, inverse: bool = False):
    """Build a jitted sharded transform: [B, N] -> [B, N] with the N axis
    of the output (and of W) sharded over mesh axis 'ring', batch over 'dp'
    when present."""
    mxu = nttm.get_mxu_tables(tables)
    W = mxu.W_inv if inverse else mxu.W_fwd          # [L, N, N] bf16
    axes = mesh.axis_names
    ring = "ring" if "ring" in axes else axes[-1]
    dp = "dp" if "dp" in axes else None

    w_sharded = jax.device_put(
        W, NamedSharding(mesh, P(None, None, ring)))
    out_spec = P(dp, ring) if dp else P(None, ring)
    in_spec = P(dp, None) if dp else P(None, None)
    Q = tables.Q
    q_bits = (Q - 1).bit_length()
    a_bits, w_bits = mxu.a_bits, mxu.w_bits

    @partial(jax.jit,
             in_shardings=NamedSharding(mesh, in_spec),
             out_shardings=NamedSharding(mesh, out_spec))
    def fn(x):
        na = -(-q_bits // a_bits)
        amask = (1 << a_bits) - 1
        acc = None
        for la in range(na):
            xl = ((x >> (la * a_bits)) & amask).astype(jnp.bfloat16)
            for lw in range(w_sharded.shape[0]):
                part = jnp.matmul(
                    xl, w_sharded[lw], preferred_element_type=jnp.float32)
                # recombine via (2^shift mod Q), exactly as ops.ntt
                # _mxu_transform: raw shifts overflow int64 at N = 2048
                smod = pow(2, la * a_bits + lw * w_bits, Q)
                part = part.astype(I64) * smod
                acc = part if acc is None else acc + part
        return (acc % Q).astype(I32)

    return fn
