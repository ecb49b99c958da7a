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


def butterfly_sharded_ntt_fn(mesh: Mesh, tables: nttm.NTTTables):
    """Butterfly-stage ppermute pipeline (SURVEY §2.5 item 2) — the
    lower-communication alternative to the matmul form for N >= 16k.

    Forward negacyclic CT transform with the N axis contiguously sharded
    over mesh axis 'ring' (D devices, chunk C = N/D):

      * stages with pair distance t >= C exchange WHOLE chunks with the
        XOR-partner device (log2 D ppermutes; at stage distance t the
        partner is d ^ (t/C)) and apply one scalar twiddle per device,
      * stages with 2t <= C are fully local (block-parallel butterflies
        with the device's twiddle slice).

    Communication: log2(D) * B*C words/device vs the matmul form's
    all-gather of B*N*(D-1)/D words/device — 3/8 vs 7/8 of B*N at D=8 —
    but the compute rides the VPU, not the MXU. Measured crossover notes
    live in tests/test_sharding.py::test_butterfly_sharded_ntt; below
    N=16k the matmul form wins on TPU because the MXU does the transform
    nearly for free next to the collective.

    Output is bit-reversed EVAL, identical to ops.ntt.ntt_fwd, sharded
    [B, N/ring]. Reference anchor: transformnat-impl.h:197-238 (the same
    (m, t) stage structure, distributed).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    N, Q = tables.N, tables.Q
    axes = mesh.axis_names
    ring = "ring" if "ring" in axes else axes[-1]
    D = mesh.shape[ring]
    C = N // D
    assert C * D == N and (D & (D - 1)) == 0, "ring size must divide N, pow2"
    psi = tables.psi_brv                 # [N] replicated twiddles

    def local_fn(psi_rep, x):            # x: [B, C] this device's chunk
        d = jax.lax.axis_index(ring)
        m, t = 1, N // 2
        # -------- cross-device stages: t >= C, partner = d ^ (t // C)
        while t >= C:
            step = t // C
            perm = [(j, j ^ step) for j in range(D)]
            other = jax.lax.ppermute(x, ring, perm)
            is_u = ((d // step) % 2) == 0
            w = psi_rep[m + d // (2 * step)]         # scalar twiddle
            u = jnp.where(is_u, x, other)
            v = jnp.where(is_u, other, x)
            wv = ((v.astype(I64) * w) % Q).astype(I32)
            s = u + wv
            s = jnp.where(s >= Q, s - Q, s)
            dff = u - wv
            dff = jnp.where(dff < 0, dff + Q, dff)
            x = jnp.where(is_u, s, dff)
            m *= 2
            t //= 2
        # -------- local stages: 2t <= C
        B = x.shape[0]
        while m < N:
            nb = C // (2 * t)
            w = jax.lax.dynamic_slice(psi_rep, (m + d * nb,), (nb,))
            xb = x.reshape(B, nb, 2, t)
            u = xb[:, :, 0, :]
            v = ((xb[:, :, 1, :].astype(I64)
                  * w[None, :, None]) % Q).astype(I32)
            s = u + v
            s = jnp.where(s >= Q, s - Q, s)
            dff = u - v
            dff = jnp.where(dff < 0, dff + Q, dff)
            x = jnp.stack([s, dff], axis=2).reshape(B, C)
            m *= 2
            t //= 2
        return x

    in_specs = (P(), P(None, ring))
    fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=P(None, ring))

    @jax.jit
    def run(x):
        return fn(psi, x)

    return run


def butterfly_sharded_intt_fn(mesh: Mesh, tables: nttm.NTTTables):
    """Inverse (GS) twin of butterfly_sharded_ntt_fn: bit-reversed EVAL in,
    natural COEFF out, N contiguously sharded over 'ring'. Local stages
    run first (2t <= C), the last log2(D) stages exchange whole chunks."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    N, Q = tables.N, tables.Q
    axes = mesh.axis_names
    ring = "ring" if "ring" in axes else axes[-1]
    D = mesh.shape[ring]
    C = N // D
    assert C * D == N and (D & (D - 1)) == 0
    ipsi = tables.ipsi_brv
    n_inv = tables.n_inv

    def local_fn(ipsi_rep, x):           # [B, C]
        d = jax.lax.axis_index(ring)
        B = x.shape[0]
        m, t = N, 1
        # -------- local stages: 2t <= C
        while 2 * t <= C:
            h = m // 2
            nb = C // (2 * t)
            w = jax.lax.dynamic_slice(ipsi_rep, (h + d * nb,), (nb,))
            xb = x.reshape(B, nb, 2, t)
            u = xb[:, :, 0, :]
            v = xb[:, :, 1, :]
            s = u + v
            s = jnp.where(s >= Q, s - Q, s)
            dff = u - v
            dff = jnp.where(dff < 0, dff + Q, dff)
            dff = ((dff.astype(I64) * w[None, :, None]) % Q).astype(I32)
            x = jnp.stack([s, dff], axis=2).reshape(B, C)
            t *= 2
            m = h
        # -------- cross-device stages: t >= C
        while m > 1:
            h = m // 2
            step = t // C
            perm = [(j, j ^ step) for j in range(D)]
            other = jax.lax.ppermute(x, ring, perm)
            is_u = ((d // step) % 2) == 0
            w = ipsi_rep[h + d // (2 * step)]
            u = jnp.where(is_u, x, other)
            v = jnp.where(is_u, other, x)
            s = u + v
            s = jnp.where(s >= Q, s - Q, s)
            dff = u - v
            dff = jnp.where(dff < 0, dff + Q, dff)
            dff = ((dff.astype(I64) * w) % Q).astype(I32)
            x = jnp.where(is_u, s, dff)
            t *= 2
            m = h
        return ((x.astype(I64) * n_inv) % Q).astype(I32)

    fn = shard_map(local_fn, mesh=mesh, in_specs=(P(), P(None, ring)),
                   out_specs=P(None, ring))

    @jax.jit
    def run(x):
        return fn(ipsi, x)

    return run
