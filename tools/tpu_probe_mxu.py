"""Probe MXU bf16 matmul integer-exactness bounds on the real chip."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    K = 2048

    for a_bits, w_bits in [(7, 6), (6, 6), (6, 5), (5, 5), (7, 5), (8, 4),
                           (4, 4), (8, 8)]:
        a = rng.integers(0, 1 << a_bits, (8, K))
        w = rng.integers(0, 1 << w_bits, (K, 256))
        want = a @ w
        got = jnp.matmul(
            jnp.asarray(a, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
            preferred_element_type=jnp.float32)
        got = np.asarray(got.astype(jnp.int64))
        ok = np.array_equal(got, want)
        mx = int(np.abs(got - want).max())
        print(f"bf16 a{a_bits} w{w_bits}: max_sum={(2**a_bits-1)*(2**w_bits-1)*K:.3e} "
              f"{'EXACT' if ok else f'ERR max={mx}'}", flush=True)

    # f32 inputs path
    for a_bits, w_bits in [(7, 6), (9, 9), (11, 11)]:
        a = rng.integers(0, 1 << a_bits, (8, K))
        w = rng.integers(0, 1 << w_bits, (K, 256))
        want = a @ w
        got = jnp.matmul(
            jnp.asarray(a, jnp.float32), jnp.asarray(w, jnp.float32),
            preferred_element_type=jnp.float32)
        got = np.asarray(got.astype(jnp.int64))
        ok = np.array_equal(got, want)
        mx = int(np.abs(got - want).max())
        print(f"f32  a{a_bits} w{w_bits}: max_sum={(2**a_bits-1)*(2**w_bits-1)*K:.3e} "
              f"{'EXACT' if ok else f'ERR max={mx}'}", flush=True)

    # int8 MXU path
    for a_bits, w_bits in [(7, 7), (7, 6)]:
        a = rng.integers(0, 1 << a_bits, (8, K))
        w = rng.integers(0, 1 << w_bits, (K, 256))
        want = a @ w
        try:
            got = jax.lax.dot_general(
                jnp.asarray(a, jnp.int8), jnp.asarray(w, jnp.int8),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            got = np.asarray(got.astype(jnp.int64))
            ok = np.array_equal(got, want)
            mx = int(np.abs(got - want).max())
            print(f"int8 a{a_bits} w{w_bits}: "
                  f"{'EXACT' if ok else f'ERR max={mx}'}", flush=True)
        except Exception as e:
            print(f"int8 a{a_bits} w{w_bits}: EXC {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
