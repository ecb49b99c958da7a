"""Final round-1 TPU session: gate benches with the tuned arithmetic
(materialized-df + Shoup singles + amortized s64 contractions + diagonal
s32 limb recombination + int32 decompose)."""


def main():
    import jax
    print("device:", jax.devices(), flush=True)
    from tpu_session import bench_gate
    from mkfhe_tpu.ops import ntt as nttm

    for impl, batch in [("mxu_s8", 32), ("mxu_s8", 128),
                        ("butterfly", 32), ("mxu_s8", 256)]:
        bench_gate("mkntru", "STD100_MKNTRU", impl, batch)
    bench_gate("ginx", "STD128", "mxu_s8", 128)


if __name__ == "__main__":
    main()
