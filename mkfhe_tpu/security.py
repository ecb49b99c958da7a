"""HE-standard lattice security table (reference:
lattice/stdlatticeparms.{h,cpp} — the homomorphicencryption.org tables).

`MAX_LOG_Q[(dist, n, level)]` gives the largest supported log2(Q) for a
ring dimension / secret distribution / security level;
`find_ring_dim(dist, level, log_q)` mirrors StdLatticeParm::FindRingDim
(stdlatticeparms.h:157): the smallest n whose maxLogQ covers log_q.
"""

# (distribution, ring_dim, level) -> max log2 Q
MAX_LOG_Q = {
    ("uniform", 1024, "128_classic"): 29,
    ("uniform", 1024, "192_classic"): 21,
    ("uniform", 1024, "256_classic"): 16,
    ("uniform", 2048, "128_classic"): 56,
    ("uniform", 2048, "192_classic"): 39,
    ("uniform", 2048, "256_classic"): 31,
    ("uniform", 4096, "128_classic"): 111,
    ("uniform", 4096, "192_classic"): 77,
    ("uniform", 4096, "256_classic"): 60,
    ("uniform", 8192, "128_classic"): 220,
    ("uniform", 8192, "192_classic"): 154,
    ("uniform", 8192, "256_classic"): 120,
    ("uniform", 16384, "128_classic"): 440,
    ("uniform", 16384, "192_classic"): 307,
    ("uniform", 16384, "256_classic"): 239,
    ("uniform", 32768, "128_classic"): 880,
    ("uniform", 32768, "192_classic"): 612,
    ("uniform", 32768, "256_classic"): 478,
    ("error", 1024, "128_classic"): 29,
    ("error", 1024, "192_classic"): 21,
    ("error", 1024, "256_classic"): 16,
    ("error", 2048, "128_classic"): 56,
    ("error", 2048, "192_classic"): 39,
    ("error", 2048, "256_classic"): 31,
    ("error", 4096, "128_classic"): 111,
    ("error", 4096, "192_classic"): 77,
    ("error", 4096, "256_classic"): 60,
    ("error", 8192, "128_classic"): 220,
    ("error", 8192, "192_classic"): 154,
    ("error", 8192, "256_classic"): 120,
    ("error", 16384, "128_classic"): 440,
    ("error", 16384, "192_classic"): 307,
    ("error", 16384, "256_classic"): 239,
    ("error", 32768, "128_classic"): 883,
    ("error", 32768, "192_classic"): 613,
    ("error", 32768, "256_classic"): 478,
    ("error", 65536, "128_classic"): 1774,
    ("error", 65536, "192_classic"): 1230,
    ("error", 65536, "256_classic"): 958,
    ("ternary", 1024, "128_classic"): 27,
    ("ternary", 1024, "192_classic"): 19,
    ("ternary", 1024, "256_classic"): 14,
    ("ternary", 2048, "128_classic"): 54,
    ("ternary", 2048, "192_classic"): 37,
    ("ternary", 2048, "256_classic"): 29,
    ("ternary", 4096, "128_classic"): 109,
    ("ternary", 4096, "192_classic"): 75,
    ("ternary", 4096, "256_classic"): 58,
    ("ternary", 8192, "128_classic"): 218,
    ("ternary", 8192, "192_classic"): 152,
    ("ternary", 8192, "256_classic"): 118,
    ("ternary", 16384, "128_classic"): 438,
    ("ternary", 16384, "192_classic"): 305,
    ("ternary", 16384, "256_classic"): 237,
    ("ternary", 32768, "128_classic"): 881,
    ("ternary", 32768, "192_classic"): 611,
    ("ternary", 32768, "256_classic"): 476,
    ("ternary", 65536, "128_classic"): 1772,
    ("ternary", 65536, "192_classic"): 1228,
    ("ternary", 65536, "256_classic"): 956,
    ("uniform", 1024, "128_quantum"): 27,
    ("uniform", 1024, "192_quantum"): 19,
    ("uniform", 1024, "256_quantum"): 15,
    ("uniform", 2048, "128_quantum"): 53,
    ("uniform", 2048, "192_quantum"): 37,
    ("uniform", 2048, "256_quantum"): 29,
    ("uniform", 4096, "128_quantum"): 103,
    ("uniform", 4096, "192_quantum"): 72,
    ("uniform", 4096, "256_quantum"): 56,
    ("uniform", 8192, "128_quantum"): 206,
    ("uniform", 8192, "192_quantum"): 143,
    ("uniform", 8192, "256_quantum"): 111,
    ("uniform", 16384, "128_quantum"): 413,
    ("uniform", 16384, "192_quantum"): 286,
    ("uniform", 16384, "256_quantum"): 222,
    ("uniform", 32768, "128_quantum"): 829,
    ("uniform", 32768, "192_quantum"): 573,
    ("uniform", 32768, "256_quantum"): 445,
    ("error", 1024, "128_quantum"): 27,
    ("error", 1024, "192_quantum"): 19,
    ("error", 1024, "256_quantum"): 15,
    ("error", 2048, "128_quantum"): 53,
    ("error", 2048, "192_quantum"): 37,
    ("error", 2048, "256_quantum"): 29,
    ("error", 4096, "128_quantum"): 103,
    ("error", 4096, "192_quantum"): 72,
    ("error", 4096, "256_quantum"): 56,
    ("error", 8192, "128_quantum"): 206,
    ("error", 8192, "192_quantum"): 143,
    ("error", 8192, "256_quantum"): 111,
    ("error", 16384, "128_quantum"): 413,
    ("error", 16384, "192_quantum"): 286,
    ("error", 16384, "256_quantum"): 222,
    ("error", 32768, "128_quantum"): 829,
    ("error", 32768, "192_quantum"): 573,
    ("error", 32768, "256_quantum"): 445,
    ("ternary", 1024, "128_quantum"): 25,
    ("ternary", 1024, "192_quantum"): 17,
    ("ternary", 1024, "256_quantum"): 13,
    ("ternary", 2048, "128_quantum"): 51,
    ("ternary", 2048, "192_quantum"): 35,
    ("ternary", 2048, "256_quantum"): 27,
    ("ternary", 4096, "128_quantum"): 101,
    ("ternary", 4096, "192_quantum"): 70,
    ("ternary", 4096, "256_quantum"): 54,
    ("ternary", 8192, "128_quantum"): 202,
    ("ternary", 8192, "192_quantum"): 141,
    ("ternary", 8192, "256_quantum"): 109,
    ("ternary", 16384, "128_quantum"): 411,
    ("ternary", 16384, "192_quantum"): 284,
    ("ternary", 16384, "256_quantum"): 220,
    ("ternary", 32768, "128_quantum"): 827,
    ("ternary", 32768, "192_quantum"): 571,
    ("ternary", 32768, "256_quantum"): 443,
}

DISTRIBUTIONS = ("uniform", "error", "ternary")
LEVELS = ("128_classic", "192_classic", "256_classic",
          "128_quantum", "192_quantum", "256_quantum")


def max_log_q(dist: str, n: int, level: str) -> int | None:
    return MAX_LOG_Q.get((dist, n, level))


def find_ring_dim(dist: str, level: str, log_q: int) -> int:
    """Smallest standard ring dimension n with maxLogQ(n) >= log_q."""
    best = None
    for (d, n, lvl), mq in MAX_LOG_Q.items():
        if d == dist and lvl == level and mq >= log_q:
            if best is None or n < best:
                best = n
    if best is None:
        raise ValueError(
            f"no standard ring dimension supports log q = {log_q} at "
            f"{level}/{dist}")
    return best


def check_security(dist: str, n: int, level: str, log_q: int) -> bool:
    """True if (n, log_q) meets the requested level for the distribution."""
    mq = max_log_q(dist, n, level)
    return mq is not None and log_q <= mq
