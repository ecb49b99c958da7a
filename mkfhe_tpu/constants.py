"""Enums and named parameter sets.

Mirrors the reference's binfhe-constants.h:129-153 (BINFHE_METHOD, BINGATE,
KEYGEN_MODE) and the parameter-set table at binfhecontext.cpp:91-146.
"""

import enum
from typing import NamedTuple


class BINFHE_METHOD(enum.Enum):
    AP = 1        # Ducas-Micciancio
    GINX = 2      # CGGI
    LMKCDEY = 3   # ia.cr/2022/198
    XZDDF = 4     # single-key NTRU, ia.cr/2023/1564 (reference dispatches this
                  # via the VectorNTRU params rather than a method enum value)
    MKNTRU = 5    # multi-key NTRU (UniEnc XZW, ternary/Gaussian secrets)
    MKNTRU_B = 6  # multi-key NTRU (UniEnc XZW_B, binary secrets)
    MKNTRU_LWE = 7  # multi-key LWE linear layer + UniEnc XZW_B accumulator


class BINGATE(enum.IntEnum):
    # order matters: indexes the gate-constant table
    # (rgsw-cryptoparameters.cpp:77-89)
    OR = 0
    AND = 1
    NOR = 2
    NAND = 3
    XOR_FAST = 4
    XNOR_FAST = 5
    MAJORITY = 6
    AND3 = 7
    OR3 = 8
    AND4 = 9
    OR4 = 10
    CMUX = 11
    XOR = 12
    XNOR = 13


class KEYGEN_MODE(enum.Enum):
    SYM_ENCRYPT = 0
    PUB_ENCRYPT = 1


class SecretKeyDist(enum.Enum):
    BINARY = 0
    UNIFORM_TERNARY = 1
    GAUSSIAN = 2


class BINFHE_PARAMSET(enum.Enum):
    TOY = "TOY"
    MEDIUM = "MEDIUM"
    STD128_AP = "STD128_AP"
    STD128 = "STD128"
    STD128_LMKCDEY = "STD128_LMKCDEY"
    STD128Q = "STD128Q"
    STD128Q_LMKCDEY = "STD128Q_LMKCDEY"
    STD192 = "STD192"
    STD192Q = "STD192Q"
    STD256 = "STD256"
    STD256Q = "STD256Q"
    SIGNED_MOD_TEST = "SIGNED_MOD_TEST"
    # 3-bit / 4-bit plaintext-space sets (multi-input gates, EvalFunc at
    # spec precision; binfhecontext.cpp:101-113)
    STD128_3 = "STD128_3"
    STD128_3_LMKCDEY = "STD128_3_LMKCDEY"
    STD128Q_3_LMKCDEY = "STD128Q_3_LMKCDEY"
    STD192Q_3 = "STD192Q_3"
    STD256Q_3 = "STD256Q_3"
    STD128_4 = "STD128_4"
    STD128_4_LMKCDEY = "STD128_4_LMKCDEY"
    STD128Q_4 = "STD128Q_4"
    STD128Q_4_LMKCDEY = "STD128Q_4_LMKCDEY"
    STD192Q_4 = "STD192Q_4"
    STD256Q_4 = "STD256Q_4"
    STD128_LMKCDEY_New = "STD128_LMKCDEY_New"
    # NTRU (single key, XZDDF)
    P128T = "P128T"
    P128G = "P128G"
    P128T_2 = "P128T_2"
    P128G_2 = "P128G_2"
    P192T = "P192T"
    P192G = "P192G"
    # MK-FHE
    STD128_MKNTRU = "STD128_MKNTRU"
    STD128_MKNTRU_2 = "STD128_MKNTRU_2"
    STD128_MKNTRU_3 = "STD128_MKNTRU_3"
    STD128_MKNTRU_4 = "STD128_MKNTRU_4"
    STD128_MKNTRU_LWE = "STD128_MKNTRU_LWE"
    STD128_MKNTRU_LWE_2 = "STD128_MKNTRU_LWE_2"
    STD128_MKNTRU_LWE_3 = "STD128_MKNTRU_LWE_3"
    STD128_MKNTRU_LWE_4 = "STD128_MKNTRU_LWE_4"
    STD100_MKNTRU = "STD100_MKNTRU"
    STD100_MKNTRU_2 = "STD100_MKNTRU_2"
    STD100_MKNTRU_3 = "STD100_MKNTRU_3"
    STD100_MKNTRU_4 = "STD100_MKNTRU_4"
    STD100_MKNTRU_LWE = "STD100_MKNTRU_LWE"
    STD100_MKNTRU_LWE_2 = "STD100_MKNTRU_LWE_2"
    STD100_MKNTRU_LWE_3 = "STD100_MKNTRU_LWE_3"
    STD100_MKNTRU_LWE_4 = "STD100_MKNTRU_LWE_4"
    # small sets for fast tests (not in reference; same structure as the MK
    # sets but with toy lattice dimensions)
    TOY_MKNTRU = "TOY_MKNTRU"
    TOY_MKNTRU_4 = "TOY_MKNTRU_4"
    TOY_MKNTRU_LWE = "TOY_MKNTRU_LWE"
    TOY_NTRU = "TOY_NTRU"


class ContextParams(NamedTuple):
    """One row of the parameter-set table (binfhecontext.h:18-42)."""

    num_user: int       # k
    number_bits: int    # bits of the intermediate prime Q
    cycl_order: int     # 2N
    lattice_param: int  # n
    mod: int            # q
    mod_ks: int         # qKS (0 = PRIME, i.e. use Q)
    std_dev: float
    base_ks: int        # Bks
    base_g: int         # gadget base B_G
    base_rk: int        # baseR (AP digit base) / numAutoKeys interplay
    num_auto_keys: int
    key_dist: SecretKeyDist


_STD = 1.9        # STD_DEV       (binfhecontext.cpp:85)
_NTRU = 0.5       # STD_NTRU      (binfhecontext.cpp:86)
_NTRU2 = 0.75     # STD_NTRU2     (binfhecontext.cpp:87)
PRIME = 0

T = SecretKeyDist.UNIFORM_TERNARY
G = SecretKeyDist.GAUSSIAN
B = SecretKeyDist.BINARY

# transcribed from binfhecontext.cpp:91-146
PARAM_SETS = {
    BINFHE_PARAMSET.TOY:             ContextParams(1, 27, 1024, 64, 512, PRIME, _STD, 25, 1 << 9, 23, 9, T),
    BINFHE_PARAMSET.MEDIUM:          ContextParams(1, 28, 2048, 422, 1024, 1 << 14, _STD, 1 << 7, 1 << 10, 32, 10, T),
    BINFHE_PARAMSET.STD192:          ContextParams(1, 37, 4096, 805, 1024, 1 << 15, _STD, 32, 1 << 13, 32, 10, T),
    BINFHE_PARAMSET.STD256:          ContextParams(1, 29, 4096, 990, 2048, 1 << 14, _STD, 1 << 7, 1 << 8, 46, 10, T),
    BINFHE_PARAMSET.STD128Q:         ContextParams(1, 25, 2048, 534, 1024, 1 << 14, _STD, 32, 1 << 7, 32, 10, T),
    BINFHE_PARAMSET.STD128Q_LMKCDEY: ContextParams(1, 27, 2048, 448, 1024, 1 << 13, _STD, 32, 1 << 9, 32, 10, G),
    BINFHE_PARAMSET.STD192Q:         ContextParams(1, 35, 4096, 875, 1024, 1 << 15, _STD, 32, 1 << 12, 32, 10, T),
    BINFHE_PARAMSET.STD256Q:         ContextParams(1, 27, 4096, 1225, 1024, 1 << 16, _STD, 16, 1 << 7, 32, 10, T),
    BINFHE_PARAMSET.SIGNED_MOD_TEST: ContextParams(1, 28, 2048, 512, 1024, PRIME, _STD, 25, 1 << 7, 23, 10, T),
    # 3-bit / 4-bit plaintext-space sets (binfhecontext.cpp:101-113).
    # NOTE: STD128Q_4 (numberBits=50) exceeds MAX_MODULUS_SIZE=28 of the
    # reference's NATIVE_SIZE=32 build (basicint.h:56-61); it runs here
    # on the dual-limb RNS ring (ops/rns.py) with reference anchors from
    # the NATIVE_SIZE=64 oracle build (oracle/vectors/std128q4_64).
    # WARNING (measured, tools/errrate_multi.json): the *_3_LMKCDEY rows
    # run 3-input gates at ~2.4 sigma of margin — 1.5-1.7% per-gate
    # error over 1024 random TPU trials (reference-class behavior; the
    # reference only tests 3-input LMKCDEY at TOY). Use the GINX _3 rows
    # (measured error-free) where that rate is unacceptable.
    BINFHE_PARAMSET.STD128_3:          ContextParams(1, 27, 2048, 541, 1024, 1 << 15, _STD, 32, 1 << 7, 32, 10, T),
    BINFHE_PARAMSET.STD128_3_LMKCDEY:  ContextParams(1, 28, 2048, 485, 1024, 1 << 15, _STD, 32, 1 << 10, 32, 10, G),
    BINFHE_PARAMSET.STD128Q_3_LMKCDEY: ContextParams(1, 27, 2048, 524, 1024, 1 << 15, _STD, 32, 1 << 9, 32, 10, G),
    BINFHE_PARAMSET.STD192Q_3:         ContextParams(1, 34, 4096, 922, 2048, 1 << 16, _STD, 16, 1 << 12, 32, 10, T),
    BINFHE_PARAMSET.STD256Q_3:         ContextParams(1, 27, 4096, 1400, 4096, 1 << 16, _STD, 21, 1 << 6, 32, 10, T),
    BINFHE_PARAMSET.STD128_4:          ContextParams(1, 27, 2048, 541, 2048, 1 << 15, _STD, 32, 1 << 7, 32, 10, T),
    BINFHE_PARAMSET.STD128_4_LMKCDEY:  ContextParams(1, 28, 2048, 522, 2048, 1 << 15, _STD, 32, 1 << 10, 32, 10, G),
    BINFHE_PARAMSET.STD128Q_4:         ContextParams(1, 50, 4096, 647, 2048, 1 << 16, _STD, 16, 1 << 25, 32, 10, T),
    BINFHE_PARAMSET.STD128Q_4_LMKCDEY: ContextParams(1, 27, 2048, 524, 2048, 1 << 15, _STD, 32, 1 << 7, 32, 10, G),
    BINFHE_PARAMSET.STD192Q_4:         ContextParams(1, 34, 4096, 980, 2048, 1 << 17, _STD, 16, 1 << 12, 32, 10, T),
    BINFHE_PARAMSET.STD256Q_4:         ContextParams(1, 27, 4096, 1625, 4096, 1 << 21, _STD, 16, 1 << 6, 32, 10, T),
    BINFHE_PARAMSET.STD128_LMKCDEY_New: ContextParams(1, 28, 2048, 446, 1024, 1 << 13, _STD, 1 << 5, 1 << 7, 32, 10, G),
    BINFHE_PARAMSET.STD128_LMKCDEY:  ContextParams(1, 28, 2048, 446, 1024, 1 << 13, _STD, 1 << 5, 1 << 10, 32, 10, G),
    BINFHE_PARAMSET.STD128_AP:       ContextParams(1, 27, 2048, 503, 1024, 1 << 14, _STD, 1 << 5, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.STD128:          ContextParams(1, 27, 2048, 503, 1024, 1 << 14, _STD, 1 << 5, 1 << 9, 32, 10, T),
    # NTRU sets
    BINFHE_PARAMSET.P128T:   ContextParams(1, 21, 2048, 512, 1024, 1 << 14, _NTRU, 32, 1 << 7, 32, 10, T),
    BINFHE_PARAMSET.P128G:   ContextParams(1, 21, 2048, 446, 1024, 1 << 14, _NTRU, 32, 1 << 7, 32, 10, G),
    BINFHE_PARAMSET.P128T_2: ContextParams(1, 21, 2048, 512, 1024, 1 << 14, _NTRU, 32, 1 << 6, 32, 10, T),
    BINFHE_PARAMSET.P128G_2: ContextParams(1, 21, 2048, 446, 1024, 1 << 14, _NTRU, 32, 1 << 5, 32, 10, G),
    BINFHE_PARAMSET.P192T:   ContextParams(1, 26, 4096, 1024, 1024, 1 << 17, _NTRU, 28, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.P192G:   ContextParams(1, 26, 4096, 805, 1024, 1 << 17, _NTRU, 28, 1 << 9, 32, 10, G),
    # MK-FHE sets (binfhecontext.cpp:129-144)
    BINFHE_PARAMSET.STD128_MKNTRU:       ContextParams(2, 27, 4096, 765, 45181, 45181, _NTRU, 32, 1 << 7, 32, 10, T),
    BINFHE_PARAMSET.STD128_MKNTRU_2:     ContextParams(4, 27, 4096, 765, 45181, 45181, _NTRU, 32, 1 << 7, 32, 10, T),
    BINFHE_PARAMSET.STD128_MKNTRU_3:     ContextParams(8, 27, 4096, 765, 45181, 45181, _NTRU, 32, 1 << 6, 32, 10, T),
    BINFHE_PARAMSET.STD128_MKNTRU_4:     ContextParams(16, 27, 4096, 765, 45181, 45181, _NTRU, 32, 1 << 5, 32, 10, T),
    BINFHE_PARAMSET.STD128_MKNTRU_LWE:   ContextParams(2, 27, 4096, 635, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    BINFHE_PARAMSET.STD128_MKNTRU_LWE_2: ContextParams(4, 27, 4096, 635, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    BINFHE_PARAMSET.STD128_MKNTRU_LWE_3: ContextParams(8, 27, 4096, 635, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    BINFHE_PARAMSET.STD128_MKNTRU_LWE_4: ContextParams(16, 27, 4096, 635, 32749, 32749, _STD, 32, 1 << 7, 2, 10, B),
    BINFHE_PARAMSET.STD100_MKNTRU:       ContextParams(2, 27, 4096, 560, 45181, 45181, _NTRU2, 32, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.STD100_MKNTRU_2:     ContextParams(4, 27, 4096, 560, 45181, 45181, _NTRU2, 32, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.STD100_MKNTRU_3:     ContextParams(8, 27, 4096, 560, 45181, 45181, _NTRU2, 32, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.STD100_MKNTRU_4:     ContextParams(16, 27, 4096, 560, 45181, 45181, _NTRU2, 32, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.STD100_MKNTRU_LWE:   ContextParams(2, 27, 4096, 500, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    BINFHE_PARAMSET.STD100_MKNTRU_LWE_2: ContextParams(4, 27, 4096, 500, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    BINFHE_PARAMSET.STD100_MKNTRU_LWE_3: ContextParams(8, 27, 4096, 500, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    BINFHE_PARAMSET.STD100_MKNTRU_LWE_4: ContextParams(16, 27, 4096, 500, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    # test-only toy MK sets: small n/N so CI runs in seconds; NOT secure
    BINFHE_PARAMSET.TOY_MKNTRU:     ContextParams(2, 27, 1024, 64, 45181, 45181, _NTRU2, 32, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.TOY_MKNTRU_4:   ContextParams(4, 27, 1024, 64, 45181, 45181, _NTRU2, 32, 1 << 9, 32, 10, T),
    BINFHE_PARAMSET.TOY_MKNTRU_LWE: ContextParams(2, 27, 1024, 64, 32749, 32749, _STD, 32, 1 << 9, 2, 10, B),
    BINFHE_PARAMSET.TOY_NTRU:       ContextParams(1, 21, 1024, 64, 512, 1 << 14, _NTRU, 32, 1 << 7, 32, 10, T),
}

# gate-constant table values are computed from q in params.py
# (rgsw-cryptoparameters.cpp:77-89 / mk-cryptoparameters.cpp:37-49)


def gate_constants(q: int) -> list[int]:
    """Gate constants indexed by BINGATE (first 11 entries)."""
    return [
        5 * (q >> 3),    # OR
        7 * (q >> 3),    # AND
        1 * (q >> 3),    # NOR
        3 * (q >> 3),    # NAND
        5 * (q >> 3),    # XOR_FAST
        1 * (q >> 3),    # XNOR_FAST
        7 * (q >> 3),    # MAJORITY
        11 * (q // 12),  # AND3
        7 * (q // 12),   # OR3
        15 * (q >> 4),   # AND4
        9 * (q >> 4),    # OR4
    ]
