# Developer entry points. The repo's compute path is JAX; native pieces
# (oracle harness, C++ batch NTT) build via their own scripts.

PY ?= python

.PHONY: test smoke bench oracle-build oracle-check native

# full CPU suite (virtual 8-device mesh; ~10 min)
test:
	$(PY) -m pytest tests/ -x -q

# <60s gate for commits touching acc/ or ops/: end-to-end TOY MK NAND
# decrypt + kernel exactness (VERDICT r1 task 1)
smoke:
	$(PY) -m pytest tests/ -q -m smoke

bench:
	$(PY) bench.py --batch 128 --reps 3

native:
	bash mkfhe_tpu/native/build.sh

oracle-build:
	bash oracle/build.sh

# Regenerate ALL 9 reference-captured vector dirs with the oracle
# binaries, then re-verify our kernels bit-exactly against them
# (r3 VERDICT weak #6: the full matrix must reproduce from one target).
# NOTE the reference enum suffixes: _2 = 4 parties, _3 = 8, _4 = 16.
oracle-check: oracle-build
	bash oracle/build_captures.sh
	./oracle/capture_mkntru  oracle/vectors/std100_mkntru    STD100_MKNTRU
	./oracle/capture_mkntru  oracle/vectors/std100_mkntru_k4 STD100_MKNTRU_2
	./oracle/capture_mkntru  oracle/vectors/std100_mkntru_k8 STD100_MKNTRU_3
	./oracle/capture_mkntru  oracle/vectors/std128_mkntru    STD128_MKNTRU
	./oracle/capture_mklwe   oracle/vectors/std100_mklwe
	./oracle/capture_mklwe   oracle/vectors/std100_mklwe_k4 STD100_MKNTRU_LWE_2
	./oracle/capture_mklwe   oracle/vectors/std100_mklwe_k8 STD100_MKNTRU_LWE_3
	./oracle/capture_ginx    oracle/vectors/std128_ginx GINX
	./oracle/capture_ginx    oracle/vectors/std128_ap   AP
	./oracle/capture_lmkcdey oracle/vectors/std128_lmkcdey
	./oracle/capture_xzddf   oracle/vectors/p128t_xzddf
	$(PY) -m pytest tests/test_bitexact_oracle.py tests/test_interop_cereal.py -x -q
