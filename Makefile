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

# PLAN #7: regenerate reference-captured vectors with the oracle
# binaries, then re-verify our kernels bit-exactly against them
oracle-check: oracle-build
	./oracle/capture_mkntru oracle/vectors/std100_mkntru STD100_MKNTRU
	./oracle/capture_mkntru oracle/vectors/std100_mkntru_k4 STD100_MKNTRU_4
	./oracle/capture_mklwe  oracle/vectors/std100_mklwe
	./oracle/capture_ginx   oracle/vectors/std128_ginx GINX
	./oracle/capture_ginx   oracle/vectors/std128_ap   AP
	$(PY) -m pytest tests/test_bitexact_oracle.py -x -q
