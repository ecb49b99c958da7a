#!/bin/bash
# Compile the capture harnesses against the oracle build's static libs.
# Usage: bash oracle/build_captures.sh [name ...]  (default: all)
set -e
cd "$(dirname "$0")"
REF=/root/reference
INC="-I$REF/src/binfhe/include -I$REF/src/core/include -I$REF/third-party/cereal/include -Ibuild/src/core -isystem ntl_shim"
LIBS="build/lib/libOPENFHEbinfhe_static.a build/lib/libOPENFHEcore_static.a"
for n in ${@:-capture_mkntru capture_mklwe capture_ginx capture_lmkcdey capture_xzddf interop_cereal ref_errrate}; do
  echo "g++ $n"
  g++ -O2 -std=c++17 -fopenmp $INC -o "$n" "$n.cpp" $LIBS -lpthread
done
