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

# 64-bit-native harnesses (oracle/build64.sh first): the >28-bit surface
INC64="-I$REF/src/binfhe/include -I$REF/src/core/include -I$REF/third-party/cereal/include -Ibuild64/src/core -isystem ntl_shim"
LIBS64="build64/lib/libOPENFHEbinfhe_static.a build64/lib/libOPENFHEcore_static.a"
if [ -f build64/lib/libOPENFHEcore_static.a ]; then
  for n in capture_ext64 capture_bigq64; do
    echo "g++ $n (NATIVE_SIZE=64)"
    g++ -O2 -std=gnu++17 -fopenmp $INC64 -o "$n" "$n.cpp" $LIBS64 -lpthread
  done
fi
