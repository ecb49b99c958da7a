#!/bin/bash
# NATIVE_SIZE=64 oracle build (r5, VERDICT r4 task #3): the reference
# compiled with 64-bit native integers, so the >28-bit parameter surface
# (logQprime=54 ext profile, STD256/STD192* sets) runs natively and can
# anchor our dual-limb RNS path with real reference vectors.
# Usage: bash oracle/build64.sh [build-dir]   (default oracle/build64)
set -e
cd "$(dirname "$0")"
SHIM="$PWD/ntl_shim"
BUILD="${1:-$PWD/build64}"

mkdir -p "$SHIM/lib"
echo 'extern "C" { int _ntl_shim_anchor; }' > "$SHIM/lib/empty.cpp"
g++ -shared -fPIC -o "$SHIM/lib/libntl.so" "$SHIM/lib/empty.cpp"
g++ -shared -fPIC -o "$SHIM/lib/libgmp.so" "$SHIM/lib/empty.cpp"
touch "$SHIM/gmp.h"

mkdir -p "$SHIM/bin"
printf '#!/bin/sh\necho "autoconf (shim) 2.71"\n' > "$SHIM/bin/autoconf"
printf '#!/bin/sh\necho "autogen (shim) 5.18"\n' > "$SHIM/bin/autogen"
chmod +x "$SHIM/bin/autoconf" "$SHIM/bin/autogen"
export PATH="$SHIM/bin:$PATH"

mkdir -p "$BUILD"
cd "$BUILD"
cmake /root/reference \
  -DCMAKE_BUILD_TYPE=Release \
  -DWITH_NTL=OFF -DNATIVE_SIZE=64 -DWITH_NATIVEOPT=ON -DWITH_OPENMP=OFF \
  -DBUILD_UNITTESTS=OFF -DBUILD_EXAMPLES=OFF -DBUILD_STATIC=ON \
  -DBUILD_SHARED=OFF \
  -DCMAKE_CXX_FLAGS="-isystem $SHIM"
make -j"$(nproc)" OPENFHEbinfhe_static OPENFHEcore_static
