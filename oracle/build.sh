#!/bin/bash
# Build the read-only reference (/root/reference) out-of-tree as the CPU
# oracle, using the NTL shim in ./ntl_shim (no libntl/libgmp in this image).
# Usage: bash oracle/build.sh [build-dir]
set -e
cd "$(dirname "$0")"
SHIM="$PWD/ntl_shim"
BUILD="${1:-$PWD/build}"

# stub shared libs so `-lntl -lgmp` succeed (all shim code is header-only)
mkdir -p "$SHIM/lib"
echo 'extern "C" { int _ntl_shim_anchor; }' > "$SHIM/lib/empty.cpp"
g++ -shared -fPIC -o "$SHIM/lib/libntl.so" "$SHIM/lib/empty.cpp"
g++ -shared -fPIC -o "$SHIM/lib/libgmp.so" "$SHIM/lib/empty.cpp"
touch "$SHIM/gmp.h"

# the reference CMake insists autoconf exists when WITH_NTL=ON
# (CMakeLists.txt:368-383); a stub satisfies the version check
mkdir -p "$SHIM/bin"
printf '#!/bin/sh\necho "autoconf (shim) 2.71"\n' > "$SHIM/bin/autoconf"
printf '#!/bin/sh\necho "autogen (shim) 5.18"\n' > "$SHIM/bin/autogen"
chmod +x "$SHIM/bin/autoconf" "$SHIM/bin/autogen"
export PATH="$SHIM/bin:$PATH"

mkdir -p "$BUILD"
cd "$BUILD"
# WITH_NTL=OFF keeps core on MATHBACKEND 4 (no NTL bigint backend); the
# binfhe MK sources include <NTL/...> unconditionally, satisfied by the
# header-only shim on the include path (no -lntl needed).
cmake /root/reference \
  -DCMAKE_BUILD_TYPE=Release \
  -DWITH_NTL=OFF -DNATIVE_SIZE=32 -DWITH_NATIVEOPT=ON -DWITH_OPENMP=OFF \
  -DBUILD_UNITTESTS=OFF -DBUILD_EXAMPLES=ON -DBUILD_STATIC=ON \
  -DBUILD_SHARED=OFF \
  -DCMAKE_CXX_FLAGS="-isystem $SHIM"
# PreLoad.cmake pins the Unix Makefiles generator
make -j"$(nproc)" boolean-mkntru boolean-mklwe || make -j"$(nproc)"
