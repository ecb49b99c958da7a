// Minimal NTL shim — just enough API surface to compile and run the
// reference fork's NTL call sites (mntru-pke.cpp, binfhe-base-scheme.cpp)
// so the reference binaries can be built WITHOUT libntl/libgmp and used as
// a CPU oracle for test-vector capture. Word-sized arithmetic only
// (moduli < 2^31, matching the fork's NATIVE_SIZE=32 build).
//
// Implements: ZZ, ZZ_p (global modulus), ZZ_pX (+ SetCoeff/deg/InvMod via
// extended Euclid over ZZ_p[X]), Vec<T>, mat_ZZ_p (+ inv via Gauss-Jordan).
#ifndef NTL_SHIM_ZZ_H
#define NTL_SHIM_ZZ_H

#include <cmath>
#include <cstdint>
#include <stdexcept>

namespace NTL {

struct ZZ {
    long long v{0};
    ZZ() = default;
    ZZ(long long x) : v(x) {}
    explicit operator long() const { return (long)v; }
};

inline long long _ntl_mod(long long a, long long p) {
    long long r = a % p;
    return r < 0 ? r + p : r;
}

inline long long _ntl_powmod(long long b, long long e, long long p) {
    unsigned long long r = 1, bb = (unsigned long long)_ntl_mod(b, p);
    while (e > 0) {
        if (e & 1) r = (unsigned __int128)r * bb % (unsigned long long)p;
        bb = (unsigned __int128)bb * bb % (unsigned long long)p;
        e >>= 1;
    }
    return (long long)r;
}

}  // namespace NTL

#endif
