#ifndef NTL_SHIM_ZZ_P_H
#define NTL_SHIM_ZZ_P_H

#include <NTL/ZZ.h>

namespace NTL {

struct ZZ_p {
    long long v{0};
    static long long& modulus_ref() {
        static long long p = 2;
        return p;
    }
    // static, so `instance.init(...)` (mntru-pke.cpp:39) also resolves
    static void init(const ZZ& m) { modulus_ref() = m.v; }

    ZZ_p() = default;
    ZZ_p(int x) { *this = x; }
    ZZ_p(long x) { *this = (long long)x; }
    ZZ_p(long long x) { v = _ntl_mod(x, modulus_ref()); }
    // double assignment truncates toward zero (NTL conv<ZZ>(double))
    ZZ_p(double x) { v = _ntl_mod((long long)std::trunc(x), modulus_ref()); }

    ZZ_p& operator=(int x) {
        v = _ntl_mod(x, modulus_ref());
        return *this;
    }
    ZZ_p& operator=(long long x) {
        v = _ntl_mod(x, modulus_ref());
        return *this;
    }
    ZZ_p& operator=(double x) {
        v = _ntl_mod((long long)std::trunc(x), modulus_ref());
        return *this;
    }
    bool operator==(const ZZ_p& o) const { return v == o.v; }
    bool operator==(int x) const {
        return v == _ntl_mod(x, modulus_ref());
    }
};

inline ZZ_p operator+(const ZZ_p& a, const ZZ_p& b) {
    return ZZ_p(a.v + b.v);
}
inline ZZ_p operator-(const ZZ_p& a, const ZZ_p& b) {
    return ZZ_p(a.v - b.v);
}
inline ZZ_p operator*(const ZZ_p& a, const ZZ_p& b) {
    long long p = ZZ_p::modulus_ref();
    return ZZ_p((long long)((__int128)a.v * b.v % p));
}

template <typename T>
T conv(const ZZ_p& x) {
    return (T)x.v;
}

}  // namespace NTL

#endif
