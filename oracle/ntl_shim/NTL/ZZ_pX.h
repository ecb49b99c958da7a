#ifndef NTL_SHIM_ZZ_PX_H
#define NTL_SHIM_ZZ_PX_H

#include <NTL/ZZ_p.h>
#include <vector>

namespace NTL {

struct ZZ_pX {
    std::vector<ZZ_p> c;  // coefficients, index = degree

    void normalize() {
        while (!c.empty() && c.back().v == 0) c.pop_back();
    }
    const ZZ_p& operator[](long i) const { return c[(size_t)i]; }
    ZZ_p& operator[](long i) { return c[(size_t)i]; }
};

inline long deg(const ZZ_pX& f) { return (long)f.c.size() - 1; }

inline void SetCoeff(ZZ_pX& f, long i, const ZZ_p& v) {
    if ((long)f.c.size() <= i) f.c.resize((size_t)i + 1);
    f.c[(size_t)i] = v;
    f.normalize();
}
inline void SetCoeff(ZZ_pX& f, long i, int v) { SetCoeff(f, i, ZZ_p(v)); }
inline void SetCoeff(ZZ_pX& f, long i, double v) { SetCoeff(f, i, ZZ_p(v)); }

namespace detail {

using Poly = std::vector<long long>;

inline Poly to_poly(const ZZ_pX& f) {
    Poly out(f.c.size());
    for (size_t i = 0; i < f.c.size(); ++i) out[i] = f.c[i].v;
    return out;
}

inline void trim(Poly& a) {
    while (!a.empty() && a.back() == 0) a.pop_back();
}

// a mod b over ZZ_p (field), in place quotient-free remainder
inline Poly poly_mod(Poly a, const Poly& b, long long p) {
    trim(a);
    long long lead_inv = _ntl_powmod(b.back(), p - 2, p);
    while (a.size() >= b.size() && !a.empty()) {
        long long coef = (long long)((__int128)a.back() * lead_inv % p);
        size_t shift = a.size() - b.size();
        for (size_t i = 0; i < b.size(); ++i) {
            long long sub = (long long)((__int128)coef * b[i] % p);
            a[shift + i] = _ntl_mod(a[shift + i] - sub, p);
        }
        trim(a);
    }
    return a;
}

inline Poly poly_mul_mod(const Poly& a, const Poly& b, const Poly& f,
                         long long p) {
    if (a.empty() || b.empty()) return {};
    Poly out(a.size() + b.size() - 1, 0);
    for (size_t i = 0; i < a.size(); ++i) {
        if (!a[i]) continue;
        for (size_t j = 0; j < b.size(); ++j) {
            out[i + j] = (long long)((out[i + j]
                          + (__int128)a[i] * b[j]) % p);
        }
    }
    return poly_mod(std::move(out), f, p);
}

}  // namespace detail

// inv = a^-1 mod f over ZZ_p[X]; throws if not invertible (the fork
// catches `...` and resamples — binfhe-base-scheme.cpp:151-166).
// Extended Euclid over the coefficient field.
inline void InvMod(ZZ_pX& inv, const ZZ_pX& a, const ZZ_pX& f) {
    using namespace detail;
    long long p = ZZ_p::modulus_ref();
    Poly r0 = to_poly(f), r1 = poly_mod(to_poly(a), r0, p);
    Poly t0{}, t1{1};
    trim(r0);
    trim(r1);
    while (!r1.empty()) {
        // r0 = q*r1 + r2: long division tracking quotient into t-chain
        Poly q;
        Poly rem = r0;
        long long lead_inv = _ntl_powmod(r1.back(), p - 2, p);
        trim(rem);
        if (rem.size() >= r1.size()) q.assign(rem.size() - r1.size() + 1, 0);
        while (rem.size() >= r1.size() && !rem.empty()) {
            long long coef = (long long)((__int128)rem.back() * lead_inv % p);
            size_t shift = rem.size() - r1.size();
            q[shift] = coef;
            for (size_t i = 0; i < r1.size(); ++i) {
                long long sub = (long long)((__int128)coef * r1[i] % p);
                rem[shift + i] = _ntl_mod(rem[shift + i] - sub, p);
            }
            trim(rem);
        }
        // t2 = t0 - q*t1 (mod f)
        Poly qt1;
        if (!q.empty() && !t1.empty()) {
            qt1.assign(q.size() + t1.size() - 1, 0);
            for (size_t i = 0; i < q.size(); ++i) {
                if (!q[i]) continue;
                for (size_t j = 0; j < t1.size(); ++j)
                    qt1[i + j] = (long long)((qt1[i + j]
                                  + (__int128)q[i] * t1[j]) % p);
            }
        }
        Poly t2(std::max(t0.size(), qt1.size()), 0);
        for (size_t i = 0; i < t2.size(); ++i) {
            long long x = i < t0.size() ? t0[i] : 0;
            long long y = i < qt1.size() ? qt1[i] : 0;
            t2[i] = _ntl_mod(x - y, p);
        }
        trim(t2);
        t0 = std::move(t1);
        t1 = std::move(t2);
        r0 = std::move(r1);
        r1 = std::move(rem);
    }
    // r0 = gcd; must be a nonzero constant
    if (r0.size() != 1)
        throw std::runtime_error("InvMod: not invertible");
    long long ginv = _ntl_powmod(r0[0], p - 2, p);
    Poly res = poly_mod(std::move(t0), to_poly(f), p);
    inv.c.clear();
    inv.c.resize(res.size());
    for (size_t i = 0; i < res.size(); ++i)
        inv.c[i].v = (long long)((__int128)res[i] * ginv % p);
    inv.normalize();
}

}  // namespace NTL

#endif
