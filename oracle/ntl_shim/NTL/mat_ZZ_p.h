#ifndef NTL_SHIM_MAT_ZZ_P_H
#define NTL_SHIM_MAT_ZZ_P_H

#include <NTL/ZZ_p.h>
#include <vector>

namespace NTL {

template <typename T>
struct Vec {
    std::vector<T> d;
    Vec() = default;
    T& operator[](long i) { return d[(size_t)i]; }
    const T& operator[](long i) const { return d[(size_t)i]; }
    long length() const { return (long)d.size(); }
};

struct INIT_SIZE_TYPE {};
static const INIT_SIZE_TYPE INIT_SIZE{};

struct mat_ZZ_p {
    std::vector<Vec<ZZ_p>> rows;
    mat_ZZ_p() = default;
    mat_ZZ_p(INIT_SIZE_TYPE, long n, long m) { SetDims(n, m); }
    void SetDims(long n, long m) {
        rows.assign((size_t)n, Vec<ZZ_p>{});
        for (auto& r : rows) r.d.assign((size_t)m, ZZ_p{});
    }
    Vec<ZZ_p>& operator[](long i) { return rows[(size_t)i]; }
    const Vec<ZZ_p>& operator[](long i) const { return rows[(size_t)i]; }
};

// X = A^-1 via Gauss-Jordan over ZZ_p; throws if singular (the fork
// catches `...` and resamples — mntru-pke.cpp:62-70).
inline void inv(mat_ZZ_p& X, const mat_ZZ_p& A) {
    long long p = ZZ_p::modulus_ref();
    long n = (long)A.rows.size();
    std::vector<std::vector<long long>> M(
        (size_t)n, std::vector<long long>((size_t)2 * n, 0));
    for (long i = 0; i < n; ++i) {
        for (long j = 0; j < n; ++j) M[i][j] = A[i][j].v;
        M[i][(size_t)n + i] = 1;
    }
    for (long col = 0; col < n; ++col) {
        long piv = -1;
        for (long r = col; r < n; ++r)
            if (M[r][col] != 0) { piv = r; break; }
        if (piv < 0) throw std::runtime_error("inv: singular matrix");
        if (piv != col) std::swap(M[(size_t)piv], M[(size_t)col]);
        long long d = _ntl_powmod(M[col][col], p - 2, p);
        for (long j = 0; j < 2 * n; ++j)
            M[col][j] = (long long)((__int128)M[col][j] * d % p);
        for (long r = 0; r < n; ++r) {
            if (r == col || M[r][col] == 0) continue;
            long long f = M[r][col];
            for (long j = 0; j < 2 * n; ++j) {
                long long sub = (long long)((__int128)f * M[col][j] % p);
                M[r][j] = _ntl_mod(M[r][j] - sub, p);
            }
        }
    }
    X.SetDims(n, n);
    for (long i = 0; i < n; ++i)
        for (long j = 0; j < n; ++j) X[i][j].v = M[i][(size_t)n + j];
}

}  // namespace NTL

#endif
