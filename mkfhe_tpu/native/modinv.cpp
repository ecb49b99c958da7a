// Exact mod-p keygen linear algebra (NTL replacement; see SURVEY.md §7).
//
// The reference's keygen depends on NTL/GMP for two inversions:
//   * mat_ZZ_p::inv for the n x n matrix-NTRU secret (mntru-pke.cpp:19-106)
//   * InvMod for ring secrets in Z_Q[X]/(X^N+1)
//     (binfhe-base-scheme.cpp:105-195)
// This library provides both, exactly, over word-sized primes (< 2^31):
//   * Gauss-Jordan over GF(p) with Fermat pivots (no NTL)
//   * iterative negacyclic NTT + per-slot Fermat inverse for ring inverses
// Exposed through a C ABI; mkfhe_tpu.native loads it with ctypes and falls
// back to numpy when the shared object is absent.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using u64 = uint64_t;
using i64 = int64_t;

u64 pow_mod(u64 b, u64 e, u64 p) {
    u64 r = 1;
    b %= p;
    while (e) {
        if (e & 1) r = (__uint128_t)r * b % p;
        b = (__uint128_t)b * b % p;
        e >>= 1;
    }
    return r;
}

}  // namespace

extern "C" {

// In-place Gauss-Jordan inverse over GF(p). a: row-major n*n with values in
// [0, p). Returns 0 on success, -1 if singular. out may alias nothing.
int invert_matrix_mod_p(const i64* a, i64* out, int n, i64 p) {
    std::vector<u64> M((size_t)n * 2 * n, 0);
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < n; ++j) M[(size_t)i * 2 * n + j] = (u64)a[(size_t)i * n + j] % (u64)p;
        M[(size_t)i * 2 * n + n + i] = 1;
    }
    const u64 up = (u64)p;
    for (int col = 0; col < n; ++col) {
        int piv = -1;
        for (int r = col; r < n; ++r)
            if (M[(size_t)r * 2 * n + col] != 0) { piv = r; break; }
        if (piv < 0) return -1;
        if (piv != col) {
            for (int j = 0; j < 2 * n; ++j)
                std::swap(M[(size_t)col * 2 * n + j], M[(size_t)piv * 2 * n + j]);
        }
        u64 inv = pow_mod(M[(size_t)col * 2 * n + col], up - 2, up);
        u64* prow = &M[(size_t)col * 2 * n];
        for (int j = 0; j < 2 * n; ++j)
            prow[j] = (__uint128_t)prow[j] * inv % up;
        for (int r = 0; r < n; ++r) {
            if (r == col) continue;
            u64 f = M[(size_t)r * 2 * n + col];
            if (!f) continue;
            u64* rrow = &M[(size_t)r * 2 * n];
            for (int j = 0; j < 2 * n; ++j) {
                u64 sub = (__uint128_t)f * prow[j] % up;
                rrow[j] = (rrow[j] + up - sub) % up;
            }
        }
    }
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j)
            out[(size_t)i * n + j] = (i64)M[(size_t)i * 2 * n + n + j];
    return 0;
}

// Negacyclic NTT (psi-twisted CT, bit-reversed output) matching
// mkfhe_tpu.ops.ntt exactly. psi_brv: psi powers in bit-reversed order.
void ntt_forward(const i64* a, const i64* psi_brv, i64* out, int N, i64 Q) {
    const u64 uq = (u64)Q;
    std::vector<u64> x(N);
    for (int i = 0; i < N; ++i) x[i] = (u64)a[i] % uq;
    int t = N;
    for (int m = 1; m < N; m <<= 1) {
        t >>= 1;
        for (int b = 0; b < m; ++b) {
            u64 w = (u64)psi_brv[m + b];
            int base = 2 * b * t;
            for (int j = base; j < base + t; ++j) {
                u64 v = (__uint128_t)x[j + t] * w % uq;
                u64 u = x[j];
                x[j] = u + v >= uq ? u + v - uq : u + v;
                x[j + t] = u >= v ? u - v : u + uq - v;
            }
        }
    }
    for (int i = 0; i < N; ++i) out[i] = (i64)x[i];
}

void ntt_inverse(const i64* a, const i64* ipsi_brv, i64 n_inv, i64* out,
                 int N, i64 Q) {
    const u64 uq = (u64)Q;
    std::vector<u64> x(N);
    for (int i = 0; i < N; ++i) x[i] = (u64)a[i] % uq;
    int t = 1;
    for (int m = N; m > 1; m >>= 1) {
        int h = m >> 1;
        for (int b = 0; b < h; ++b) {
            u64 w = (u64)ipsi_brv[h + b];
            int base = 2 * b * t;
            for (int j = base; j < base + t; ++j) {
                u64 u = x[j], v = x[j + t];
                x[j] = u + v >= uq ? u + v - uq : u + v;
                u64 d = u >= v ? u - v : u + uq - v;
                x[j + t] = (__uint128_t)d * (u64)w % uq;
            }
        }
        t <<= 1;
    }
    for (int i = 0; i < N; ++i)
        out[i] = (i64)((__uint128_t)x[i] * (u64)n_inv % uq);
}

// Ring inverse of f in Z_Q[X]/(X^N+1) for NTT-friendly prime Q.
// Returns 0 on success, -1 if f is non-invertible (some NTT slot == 0).
int invert_ring_mod_q(const i64* f, const i64* psi_brv, const i64* ipsi_brv,
                      i64 n_inv, i64* f_inv, i64* f_eval, i64* f_inv_eval,
                      int N, i64 Q) {
    ntt_forward(f, psi_brv, f_eval, N, Q);
    for (int i = 0; i < N; ++i) {
        if (f_eval[i] == 0) return -1;
        f_inv_eval[i] = (i64)pow_mod((u64)f_eval[i], (u64)Q - 2, (u64)Q);
    }
    ntt_inverse(f_inv_eval, ipsi_brv, n_inv, f_inv, N, Q);
    return 0;
}

}  // extern "C"

extern "C" {

// Batched forward NTT for keygen-scale host work (rows of a [batch, N]
// matrix transformed in place into out). Same tables/semantics as
// ntt_forward above.
void ntt_forward_batch(const i64* a, const i64* psi_brv, i64* out,
                       long batch, int N, i64 Q) {
    for (long r = 0; r < batch; ++r)
        ntt_forward(a + (size_t)r * N, psi_brv, out + (size_t)r * N, N, Q);
}

void ntt_inverse_batch(const i64* a, const i64* ipsi_brv, i64 n_inv,
                       i64* out, long batch, int N, i64 Q) {
    for (long r = 0; r < batch; ++r)
        ntt_inverse(a + (size_t)r * N, ipsi_brv, n_inv,
                    out + (size_t)r * N, N, Q);
}

}  // extern "C"
