// End-to-end NAND error-rate harness for the REFERENCE implementation,
// self-generated keys (its own keygen path, its own KeySwitch2 — including
// the degenerate single-Gaussian-row KSK2, mntru-pke.cpp:655).
//
// Purpose (r3 VERDICT next-round #1c): establish what error rate the
// reference itself achieves at STD100_MKNTRU_3 (k=8) and _4 (k=16) so our
// k-sweep correctness claims are compared against measured reference
// behavior, not assumed parity.
//
// Usage: ref_errrate <paramset> <ngates>
// Prints one JSON line: {"paramset":..., "k":..., "ngates":..., "errors":...,
//                        "error_rate":..., "ms_per_gate":...}

#include "binfhecontext.h"

#include <cstdio>
#include <cstdlib>
#include <ctime>
#include <random>
#include <string>

using namespace lbcrypto;

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s <paramset> <ngates>\n", argv[0]);
        return 1;
    }
    std::string set = argv[1];
    int ngates      = std::atoi(argv[2]);

    auto cc = BinFHEContext();
    if (set == "STD100_MKNTRU")
        cc.GenerateBinFHEContext(STD100_MKNTRU, MKNTRU);
    else if (set == "STD100_MKNTRU_2")
        cc.GenerateBinFHEContext(STD100_MKNTRU_2, MKNTRU);
    else if (set == "STD100_MKNTRU_3")
        cc.GenerateBinFHEContext(STD100_MKNTRU_3, MKNTRU);
    else if (set == "STD100_MKNTRU_4")
        cc.GenerateBinFHEContext(STD100_MKNTRU_4, MKNTRU);
    else {
        std::fprintf(stderr, "unknown paramset %s\n", set.c_str());
        return 1;
    }
    uint32_t k = cc.GetParams()->GetMatrixNTRUParams()->Getk();

    std::fprintf(stderr, "[%s] keygen...\n", set.c_str());
    std::clock_t t0 = std::clock();
    auto sk = cc.MNTRU_KeyGen();
    cc.MKBTKeyGen(sk);
    cc.ctGateGen(sk, NAND);
    double keygen_s = double(std::clock() - t0) / CLOCKS_PER_SEC;
    std::fprintf(stderr, "[%s] keygen done in %.1fs\n", set.c_str(), keygen_s);

    std::mt19937 rng(12345);
    int errors = 0;
    double total_ms = 0.0;
    for (int g = 0; g < ngates; ++g) {
        int m0 = (int)(rng() & 1), m1 = (int)(rng() & 1);
        auto ct1 = cc.Encrypt(sk, m0);
        auto ct2 = cc.Encrypt(sk, m1);
        std::clock_t s = std::clock();
        MNTRUCiphertext ctOUT = cc.EvalBinGate(NAND, ct1, ct2);
        total_ms += double(std::clock() - s) * 1000.0 / CLOCKS_PER_SEC;
        MNTRUPlaintext result;
        cc.Decrypt(sk, ctOUT, &result);
        int want = 1 - (m0 & m1);
        if ((int)result != want)
            ++errors;
        std::fprintf(stderr, "[%s] gate %d/%d: %d NAND %d -> %d (want %d)%s\n",
                     set.c_str(), g + 1, ngates, m0, m1, (int)result, want,
                     (int)result != want ? "  ERROR" : "");
    }

    std::printf(
        "{\"paramset\":\"%s\",\"k\":%u,\"ngates\":%d,\"errors\":%d,"
        "\"error_rate\":%.4f,\"ms_per_gate\":%.1f,\"keygen_sec\":%.1f}\n",
        set.c_str(), k, ngates, errors, (double)errors / ngates,
        total_ms / ngates, keygen_s);
    return 0;
}
