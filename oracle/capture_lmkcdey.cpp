// Test-vector capture for the single-key LMKCDEY path: LWE secret, the n
// RGSW(X^si) keys, the numAutoKeys+1 automorphism keys, switching key and
// (ct1, ct2, ctout) for six gates. Polynomials dumped in COEFFICIENT
// format (see capture_mkntru.cpp). Layouts match mkfhe_tpu.oracle_io.
//
// Usage: capture_lmkcdey <outdir> [STD128_LMKCDEY]

#include "binfhecontext.h"

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

using namespace lbcrypto;

static std::string g_dir;

static void dump(const std::string& name, const std::vector<int64_t>& v) {
    std::ofstream f(g_dir + "/" + name + ".bin", std::ios::binary);
    f.write(reinterpret_cast<const char*>(v.data()),
            (std::streamsize)(v.size() * sizeof(int64_t)));
}

static void push_vec(std::vector<int64_t>& out, const NativeVector& v) {
    for (uint32_t i = 0; i < v.GetLength(); ++i)
        out.push_back((int64_t)v[i].ConvertToInt());
}

static void push_poly_coeff(std::vector<int64_t>& out, NativePoly p) {
    p.SetFormat(Format::COEFFICIENT);
    push_vec(out, p.GetValues());
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s <outdir> [paramset]\n", argv[0]);
        return 1;
    }
    g_dir = argv[1];

    auto cc = BinFHEContext();
    cc.GenerateBinFHEContext(STD128_LMKCDEY, LMKCDEY);

    auto params = cc.GetParams();
    const auto& lp = params->GetLWEParams();
    const auto& rp = params->GetRingGSWParams();

    uint32_t n = lp->Getn(), N = lp->GetN();
    uint32_t dg = rp->GetDigitsG() - 1;
    uint32_t dg2 = dg * 2;
    uint32_t w = rp->GetNumAutoKeys();
    int64_t q = (int64_t)lp->Getq().ConvertToInt();
    int64_t Q = (int64_t)lp->GetQ().ConvertToInt();
    int64_t qks = (int64_t)lp->GetqKS().ConvertToInt();
    uint32_t bks = lp->GetBaseKS();
    uint32_t dks = (uint32_t)std::ceil(
        std::log((double)qks) / std::log((double)bks));

    {
        std::ofstream meta(g_dir + "/meta.txt");
        meta << "paramset STD128_LMKCDEY\nn " << n << "\nN " << N << "\nq "
             << q << "\nQ " << Q << "\nqks " << qks << "\nbks " << bks
             << "\nbaseG " << (uint32_t)rp->GetBaseG() << "\ndigitsG "
             << rp->GetDigitsG() << "\ndks " << dks << "\nnumAutoKeys "
             << w << "\n";
    }

    auto sk = cc.KeyGen();
    {
        std::vector<int64_t> v;
        push_vec(v, sk->GetElement());
        dump("sk", v);
    }

    std::printf("BTKeyGen...\n");
    cc.BTKeyGen(sk);
    const auto& EK = cc.GetRefreshKey();
    const auto& KS = cc.GetSwitchKey();

    // RGSW keys ek[0][0][i]: [n][dg2][2][N] COEFF
    {
        std::vector<int64_t> v;
        const auto& ek = EK->GetElements();
        for (uint32_t i = 0; i < n; ++i) {
            const auto& e = ek[0][0][i];
            for (uint32_t d = 0; d < dg2; ++d)
                for (uint32_t c = 0; c < 2; ++c)
                    push_poly_coeff(v, e->GetElements()[d][c]);
        }
        dump("bskey", v);
    }
    // automorphism keys ek[0][1][0..w]: [w+1][dg][2][N] COEFF
    // (index 0 is the key for 2N-5; 1..w for 5^i — rgsw-acc-lmkcdey.cpp:61-67)
    {
        std::vector<int64_t> v;
        const auto& ek = EK->GetElements();
        for (uint32_t i = 0; i <= w; ++i) {
            const auto& e = ek[0][1][i];
            for (uint32_t d = 0; d < dg; ++d)
                for (uint32_t c = 0; c < 2; ++c)
                    push_poly_coeff(v, e->GetElements()[d][c]);
        }
        dump("autokey", v);
    }
    // KSkey A [N][bks][dks][n], B [N][bks][dks]
    {
        std::vector<int64_t> va, vb;
        for (uint32_t i = 0; i < N; ++i)
            for (uint32_t j = 0; j < bks; ++j)
                for (uint32_t t = 0; t < dks; ++t) {
                    push_vec(va, KS->GetElementsA()[i][j][t]);
                    vb.push_back(
                        (int64_t)KS->GetElementsB()[i][j][t].ConvertToInt());
                }
        dump("ksk_a", va);
        dump("ksk_b", vb);
    }

    const char* names[] = {"or", "and", "nor", "nand", "xorf", "xnorf"};
    BINGATE gates[] = {OR, AND, NOR, NAND, XOR_FAST, XNOR_FAST};
    auto ct1 = cc.Encrypt(sk, 1);
    auto ct2 = cc.Encrypt(sk, 0);
    {
        std::vector<int64_t> v;
        push_vec(v, ct1->GetA());
        v.push_back((int64_t)ct1->GetB().ConvertToInt());
        dump("ct1", v);
        v.clear();
        push_vec(v, ct2->GetA());
        v.push_back((int64_t)ct2->GetB().ConvertToInt());
        dump("ct2", v);
    }
    for (int g = 0; g < 6; ++g) {
        auto out = cc.EvalBinGate(gates[g], ct1, ct2);
        std::vector<int64_t> v;
        push_vec(v, out->GetA());
        v.push_back((int64_t)out->GetB().ConvertToInt());
        dump(std::string("ctout_") + names[g], v);
        LWEPlaintext r;
        cc.Decrypt(sk, out, &r);
        std::printf("gate %s -> %ld\n", names[g], (long)r);
    }
    return 0;
}
