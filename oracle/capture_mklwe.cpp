// Test-vector capture for the MKLWE (boolean-mklwe) path.
// Layout notes in capture_mkntru.cpp.
// Usage: capture_mklwe <outdir> [paramset]
//        paramset: STD100_MKNTRU_LWE (k=2, default) | STD100_MKNTRU_LWE_2
//        (k=4) | STD100_MKNTRU_LWE_3 (k=8) | STD100_MKNTRU_LWE_4 (k=16)
//        (binfhecontext.cpp:141-144)

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
        std::fprintf(stderr, "usage: %s <outdir>\n", argv[0]);
        return 1;
    }
    g_dir = argv[1];
    std::string set = argc > 2 ? argv[2] : "STD100_MKNTRU_LWE";

    auto cc = BinFHEContext();
    if (set == "STD100_MKNTRU_LWE")
        cc.GenerateBinFHEContext(STD100_MKNTRU_LWE, MKNTRU_LWE);
    else if (set == "STD100_MKNTRU_LWE_2")
        cc.GenerateBinFHEContext(STD100_MKNTRU_LWE_2, MKNTRU_LWE);
    else if (set == "STD100_MKNTRU_LWE_3")
        cc.GenerateBinFHEContext(STD100_MKNTRU_LWE_3, MKNTRU_LWE);
    else if (set == "STD100_MKNTRU_LWE_4")
        cc.GenerateBinFHEContext(STD100_MKNTRU_LWE_4, MKNTRU_LWE);
    else {
        std::fprintf(stderr, "unknown paramset %s\n", set.c_str());
        return 1;
    }

    auto params = cc.GetParams();
    auto scheme = cc.GetBinFHEScheme();
    const auto& mp = params->GetMKLWEParams();
    const auto& up = params->GetUniEncParams();

    uint32_t k = mp->Getk(), n = mp->Getn(), N = up->GetN();
    uint32_t dg = up->GetDigitsG() - 1;
    int64_t q = (int64_t)mp->Getq().ConvertToInt();
    int64_t Q = (int64_t)up->GetQ().ConvertToInt();
    int64_t qks = (int64_t)mp->GetqKS().ConvertToInt();
    uint32_t bks = mp->GetBaseKS();
    uint32_t dks = (uint32_t)std::ceil(
        std::log((double)qks) / std::log((double)bks));

    {
        std::ofstream meta(g_dir + "/meta.txt");
        meta << "paramset " << set << "\nk " << k << "\nn " << n
             << "\nN " << N << "\nq " << q << "\nQ " << Q << "\nqks " << qks
             << "\nbks " << bks << "\nbaseG " << (uint32_t)up->GetBaseG()
             << "\ndigitsG " << (dg + 1) << "\ndks " << dks << "\n";
    }

    std::printf("keygen (k=%u n=%u N=%u)...\n", k, n, N);
    auto sk = cc.MKLWE_KeyGen();
    {
        std::vector<int64_t> v;
        for (uint32_t u = 0; u < k; ++u) push_vec(v, sk->GetElement()[u]);
        dump("sk", v);
    }
    {
        std::vector<int64_t> v;
        for (auto& c : up->GetCRS()) push_poly_coeff(v, c);
        dump("crs", v);
    }

    std::printf("MKKeyGen...\n");
    auto EK = scheme->MKKeyGen(params, sk, SYM_ENCRYPT);

    {
        std::vector<int64_t> v;
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t i = 0; i < dg; ++i)
                push_poly_coeff(v, EK.Pkey[u][i]);
        dump("pkey", v);
    }
    {
        std::vector<int64_t> v;
        for (uint32_t u = 0; u < k; ++u) push_vec(v, EK.fvec[u]);
        dump("fvec", v);
    }
    // BSkey (XZW_B: single branch) [k][n+1][dg][2][N] COEFF
    {
        std::vector<int64_t> v;
        const auto& ek = EK.BSkey->GetElements();
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t i = 0; i <= n; ++i) {
                const auto& e = ek[u][0][i];
                if (!e) {
                    v.insert(v.end(), (size_t)dg * 2 * N, 0);
                    continue;
                }
                for (uint32_t d = 0; d < dg; ++d)
                    for (uint32_t c = 0; c < 2; ++c)
                        push_poly_coeff(v, e->GetElements()[d][c]);
            }
        dump("bskey", v);
    }
    // LKSkey A [k][N][bks][dks][n], B [k][N][bks][dks]
    {
        std::vector<int64_t> va, vb;
        const auto& A = EK.LKSkey->GetElementsA();
        const auto& B = EK.LKSkey->GetElementsB();
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t i = 0; i < N; ++i)
                for (uint32_t j = 0; j < bks; ++j)
                    for (uint32_t t = 0; t < dks; ++t) {
                        push_vec(va, A[u][i][j][t]);
                        vb.push_back((int64_t)B[u][i][j][t].ConvertToInt());
                    }
        dump("ksk_a", va);
        dump("ksk_b", vb);
    }

    auto ct1 = cc.Encrypt(sk, 1);
    auto ct2 = cc.Encrypt(sk, 0);
    auto dump_ct = [&](const std::string& nm, ConstMKLWECiphertext& ct) {
        std::vector<int64_t> v;
        for (uint32_t u = 0; u < k; ++u) push_vec(v, ct->GetA()[u]);
        v.push_back((int64_t)ct->GetB().ConvertToInt());
        dump(nm, v);
    };
    dump_ct("ct1", ct1);
    dump_ct("ct2", ct2);

    std::printf("EvalBinGate...\n");
    auto ctOut = scheme->EvalBinGate(params, NAND, EK, ct1, ct2);
    dump_ct("ctout", ctOut);

    MKLWEPlaintext res;
    cc.Decrypt(sk, ctOut, &res);
    std::printf("1 NAND 0 = %ld (want 1)\n", (long)res);
    return res == 1 ? 0 : 2;
}
