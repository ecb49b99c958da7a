// Test-vector capture harness for the MKNTRU path.
//
// Links against the reference static libs (built by oracle/build.sh) and
// dumps ALL key material + ciphertexts + the NAND gate output as raw
// little-endian int64 files, polynomials in COEFFICIENT format. Our jax
// side loads these (mkfhe_tpu/oracle_io.py), converts to its own EVAL
// ordering, and must reproduce ctout BIT-EXACTLY.
//
// Usage: capture_mkntru <outdir> [paramset]   (paramset: STD100_MKNTRU |
//        STD128_MKNTRU | TOY — TOY uses a small custom BinFHEContextParams)

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
    std::string set = argc > 2 ? argv[2] : "STD100_MKNTRU";

    auto cc = BinFHEContext();
    if (set == "STD100_MKNTRU") {
        cc.GenerateBinFHEContext(STD100_MKNTRU, MKNTRU);
    } else if (set == "STD100_MKNTRU_2") {          // k = 4 parties
        cc.GenerateBinFHEContext(STD100_MKNTRU_2, MKNTRU);
    } else if (set == "STD128_MKNTRU") {
        cc.GenerateBinFHEContext(STD128_MKNTRU, MKNTRU);
    } else if (set == "STD100_MKNTRU_3") {          // k = 8 parties
        cc.GenerateBinFHEContext(STD100_MKNTRU_3, MKNTRU);
    } else if (set == "STD100_MKNTRU_4") {          // k = 16 parties
        cc.GenerateBinFHEContext(STD100_MKNTRU_4, MKNTRU);
    } else {  // TOY: small custom params, mirrors our TOY_MKNTRU set
        BinFHEContextParams p{2,     27,    1024, 64, 45181, 45181,
                              0.75,  32,    1 << 9, 32, 10,
                              UNIFORM_TERNARY};
        cc.GenerateBinFHEContext(p, MKNTRU);
    }

    auto params = cc.GetParams();
    auto scheme = cc.GetBinFHEScheme();
    const auto& mp = params->GetMatrixNTRUParams();
    const auto& up = params->GetUniEncParams();

    uint32_t k = mp->Getk(), n = mp->Getn(), N = up->GetN();
    uint32_t dg = up->GetDigitsG() - 1;
    int64_t q = (int64_t)mp->Getq().ConvertToInt();
    int64_t Q = (int64_t)up->GetQ().ConvertToInt();
    int64_t qks = (int64_t)mp->GetqKS().ConvertToInt();
    uint32_t bks = mp->GetBaseKS();
    uint32_t baseG = up->GetBaseG();
    uint32_t dks = 0;
    {
        double lq = std::log((double)qks), lb = std::log((double)bks);
        dks = (uint32_t)std::ceil(lq / lb);
    }

    {
        std::ofstream meta(g_dir + "/meta.txt");
        meta << "paramset " << set << "\nk " << k << "\nn " << n << "\nN "
             << N << "\nq " << q << "\nQ " << Q << "\nqks " << qks
             << "\nbks " << bks << "\nbaseG " << baseG << "\ndigitsG "
             << (dg + 1) << "\ndks " << dks << "\n";
    }

    std::printf("keygen (k=%u n=%u N=%u)...\n", k, n, N);
    auto sk = cc.MNTRU_KeyGen();

    // secret matrices (mod qKS)
    {
        std::vector<int64_t> F, Finv;
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t i = 0; i < n; ++i)
                push_vec(F, sk->GetF()[u][i]);
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t i = 0; i < n; ++i)
                push_vec(Finv, sk->GetF_inv()[u][i]);
        dump("sk_F", F);
        dump("sk_Finv", Finv);
    }

    // CRS (COEFF)
    {
        std::vector<int64_t> v;
        for (auto& c : up->GetCRS()) push_poly_coeff(v, c);
        dump("crs", v);
    }

    std::printf("MKKeyGen...\n");
    auto EK = scheme->MKKeyGen(params, sk, SYM_ENCRYPT);

    // Pkey [k][dg][N] COEFF
    {
        std::vector<int64_t> v;
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t i = 0; i < dg; ++i)
                push_poly_coeff(v, EK.Pkey[u][i]);
        dump("pkey", v);
    }
    // ring secrets f [k][N] COEFF
    {
        std::vector<int64_t> v;
        for (uint32_t u = 0; u < k; ++u) push_vec(v, EK.fvec[u]);
        dump("fvec", v);
    }
    // BSkey: [k][2][n+1][dg][2][N] COEFF; missing entries dumped as zeros
    {
        std::vector<int64_t> v;
        const auto& ek = EK.BSkey->GetElements();
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t b = 0; b < 2; ++b)
                for (uint32_t i = 0; i <= n; ++i) {
                    const auto& e = ek[u][b][i];
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
    // KSkey2: dump only the j=1 plane (KSK2[u][j] == j*KSK2[u][1] mod qKS,
    // mntru-pke.cpp:743-753)
    {
        std::vector<int64_t> v;
        const auto& ks = EK.KSkey2->GetElements();
        for (uint32_t u = 0; u < k; ++u)
            for (uint32_t r = 0; r < N * dks; ++r)
                push_vec(v, ks[u][1][r]);
        dump("kskey", v);
    }

    std::printf("ctGateGen + encrypt...\n");
    auto ctNAND = scheme->ctGateGen(params, sk, NAND);
    auto ct1 = cc.Encrypt(sk, 1);
    auto ct2 = cc.Encrypt(sk, 0);

    auto dump_ct = [&](const std::string& nm, ConstMNTRUCiphertext& ct) {
        std::vector<int64_t> v;
        for (uint32_t u = 0; u < k; ++u) push_vec(v, ct->GetElements()[u]);
        dump(nm, v);
    };
    dump_ct("ctnand", ctNAND);
    dump_ct("ct1", ct1);
    dump_ct("ct2", ct2);

    std::printf("EvalBinGate...\n");
    auto ctOut = scheme->EvalBinGate(params, NAND, EK, ct1, ct2, ctNAND);
    dump_ct("ctout", ctOut);

    MNTRUPlaintext res;
    cc.Decrypt(sk, ctOut, &res);
    std::printf("1 NAND 0 = %ld (want 1)\n", (long)res);
    return res == 1 ? 0 : 2;
}
