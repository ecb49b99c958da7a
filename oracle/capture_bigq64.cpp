// NATIVE_SIZE=64 capture for the >28-bit parameter sets (r5, VERDICT r4
// task #3): runs a full GINX gate suite at a big-Q set (default
// STD128Q_4, Q ~ 2^50) and dumps
//   * meta + LWE secret
//   * keyswitch UNIT vectors (deterministic LCG inputs mod qKS ->
//     KeySwitch output) — bit-exact replay targets: the switching key
//     encodes the ternary ring secret, whose SwitchModulus image is
//     independent of the (prime vs composite) ring modulus choice
//   * the full switching key
//   * gate truth tables: Encrypt(m1), Encrypt(m2) -> EvalBinGate for
//     AND/OR/NAND/NOR on all four input pairs, with reference-decrypted
//     results (SEMANTIC anchors for the dual-limb RNS ring)
// Usage: capture_bigq64 <outdir> [STD128Q_4|STD256|STD192|...]

#include "binfhecontext.h"

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <map>
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

static void push_ct(std::vector<int64_t>& out, ConstLWECiphertext& ct) {
    push_vec(out, ct->GetA());
    out.push_back((int64_t)ct->GetB().ConvertToInt());
}

static uint64_t g_lcg;
static uint64_t lcg() {
    g_lcg = g_lcg * 6364136223846793005ULL + 1442695040888963407ULL;
    return g_lcg >> 11;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s <outdir> [paramset]\n", argv[0]);
        return 1;
    }
    g_dir = argv[1];
    std::string set = argc > 2 ? argv[2] : "STD128Q_4";
    std::map<std::string, BINFHE_PARAMSET> sets = {
        {"STD128Q_4", STD128Q_4}, {"STD256", STD256}, {"STD192", STD192},
        {"STD192Q", STD192Q}, {"STD192Q_3", STD192Q_3},
        {"STD192Q_4", STD192Q_4}};
    auto it = sets.find(set);
    if (it == sets.end()) {
        std::fprintf(stderr, "unknown set %s\n", set.c_str());
        return 1;
    }

    auto cc = BinFHEContext();
    cc.GenerateBinFHEContext(it->second, GINX);

    auto params = cc.GetParams();
    const auto& lp = params->GetLWEParams();
    const auto& rp = params->GetRingGSWParams();
    uint32_t n = lp->Getn(), N = lp->GetN();
    int64_t q = (int64_t)lp->Getq().ConvertToInt();
    int64_t Q = (int64_t)lp->GetQ().ConvertToInt();
    int64_t qks = (int64_t)lp->GetqKS().ConvertToInt();
    uint32_t bks = lp->GetBaseKS();
    uint32_t dks = (uint32_t)std::ceil(
        std::log((double)qks) / std::log((double)bks));
    {
        std::ofstream meta(g_dir + "/meta.txt");
        meta << "paramset " << set << "\nn " << n << "\nN " << N << "\nq "
             << q << "\nQ " << Q << "\nqks " << qks << "\nbks " << bks
             << "\ndks " << dks << "\nbaseG " << (uint32_t)rp->GetBaseG()
             << "\ndigitsG " << rp->GetDigitsG() << "\n";
    }

    auto sk = cc.KeyGen();
    {
        std::vector<int64_t> v;
        push_vec(v, sk->GetElement());
        dump("sk", v);
    }
    std::printf("BTKeyGen (%s, NATIVE_SIZE=64)...\n", set.c_str());
    cc.BTKeyGen(sk);

    const auto& KS = cc.GetSwitchKey();
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

    auto lwescheme = cc.GetLWEScheme();
    const int R = 4;
    std::vector<int64_t> vin, vout, vms;
    for (int r = 0; r < R; ++r) {
        g_lcg = 2000 + r;
        NativeVector a(N, qks);
        for (uint32_t i = 0; i < N; ++i)
            a[i] = NativeInteger((uint64_t)(lcg() % (uint64_t)qks));
        NativeInteger b((uint64_t)(lcg() % (uint64_t)qks));
        auto ct = std::make_shared<LWECiphertextImpl>(std::move(a), b);
        ConstLWECiphertext cct = ct;
        push_ct(vin, cct);
        auto out = lwescheme->KeySwitch(lp, KS, cct);
        ConstLWECiphertext cout_ = out;
        push_ct(vout, cout_);
        auto ms = lwescheme->ModSwitch(NativeInteger((uint64_t)q), cout_);
        ConstLWECiphertext cms = ms;
        push_ct(vms, cms);
    }
    dump("ksunit_in", vin);
    dump("ksunit_out", vout);
    dump("ksunit_ms", vms);

    // gate truth tables (semantic anchors)
    const char* names[] = {"and", "or", "nand", "nor"};
    BINGATE gates[] = {AND, OR, NAND, NOR};
    std::vector<int64_t> vres;
    for (int g = 0; g < 4; ++g) {
        for (int m1 = 0; m1 < 2; ++m1)
            for (int m2 = 0; m2 < 2; ++m2) {
                auto ct1 = cc.Encrypt(sk, m1);
                auto ct2 = cc.Encrypt(sk, m2);
                auto out = cc.EvalBinGate(gates[g], ct1, ct2);
                LWEPlaintext r;
                cc.Decrypt(sk, out, &r);
                vres.push_back((int64_t)r);
                std::printf("%s(%d,%d) = %ld\n", names[g], m1, m2, (long)r);
            }
    }
    dump("gate_res", vres);   // [4 gates x 4 input pairs]
    std::printf("done\n");
    return 0;
}
