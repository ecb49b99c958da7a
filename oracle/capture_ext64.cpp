// NATIVE_SIZE=64 capture for the large-precision profile (r5, VERDICT r4
// task #3): GenerateBinFHEContext(TOY, arbFunc=false, logQ=17) — the
// 54-bit intermediate prime + qKS=2^35 surface that a 32-bit build
// cannot run. Dumps:
//   * meta + LWE secret + full switching key (int64)
//   * keyswitch/ModSwitch UNIT vectors: deterministic (LCG) input
//     ciphertexts mod qKS -> KeySwitch -> ModSwitch outputs, replayable
//     bit-exactly by any implementation holding the same KSK (the
//     modulus-compatible tail of the big-Q flow; the 54-bit ring itself
//     is composite on our side by design and cannot be bit-compared)
//   * EvalSign / EvalFloor / EvalDecomp digit STREAMS (inputs + every
//     output ciphertext + reference-decrypted values) — the semantic
//     anchor for the dual-limb RNS path.
// Layout notes in capture_mkntru.cpp.  Usage: capture_ext64 <outdir>

#include "binfhecontext.h"

#include <cmath>
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

static void push_ct(std::vector<int64_t>& out, ConstLWECiphertext& ct) {
    push_vec(out, ct->GetA());
    out.push_back((int64_t)ct->GetB().ConvertToInt());
}

// deterministic 64-bit LCG (replayed python-side to cross-check files)
static uint64_t g_lcg;
static uint64_t lcg() {
    g_lcg = g_lcg * 6364136223846793005ULL + 1442695040888963407ULL;
    return g_lcg >> 11;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s <outdir>\n", argv[0]);
        return 1;
    }
    g_dir = argv[1];

    auto cc = BinFHEContext();
    cc.GenerateBinFHEContext(TOY, false, 17, 0, GINX, false);

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
    int64_t beta = (int64_t)cc.GetBeta().ConvertToInt();
    int64_t p4 = (int64_t)cc.GetMaxPlaintextSpace().ConvertToInt();
    {
        std::ofstream meta(g_dir + "/meta.txt");
        meta << "profile TOY_ext_logQ17\nn " << n << "\nN " << N << "\nq "
             << q << "\nQ " << Q << "\nqks " << qks << "\nbks " << bks
             << "\ndks " << dks << "\nbaseG " << (uint32_t)rp->GetBaseG()
             << "\ndigitsG " << rp->GetDigitsG() << "\nbeta " << beta
             << "\nmaxP " << p4 << "\nlogQ 17\n";
    }

    auto sk = cc.KeyGen();
    {
        std::vector<int64_t> v;
        push_vec(v, sk->GetElement());
        dump("sk", v);
    }
    std::printf("BTKeyGen (NATIVE_SIZE=64, 54-bit Q)...\n");
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

    // ---- keyswitch / ModSwitch unit vectors (bit-exact replay targets)
    auto lwescheme = cc.GetLWEScheme();
    const int R = 4;
    std::vector<int64_t> vin, vout, vms;
    for (int r = 0; r < R; ++r) {
        g_lcg = 1000 + r;
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
    dump("ksunit_in", vin);    // R x (N+1) mod qKS
    dump("ksunit_out", vout);  // R x (n+1) mod qKS
    dump("ksunit_ms", vms);    // R x (n+1) mod q

    // ---- EvalSign stream (mod 2^17)
    {
        int64_t mod = 1 << 17;
        int64_t P = mod / 512;      // 256, mirrors tests/test_extended_ops
        int64_t half = P / 2;
        std::vector<int64_t> ms = {half - 2, half - 1, half, half + 1,
                                   half + 2};
        std::vector<int64_t> vct, vres;
        for (auto m : ms) {
            auto ct = cc.Encrypt(sk, m % P, FRESH, P,
                                 NativeInteger((uint64_t)mod));
            ConstLWECiphertext cct = ct;
            auto out = cc.EvalSign(ct);
            ConstLWECiphertext cout_ = out;
            push_ct(vct, cout_);
            LWEPlaintext r;
            cc.Decrypt(sk, out, &r, 2);
            vres.push_back((int64_t)r);
            std::printf("EvalSign(%ld) = %ld\n", (long)m, (long)r);
        }
        dump("sign_m", ms);
        dump("sign_ct", vct);
        dump("sign_res", vres);
    }

    // ---- EvalFloor by 1 bit (UnitTestFunc.cpp:74-97 at the ext profile)
    {
        int64_t mod = 1 << 17;
        int64_t P = mod / 512;
        std::vector<int64_t> ms = {5, 13, 128, 200, 255};
        std::vector<int64_t> vct, vres;
        for (auto m : ms) {
            auto ct = cc.Encrypt(sk, m % P, FRESH, P,
                                 NativeInteger((uint64_t)mod));
            auto out = cc.EvalFloor(ct, 1);
            ConstLWECiphertext cout_ = out;
            push_ct(vct, cout_);
            LWEPlaintext r;
            cc.Decrypt(sk, out, &r, P / 2);
            vres.push_back((int64_t)r);
            std::printf("EvalFloor1(%ld) = %ld (want %ld)\n", (long)m,
                        (long)r, (long)(m / 2));
        }
        dump("floor_m", ms);
        dump("floor_ct", vct);
        dump("floor_res", vres);
    }

    // ---- EvalDecomp digit streams (UnitTestFunc.cpp:160-199 decode)
    {
        int64_t mod = 1 << 17;
        int64_t P = mod / (2 * beta);
        std::vector<int64_t> ms = {5, 13, 7, 2, P - 1};
        std::vector<int64_t> vct, vres, vcount;
        for (auto m : ms) {
            auto ct = cc.Encrypt(sk, m % P, FRESH, P,
                                 NativeInteger((uint64_t)mod));
            auto decomp = cc.EvalDecomp(ct);
            vcount.push_back((int64_t)decomp.size());
            int64_t pd = p4;
            for (size_t j = 0; j < decomp.size(); ++j) {
                if (j == decomp.size() - 1) {
                    auto logp = GetMSB((uint64_t)(P - 1)) %
                                GetMSB((uint64_t)(p4 - 1));
                    pd = (int64_t)1 << logp;
                }
                ConstLWECiphertext cd = decomp[j];
                push_ct(vct, cd);
                LWEPlaintext r;
                cc.Decrypt(sk, decomp[j], &r, pd);
                vres.push_back((int64_t)r);
            }
            std::printf("EvalDecomp(%ld): %zu digits\n", (long)m,
                        decomp.size());
        }
        dump("decomp_m", ms);
        dump("decomp_count", vcount);
        dump("decomp_ct", vct);
        dump("decomp_res", vres);
    }
    std::printf("done\n");
    return 0;
}
