// Test-vector capture for the single-key XZDDF (vector-NTRU) path.
//
// The reference wires VectorNTRUCryptoParams into no public
// GenerateBinFHEContext branch (binfhecontext.cpp:174-193 builds RingGSW
// for every non-MK method), so BinFHEScheme::NKeyGen/EvalBinGate(VNTRU)
// are reachable only with a hand-built BinFHECryptoParams. This harness
// constructs the params + VectorNTRUAccumulatorXZDDF directly against the
// reference static libs (same pattern as capture_lmkcdey.cpp) and
// replicates NKeyGen (binfhe-base-scheme.cpp:76-103) and the VNTRU
// EvalBinGate tail (:518-574, BootstrapGateCore :1136-1188) verbatim.
//
// Dumps (COEFFICIENT format, little-endian int64):
//   sk, f, finv, bskey [n+1][dg][N], autokey [q-1][dg][N],
//   ksk_a [N][bks][dks][n], ksk_b [N][bks][dks], ct1, ct2, ctout_nand.
//
// Usage: capture_xzddf <outdir> [P128T]

#include "binfhecontext.h"
#include "rgsw-acc.h"
#include "vntru-acc-xzddf.h"

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

using namespace lbcrypto;

// free function defined in binfhe-base-scheme.cpp (no header decl)
namespace lbcrypto {
void Get_invertible_NativeVector(NativeVector& NatVec, NativeVector& NatVec_inv,
                                 uint32_t q_boot, uint32_t N, SecretKeyDist keyDist);
}

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

    // P128T row (binfhecontext.cpp:119): numberBits=21, cyclOrder=2048,
    // n=512, q=1024, qKS=2^14, std=STD_NTRU=0.5, Bks=32, baseG=2^7
    uint32_t numberBits = 21, cyclOrder = 2048, latticeParam = 512;
    uint32_t mod = 1024, modKS = 1 << 14, baseKS = 32, gadgetBase = 1 << 7;
    double stdDev = 0.5;

    NativeInteger Q(PreviousPrime<NativeInteger>(
        FirstPrime<NativeInteger>(numberBits, cyclOrder), cyclOrder));
    uint32_t N = cyclOrder / 2;

    auto lweparams = std::make_shared<LWECryptoParams>(
        latticeParam, N, mod, Q, modKS, stdDev, baseKS, UNIFORM_TERNARY);
    auto vparams = std::make_shared<VectorNTRUCryptoParams>(
        N, Q, mod, gadgetBase, 32, GINX /*method unused on this path*/,
        stdDev, UNIFORM_TERNARY, false, 10);
    auto params = std::make_shared<BinFHECryptoParams>(lweparams, vparams);

    auto LWEscheme = std::make_shared<LWEEncryptionScheme>();
    auto NACC = std::make_shared<VectorNTRUAccumulatorXZDDF>();

    uint32_t n = latticeParam;
    uint32_t dg = vparams->GetDigitsG() - 1;
    int64_t q = (int64_t)mod, qks = (int64_t)modKS;
    uint32_t dks = (uint32_t)std::ceil(std::log((double)qks) /
                                       std::log((double)baseKS));

    {
        std::ofstream meta(g_dir + "/meta.txt");
        meta << "paramset P128T\nn " << n << "\nN " << N << "\nq " << q
             << "\nQ " << Q.ConvertToInt() << "\nqks " << qks << "\nbks "
             << baseKS << "\nbaseG " << gadgetBase << "\ndigitsG "
             << (dg + 1) << "\ndks " << dks << "\n";
    }

    std::printf("LWE keygen...\n");
    auto sk = LWEscheme->KeyGen(n, modKS);
    {
        std::vector<int64_t> v;
        push_vec(v, sk->GetElement());
        dump("sk", v);
    }

    // ---- NKeyGen replica (binfhe-base-scheme.cpp:76-103)
    std::printf("NKeyGen (f, KSK, BSkey, %u autokeys)...\n",
                (uint32_t)(q - 1));
    NativeVector NatVec(N, Q), NatVec_inv(N, Q);
    Get_invertible_NativeVector(NatVec, NatVec_inv, Q.ConvertToInt(), N,
                                GAUSSIAN);
    {
        std::vector<int64_t> f, finv;
        push_vec(f, NatVec);
        push_vec(finv, NatVec_inv);
        dump("f", f);
        dump("finv", finv);
    }
    auto skN = std::make_shared<LWEPrivateKeyImpl>(LWEPrivateKeyImpl(NatVec));
    auto KSkey = LWEscheme->KeySwitchGen(lweparams, sk, skN);
    {
        std::vector<int64_t> a, b;
        for (uint32_t i = 0; i < N; ++i)
            for (uint32_t j = 0; j < baseKS; ++j)
                for (uint32_t t = 0; t < dks; ++t)
                    push_vec(a, KSkey->GetElementsA()[i][j][t]);
        for (uint32_t i = 0; i < N; ++i)
            for (uint32_t j = 0; j < baseKS; ++j)
                for (uint32_t t = 0; t < dks; ++t)
                    b.push_back(
                        (int64_t)KSkey->GetElementsB()[i][j][t].ConvertToInt());
        dump("ksk_a", a);
        dump("ksk_b", b);
    }

    auto polyParams = vparams->GetPolyParams();
    NativePoly skNPoly(polyParams);
    skNPoly.SetValues(NatVec, Format::COEFFICIENT);
    NativePoly invskNPoly(polyParams);
    invskNPoly.SetValues(NatVec_inv, Format::COEFFICIENT);
    skNPoly.SetFormat(Format::EVALUATION);
    invskNPoly.SetFormat(Format::EVALUATION);
    auto BSkey = NACC->KeyGenAcc(vparams, skNPoly, invskNPoly, sk);

    {
        std::vector<int64_t> v;
        for (uint32_t i = 0; i <= n; ++i)
            for (auto& p : (*BSkey)[0][0][i]->GetElements())
                push_poly_coeff(v, p);
        dump("bskey", v);
        std::vector<int64_t> av;
        for (int64_t i = 0; i < q - 1; ++i)
            for (auto& p : (*BSkey)[0][1][i]->GetElements())
                push_poly_coeff(av, p);
        dump("autokey", av);
    }

    // ---- encrypt 1, 0 and run the NAND gate
    std::printf("encrypt + NAND...\n");
    auto ct1 = LWEscheme->Encrypt(lweparams, sk, 1, 4, mod);
    auto ct2 = LWEscheme->Encrypt(lweparams, sk, 0, 4, mod);
    auto dump_lwe = [&](const std::string& name, ConstLWECiphertext& c) {
        std::vector<int64_t> v;
        push_vec(v, c->GetA());
        v.push_back((int64_t)c->GetB().ConvertToInt());
        dump(name, v);
    };
    dump_lwe("ct1", ct1);
    dump_lwe("ct2", ct2);

    // EvalBinGate(VNTRU) replica (binfhe-base-scheme.cpp:518-574)
    LWECiphertext ctprep = std::make_shared<LWECiphertextImpl>(*ct1);
    NativeVector zero(n, 0);
    zero.SetModulus(mod);
    NativeInteger temp_b = 5 * mod / 8;
    LWECiphertext ct_temp = std::make_shared<LWECiphertextImpl>(
        LWECiphertextImpl(std::move(zero), temp_b.Mod(mod)));
    LWEscheme->EvalAddEq(ctprep, ct2);
    LWEscheme->EvalSubEq(ct_temp, ctprep);

    // BootstrapGateCore replica (:1136-1188)
    NativeInteger p = 4;
    NativeInteger Q2p = Q / NativeInteger(2 * p) + 1;
    NativeInteger Q2pNeg = Q - Q2p;
    uint32_t factor = 2 * N / (uint32_t)mod;
    NativeVector m(N, Q), new_m(N, Q);
    const NativeInteger b = ct_temp->GetB() * (2 * NativeInteger(N) / mod);
    for (size_t j = 0; j < N; ++j)
        m[j] = j < N / 2 ? Q2p : Q2pNeg;
    for (size_t j = 0; j < N; ++j) {
        auto kk = b.ConvertToInt() + j;
        if (kk >= N && kk < 2 * N)
            new_m[kk % N] = Q - m[j];
        else
            new_m[kk % N] = m[j];
    }
    NativeInteger azero = ct_temp->GetA()[0];
    uint32_t wzero = factor * azero.ConvertToInt() + 1;
    uint32_t invw = ModInverse(wzero, 2 * N) % (2 * N);
    NativePoly polym(polyParams);
    polym.SetValues(new_m, Format::COEFFICIENT);
    polym.SetFormat(EVALUATION);
    auto polym2{polym.AutomorphismTransform(invw)};
    auto acc = std::make_shared<NTRUCiphertextImpl>(std::move(polym2));
    NACC->EvalAcc(vparams, BSkey, acc, ct_temp->GetA());

    // extract + switch tail (:559-574)
    NativePoly& accVec{acc->GetElements()};
    accVec = accVec.Transpose();
    accVec.SetFormat(Format::COEFFICIENT);
    NativeInteger bext{(Q >> 3) + 1};
    auto ctExt = std::make_shared<LWECiphertextImpl>(
        std::move(accVec.GetValues()), std::move(bext));
    auto ctMS = LWEscheme->ModSwitch(modKS, ctExt);
    auto ctKS = LWEscheme->KeySwitch(lweparams, KSkey, ctMS);
    auto ctout = LWEscheme->ModSwitch(mod, ctKS);
    dump_lwe("ctout_nand", ctout);

    LWEPlaintext res;
    LWEscheme->Decrypt(lweparams, sk, ctout, &res, 4);
    std::printf("1 NAND 0 = %ld (want 1)\n", (long)res);
    return res == 1 ? 0 : 2;
}
