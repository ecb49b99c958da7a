// Cereal interop bridge (PLAN #6 / r2 VERDICT missing #5).
//
// Converts between this repo's raw int64 dump layout (the capture-harness
// format that mkfhe_tpu.interop reads/writes) and the reference's cereal
// BINARY serialization (utils/serial.h, binfhecontext-ser.h) — so keys and
// ciphertexts cross the library boundary through the reference's own
// serialization layer rather than the bespoke capture binaries.
//
// Modes:
//   roundtrip-ginx <dir>  read bskey/ksk_a/ksk_b/sk/ct1 .bin dumps ->
//                         construct reference objects -> Serialize BINARY
//                         -> Deserialize -> re-dump as *_rt.bin (the
//                         python test asserts bit equality) -> also
//                         reference-Decrypt ct1 with sk and print it.
//
// Usage: interop_cereal roundtrip-ginx <dir>

#include "binfhecontext-ser.h"

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

using namespace lbcrypto;

static std::string g_dir;

static std::vector<int64_t> slurp(const std::string& name) {
    std::ifstream f(g_dir + "/" + name + ".bin", std::ios::binary);
    f.seekg(0, std::ios::end);
    std::streamsize sz = f.tellg();
    f.seekg(0);
    std::vector<int64_t> v(sz / 8);
    f.read(reinterpret_cast<char*>(v.data()), sz);
    return v;
}

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
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s roundtrip-ginx <dir>\n", argv[0]);
        return 1;
    }
    g_dir = argv[2];

    // meta
    std::ifstream metaf(g_dir + "/meta.txt");
    std::string key, sval;
    uint32_t n = 0, N = 0, bks = 0, dks = 0, dg2 = 0;
    int64_t q = 0, Q = 0, qks = 0, baseG = 0;
    while (metaf >> key >> sval) {
        int64_t val = 0;
        try { val = std::stoll(sval); } catch (...) { continue; }
        if (key == "n") n = val;
        else if (key == "N") N = val;
        else if (key == "q") q = val;
        else if (key == "Q") Q = val;
        else if (key == "qks") qks = val;
        else if (key == "bks") bks = val;
        else if (key == "dks") dks = val;
        else if (key == "baseG") baseG = val;
        else if (key == "digitsG") dg2 = 2 * (val - 1);
    }
    std::printf("n=%u N=%u q=%ld Q=%ld qks=%ld bks=%u dks=%u dg2=%u\n",
                n, N, q, Q, qks, bks, dks, dg2);

    auto lweparams = std::make_shared<LWECryptoParams>(
        n, N, q, Q, qks, 1.9, bks, UNIFORM_TERNARY);
    auto polyParams = std::make_shared<ILNativeParams>(2 * N, Q);

    // ---- build reference objects from the raw dumps
    // sk [n] mod qks
    auto skv = slurp("sk");
    NativeVector sv(n, qks);
    for (uint32_t i = 0; i < n; ++i) sv[i] = (uint64_t)skv[i];
    auto sk = std::make_shared<LWEPrivateKeyImpl>(LWEPrivateKeyImpl(sv));

    // BSkey [n][2][dg2][2][N] COEFF -> RingGSWACCKey (EVAL polys)
    auto bs = slurp("bskey");
    auto acckey = std::make_shared<RingGSWACCKeyImpl>(1, 2, n);
    size_t off = 0;
    for (uint32_t i = 0; i < n; ++i)
        for (uint32_t t = 0; t < 2; ++t) {
            auto ek = std::make_shared<RingGSWEvalKeyImpl>(dg2, 2);
            for (uint32_t d = 0; d < dg2; ++d)
                for (uint32_t c = 0; c < 2; ++c) {
                    NativeVector pv(N, Q);
                    for (uint32_t j = 0; j < N; ++j)
                        pv[j] = (uint64_t)bs[off++];
                    NativePoly p(polyParams);
                    p.SetValues(pv, Format::COEFFICIENT);
                    p.SetFormat(Format::EVALUATION);
                    (*ek)[d][c] = p;
                }
            (*acckey)[0][t][i] = ek;
        }

    // KSK [N][bks][dks][n] + B [N][bks][dks] mod qks
    auto ka = slurp("ksk_a");
    auto kb = slurp("ksk_b");
    auto ksk = std::make_shared<LWESwitchingKeyImpl>(
        std::vector<std::vector<std::vector<NativeVector>>>(),
        std::vector<std::vector<std::vector<NativeInteger>>>());
    {
        std::vector<std::vector<std::vector<NativeVector>>> A(N);
        std::vector<std::vector<std::vector<NativeInteger>>> B(N);
        size_t oa = 0, ob = 0;
        for (uint32_t i = 0; i < N; ++i) {
            A[i].resize(bks);
            B[i].resize(bks);
            for (uint32_t jj = 0; jj < bks; ++jj) {
                A[i][jj].resize(dks);
                B[i][jj].resize(dks);
                for (uint32_t t = 0; t < dks; ++t) {
                    NativeVector row(n, qks);
                    for (uint32_t m = 0; m < n; ++m)
                        row[m] = (uint64_t)ka[oa++];
                    A[i][jj][t] = row;
                    B[i][jj][t] = (uint64_t)kb[ob++];
                }
            }
        }
        ksk = std::make_shared<LWESwitchingKeyImpl>(A, B);
    }

    // ct1 [n+1] mod q
    auto c1 = slurp("ct1");
    NativeVector av(n, q);
    for (uint32_t i = 0; i < n; ++i) av[i] = (uint64_t)c1[i];
    auto ct = std::make_shared<LWECiphertextImpl>(av, NativeInteger((uint64_t)c1[n]));

    // ---- cereal BINARY round trip through the reference's Serial layer
    Serial::SerializeToFile(g_dir + "/ref_bskey.cereal", acckey, SerType::BINARY);
    Serial::SerializeToFile(g_dir + "/ref_ksk.cereal", ksk, SerType::BINARY);
    Serial::SerializeToFile(g_dir + "/ref_sk.cereal", sk, SerType::BINARY);
    Serial::SerializeToFile(g_dir + "/ref_ct1.cereal", ct, SerType::BINARY);

    RingGSWACCKey acckey2;
    LWESwitchingKey ksk2;
    LWEPrivateKey sk2;
    LWECiphertext ct2;
    Serial::DeserializeFromFile(g_dir + "/ref_bskey.cereal", acckey2, SerType::BINARY);
    Serial::DeserializeFromFile(g_dir + "/ref_ksk.cereal", ksk2, SerType::BINARY);
    Serial::DeserializeFromFile(g_dir + "/ref_sk.cereal", sk2, SerType::BINARY);
    Serial::DeserializeFromFile(g_dir + "/ref_ct1.cereal", ct2, SerType::BINARY);

    // ---- re-dump the deserialized objects in the raw layout
    {
        std::vector<int64_t> v;
        for (uint32_t i = 0; i < n; ++i)
            for (uint32_t t = 0; t < 2; ++t)
                for (uint32_t d = 0; d < dg2; ++d)
                    for (uint32_t c = 0; c < 2; ++c)
                        push_poly_coeff(v, (*(*acckey2)[0][t][i])[d][c]);
        dump("bskey_rt", v);
    }
    {
        std::vector<int64_t> a, b;
        for (uint32_t i = 0; i < N; ++i)
            for (uint32_t jj = 0; jj < bks; ++jj)
                for (uint32_t t = 0; t < dks; ++t) {
                    push_vec(a, ksk2->GetElementsA()[i][jj][t]);
                    b.push_back((int64_t)ksk2->GetElementsB()[i][jj][t].ConvertToInt());
                }
        dump("ksk_a_rt", a);
        dump("ksk_b_rt", b);
    }
    {
        std::vector<int64_t> v;
        push_vec(v, sk2->GetElement());
        dump("sk_rt", v);
        std::vector<int64_t> c;
        push_vec(c, ct2->GetA());
        c.push_back((int64_t)ct2->GetB().ConvertToInt());
        dump("ct1_rt", c);
    }

    // cross-library check: reference-decrypt the imported ciphertext
    auto LWEscheme = std::make_shared<LWEEncryptionScheme>();
    LWEPlaintext res;
    LWEscheme->Decrypt(lweparams, sk2, ct2, &res, 4);
    std::printf("reference Decrypt(imported ct1) = %ld\n", (long)res);
    return 0;
}
