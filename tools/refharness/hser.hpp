// Serialization helpers for the harness binaries.
//
// Implements the bounty-era binary formats (format spec documented in
// SURVEY.md §2.2; magic constants CT=0x66699666 SK=0x66666999 PK=0x06660666,
// VER=1) plus a harness-local "pk-lite" container that stores only the
// decrypt-relevant public-key fields (params, canon_tag, H_digest, omega_B,
// powg_B) so fixtures stay small: H and ubk are regenerated from canon_tag.
#pragma once
#include <pvac/pvac.hpp>
#include <cstdio>
#include <cstdint>
#include <stdexcept>
#include <string>
#include <vector>

namespace hser {
using namespace pvac;

constexpr uint32_t MAGIC_CT = 0x66699666u;
constexpr uint32_t MAGIC_SK = 0x66666999u;
constexpr uint32_t MAGIC_PK = 0x06660666u;
constexpr uint32_t MAGIC_PKLITE = 0x504B4C54u;  // "PKLT" (harness-local)
constexpr uint32_t VER = 1;

struct W {
    FILE* f;
    explicit W(const std::string& p) : f(fopen(p.c_str(), "wb")) {
        if (!f) throw std::runtime_error("open w " + p);
    }
    ~W() { if (f) fclose(f); }
    void u8(uint8_t x)   { fwrite(&x, 1, 1, f); }
    void u16(uint16_t x) { fwrite(&x, 2, 1, f); }
    void u32(uint32_t x) { fwrite(&x, 4, 1, f); }
    void u64(uint64_t x) { fwrite(&x, 8, 1, f); }
    void f64raw(double d) { uint64_t x; memcpy(&x, &d, 8); u64(x); }
    void bytes(const void* p, size_t n) { fwrite(p, 1, n, f); }
    void fp(const Fp& x) { u64(x.lo); u64(x.hi); }
    void bv(const BitVec& b) {
        u32((uint32_t)b.nbits);
        for (size_t i = 0; i < (b.nbits + 63) / 64; i++) u64(b.w[i]);
    }
};

struct R {
    FILE* f;
    explicit R(const std::string& p) : f(fopen(p.c_str(), "rb")) {
        if (!f) throw std::runtime_error("open r " + p);
    }
    ~R() { if (f) fclose(f); }
    uint8_t u8()   { uint8_t x = 0;  if (fread(&x, 1, 1, f) != 1) throw std::runtime_error("eof"); return x; }
    uint16_t u16() { uint16_t x = 0; if (fread(&x, 2, 1, f) != 1) throw std::runtime_error("eof"); return x; }
    uint32_t u32() { uint32_t x = 0; if (fread(&x, 4, 1, f) != 1) throw std::runtime_error("eof"); return x; }
    uint64_t u64() { uint64_t x = 0; if (fread(&x, 8, 1, f) != 1) throw std::runtime_error("eof"); return x; }
    double f64raw() { uint64_t x = u64(); double d; memcpy(&d, &x, 8); return d; }
    void bytes(void* p, size_t n) { if (fread(p, 1, n, f) != n) throw std::runtime_error("eof"); }
    Fp fp() { Fp x; x.lo = u64(); x.hi = u64(); return x; }
    BitVec bv() {
        BitVec b = BitVec::make(u32());
        for (size_t i = 0; i < (b.nbits + 63) / 64; i++) b.w[i] = u64();
        return b;
    }
};

inline void put_layer(W& w, const Layer& L) {
    w.u8((uint8_t)L.rule);
    if (L.rule == RRule::BASE) {
        w.u64(L.seed.ztag); w.u64(L.seed.nonce.lo); w.u64(L.seed.nonce.hi);
    } else {
        w.u32(L.pa); w.u32(L.pb);
    }
}
inline Layer get_layer(R& r) {
    Layer L{};
    L.rule = (RRule)r.u8();
    if (L.rule == RRule::BASE) {
        L.seed.ztag = r.u64(); L.seed.nonce.lo = r.u64(); L.seed.nonce.hi = r.u64();
    } else {
        L.pa = r.u32(); L.pb = r.u32();
    }
    return L;
}
inline void put_edge(W& w, const Edge& e) {
    w.u32(e.layer_id); w.u16(e.idx); w.u8(e.ch); w.u8(0);
    w.fp(e.w); w.bv(e.s);
}
inline Edge get_edge(R& r) {
    Edge e{};
    e.layer_id = r.u32(); e.idx = r.u16(); e.ch = r.u8(); r.u8();
    e.w = r.fp(); e.s = r.bv();
    return e;
}
inline void put_cipher(W& w, const Cipher& C) {
    w.u32((uint32_t)C.L.size()); w.u32((uint32_t)C.E.size());
    for (const auto& L : C.L) put_layer(w, L);
    for (const auto& e : C.E) put_edge(w, e);
}
inline Cipher get_cipher(R& r) {
    Cipher C;
    uint32_t nL = r.u32(), nE = r.u32();
    C.L.reserve(nL); C.E.reserve(nE);
    for (uint32_t i = 0; i < nL; i++) C.L.push_back(get_layer(r));
    for (uint32_t i = 0; i < nE; i++) C.E.push_back(get_edge(r));
    return C;
}

inline void save_cts(const std::vector<Cipher>& cts, const std::string& path) {
    W w(path);
    w.u32(MAGIC_CT); w.u32(VER); w.u64(cts.size());
    for (const auto& c : cts) put_cipher(w, c);
}
inline std::vector<Cipher> load_cts(const std::string& path) {
    R r(path);
    if (r.u32() != MAGIC_CT || r.u32() != VER) throw std::runtime_error("bad ct " + path);
    std::vector<Cipher> cts(r.u64());
    for (auto& c : cts) c = get_cipher(r);
    return cts;
}

inline void save_sk(const SecKey& sk, const std::string& path) {
    W w(path);
    w.u32(MAGIC_SK); w.u32(VER);
    for (int i = 0; i < 4; i++) w.u64(sk.prf_k[i]);
    w.u64(sk.lpn_s_bits.size());
    for (auto x : sk.lpn_s_bits) w.u64(x);
}
inline SecKey load_sk(const std::string& path) {
    R r(path);
    if (r.u32() != MAGIC_SK || r.u32() != VER) throw std::runtime_error("bad sk " + path);
    SecKey sk;
    for (int i = 0; i < 4; i++) sk.prf_k[i] = r.u64();
    sk.lpn_s_bits.resize(r.u64());
    for (auto& x : sk.lpn_s_bits) x = r.u64();
    return sk;
}

// pk-lite: everything except H / ubk (those regenerate from canon_tag),
// including the σ-relevant weight params the reference pk.bin format drops.
inline void save_pklite(const PubKey& pk, const std::string& path) {
    W w(path);
    w.u32(MAGIC_PKLITE); w.u32(VER);
    w.u32(pk.prm.B); w.u32(pk.prm.m_bits); w.u32(pk.prm.n_bits);
    w.u32(pk.prm.h_col_wt); w.u32(pk.prm.x_col_wt); w.u32(pk.prm.err_wt);
    w.f64raw(pk.prm.noise_entropy_bits);
    w.f64raw(pk.prm.tuple2_fraction);
    w.f64raw(pk.prm.depth_slope_bits);
    w.u64(pk.prm.edge_budget);
    w.u32(pk.prm.lpn_n); w.u32(pk.prm.lpn_t);
    w.u32(pk.prm.lpn_tau_num); w.u32(pk.prm.lpn_tau_den);
    w.f64raw(pk.prm.recrypt_lo); w.f64raw(pk.prm.recrypt_hi);
    w.u32(pk.prm.recrypt_rounds);
    w.u64(pk.canon_tag);
    w.bytes(pk.H_digest.data(), 32);
    w.fp(pk.omega_B);
    w.u64(pk.powg_B.size());
    for (const auto& g : pk.powg_B) w.fp(g);
}
// Loads pk-lite WITHOUT regenerating H/ubk (decrypt does not need them).
inline PubKey load_pklite(const std::string& path) {
    R r(path);
    if (r.u32() != MAGIC_PKLITE || r.u32() != VER) throw std::runtime_error("bad pklite " + path);
    PubKey pk;
    pk.prm.B = r.u32(); pk.prm.m_bits = r.u32(); pk.prm.n_bits = r.u32();
    pk.prm.h_col_wt = r.u32(); pk.prm.x_col_wt = r.u32(); pk.prm.err_wt = r.u32();
    pk.prm.noise_entropy_bits = r.f64raw();
    pk.prm.tuple2_fraction = r.f64raw();
    pk.prm.depth_slope_bits = r.f64raw();
    pk.prm.edge_budget = r.u64();
    pk.prm.lpn_n = r.u32(); pk.prm.lpn_t = r.u32();
    pk.prm.lpn_tau_num = r.u32(); pk.prm.lpn_tau_den = r.u32();
    pk.prm.recrypt_lo = r.f64raw(); pk.prm.recrypt_hi = r.f64raw();
    pk.prm.recrypt_rounds = r.u32();
    pk.canon_tag = r.u64();
    r.bytes(pk.H_digest.data(), 32);
    pk.omega_B = r.fp();
    pk.powg_B.resize(r.u64());
    for (auto& g : pk.powg_B) g = r.fp();
    return pk;
}

}  // namespace hser
