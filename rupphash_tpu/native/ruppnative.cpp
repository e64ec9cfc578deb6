// ruppnative — native host-side hot paths for rupphash_tpu.
//
// The reference implementation keeps its entire runtime in a compiled
// language; this library plays the same role for the Python orchestration
// layer here: the host-side operations that run per-file at scan rate are
// implemented in C++ and exposed over a C ABI consumed via ctypes
// (rupphash_tpu/native/__init__.py), with pure-Python fallbacks when the
// toolchain is unavailable.
//
// Contents:
//   hchacha20         cache value-encryption subkey derivation
//                     (RFC draft irtf-cfrg-xchacha section 2.2)
//   luma601           integer Rec.601 luma (pdqhash.rs:268-284 semantics)
//   box_resample_u8   area-average pre-downsample, float64 accumulate,
//                     round-half-away (matches ops/pdq_ref.py exactly)
//   union_find        path-halving union-find over an edge list
//                     (scanner.rs:1780-1807 semantics)
//
// Build: g++ -O3 -shared -fPIC (see build.py). No external dependencies.

#include <cstdint>
#include <cstring>
#include <vector>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------
// HChaCha20
// ---------------------------------------------------------------------
static inline uint32_t rotl32(uint32_t x, int n) {
    return (x << n) | (x >> (32 - n));
}

#define QR(a, b, c, d)                          \
    a += b; d ^= a; d = rotl32(d, 16);          \
    c += d; b ^= c; b = rotl32(b, 12);          \
    a += b; d ^= a; d = rotl32(d, 8);           \
    c += d; b ^= c; b = rotl32(b, 7);

void hchacha20(const uint8_t key[32], const uint8_t nonce[16],
               uint8_t out[32]) {
    uint32_t x[16];
    x[0] = 0x61707865u; x[1] = 0x3320646Eu;
    x[2] = 0x79622D32u; x[3] = 0x6B206574u;
    for (int i = 0; i < 8; i++)
        std::memcpy(&x[4 + i], key + 4 * i, 4);
    for (int i = 0; i < 4; i++)
        std::memcpy(&x[12 + i], nonce + 4 * i, 4);
    for (int r = 0; r < 10; r++) {
        QR(x[0], x[4], x[8],  x[12]);
        QR(x[1], x[5], x[9],  x[13]);
        QR(x[2], x[6], x[10], x[14]);
        QR(x[3], x[7], x[11], x[15]);
        QR(x[0], x[5], x[10], x[15]);
        QR(x[1], x[6], x[11], x[12]);
        QR(x[2], x[7], x[8],  x[13]);
        QR(x[3], x[4], x[9],  x[14]);
    }
    std::memcpy(out +  0, &x[0],  16);
    std::memcpy(out + 16, &x[12], 16);
}

// ---------------------------------------------------------------------
// Rec.601 integer luma: (299 r + 587 g + 114 b + 500) / 1000
// ---------------------------------------------------------------------
void luma601(const uint8_t* px, int64_t n_px, int channels, uint8_t* out) {
    if (channels == 1) {
        std::memcpy(out, px, (size_t)n_px);
        return;
    }
    for (int64_t i = 0; i < n_px; i++) {
        const uint8_t* p = px + i * channels;
        uint32_t l = (299u * p[0] + 587u * p[1] + 114u * p[2] + 500u) / 1000u;
        out[i] = (uint8_t)l;
    }
}

// ---------------------------------------------------------------------
// Area-average box resample, u8 -> u8 (float64 accumulate).
// Matches rupphash_tpu.ops.pdq_ref.box_resample_u8: rows pass then cols
// pass, per-output normalization, round half away from zero.
// ---------------------------------------------------------------------
static void axis_weights(int src, int dst, std::vector<int>& starts,
                         std::vector<std::vector<double>>& weights) {
    const double s = (double)src / (double)dst;
    starts.resize(dst);
    weights.resize(dst);
    for (int i = 0; i < dst; i++) {
        double lo = i * s, hi = (i + 1) * s;
        int k0 = (int)std::floor(lo);
        int k1 = std::min((int)std::ceil(hi), src);
        starts[i] = k0;
        auto& w = weights[i];
        w.resize(k1 - k0);
        for (int k = k0; k < k1; k++)
            w[k - k0] = std::min(hi, (double)(k + 1)) - std::max(lo, (double)k);
    }
}

void box_resample_u8(const uint8_t* src, int h, int w,
                     uint8_t* dst, int nh, int nw) {
    std::vector<double> acc((size_t)h * w);
    for (int64_t i = 0; i < (int64_t)h * w; i++) acc[i] = src[i];

    int ch = h, cw = w;
    if (nh != h) {
        std::vector<int> starts;
        std::vector<std::vector<double>> wts;
        axis_weights(h, nh, starts, wts);
        std::vector<double> tmp((size_t)nh * w);
        for (int i = 0; i < nh; i++) {
            const auto& wv = wts[i];
            double wsum = 0;
            for (double x : wv) wsum += x;
            for (int j = 0; j < w; j++) {
                double v = 0;
                for (size_t k = 0; k < wv.size(); k++)
                    v += wv[k] * acc[(size_t)(starts[i] + k) * w + j];
                tmp[(size_t)i * w + j] = v / wsum;
            }
        }
        acc.swap(tmp);
        ch = nh;
    }
    if (nw != w) {
        std::vector<int> starts;
        std::vector<std::vector<double>> wts;
        axis_weights(w, nw, starts, wts);
        std::vector<double> tmp((size_t)ch * nw);
        for (int j = 0; j < nw; j++) {
            const auto& wv = wts[j];
            double wsum = 0;
            for (double x : wv) wsum += x;
            for (int i = 0; i < ch; i++) {
                double v = 0;
                for (size_t k = 0; k < wv.size(); k++)
                    v += acc[(size_t)i * cw + starts[j] + k] * wv[k];
                tmp[(size_t)i * nw + j] = v / wsum;
            }
        }
        acc.swap(tmp);
        cw = nw;
    }
    for (int64_t i = 0; i < (int64_t)ch * cw; i++) {
        double r = std::floor(acc[i] + 0.5);
        dst[i] = (uint8_t)std::max(0.0, std::min(255.0, r));
    }
}

// ---------------------------------------------------------------------
// Union-find with path halving; writes each node's final root.
// ---------------------------------------------------------------------
void union_find(int64_t n, const int64_t* ei, const int64_t* ej,
                int64_t m, int64_t* parent) {
    for (int64_t i = 0; i < n; i++) parent[i] = i;
    auto find = [&](int64_t i) {
        while (parent[i] != i) {
            parent[i] = parent[parent[i]];
            i = parent[i];
        }
        return i;
    };
    for (int64_t e = 0; e < m; e++) {
        int64_t ri = find(ei[e]), rj = find(ej[e]);
        if (ri != rj) parent[ri] = rj;
    }
    for (int64_t i = 0; i < n; i++) parent[i] = find(i);
}

}  // extern "C"
