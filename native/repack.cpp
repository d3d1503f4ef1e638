// zllm native repack engine.
//
// The C++ load-time stage of the framework (counterpart of the reference's
// repack extra-buffer: ggml/src/ggml-cpu/repack.cpp set_tensor -> tiled
// relayout): converts GGUF block-quantized tensors (row-major [N, K]) into
// the TPU planar layouts consumed by the Pallas kernels — split-half
// fold-packed quants [K/2, N] with N on the lane axis, per-group fp16
// scale planes — using all cores.  The numpy implementation in
// zllm/quant/repack.py is the reference; this produces identical bytes
// ~20x faster on the big tensors.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// ---- fp16 helpers ---------------------------------------------------------

static inline float half_to_float(uint16_t h) {
    uint32_t sign = (uint32_t)(h >> 15) << 31;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; exp--; }
            mant &= 0x3FF;
            bits = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

static inline uint16_t float_to_half(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    uint32_t sign = (bits >> 16) & 0x8000;
    int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = bits & 0x7FFFFF;
    if (exp <= 0) {  // subnormal / zero (round-to-nearest)
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half_mant = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half_mant & 1))) half_mant++;
        return (uint16_t)(sign | half_mant);
    }
    if (exp >= 31) return (uint16_t)(sign | 0x7C00);  // inf
    uint32_t half_mant = mant >> 13;
    uint32_t rem = mant & 0x1FFF;
    if (rem > 0x1000 || (rem == 0x1000 && (half_mant & 1))) {
        half_mant++;
        if (half_mant == 0x400) { half_mant = 0; exp++; if (exp >= 31) return (uint16_t)(sign | 0x7C00); }
    }
    return (uint16_t)(sign | ((uint32_t)exp << 10) | half_mant);
}

// element order of in-block nibbles (pair = 32 for K-quants, 16 for 32-blocks):
// byte j of a 2*pair run: low nibble = element j, high = element j+pair.

static void parallel_rows(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t nthreads = hw ? (int64_t)hw : 4;
    if (nthreads > n) nthreads = n > 0 ? n : 1;
    std::vector<std::thread> ts;
    int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int64_t t = 0; t < nthreads; t++) {
        int64_t lo = t * chunk, hi = lo + chunk > n ? n : lo + chunk;
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto& th : ts) th.join();
}

// fold-pack one column of 4-bit values: q[K] -> qs[K/2] column writes with
// stride N; pairing (r, r + fold/2) within each fold chunk
static inline void fold_pack_col(const uint8_t* q, int64_t K, int64_t fold,
                                 uint8_t* qs, int64_t col, int64_t N) {
    int64_t half = fold / 2;
    for (int64_t c = 0; c < K / fold; c++) {
        const uint8_t* lo = q + c * fold;
        const uint8_t* hi = lo + half;
        uint8_t* out = qs + (c * half) * N + col;
        for (int64_t r = 0; r < half; r++) {
            out[r * N] = (uint8_t)(lo[r] | (hi[r] << 4));
        }
    }
}

}  // namespace

extern "C" {

// Q4_K: raw [N, K/256*144] -> qs u8[K/2, N] plus the "diet" scale planes:
// sm u16[K/32, N] = sc | mn << 6 (the raw 6-bit two-level fields) and
// sd/sb f16-bits u16[K/256, N] = per-superblock d / dmin (pass-through).
// Tiled over blocks of NB output columns: decode into a column-tile
// [K][NB] then emit contiguous NB-wide row segments (a blocked transpose —
// per-element strided stores measured 3.5x slower than numpy).
void zllm_repack_q4k(const uint8_t* raw, int64_t N, int64_t K, int64_t fold,
                     uint8_t* qs, uint16_t* sm, uint16_t* sd, uint16_t* sb_out) {
    const int64_t nb = K / 256;          // superblocks per row
    const int64_t row_bytes = nb * 144;
    const int64_t NB = 128;
    const int64_t nblocks = (N + NB - 1) / NB;
    parallel_rows(nblocks, [&](int64_t lo_b, int64_t hi_b) {
        std::vector<uint8_t> tile(K * NB);
        for (int64_t bidx = lo_b; bidx < hi_b; bidx++) {
            const int64_t n0 = bidx * NB;
            const int64_t bw = (n0 + NB <= N) ? NB : N - n0;
            for (int64_t j = 0; j < bw; j++) {
                const int64_t n = n0 + j;
                const uint8_t* row = raw + n * row_bytes;
                for (int64_t sb = 0; sb < nb; sb++) {
                    const uint8_t* blk = row + sb * 144;
                    uint16_t dh, dminh;
                    std::memcpy(&dh, blk, 2);
                    std::memcpy(&dminh, blk + 2, 2);
                    sd[sb * N + n] = dh;       // raw f16 bits pass through
                    sb_out[sb * N + n] = dminh;
                    const uint8_t* sbytes = blk + 4;
                    for (int g = 0; g < 8; g++) {
                        uint8_t sc, mn;
                        if (g < 4) {
                            sc = sbytes[g] & 0x3F;
                            mn = sbytes[g + 4] & 0x3F;
                        } else {
                            sc = (uint8_t)((sbytes[g + 4] & 0x0F) | ((sbytes[g - 4] >> 6) << 4));
                            mn = (uint8_t)((sbytes[g + 4] >> 4) | ((sbytes[g] >> 6) << 4));
                        }
                        int64_t gi = sb * 8 + g;
                        sm[gi * N + n] = (uint16_t)(sc | ((uint16_t)mn << 6));
                    }
                    const uint8_t* qb = blk + 16;
                    uint8_t* qe = tile.data() + (sb * 256) * NB + j;
                    for (int64_t i2 = 0; i2 < 128; i2++) {
                        int64_t run = i2 / 32, idx = i2 % 32;
                        qe[(run * 64 + idx) * NB] = qb[i2] & 0x0F;
                        qe[(run * 64 + 32 + idx) * NB] = qb[i2] >> 4;
                    }
                }
            }
            // fold-pack: pair rows (r, r+fold/2) within each chunk, emit
            // bw contiguous bytes per output row
            const int64_t half = fold / 2;
            for (int64_t c = 0; c < K / fold; c++) {
                for (int64_t r = 0; r < half; r++) {
                    const uint8_t* lo = tile.data() + (c * fold + r) * NB;
                    const uint8_t* hi = tile.data() + (c * fold + half + r) * NB;
                    uint8_t* out = qs + (c * half + r) * N + n0;
                    for (int64_t j = 0; j < bw; j++)
                        out[j] = (uint8_t)(lo[j] | (hi[j] << 4));
                }
            }
        }
    });
}

// Q8_0: raw [N, K/32*34] -> qs i8[K, N], d f16[K/32, N]
void zllm_repack_q8_0(const uint8_t* raw, int64_t N, int64_t K,
                      int8_t* qs, uint16_t* d) {
    const int64_t nb = K / 32;
    const int64_t row_bytes = nb * 34;
    parallel_rows(N, [&](int64_t lo_n, int64_t hi_n) {
        for (int64_t n = lo_n; n < hi_n; n++) {
            const uint8_t* row = raw + n * row_bytes;
            for (int64_t g = 0; g < nb; g++) {
                const uint8_t* blk = row + g * 34;
                uint16_t dh;
                std::memcpy(&dh, blk, 2);
                d[g * N + n] = dh;  // pass-through fp16
                const int8_t* src = (const int8_t*)(blk + 2);
                int8_t* dst = qs + g * 32 * N + n;
                for (int64_t j = 0; j < 32; j++) dst[j * N] = src[j];
            }
        }
    });
}

// Q4_0: raw [N, K/32*18] -> qs u8[K/2, N] fold-packed, d f16[K/32, N]
void zllm_repack_q4_0(const uint8_t* raw, int64_t N, int64_t K, int64_t fold,
                      uint8_t* qs, uint16_t* d) {
    const int64_t nb = K / 32;
    const int64_t row_bytes = nb * 18;
    parallel_rows(N, [&](int64_t lo_n, int64_t hi_n) {
        std::vector<uint8_t> q(K);
        for (int64_t n = lo_n; n < hi_n; n++) {
            const uint8_t* row = raw + n * row_bytes;
            for (int64_t g = 0; g < nb; g++) {
                const uint8_t* blk = row + g * 18;
                uint16_t dh;
                std::memcpy(&dh, blk, 2);
                d[g * N + n] = dh;
                const uint8_t* qb = blk + 2;
                uint8_t* qe = q.data() + g * 32;
                for (int64_t j = 0; j < 16; j++) {  // pair = 16
                    qe[j] = qb[j] & 0x0F;
                    qe[16 + j] = qb[j] >> 4;
                }
            }
            fold_pack_col(q.data(), K, fold, qs, n, N);
        }
    });
}

// Q6_K: raw [N, K/256*210] -> ql u8[K/2,N], qh u8[K/4,N], a f16[K/16,N]
void zllm_repack_q6k(const uint8_t* raw, int64_t N, int64_t K, int64_t fold,
                     uint8_t* ql_out, uint8_t* qh_out, uint16_t* a) {
    const int64_t nb = K / 256;
    const int64_t row_bytes = nb * 210;
    parallel_rows(N, [&](int64_t lo_n, int64_t hi_n) {
        std::vector<uint8_t> qlo(K), qhi(K);
        for (int64_t n = lo_n; n < hi_n; n++) {
            const uint8_t* row = raw + n * row_bytes;
            for (int64_t sb = 0; sb < nb; sb++) {
                const uint8_t* blk = row + sb * 210;
                const uint8_t* ql = blk;          // 128 bytes
                const uint8_t* qh = blk + 128;    // 64 bytes
                const int8_t* sc = (const int8_t*)(blk + 192);  // 16 int8
                uint16_t dh;
                std::memcpy(&dh, blk + 208, 2);
                float dv = half_to_float(dh);
                for (int g = 0; g < 16; g++)
                    a[(sb * 16 + g) * N + n] = float_to_half(dv * (float)sc[g]);
                uint8_t* lo = qlo.data() + sb * 256;
                uint8_t* hi = qhi.data() + sb * 256;
                // ql: two 64-byte chunks, pair = 64
                for (int64_t c = 0; c < 2; c++) {
                    const uint8_t* src = ql + c * 64;
                    for (int64_t j = 0; j < 64; j++) {
                        lo[c * 128 + j] = src[j] & 0x0F;
                        lo[c * 128 + 64 + j] = src[j] >> 4;
                    }
                }
                // qh: two 32-byte chunks, 2-bit fields, element (32*b + j)
                for (int64_t c = 0; c < 2; c++) {
                    const uint8_t* src = qh + c * 32;
                    for (int64_t j = 0; j < 32; j++) {
                        for (int64_t bpos = 0; bpos < 4; bpos++) {
                            hi[c * 128 + bpos * 32 + j] = (src[j] >> (2 * bpos)) & 0x3;
                        }
                    }
                }
            }
            fold_pack_col(qlo.data(), K, fold, ql_out, n, N);
            // crumb-pack qhi: 4 values per byte, quarters of each fold chunk
            int64_t quart = fold / 4;
            for (int64_t c = 0; c < K / fold; c++) {
                const uint8_t* base = qhi.data() + c * fold;
                uint8_t* out = qh_out + (c * quart) * N + n;
                for (int64_t r = 0; r < quart; r++) {
                    out[r * N] = (uint8_t)(base[r] | (base[quart + r] << 2) |
                                           (base[2 * quart + r] << 4) | (base[3 * quart + r] << 6));
                }
            }
        }
    });
}

}  // extern "C"
