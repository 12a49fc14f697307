// Native host-side runtime for interactive_unet_tpu.
//
// The reference delegates its host hot loops to third-party native code
// (numba JIT color decode utils.py:325, zarr's C codecs, scipy's C resample;
// SURVEY §2.1).  This library is the in-repo equivalent: the storage codec
// path (crc32c + batched zstd chunk compression for the zarr v3
// sharding_indexed codec), the multiscale order-0 downsample, and the
// RGB-palette mask decode.  Exposed via a plain C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 iunet_native.cpp -lzstd -lz
//        (see ../build.sh)

#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>
#include <algorithm>
#include <cmath>

#include <zstd.h>

extern "C" {

// ---------------------------------------------------------------------------
// crc32c (Castagnoli) — slicing-by-8 software implementation.
// ---------------------------------------------------------------------------

static uint32_t crc32c_table[8][256];
static bool crc32c_init_done = false;

static void crc32c_init() {
    const uint32_t poly = 0x82F63B78u;
    for (int n = 0; n < 256; n++) {
        uint32_t c = (uint32_t)n;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? (c >> 1) ^ poly : c >> 1;
        crc32c_table[0][n] = c;
    }
    for (int n = 0; n < 256; n++) {
        uint32_t c = crc32c_table[0][n];
        for (int k = 1; k < 8; k++) {
            c = crc32c_table[0][c & 0xff] ^ (c >> 8);
            crc32c_table[k][n] = c;
        }
    }
    crc32c_init_done = true;
}

uint32_t iunet_crc32c(const uint8_t* data, uint64_t len) {
    if (!crc32c_init_done) crc32c_init();
    uint32_t crc = 0xFFFFFFFFu;
    while (len >= 8) {
        uint64_t word;
        std::memcpy(&word, data, 8);
        word ^= (uint64_t)crc;
        crc = crc32c_table[7][word & 0xff] ^
              crc32c_table[6][(word >> 8) & 0xff] ^
              crc32c_table[5][(word >> 16) & 0xff] ^
              crc32c_table[4][(word >> 24) & 0xff] ^
              crc32c_table[3][(word >> 32) & 0xff] ^
              crc32c_table[2][(word >> 40) & 0xff] ^
              crc32c_table[1][(word >> 48) & 0xff] ^
              crc32c_table[0][(word >> 56) & 0xff];
        data += 8;
        len -= 8;
    }
    while (len--) crc = crc32c_table[0][(crc ^ *data++) & 0xff] ^ (crc >> 8);
    return crc ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// Batched zstd chunk codec (the sharding_indexed inner codec hot loop).
// Chunks are (de)compressed in parallel with a small thread pool.
// ---------------------------------------------------------------------------

// Compress n chunks, each src_size bytes at srcs[i]; writes compressed bytes
// to dst (caller-allocated, per-chunk capacity dst_cap), sizes to out_sizes.
// Returns 0 on success.
int iunet_zstd_compress_batch(const uint8_t** srcs, uint64_t src_size,
                              uint8_t* dst, uint64_t dst_cap,
                              uint64_t* out_sizes, int n, int level,
                              int n_threads) {
    std::vector<int> err(std::max(n_threads, 1), 0);
    auto work = [&](int tid) {
        for (int i = tid; i < n; i += n_threads) {
            size_t r = ZSTD_compress(dst + (uint64_t)i * dst_cap, dst_cap,
                                     srcs[i], src_size, level);
            if (ZSTD_isError(r)) { err[tid] = 1; return; }
            out_sizes[i] = r;
        }
    };
    if (n_threads <= 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < n_threads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
    for (int e : err) if (e) return 1;
    return 0;
}

// Decompress n chunks; srcs[i]/src_sizes[i] -> dst + i*dst_size.
int iunet_zstd_decompress_batch(const uint8_t** srcs,
                                const uint64_t* src_sizes, uint8_t* dst,
                                uint64_t dst_size, int n, int n_threads) {
    std::vector<int> err(std::max(n_threads, 1), 0);
    auto work = [&](int tid) {
        for (int i = tid; i < n; i += n_threads) {
            size_t r = ZSTD_decompress(dst + (uint64_t)i * dst_size, dst_size,
                                       srcs[i], src_sizes[i]);
            if (ZSTD_isError(r) || r != dst_size) { err[tid] = 1; return; }
        }
    };
    if (n_threads <= 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < n_threads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
    for (int e : err) if (e) return 1;
    return 0;
}

// ---------------------------------------------------------------------------
// Order-0 x0.5-style downsample with scipy.ndimage.zoom index mapping:
// idx(i) = floor(i * (in-1)/(out-1) + 0.5)  (out > 1; idx = 0 when out == 1)
// — the multiscale pyramid hot loop (reference utils.py:29-48).
// ---------------------------------------------------------------------------

// idx = -1 marks out-of-range coordinates -> cval (0), matching scipy's
// constant mode exactly (including float64 rounding overshoot at the end).
static inline void zoom_indices(int64_t in, int64_t out,
                                std::vector<int64_t>& idx) {
    idx.resize(out);
    if (out <= 1) { if (out == 1) idx[0] = 0; return; }
    double scale = (double)(in - 1) / (double)(out - 1);
    for (int64_t i = 0; i < out; i++) {
        double x = (double)i * scale;
        if (x < 0.0 || x > (double)(in - 1)) { idx[i] = -1; continue; }
        idx[i] = (int64_t)std::floor(x + 0.5);
    }
}

void iunet_downsample0_u8(const uint8_t* src, int64_t d, int64_t h, int64_t w,
                          uint8_t* dst, int64_t od, int64_t oh, int64_t ow) {
    std::vector<int64_t> di, hi, wi;
    zoom_indices(d, od, di);
    zoom_indices(h, oh, hi);
    zoom_indices(w, ow, wi);
    for (int64_t i = 0; i < od; i++) {
        uint8_t* dp = dst + i * oh * ow;
        if (di[i] < 0) { std::memset(dp, 0, (size_t)(oh * ow)); continue; }
        const uint8_t* sp = src + di[i] * h * w;
        for (int64_t j = 0; j < oh; j++) {
            uint8_t* drow = dp + j * ow;
            if (hi[j] < 0) { std::memset(drow, 0, (size_t)ow); continue; }
            const uint8_t* row = sp + hi[j] * w;
            for (int64_t k = 0; k < ow; k++)
                drow[k] = wi[k] < 0 ? 0 : row[wi[k]];
        }
    }
}

// ---------------------------------------------------------------------------
// RGB palette mask -> one-hot planes + weight (numba kernel replacement,
// reference utils.py:325-336 semantics: first palette match wins,
// weight = 255 - channel0, channel 0 dropped by the Python wrapper).
// ---------------------------------------------------------------------------

void iunet_colored_to_categorical(const uint8_t* mask, int64_t h, int64_t w,
                                  const uint8_t* colors, int n_colors,
                                  uint8_t* onehot /* h*w*n_colors */,
                                  uint8_t* weight /* h*w */) {
    std::vector<uint32_t> keys(n_colors);
    for (int c = 0; c < n_colors; c++)
        keys[c] = ((uint32_t)colors[c * 3] << 16) |
                  ((uint32_t)colors[c * 3 + 1] << 8) | colors[c * 3 + 2];
    std::memset(onehot, 0, (size_t)(h * w * n_colors));
    for (int64_t p = 0; p < h * w; p++) {
        uint32_t key = ((uint32_t)mask[p * 3] << 16) |
                       ((uint32_t)mask[p * 3 + 1] << 8) | mask[p * 3 + 2];
        for (int c = 0; c < n_colors; c++) {
            if (key == keys[c]) { onehot[p * n_colors + c] = 255; break; }
        }
        weight[p] = 255 - onehot[p * n_colors];
    }
}

}  // extern "C"
