// Native host-side codec for the TPU transfer path.
//
// The end-to-end inference pipeline (core/seg_infer.py) is bounded by the
// ONE host core on this machine (BASELINE.md "End-to-end" section): every
// stage that is not zlib (already C) is a numpy multi-pass over a ~100 MB
// volume. This file collapses the two remaining numpy hot loops into
// single-pass C++:
//
//   * the 12-bit upload pack (ops/volume_pack.py:pack_volume_np) — numpy
//     needs ~6 vector passes (view, subtract, reshape, 2x shift, 2x or);
//     seg3d_pack12_u16 does one read pass + one write pass;
//   * the mask bit-unpack (ops/mask_pack.py:unpack_mask) — numpy's LUT
//     gather materializes an index pass + a gather pass; seg3d_unpack_bits
//     is one pass.
//
// The reference (SURVEY.md §2: zero first-party native code; it rides
// SimpleITK's C++ for host work) has no analog for either op — they exist
// because the TPU host link makes transfer bytes explicit. Loaded via
// ctypes (segmentation3d_tpu/native/__init__.py) with a transparent numpy
// fallback, so the framework works identically without a toolchain.
//
// Build: g++ -O3 -shared -fPIC codec.cpp -o libseg3dcodec.so  (see
// native/__init__.py:_build, which does this lazily and caches by source
// hash). No Python.h dependency — plain C ABI, arrays passed as pointers.

#include <cstdint>
#include <cstddef>

extern "C" {

// min/max over a 2-byte signed array (int16 CT volumes).
void seg3d_minmax_i16(const int16_t* in, size_t n, int32_t* lo, int32_t* hi) {
    if (n == 0) { *lo = 0; *hi = 0; return; }
    int16_t mn = in[0], mx = in[0];
    for (size_t i = 1; i < n; ++i) {
        int16_t v = in[i];
        if (v < mn) mn = v;
        if (v > mx) mx = v;
    }
    *lo = mn; *hi = mx;
}

// min/max over a 2-byte unsigned array (uint16 MR / mask volumes).
void seg3d_minmax_u16(const uint16_t* in, size_t n, int32_t* lo, int32_t* hi) {
    if (n == 0) { *lo = 0; *hi = 0; return; }
    uint16_t mn = in[0], mx = in[0];
    for (size_t i = 1; i < n; ++i) {
        uint16_t v = in[i];
        if (v < mn) mn = v;
        if (v > mx) mx = v;
    }
    *lo = mn; *hi = mx;
}

// (in[i] - lo) mod 2^16 -> uint8, for integer ranges < 256. `in` is the
// uint16 VIEW of the stored 2-byte array (same trick as volume_pack._sub_u16:
// wraparound subtraction is exact whenever the true difference fits 0..65535).
void seg3d_sub_u8(const uint16_t* in, size_t n, uint16_t lo, uint8_t* out) {
    for (size_t i = 0; i < n; ++i)
        out[i] = (uint8_t)(uint16_t)(in[i] - lo);
}

// 12-bit pack: voxel pair (a, b) = (in[2i]-lo, in[2i+1]-lo) (mod 2^16,
// both guaranteed < 4096 by the caller's range scan) becomes three byte
// planes p0[i] = a & 0xFF, p1[i] = (a >> 8) | ((b & 0xF) << 4),
// p2[i] = b >> 4 — the exact layout ops/volume_pack.py documents, inverted
// on device by unpack_volume. Odd n duplicates the last voxel as numpy's
// concatenate([u, u[-1:]]) does; npairs = (n + 1) / 2.
void seg3d_pack12_u16(const uint16_t* in, size_t n, uint16_t lo,
                      uint8_t* p0, uint8_t* p1, uint8_t* p2) {
    size_t npairs = (n + 1) / 2;
    for (size_t i = 0; i < npairs; ++i) {
        uint16_t a = (uint16_t)(in[2 * i] - lo);
        uint16_t b = (2 * i + 1 < n) ? (uint16_t)(in[2 * i + 1] - lo) : a;
        p0[i] = (uint8_t)(a & 0xFF);
        p1[i] = (uint8_t)((a >> 8) | ((b & 0xF) << 4));
        p2[i] = (uint8_t)(b >> 4);
    }
}

// Unpack bit-packed labels: each input byte holds 8/bits voxels, HIGH bits
// first (np.packbits 'big' order — matches ops/mask_pack.pack_mask).
// bits in {1, 2, 4}; out has nbytes * (8 / bits) entries.
void seg3d_unpack_bits(const uint8_t* in, size_t nbytes, int bits,
                       uint8_t* out) {
    int vpb = 8 / bits;
    uint8_t mask = (uint8_t)((1 << bits) - 1);
    for (size_t i = 0; i < nbytes; ++i) {
        uint8_t byte = in[i];
        uint8_t* o = out + i * vpb;
        for (int j = 0; j < vpb; ++j)
            o[j] = (uint8_t)((byte >> (8 - bits * (j + 1))) & mask);
    }
}

// ---------------------------------------------------------------------------
// JPEG Lossless (T.81 process 14) scan decoder — the per-sample hot loop of
// io/jpeg_lossless.py (round-5; see that module for the format notes). The
// Python side parses markers and builds the 16-bit Huffman peek LUT; this
// function decodes one frame's entropy-coded scan. Must stay in EXACT
// agreement with jpeg_lossless._decode_scan_py (parity-tested).
// Returns 0 ok, 2 = invalid Huffman code.
int seg3d_jpegll_decode(const uint8_t* scan, size_t n,
                        const uint8_t* lut_sym, const uint8_t* lut_len,
                        int width, int height, int precision, int predictor,
                        int pt, int restart_interval, uint16_t* out) {
    uint32_t bitbuf = 0;
    int nbits = 0;
    size_t pos = 0;
    int def_px = 1 << (precision - pt - 1);
    int reset = 1;
    long until_rst = restart_interval ? restart_interval : -1;

    #define JLL_FILL() do { \
        while (nbits <= 24) { \
            uint8_t b; \
            if (pos >= n) { bitbuf <<= 8; nbits += 8; continue; } \
            b = scan[pos]; \
            if (b == 0xFF) { \
                uint8_t nxt = (pos + 1 < n) ? scan[pos + 1] : 0xD9; \
                if (nxt == 0x00) { pos += 2; } \
                else { bitbuf <<= 8; nbits += 8; continue; } \
            } else { pos += 1; } \
            bitbuf = (bitbuf << 8) | b; nbits += 8; \
        } \
    } while (0)

    for (int row = 0; row < height; ++row) {
        uint16_t* orow = out + (size_t)row * width;
        for (int col = 0; col < width; ++col) {
            if (until_rst == 0) {
                while (pos + 1 < n && !(scan[pos] == 0xFF &&
                                        scan[pos + 1] >= 0xD0 &&
                                        scan[pos + 1] <= 0xD7))
                    ++pos;
                if (pos + 1 < n) pos += 2;
                bitbuf = 0; nbits = 0; reset = 1;
                until_rst = restart_interval;
            }
            JLL_FILL();
            uint16_t peek = (uint16_t)((bitbuf >> (nbits - 16)) & 0xFFFF);
            int ssss = lut_sym[peek];
            int len = lut_len[peek];
            if (len == 0) return 2;
            nbits -= len;
            int32_t diff;
            if (ssss == 16) diff = 32768;
            else if (ssss == 0) diff = 0;
            else {
                JLL_FILL();
                uint32_t v = (bitbuf >> (nbits - ssss)) & ((1u << ssss) - 1);
                nbits -= ssss;
                diff = (v >= (1u << (ssss - 1))) ? (int32_t)v
                     : (int32_t)v - (1 << ssss) + 1;
            }
            int32_t px;
            if (reset) { px = def_px; reset = 0; }
            else if (row == 0) px = orow[col - 1];
            else if (col == 0) px = orow[-width];
            else {
                int32_t ra = orow[col - 1];
                int32_t rb = orow[col - width];
                int32_t rc = orow[col - width - 1];
                switch (predictor) {
                    case 1: px = ra; break;
                    case 2: px = rb; break;
                    case 3: px = rc; break;
                    case 4: px = ra + rb - rc; break;
                    case 5: px = ra + ((rb - rc) >> 1); break;
                    case 6: px = rb + ((ra - rc) >> 1); break;
                    default: px = (ra + rb) >> 1; break;
                }
            }
            orow[col] = (uint16_t)((px + diff) & 0xFFFF);
            if (until_rst > 0) --until_rst;
        }
    }
    #undef JLL_FILL
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// gzip via libdeflate (round-4): gunzip (~1.6 s) and gzip-write (~1.5 s)
// were the two largest single-core host stages of the e2e per-case budget
// (BASELINE.md per-stage table) even with Python's one-shot zlib — both are
// C already, but libdeflate's non-streaming (de)compressor is measured
// 2-3x faster than zlib on whole buffers, which is exactly our shape: the
// reader holds the full compressed blob, the writer holds the full payload.
// Guarded by __has_include so the codec still builds (without these two
// symbols) on hosts without libdeflate-dev; native/__init__.py degrades to
// the zlib path per-function.

#if defined(__has_include) && !defined(SEG3D_DISABLE_LIBDEFLATE)
#if __has_include(<libdeflate.h>)
#include <libdeflate.h>

extern "C" {

// Worst-case gzip-compressed size for n payload bytes at `level` (1-12).
size_t seg3d_gzip_bound(size_t n, int level) {
    struct libdeflate_compressor* c = libdeflate_alloc_compressor(level);
    if (!c) return 0;
    size_t b = libdeflate_gzip_compress_bound(c, n);
    libdeflate_free_compressor(c);
    return b;
}

// One-shot gzip compression; returns the compressed size, or 0 on failure
// (dst too small / alloc failure).
size_t seg3d_gzip_compress(const uint8_t* src, size_t n, int level,
                           uint8_t* dst, size_t cap) {
    struct libdeflate_compressor* c = libdeflate_alloc_compressor(level);
    if (!c) return 0;
    size_t out = libdeflate_gzip_compress(c, src, n, dst, cap);
    libdeflate_free_compressor(c);
    return out;
}

// One-shot decompression of ONE gzip member. Returns 0 on success,
// 1 if dst is too small (caller grows and retries), 2 on bad data.
// *in_used reports the member's compressed length (multi-member streams:
// the caller loops or falls back to zlib), *out_used the payload length.
int seg3d_gunzip_member(const uint8_t* src, size_t n, uint8_t* dst,
                        size_t cap, size_t* in_used, size_t* out_used) {
    struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
    if (!d) return 2;
    enum libdeflate_result r = libdeflate_gzip_decompress_ex(
        d, src, n, dst, cap, in_used, out_used);
    libdeflate_free_decompressor(d);
    if (r == LIBDEFLATE_SUCCESS) return 0;
    if (r == LIBDEFLATE_INSUFFICIENT_SPACE) return 1;
    return 2;
}

}  // extern "C"

#endif  // __has_include(<libdeflate.h>)
#endif  // defined(__has_include) && !defined(SEG3D_DISABLE_LIBDEFLATE)
