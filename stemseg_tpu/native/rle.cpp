// Native COCO-RLE codec: run extraction, reconstruction and the varint
// string coding. Same wire format as stemseg_tpu/utils/rle.py (see its
// docstring for the scheme); this library accelerates the hot loops for the
// output-writing path (per-frame mask encode at original resolution, e.g.
// 375x1242 KITTI frames x thousands of detections).
//
// Exported as plain C symbols, loaded via ctypes (stemseg_tpu/utils/rle.py);
// build with stemseg_tpu/native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>

extern "C" {

// mask: row-major [h, w] uint8. Traversed column-major (Fortran order).
// counts: alternating run lengths starting with background.
// Returns number of counts written, or -1 if max_n exceeded.
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                   int64_t* counts, int64_t max_n) {
    int64_t n = 0;
    int64_t run = 0;
    uint8_t current = 0;  // first run counts background
    for (int64_t x = 0; x < w; ++x) {
        const uint8_t* col = mask + x;
        for (int64_t y = 0; y < h; ++y) {
            uint8_t v = col[y * w] ? 1 : 0;
            if (v == current) {
                ++run;
            } else {
                if (n >= max_n) return -1;
                counts[n++] = run;
                current = v;
                run = 1;
            }
        }
    }
    if (n >= max_n) return -1;
    counts[n++] = run;
    return n;
}

// Reconstruct a row-major [h, w] uint8 mask from counts (column-major runs).
// Returns 0 on success, -1 if counts do not cover h*w pixels.
int64_t rle_decode(const int64_t* counts, int64_t n, int64_t h, int64_t w,
                   uint8_t* mask) {
    int64_t pos = 0;  // column-major linear position
    const int64_t total = h * w;
    uint8_t v = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t run = counts[i];
        if (pos + run > total) return -1;
        if (v) {
            for (int64_t k = 0; k < run; ++k) {
                int64_t p = pos + k;
                mask[(p % h) * w + (p / h)] = 1;
            }
        }
        pos += run;
        v ^= 1;
    }
    return pos == total ? 0 : -1;
}

// COCO varint pack: 5 bits/char, 0x20 continuation, +48 into ASCII,
// counts[i>2] delta-coded against counts[i-2].
// Returns string length, or -1 if max_len exceeded.
int64_t rle_counts_to_string(const int64_t* counts, int64_t n,
                             char* out, int64_t max_len) {
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t x = counts[i];
        if (i > 2) x -= counts[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1F;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            if (m >= max_len) return -1;
            out[m++] = static_cast<char>(c + 48);
        }
    }
    return m;
}

// Returns number of counts decoded, or -1 if max_n exceeded.
int64_t rle_string_to_counts(const char* s, int64_t len,
                             int64_t* counts, int64_t max_n) {
    int64_t n = 0;
    int64_t i = 0;
    while (i < len) {
        int64_t x = 0;
        int64_t k = 0;
        bool more = true;
        while (more) {
            int64_t c = static_cast<int64_t>(s[i]) - 48;
            x |= (c & 0x1F) << (5 * k);
            more = (c & 0x20) != 0;
            ++i;
            ++k;
            if (!more && (c & 0x10)) x |= -1LL << (5 * k);
        }
        if (n > 2) x += counts[n - 2];
        if (n >= max_n) return -1;
        counts[n++] = x;
    }
    return n;
}

}  // extern "C"
