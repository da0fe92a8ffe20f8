// Native host runtime for versatiles_glyphs_tpu.
//
// The reference implements its entire host pipeline in Rust; the TPU
// build keeps the device path in Pallas/XLA and implements the
// performance-relevant host stages natively here, exposed through a
// plain C ABI consumed via ctypes (proto/native.py):
//
//  - vg_encode_glyph_block: mapbox glyphs.proto wire encoding of a
//    whole block from raw arrays (the host packing hot loop; wire
//    layout mirrors /root/reference/src/protobuf/*.rs via prost
//    semantics: fields in tag order, sint32 zigzag for left/top).
//  - vg_tar_header: POSIX ustar 512-byte header with the reference's
//    exact octal/checksum layout (/root/reference/src/writer/tar.rs).
//  - vg_render_sdf_batch: multithreaded float64 brute-force SDF
//    renderer — bit-identical to ops/sdf_ref.py (same IEEE operations
//    in the same per-pixel order), used as the CPU fallback and as the
//    reference-equivalent baseline bench.py compares the TPU against.
//
// Build: csrc/Makefile (g++ -O3 -shared); loaded lazily, with the
// pure-Python implementations as always-available fallbacks.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline long put_varint(uint64_t v, uint8_t* out) {
  long n = 0;
  while (v > 0x7f) {
    out[n++] = static_cast<uint8_t>(v & 0x7f) | 0x80;
    v >>= 7;
  }
  out[n++] = static_cast<uint8_t>(v);
  return n;
}

inline long varint_len(uint64_t v) {
  long n = 1;
  while (v > 0x7f) {
    ++n;
    v >>= 7;
  }
  return n;
}

inline uint32_t zigzag32(int32_t v) {
  return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}

// Encoded size of one glyph message body (without the outer key/len).
long glyph_body_len(uint32_t id, uint8_t has_bitmap, uint64_t bm_len,
                    uint32_t w, uint32_t h, int32_t left, int32_t top,
                    uint32_t adv) {
  long n = 1 + varint_len(id);
  if (has_bitmap) n += 1 + varint_len(bm_len) + static_cast<long>(bm_len);
  n += 1 + varint_len(w);
  n += 1 + varint_len(h);
  n += 1 + varint_len(zigzag32(left));
  n += 1 + varint_len(zigzag32(top));
  n += 1 + varint_len(adv);
  return n;
}

long encode_glyph(uint32_t id, uint8_t has_bitmap, const uint8_t* bm,
                  uint64_t bm_len, uint32_t w, uint32_t h, int32_t left,
                  int32_t top, uint32_t adv, uint8_t* out) {
  long n = 0;
  out[n++] = (1 << 3) | 0;
  n += put_varint(id, out + n);
  if (has_bitmap) {
    out[n++] = (2 << 3) | 2;
    n += put_varint(bm_len, out + n);
    std::memcpy(out + n, bm, bm_len);
    n += static_cast<long>(bm_len);
  }
  out[n++] = (3 << 3) | 0;
  n += put_varint(w, out + n);
  out[n++] = (4 << 3) | 0;
  n += put_varint(h, out + n);
  out[n++] = (5 << 3) | 0;
  n += put_varint(zigzag32(left), out + n);
  out[n++] = (6 << 3) | 0;
  n += put_varint(zigzag32(top), out + n);
  out[n++] = (7 << 3) | 0;
  n += put_varint(adv, out + n);
  return n;
}

}  // namespace

extern "C" {

// Returns bytes written, or -(needed) when out_cap is too small.
long vg_encode_glyph_block(const char* name, long name_len, const char* range,
                           long range_len, long n_glyphs, const uint32_t* ids,
                           const uint32_t* widths, const uint32_t* heights,
                           const int32_t* lefts, const int32_t* tops,
                           const uint32_t* advances, const uint8_t* bitmaps,
                           const int64_t* bitmap_offs,
                           const uint8_t* has_bitmap, uint8_t* out,
                           long out_cap) {
  // Stack (fontstack) body: name(1) + range(2) + repeated glyphs(3).
  long stack_len = 1 + varint_len(name_len) + name_len + 1 +
                   varint_len(range_len) + range_len;
  std::vector<long> glyph_lens(n_glyphs);
  for (long i = 0; i < n_glyphs; ++i) {
    uint64_t bl = bitmap_offs[i + 1] - bitmap_offs[i];
    glyph_lens[i] = glyph_body_len(ids[i], has_bitmap[i], bl, widths[i],
                                   heights[i], lefts[i], tops[i], advances[i]);
    stack_len += 1 + varint_len(glyph_lens[i]) + glyph_lens[i];
  }
  long total = 1 + varint_len(stack_len) + stack_len;
  if (total > out_cap) return -total;

  long n = 0;
  out[n++] = (1 << 3) | 2;  // stacks
  n += put_varint(stack_len, out + n);
  out[n++] = (1 << 3) | 2;  // name
  n += put_varint(name_len, out + n);
  std::memcpy(out + n, name, name_len);
  n += name_len;
  out[n++] = (2 << 3) | 2;  // range
  n += put_varint(range_len, out + n);
  std::memcpy(out + n, range, range_len);
  n += range_len;
  for (long i = 0; i < n_glyphs; ++i) {
    out[n++] = (3 << 3) | 2;
    n += put_varint(glyph_lens[i], out + n);
    uint64_t bl = bitmap_offs[i + 1] - bitmap_offs[i];
    n += encode_glyph(ids[i], has_bitmap[i], bitmaps + bitmap_offs[i], bl,
                      widths[i], heights[i], lefts[i], tops[i], advances[i],
                      out + n);
  }
  return n;
}

// 512-byte ustar header; layout identical to the reference's
// hand-rolled writer (zero-filled right-aligned octal, trailing space,
// checksum over space-filled field). Returns 0, or -1 if the name is
// longer than 100 bytes (truncation would corrupt the entry identity).
long vg_tar_header(const char* name, long name_len, uint64_t size,
                   uint64_t mode, uint8_t typeflag, uint64_t mtime,
                   uint8_t* out) {
  if (name_len > 100) return -1;
  std::memset(out, 0, 512);
  std::memcpy(out, name, name_len);
  auto write_octal = [&](long start, long len, uint64_t val) {
    long idx = start + len - 1;
    out[idx] = ' ';
    while (idx > start) {
      --idx;
      out[idx] = '0' + static_cast<uint8_t>(val & 7);
      val >>= 3;
    }
  };
  write_octal(100, 8, mode);
  write_octal(108, 8, 0);
  write_octal(116, 8, 0);
  write_octal(124, 12, size);
  write_octal(136, 12, mtime);
  out[156] = typeflag;
  std::memcpy(out + 257, "ustar\0" "00", 8);
  std::memset(out + 148, ' ', 8);
  uint32_t csum = 0;
  for (int i = 0; i < 512; ++i) csum += out[i];
  write_octal(148, 8, csum);
  return 0;
}

// Exact float64 SDF render of a glyph batch (see ops/sdf_ref.py for
// the semantics proof vs the reference's R-tree + scanline sweep).
// segs: [total_S][4] rows (vx, vy, wx, wy); per-glyph runs given by
// seg_offs[n+1]. meta: [n][4] = x0, y0, w, h. out: concatenated
// bitmaps at out_offs[n+1] (each w*h bytes, Y-flipped row-major).
long vg_render_sdf_batch(const double* segs, const int64_t* seg_offs,
                         const int32_t* meta, long n_glyphs, uint8_t* out,
                         const int64_t* out_offs, int n_threads) {
  std::atomic<long> next{0};
  auto worker = [&]() {
    for (;;) {
      long g = next.fetch_add(1);
      if (g >= n_glyphs) return;
      const double* s = segs + 4 * seg_offs[g];
      long ns = seg_offs[g + 1] - seg_offs[g];
      int32_t x0 = meta[4 * g + 0], y0 = meta[4 * g + 1];
      int32_t w = meta[4 * g + 2], h = meta[4 * g + 3];
      uint8_t* bm = out + out_offs[g];
      const double x0f = x0 + 0.5, y0f = y0 + 0.5;
      for (int32_t y = 0; y < h; ++y) {
        const double py = y + y0f;
        for (int32_t x = 0; x < w; ++x) {
          const double px = x + x0f;
          double best = HUGE_VAL;
          int wn = 0;
          for (long k = 0; k < ns; ++k) {
            const double vx = s[4 * k + 0], vy = s[4 * k + 1];
            const double wx = s[4 * k + 2], wy = s[4 * k + 3];
            const double dx = wx - vx, dy = wy - vy;
            // Distance: exact formula of segment.rs:54-96.
            const double l2 = dx * dx + dy * dy;
            double qx, qy;
            if (l2 == 0.0) {
              qx = vx;
              qy = vy;
            } else {
              const double t = ((px - vx) * dx + (py - vy) * dy) / l2;
              if (t < 0.0) {
                qx = vx;
                qy = vy;
              } else if (t > 1.0) {
                qx = wx;
                qy = wy;
              } else {
                qx = vx + t * dx;
                qy = vy + t * dy;
              }
            }
            const double ddx = px - qx, ddy = py - qy;
            const double d2 = ddx * ddx + ddy * ddy;
            if (d2 < best) best = d2;
            // Winding: half-open crossings, cx <= px convention
            // (renderer_precise.rs:40-67 re-expressed as a masked sum).
            if (vy <= py) {
              if (wy > py) {
                const double t = (py - vy) / (wy - vy);
                const double cx = vx + t * (wx - vx);
                if (cx <= px) wn += 1;
              }
            } else if (wy <= py) {
              const double t = (py - vy) / (wy - vy);
              const double cx = vx + t * (wx - vx);
              if (cx <= px) wn -= 1;
            }
          }
          double d = std::sqrt(best);
          if (wn != 0) d = -d;
          d = d * (256.0 / 8.0) + 64.0;
          double v = 255.0 - d;
          if (v < 0.0) v = 0.0;
          if (v > 255.0) v = 255.0;
          // Rust f64::round — half away from zero; v >= 0 here.
          bm[(h - 1 - y) * static_cast<long>(w) + x] =
              static_cast<uint8_t>(std::floor(v + 0.5));
        }
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
