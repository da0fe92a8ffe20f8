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

// ---------------------------------------------------------------------------
// Native TrueType glyf outline extraction + flattening.
//
// Replaces the per-glyph fontTools pen walk (the host ingest hot loop)
// with a direct parse of the binary glyf table, reproducing exactly the
// fontTools/ttf-parser outline semantics our goldens were validated
// against (and the reference validates via ttf_parser::Face::
// outline_glyph, /root/reference/src/render/renderer.rs:109-111):
//
//  - TrueType quadratic contours with implied on-curve midpoints
//    between consecutive off-curve points;
//  - contour start rules: first point on-curve -> start there; else
//    last point on-curve -> start there (rotated); else start at the
//    midpoint of first and last (computed on RAW coordinates, then
//    transformed - matching glyf.draw + TransformPen order);
//  - composite glyphs: 2x2 F2Dot14 transforms + raw (unscaled) int
//    offsets, applied innermost-first per point exactly like nested
//    fontTools TransformPens (bit-identical f64);
//  - De Casteljau flattening with the reference's flatness predicate
//    (s + e - 2c)^2 <= tol^2, right half pushed first
//    (/root/reference/src/geometry/ring.rs:119-144), and the ring
//    close/drop rules of src/render/ring_builder.rs:33-54.
// ---------------------------------------------------------------------------

namespace {

inline uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>((p[0] << 8) | p[1]);
}
inline int16_t rd_i16(const uint8_t* p) {
  return static_cast<int16_t>((p[0] << 8) | p[1]);
}

constexpr double kF64Eps = 2.220446049250313e-16;

// Affine (a b c d e f): x' = a*x + c*y + e ; y' = b*x + d*y + f
// (fontTools Transform convention).
struct Affine {
  double a, b, c, d, e, f;
};

struct RingSink {
  double tol_sq;
  // Flattened output
  std::vector<double> pts;        // x,y interleaved, all rings
  std::vector<int32_t> ring_lens; // points per kept ring
  // Current ring under construction
  std::vector<double> cur;

  void move_to(double x, double y) {
    save_ring();
    cur.push_back(x);
    cur.push_back(y);
  }
  void line_to(double x, double y) {
    cur.push_back(x);
    cur.push_back(y);
  }
  void quad_to(double cx, double cy, double ex, double ey) {
    if (cur.empty()) return;
    double sx = cur[cur.size() - 2], sy = cur[cur.size() - 1];
    // Explicit stack, right half pushed first (start->end order).
    struct Q { double sx, sy, cx, cy, ex, ey; };
    Q stack[64];
    int top = 0;
    stack[top++] = {sx, sy, cx, cy, ex, ey};
    while (top) {
      Q q = stack[--top];
      double dx = q.sx + q.ex - q.cx * 2.0;
      double dy = q.sy + q.ey - q.cy * 2.0;
      if (dx * dx + dy * dy <= tol_sq || top >= 62) {
        cur.push_back(q.ex);
        cur.push_back(q.ey);
        continue;
      }
      double m1x = (q.sx + q.cx) / 2.0, m1y = (q.sy + q.cy) / 2.0;
      double m2x = (q.cx + q.ex) / 2.0, m2y = (q.cy + q.ey) / 2.0;
      double mx = (m1x + m2x) / 2.0, my = (m1y + m2y) / 2.0;
      stack[top++] = {mx, my, m2x, m2y, q.ex, q.ey};
      stack[top++] = {q.sx, q.sy, m1x, m1y, mx, my};
    }
  }
  void close_path() { save_ring(); }

  void save_ring() {
    size_t n = cur.size() / 2;
    if (n < 3) {
      cur.clear();
      return;
    }
    double fx = cur[0], fy = cur[1];
    double lx = cur[cur.size() - 2], ly = cur[cur.size() - 1];
    if (std::fabs(fx - lx) > kF64Eps || std::fabs(fy - ly) > kF64Eps) {
      cur.push_back(fx);
      cur.push_back(fy);
      ++n;
    }
    if (n < 4) {
      cur.clear();
      return;
    }
    pts.insert(pts.end(), cur.begin(), cur.end());
    ring_lens.push_back(static_cast<int32_t>(n));
    cur.clear();
  }
};

struct GlyfCtx {
  const uint8_t* glyf;
  long glyf_len;
  const uint32_t* loca;
  long n_glyphs;  // loca has n_glyphs + 1 entries
};

// Parse one glyph (recursing through composites). `stack`/`depth` hold
// the enclosing component transforms, outermost first. Returns false on
// malformed/unsupported data (caller falls back to the Python pen).
bool parse_glyph(const GlyfCtx& ctx, uint32_t gid, RingSink& sink,
                 const Affine* stack, int depth) {
  if (gid >= static_cast<uint32_t>(ctx.n_glyphs) || depth > 8) return false;
  uint32_t off = ctx.loca[gid], end = ctx.loca[gid + 1];
  if (off == end) return true;  // empty glyph
  if (end > static_cast<uint32_t>(ctx.glyf_len) || end - off < 10) return false;
  const uint8_t* p = ctx.glyf + off;
  const uint8_t* pe = ctx.glyf + end;
  int16_t nc = rd_i16(p);
  p += 10;  // skip bbox

  if (nc < 0) {
    // Composite glyph.
    for (;;) {
      if (p + 4 > pe) return false;
      uint16_t flags = rd_u16(p);
      uint16_t cgid = rd_u16(p + 2);
      p += 4;
      double dx, dy;
      if (flags & 0x0001) {  // ARG_1_AND_2_ARE_WORDS
        if (p + 4 > pe) return false;
        if (!(flags & 0x0002)) return false;  // point-matching args: bail
        dx = rd_i16(p);
        dy = rd_i16(p + 2);
        p += 4;
      } else {
        if (p + 2 > pe) return false;
        if (!(flags & 0x0002)) return false;
        dx = static_cast<int8_t>(p[0]);
        dy = static_cast<int8_t>(p[1]);
        p += 2;
      }
      Affine t{1.0, 0.0, 0.0, 1.0, dx, dy};
      if (flags & 0x0008) {  // WE_HAVE_A_SCALE
        if (p + 2 > pe) return false;
        t.a = t.d = rd_i16(p) / 16384.0;
        p += 2;
      } else if (flags & 0x0040) {  // X_AND_Y_SCALE
        if (p + 4 > pe) return false;
        t.a = rd_i16(p) / 16384.0;
        t.d = rd_i16(p + 2) / 16384.0;
        p += 4;
      } else if (flags & 0x0080) {  // TWO_BY_TWO
        if (p + 8 > pe) return false;
        t.a = rd_i16(p) / 16384.0;
        t.b = rd_i16(p + 2) / 16384.0;
        t.c = rd_i16(p + 4) / 16384.0;
        t.d = rd_i16(p + 6) / 16384.0;
        p += 8;
      }
      Affine child_stack[10];
      for (int i = 0; i < depth; ++i) child_stack[i] = stack[i];
      child_stack[depth] = t;
      if (!parse_glyph(ctx, cgid, sink, child_stack, depth + 1)) return false;
      if (!(flags & 0x0020)) break;  // MORE_COMPONENTS
    }
    return true;
  }

  // Simple glyph.
  int n_contours = nc;
  if (p + 2 * n_contours + 2 > pe) return false;
  std::vector<uint16_t> ends(n_contours);
  for (int i = 0; i < n_contours; ++i) ends[i] = rd_u16(p + 2 * i);
  p += 2 * n_contours;
  uint16_t ilen = rd_u16(p);
  p += 2 + ilen;
  if (p > pe) return false;
  int npts = n_contours ? ends[n_contours - 1] + 1 : 0;
  if (npts == 0) return true;

  std::vector<uint8_t> flags(npts);
  for (int i = 0; i < npts;) {
    if (p >= pe) return false;
    uint8_t f = *p++;
    flags[i++] = f;
    if (f & 0x08) {  // REPEAT
      if (p >= pe) return false;
      int rep = *p++;
      while (rep-- && i < npts) flags[i++] = f;
    }
  }
  std::vector<double> xs(npts), ys(npts);
  {
    long v = 0;
    for (int i = 0; i < npts; ++i) {
      uint8_t f = flags[i];
      if (f & 0x02) {  // x short
        if (p >= pe) return false;
        v += (f & 0x10) ? *p : -static_cast<int>(*p);
        ++p;
      } else if (!(f & 0x10)) {
        if (p + 2 > pe) return false;
        v += rd_i16(p);
        p += 2;
      }
      xs[i] = static_cast<double>(v);
    }
    v = 0;
    for (int i = 0; i < npts; ++i) {
      uint8_t f = flags[i];
      if (f & 0x04) {  // y short
        if (p >= pe) return false;
        v += (f & 0x20) ? *p : -static_cast<int>(*p);
        ++p;
      } else if (!(f & 0x20)) {
        if (p + 2 > pe) return false;
        v += rd_i16(p);
        p += 2;
      }
      ys[i] = static_cast<double>(v);
    }
  }

  // Transform chain: innermost (deepest) component transform first —
  // exactly the order nested fontTools TransformPens apply.
  auto xf = [&](double x, double y, double* ox, double* oy) {
    for (int i = depth - 1; i >= 0; --i) {
      const Affine& t = stack[i];
      double nx = t.a * x + t.c * y + t.e;
      double ny = t.b * x + t.d * y + t.f;
      x = nx;
      y = ny;
    }
    *ox = x;
    *oy = y;
  };

  int start = 0;
  for (int ci = 0; ci < n_contours; ++ci) {
    int cend = ends[ci];  // inclusive
    int k = cend - start + 1;
    if (k <= 0) {
      start = cend + 1;
      continue;
    }
    const double* cxs = xs.data() + start;
    const double* cys = ys.data() + start;
    const uint8_t* cfl = flags.data() + start;

    // Cubic glyf off-curves (flag 0x80, variable-font extension): not
    // in scope for this parser — caller falls back to the Python pen.
    for (int i = 0; i < k; ++i) {
      if (cfl[i] & 0x80) return false;
    }

    // Start point + iteration order (glyf.draw semantics,
    // fontTools _g_l_y_f.py:1488-1569): the contour is rotated to END
    // at its FIRST on-curve point, which becomes the moveTo; with no
    // on-curve point at all, the start is the implied midpoint of the
    // last and first off-curve points.
    int f = -1;
    for (int i = 0; i < k; ++i) {
      if (cfl[i] & 1) {
        f = i;
        break;
      }
    }
    double sx, sy;
    if (f < 0) {
      // All-off-curve: BasePen computes the implied start from the
      // TRANSFORMED first/last points (basePen.py qCurveTo None case).
      double ax, ay, bx, by;
      xf(cxs[0], cys[0], &ax, &ay);
      xf(cxs[k - 1], cys[k - 1], &bx, &by);
      sx = 0.5 * (bx + ax);
      sy = 0.5 * (by + ay);
    } else {
      xf(cxs[f], cys[f], &sx, &sy);
    }
    sink.move_to(sx, sy);

    bool have_pend = false;
    double pcx = 0.0, pcy = 0.0;
    // Iterate the k-1 points after the start (wrapping) for the
    // on-curve case, or all k points for the all-off-curve case.
    int count = (f < 0) ? k : k - 1;
    for (int j = 0; j < count; ++j) {
      int i = (f < 0) ? j : (f + 1 + j) % k;
      double px, py;
      xf(cxs[i], cys[i], &px, &py);
      if (cfl[i] & 1) {
        if (have_pend) {
          sink.quad_to(pcx, pcy, px, py);
          have_pend = false;
        } else {
          sink.line_to(px, py);
        }
      } else {
        if (have_pend) {
          sink.quad_to(pcx, pcy, 0.5 * (pcx + px), 0.5 * (pcy + py));
        }
        pcx = px;
        pcy = py;
        have_pend = true;
      }
    }
    if (have_pend) {
      sink.quad_to(pcx, pcy, sx, sy);
    }
    sink.close_path();
    start = cend + 1;
  }
  return true;
}

}  // namespace

extern "C" {

// Flattened rings for a batch of glyph ids, straight from the raw glyf
// table. Outputs: pts (x,y interleaved f64), ring_lens (points per
// ring), glyph_nrings[n_gids] (rings per glyph; -1 = unsupported glyph,
// caller falls back to the Python pen for it). out_counts[2] = total
// points, total rings actually needed. Returns 0 on success, 1 when a
// capacity was exceeded (re-call with out_counts-sized buffers).
long vg_glyf_rings(const uint8_t* glyf, long glyf_len, const uint32_t* loca,
                   long n_glyphs, const uint32_t* gids, long n_gids,
                   double tol_sq, double* pts, long pts_cap,
                   int32_t* ring_lens, long rings_cap, int32_t* glyph_nrings,
                   int64_t* out_counts) {
  GlyfCtx ctx{glyf, glyf_len, loca, n_glyphs};
  long npts = 0, nrings = 0;
  bool overflow = false;
  RingSink sink;
  sink.tol_sq = tol_sq;
  for (long i = 0; i < n_gids; ++i) {
    sink.pts.clear();
    sink.ring_lens.clear();
    sink.cur.clear();
    bool ok = parse_glyph(ctx, gids[i], sink, nullptr, 0);
    if (ok) sink.save_ring();
    if (!ok) {
      glyph_nrings[i] = -1;
      continue;
    }
    long gp = static_cast<long>(sink.pts.size() / 2);
    long gr = static_cast<long>(sink.ring_lens.size());
    if (!overflow && npts + gp <= pts_cap && nrings + gr <= rings_cap) {
      std::memcpy(pts + 2 * npts, sink.pts.data(),
                  sink.pts.size() * sizeof(double));
      std::memcpy(ring_lens + nrings, sink.ring_lens.data(),
                  gr * sizeof(int32_t));
    } else {
      overflow = true;
    }
    glyph_nrings[i] = static_cast<int32_t>(gr);
    npts += gp;
    nrings += gr;
  }
  out_counts[0] = npts;
  out_counts[1] = nrings;
  return overflow ? 1 : 0;
}

}  // extern "C"
