// Native tile assembler: styled primitives -> device-ready chunk arrays.
//
// The serving path's cold cost is per-primitive Python overhead (a z15
// city tile has ~600 primitives; pair building, view culling, packing,
// span extraction and work-item emission each cost a few numpy calls
// per primitive).  This module is an exact C++ transcription of that
// pipeline — draw/primitives.py (make_stroke_prim + cull),
// draw/packing.py (pack_prims), draw/spans.py (fill_spans_multi), and
// ops/render_pallas.py (build_tile_chunks incl. _stroke_items and
// _split_big_stroke_chunks) — validated by exact chunk-array equality
// tests against the Python path (tests/test_native_assembler.py).
//
// Reference provenance (semantics, not code): the reference renderer's
// drawer passes (drawer.rs:60-131), scanline fill (fill.rs:16-104) and
// stroke expansion (line.rs:9-61) define what these chunks must paint;
// the packing/item machinery is this framework's own TPU-side design.
//
// Python keeps: styling, projection, profile/pattern tables, and the
// rare host-rasterized layer path (out-of-bound or oversize prims) —
// those requests are returned as placeholder chunks the caller
// replaces.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int CH = 128;       // geometry slots per chunk
constexpr int RB_F = 32;      // blend row-block height
constexpr int RB_I = 8;       // shallow/dead work-item row-block height
constexpr int RB16 = 16;      // steep (16, 64) work-item row-block height
constexpr int IT_CAP = 2048;  // max work items per chunk
constexpr int64_t FAST_COORD_BOUND = 12000;

constexpr int KIND_FILL = 1;
constexpr int KIND_STROKE = 2;
constexpr int KIND_STROKE_SOLID = 3;
constexpr int NSEC = 12;  // item section slots (shallow/steep16/dead x 4 halves)
constexpr int KIND_FILL_IMAGE = 5;
constexpr int KIND_STROKE_DASH = 7;
constexpr int KIND_STROKE_SPAN = 9;   // gradient spans (alive solid strokes)
constexpr int KIND_PLACEHOLDER = -2;  // layer-path request marker

// Tent-lane routing constants — must match render_pallas.py
// (SPAN_TOL / TOL255 / SPAN_ROW_MERGE / SPAN_VS_ITEM); the compression
// below evaluates the same f32/f64 expressions in the same order as
// the numpy path, so emitted lanes are bit-identical (pinned by
// tests/test_native_assembler.py).
constexpr float SPAN_TOL = 3.0517578125e-05f;  // 2^-15 (alpha domain)
constexpr float TOL255 = 0.03125f;             // 2^-5 (255 domain)
constexpr int SPAN_ROW_MERGE = 32;
constexpr int64_t SPAN_VS_ITEM = 32;

constexpr int LINE_CAP_ROUND = 1;
constexpr int LINE_CAP_SQUARE = 2;

inline double round_half_away(double x) {
  return (x > 0 ? 1.0 : (x < 0 ? -1.0 : 0.0)) * std::floor(std::abs(x) + 0.5);
}

inline int64_t floor_div(int64_t x, int64_t y) {
  int64_t q = x / y, r = x % y;
  return (r != 0 && ((r < 0) != (y < 0))) ? q - 1 : q;
}
inline int64_t ceil_div(int64_t a, int64_t b) { return -floor_div(-a, b); }

// ---------------------------------------------------------------------------
// Inputs
// ---------------------------------------------------------------------------

struct Request {
  uint8_t kind;       // 0 = fill, 1 = stroke
  int64_t style_key;  // equal keys <=> identical style payload
  float color[3];     // already /255
  double opacity;
  double hw;          // half width (strokes)
  int32_t body_pidx, outer_pidx;  // dash-profile indices (strokes)
  uint8_t cap;
  uint8_t force_layer;  // python routing (round-cap > chain bound, ...)
  int32_t pat;          // fill-image pattern index (fills; -1 plain)
  uint8_t item_ok;      // profile chain-free (dash item eligibility)
};

// Per-request built geometry.
struct Built {
  // strokes: post-cap, pre-cull rows kept for nothing; post-cull below.
  std::vector<int64_t> segs;    // (n, 4)
  std::vector<double> trav;
  std::vector<uint8_t> outer;
  // fills: edge rows (n, 4)
  std::vector<int64_t> edges;
  // raw extent (pre-cull) for the dashed far-reach rule
  int64_t raw_absmax = 0;
  bool oob = false;
  int64_t bb[4] = {0, 0, 0, 0};  // xlo, xhi, ylo, yhi (with margin)
  bool has_bb = false;
  // fill spans (y, lo, hi) extracted per prim
  std::vector<int32_t> spans;
};

// One logical chunk before array emission.
struct ChunkT {
  int kind = 0;
  std::vector<int64_t> geom;   // (n, 4) segs / fill spans / tent lanes
  std::vector<float> trav;     // f32 (strokes); tent apex a (span chunks)
  std::vector<int32_t> prof;   // per-seg profile idx
  std::vector<float> spanb;    // tent slope b (KIND_STROKE_SPAN)
  std::vector<float> spanxc;   // tent apex x (KIND_STROKE_SPAN)
  bool last = false;
  float color[3] = {0, 0, 0};
  float opacity = 1.f;
  double hw = 0.0;
  int32_t pat = -1;
  int32_t placeholder_req = -1;
};

// ---------------------------------------------------------------------------
// Stroke building: make_stroke_prims_batch + _cull_view transcription
// ---------------------------------------------------------------------------

void build_stroke(const int64_t* pairs, int64_t n, const Request& rq,
                  int32_t view_px, Built* out) {
  out->raw_absmax = 0;
  for (int64_t i = 0; i < n * 4; ++i)
    out->raw_absmax = std::max(out->raw_absmax, std::abs(pairs[i]));

  const double hw = rq.hw;
  const bool has_caps = rq.cap == LINE_CAP_ROUND || rq.cap == LINE_CAP_SQUARE;

  std::vector<int64_t> segs;
  std::vector<double> travs;
  std::vector<uint8_t> outer;
  segs.reserve(n * 4 + 8);
  travs.reserve(n + 2);

  double trav_before = 0.0;
  // Match the Python batch path bit-for-bit: per-pair f64 cumsum in
  // order, nondegenerate filter.
  std::vector<uint8_t> nondeg(n);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t x1 = pairs[i * 4], y1 = pairs[i * 4 + 1];
    const int64_t x2 = pairs[i * 4 + 2], y2 = pairs[i * 4 + 3];
    nondeg[i] = (x1 != x2) || (y1 != y2);
    if (nondeg[i]) {
      segs.insert(segs.end(), {x1, y1, x2, y2});
      travs.push_back(trav_before);
      outer.push_back(0);
    }
    const double dx = double(x2 - x1), dy = double(y2 - y1);
    trav_before += std::sqrt(dx * dx + dy * dy);
  }

  if (has_caps && n) {
    if (nondeg[0]) {
      const int64_t p1x = pairs[0], p1y = pairs[1];
      const int64_t p2x = pairs[2], p2y = pairs[3];
      const double dx = double(p1x - p2x), dy = double(p1y - p2y);
      const double dist = std::sqrt(dx * dx + dy * dy);
      const double f = hw / dist;
      const int64_t cex = p1x + int64_t(round_half_away(dx * f));
      const int64_t cey = p1y + int64_t(round_half_away(dy * f));
      if (cex != p1x || cey != p1y) {
        segs.insert(segs.end(), {p1x, p1y, cex, cey});
        travs.push_back(0.0);
        outer.push_back(1);
      }
    }
    if (nondeg[n - 1]) {
      const int64_t p1x = pairs[(n - 1) * 4], p1y = pairs[(n - 1) * 4 + 1];
      const int64_t p2x = pairs[(n - 1) * 4 + 2], p2y = pairs[(n - 1) * 4 + 3];
      const double dx = double(p2x - p1x), dy = double(p2y - p1y);
      const double dist = std::sqrt(dx * dx + dy * dy);
      const double f = hw / dist;
      const int64_t cex = p2x + int64_t(round_half_away(dx * f));
      const int64_t cey = p2y + int64_t(round_half_away(dy * f));
      if (cex != p2x || cey != p2y) {
        segs.insert(segs.end(), {p2x, p2y, cex, cey});
        travs.push_back(0.0);
        outer.push_back(1);
      }
    }
  }

  // _cull_view: m = ceil(hw) + 3.
  const int64_t m = int64_t(std::ceil(hw)) + 3;
  const int64_t nseg = int64_t(travs.size());
  out->segs.clear();
  out->trav.clear();
  out->outer.clear();
  for (int64_t i = 0; i < nseg; ++i) {
    const int64_t x1 = segs[i * 4], y1 = segs[i * 4 + 1];
    const int64_t x2 = segs[i * 4 + 2], y2 = segs[i * 4 + 3];
    const bool keep = (std::min(x1, x2) - m < view_px) &&
                      (std::max(x1, x2) + m >= 0) &&
                      (std::min(y1, y2) - m < view_px) &&
                      (std::max(y1, y2) + m >= 0);
    if (keep) {
      out->segs.insert(out->segs.end(), {x1, y1, x2, y2});
      out->trav.push_back(travs[i]);
      out->outer.push_back(outer[i]);
    }
  }
}

// ---------------------------------------------------------------------------
// Fill spans: draw/spans.py closed form, per-prim
// ---------------------------------------------------------------------------

struct SpanEntry {
  int64_t y, a, b, eid;
};

void fill_spans(const int64_t* edges, int64_t n_edges, int32_t ts,
                std::vector<int32_t>* out_spans) {
  out_spans->clear();
  if (n_edges == 0) return;
  std::vector<SpanEntry> ents;
  ents.reserve(n_edges * 2);
  for (int64_t e = 0; e < n_edges; ++e) {
    const int64_t x1 = edges[e * 4], y1 = edges[e * 4 + 1];
    const int64_t x2 = edges[e * 4 + 2], y2 = edges[e * 4 + 3];
    const int64_t ytop = std::min(y1, y2), ybot = std::max(y1, y2);
    const int64_t r_lo = std::max<int64_t>(ytop, 0);
    const int64_t r_hi = std::min<int64_t>(ybot, ts - 1);
    if (r_hi < r_lo) continue;
    const int64_t adx = std::abs(x2 - x1), ady = std::abs(y2 - y1);
    const int64_t ady_nz = std::max<int64_t>(ady, 1);
    const int64_t sx = x1 < x2 ? 1 : -1;
    const bool steep = ady > adx;
    for (int64_t y = r_lo; y <= r_hi; ++y) {
      const int64_t j = std::abs(y - y1);
      // Poisoned start/end pixels (vertex double-count rule).
      const bool pois =
          ((y == y1) && (y1 <= y2)) || ((y == y2) && (y2 <= y1));
      if (pois) continue;
      int64_t a, b;
      if (steep) {
        const int64_t x = x1 + sx * ((2 * j * adx + ady) / (2 * ady_nz));
        a = b = x;
      } else {
        int64_t i_min = ceil_div(adx * (2 * j - 1), 2 * ady_nz);
        int64_t i_max = ceil_div(adx * (2 * j + 1), 2 * ady_nz) - 1;
        i_min = std::min(std::max<int64_t>(i_min, 0), adx);
        i_max = std::min(std::max<int64_t>(i_max, 0), adx);
        const int64_t lo = x1 + sx * i_min, hi = x1 + sx * i_max;
        a = std::min(lo, hi);
        b = std::max(lo, hi);
      }
      ents.push_back({y, a, b, e});
    }
  }
  // lexsort (eid, a, y): primary y, then a, then eid.
  std::stable_sort(ents.begin(), ents.end(),
                   [](const SpanEntry& l, const SpanEntry& r) {
                     if (l.y != r.y) return l.y < r.y;
                     if (l.a != r.a) return l.a < r.a;
                     return l.eid < r.eid;
                   });
  const size_t n = ents.size();
  // Pairing (mirrors fill_spans_multi's pos%2 rule): per row, entries
  // ordered by (a, eid); even positions open a span to the next entry.
  size_t i = 0;
  while (i < n) {
    size_t g_end = i;
    while (g_end + 1 < n && ents[g_end + 1].y == ents[i].y) ++g_end;
    for (size_t k = i; k + 1 <= g_end; k += 2) {
      const int64_t lo = std::max<int64_t>(ents[k].a, 0);
      const int64_t hi = std::min<int64_t>(ents[k + 1].b, ts - 1);
      if (lo <= hi) {
        out_spans->push_back(int32_t(ents[k].y));
        out_spans->push_back(int32_t(lo));
        out_spans->push_back(int32_t(hi));
      }
    }
    i = g_end + 1;
  }
}

// ---------------------------------------------------------------------------
// Work items: ops/render_pallas.py _stroke_items transcription
// ---------------------------------------------------------------------------

// Per-(segment, column subrange) clipped row-block range —
// transcription of render_pallas.py _seg_sub_blocks (the f64
// interpolation expression is written identically so both sides
// produce the same blocks).  `colw` is the subrange width (128 for
// shallow/dead sections, 64 for steep), `rowb` the block height
// (8 / 16), `h` the subrange index.
static bool seg_sub_blocks(int64_t x1, int64_t y1, int64_t x2, int64_t y2,
                           int64_t m, int32_t ts, int h, int colw, int rowb,
                           int64_t* b0_out, int64_t* nblk_out) {
  if (x1 == x2 && y1 == y2) return false;
  const int64_t c0 = int64_t(h) * colw;
  const int64_t xa = std::min(x1, x2), xb = std::max(x1, x2);
  const int64_t ya = std::min(y1, y2), yb = std::max(y1, y2);
  const int64_t lo = std::max(xa, c0 - m);
  const int64_t hi = std::min(xb, c0 + (colw - 1) + m);
  if (lo > hi) return false;
  int64_t sel_lo, sel_hi;
  if (x1 == x2) {
    sel_lo = ya;
    sel_hi = yb;
  } else {
    const int64_t dy = y2 - y1, dxs = x2 - x1;
    const double y_lo = double(y1) + double((lo - x1) * dy) / double(dxs);
    const double y_hi = double(y1) + double((hi - x1) * dy) / double(dxs);
    sel_lo =
        std::max(int64_t(std::floor(std::min(y_lo, y_hi))) - 1, ya);
    sel_hi = std::min(int64_t(std::ceil(std::max(y_lo, y_hi))) + 1, yb);
  }
  const int64_t blo =
      std::min<int64_t>(std::max<int64_t>(sel_lo - m, 0), ts - 1) / rowb;
  const int64_t bhi =
      std::min<int64_t>(std::max<int64_t>(sel_hi + m, 0), ts - 1) / rowb;
  *b0_out = blo;
  *nblk_out = bhi - blo + 1;
  return true;
}

// Forward decl (defined below with the aliveness machinery).
static bool seg_all_alive(int64_t x1, int64_t y1, int64_t x2, int64_t y2,
                          double c_hw);

// Raw (pre-padding) window count per segment — steep alive segments
// use (16, 64) windows, everything else (8, 128); mirrors
// render_pallas._stroke_item_counts.
int64_t stroke_item_count(const int64_t* g, int64_t n, double c_hw,
                          int32_t ts) {
  if (n == 0) return 0;
  const int64_t m = int64_t(std::ceil(c_hw)) + 1;
  int64_t tot = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t x1 = g[i * 4], y1 = g[i * 4 + 1];
    const int64_t x2 = g[i * 4 + 2], y2 = g[i * 4 + 3];
    const bool steep = std::llabs(y2 - y1) > std::llabs(x2 - x1);
    const bool use16 = steep && seg_all_alive(x1, y1, x2, y2, c_hw);
    int64_t c8 = 0, c16 = 0;
    for (int h = 0; h < ts / 128; ++h) {
      int64_t b0, nblk;
      if (seg_sub_blocks(x1, y1, x2, y2, m, ts, h, 128, RB_I, &b0, &nblk))
        c8 += nblk;
    }
    if (use16) {
      for (int h = 0; h < ts / 64; ++h) {
        int64_t b0, nblk;
        if (seg_sub_blocks(x1, y1, x2, y2, m, ts, h, 64, RB16, &b0, &nblk))
          c16 += nblk;
      }
      // Steep segments emit whichever shape is cheaper per half (see
      // stroke_items); the per-seg min lower-bounds either choice,
      // which is what the IT_CAP chunk-split budget needs.
      tot += std::min(c8, c16);
    } else {
      tot += c8;
    }
  }
  return tot;
}

// Exact dead-start scan for one segment (render_pallas.py
// _seg_alive_exact transcription): enumerate the gap-band owner starts
// (c(k)+1, k) and test each against the feather cutoff.
static bool seg_alive_exact(int64_t x1, int64_t y1, int64_t x2, int64_t y2,
                            int64_t mn, int64_t mx, double den, double ft) {
  bool any_gap = false;
  int64_t c_prev = (mx - 1) / (2 * mx);  // c(0)
  int64_t h_prev = (2 * c_prev * mn + mx - 1) / (2 * mx);  // h(0) = 0 + g(0)
  const bool swap = std::llabs(x2 - x1) > std::llabs(y2 - y1);
  const int64_t mn0 = swap ? y1 : x1;
  const int64_t mx0 = swap ? x1 : y1;
  const int64_t x_inc = x1 <= x2 ? 1 : -1;
  const int64_t y_inc = y1 <= y2 ? 1 : -1;
  const int64_t mn_i = swap ? y_inc : x_inc;
  const int64_t mx_i = swap ? x_inc : y_inc;
  const int64_t nc = x2 * y1 - y2 * x1;
  for (int64_t k = 0; k < mx; ++k) {
    const int64_t c_next = (2 * (k + 1) * mn + mx - 1) / (2 * mx);
    const int64_t g_next = (2 * c_next * mn + mx - 1) / (2 * mx);
    const int64_t h_next = (k + 1) + g_next;
    if (h_next - h_prev == 2) {
      any_gap = true;
      // Gap band (h(k), h(k+1)) is owned by start (c(k)+1, k).
      const int64_t s_mn = mn0 + mn_i * (c_prev + 1);
      const int64_t s_mx = mx0 + mx_i * k;
      const int64_t sx = swap ? s_mx : s_mn;
      const int64_t sy = swap ? s_mn : s_mx;
      const int64_t cross = nc + (y2 - y1) * sx - (x2 - x1) * sy;
      const double cd = double(std::llabs(cross)) / den;
      if (!(cd < ft)) return false;
    }
    c_prev = c_next;
    h_prev = h_next;
  }
  (void)any_gap;
  return true;
}

// Per-segment aliveness (render_pallas.py _seg_all_alive transcription):
// true iff every perpendicular-walk owner start is provably alive
// (center distance < feather cutoff).  Conservative routing: anything
// uncertain takes the exact general-dead kernel path.
static bool seg_all_alive(int64_t x1, int64_t y1, int64_t x2, int64_t y2,
                          double c_hw) {
  if (c_hw <= 0.0) return false;
  const double ft = std::max(c_hw + 0.5, 1.0) - 1e-6;
  const int64_t dx = std::llabs(x2 - x1);
  const int64_t dy = std::llabs(y2 - y1);
  const int64_t mn = std::min(dx, dy);
  const int64_t mx = std::max(std::max(dx, dy), int64_t(1));
  const double den = std::sqrt(double(dx * dx + dy * dy));
  const int64_t gK = (2 * mn * mn + mx - 1) / (2 * mx);
  if (gK == 0) return true;  // no gap bands at all (near-axis)
  if (double(3 * mx - 1) < 2.0 * ft * den) return true;
  if (den <= 0.0) return false;
  return seg_alive_exact(x1, y1, x2, y2, mn, mx, den, ft);
}

// ---------------------------------------------------------------------------
// Stroke tent lanes: render_pallas.py _route_stroke_spans machinery
// (_stroke_span_raster / _emit_run_tents / _compress_span_rows), exact
// transcription — every f32/f64 expression in the numpy order.
// ---------------------------------------------------------------------------

struct SpanLane {
  int64_t y0, y1, xlo, xhi;
  float a, b, xc;
};

static inline uint32_t f32_bits(float v) {
  uint32_t u;
  std::memcpy(&u, &v, 4);
  return u;
}

// render_pallas.py _stroke_span_cost_est
static int64_t stroke_span_cost_est(int64_t x1, int64_t y1, int64_t x2,
                                    int64_t y2, double c_hw, int32_t ts) {
  const bool vert = x1 == x2;
  if (vert && y1 == y2) return 0;
  const int64_t m = int64_t(std::ceil(c_hw)) + 2;
  auto clip = [&](int64_t v) {
    return std::min<int64_t>(std::max<int64_t>(v, 0), ts - 1);
  };
  const int64_t ylo = clip(std::min(y1, y2) - m);
  const int64_t yhi = clip(std::max(y1, y2) + m);
  const int64_t rows = yhi - ylo + 1;
  return vert ? (rows + SPAN_ROW_MERGE - 1) / SPAN_ROW_MERGE + 2 * m : rows;
}

// render_pallas.py _tent_verify: the kernel's f32 reconstruction
// max(min(a - b*|x - xc|, plat255), 0) against the rasterized truth.
static bool tent_verify(const float* v255, int64_t n, int64_t x0, float a,
                        float b, float xc, float plat255) {
  for (int64_t i = 0; i < n; ++i) {
    const float t0 = a - b * std::abs(float(x0 + i) - xc);
    const float t = std::max(std::min(t0, plat255), 0.0f);
    if (!(std::abs(t - v255[i]) <= TOL255)) return false;
  }
  return true;
}

// render_pallas.py _emit_run_tents emit_piece: one-sided tent for a
// linear piece, recursively halved if the verify fails.
static void emit_piece_rec(int64_t y, int64_t x0, const float* vals,
                           const float* v255, float plat255, int64_t p0,
                           int64_t p1, std::vector<SpanLane>* out) {
  float a, b, xc;
  if (p1 == p0) {
    a = v255[p0];
    b = 0.0f;
    xc = float(x0 + p0);
  } else {
    const float da = vals[p0 + 1] - vals[p0];
    if (da <= 0.0f) {
      a = vals[p0] * 255.0f;
      b = (-da) * 255.0f;
      xc = float(x0 + p0);
    } else {
      a = (vals[p0] + da * float(p1 - p0)) * 255.0f;
      b = da * 255.0f;
      xc = float(x0 + p1);
    }
  }
  if (tent_verify(v255 + p0, p1 - p0 + 1, x0 + p0, a, b, xc, plat255)) {
    out->push_back({y, y, x0 + p0, x0 + p1, a, b, xc});
  } else {
    const int64_t mid = (p0 + p1) / 2;
    emit_piece_rec(y, x0, vals, v255, plat255, p0, mid, out);
    emit_piece_rec(y, x0, vals, v255, plat255, mid + 1, p1, out);
  }
}

// render_pallas.py _emit_run_tents: one maximal nonzero run -> verified
// tent lanes (greedy linear pieces, then [rise, plateau?, fall] groups
// merged into one clipped tent via the f64 end-line intersection).
static void emit_run_tents(int64_t y, int64_t x0, const float* vals,
                           int64_t L, float plat255,
                           std::vector<SpanLane>* out) {
  std::vector<float> v255(static_cast<size_t>(L));
  for (int64_t i = 0; i < L; ++i) v255[size_t(i)] = vals[i] * 255.0f;
  struct Piece {
    int64_t p0, p1;
    float a0, da;
  };
  std::vector<Piece> pieces;
  int64_t i = 0;
  while (i < L) {
    if (i + 1 == L) {
      pieces.push_back({i, i, vals[i], 0.0f});
      break;
    }
    const float da = vals[i + 1] - vals[i];
    int64_t j = i + 1;
    while (j + 1 < L) {
      const float pred = vals[i] + da * float(j + 1 - i);
      if (std::abs(vals[j + 1] - pred) > SPAN_TOL) break;
      ++j;
    }
    pieces.push_back({i, j, vals[i], da});
    i = j + 1;
  }
  size_t gi = 0;
  while (gi < pieces.size()) {
    const Piece p = pieces[gi];
    size_t group_end = gi;
    if (p.da > 0.0f) {
      size_t k = gi + 1;
      if (k < pieces.size() && pieces[k].da == 0.0f) ++k;
      if (k < pieces.size() && pieces[k].da < 0.0f) group_end = k;
    }
    if (group_end > gi) {
      const Piece up = pieces[gi];
      const Piece dn = pieces[group_end];
      const double dau = double(up.da), dad = double(dn.da);
      const double xu = double(x0 + up.p0), xd = double(x0 + dn.p0);
      const double xstar =
          (double(dn.a0) - dad * xd - double(up.a0) + dau * xu) / (dau - dad);
      const double astar = double(up.a0) + dau * (xstar - xu);
      const float a = float(astar * 255.0);
      const float b = float(dau * 255.0);
      const float xc = float(xstar);
      const int64_t p0 = up.p0, p1 = dn.p1;
      if (tent_verify(v255.data() + p0, p1 - p0 + 1, x0 + p0, a, b, xc,
                      plat255)) {
        out->push_back({y, y, x0 + p0, x0 + p1, a, b, xc});
        gi = group_end + 1;
        continue;
      }
    }
    emit_piece_rec(y, x0, vals, v255.data(), plat255, p.p0, p.p1, out);
    ++gi;
  }
}

// render_pallas.py _stroke_span_raster + _compress_span_rows: exact
// per-pixel alpha of the routed segments (the f32 expressions the
// alive-mode item kernel evaluates), fmax-merged, then compressed into
// verified tent lanes with exact-bit row-range merging.
static void stroke_spans(const std::vector<int64_t>& g, double c_hw,
                         double c_op, int32_t ts,
                         std::vector<SpanLane>* lanes) {
  static thread_local std::vector<float> acc;
  if (int64_t(acc.size()) < int64_t(ts) * ts)
    acc.assign(size_t(ts) * size_t(ts), 0.0f);
  const int64_t n = int64_t(g.size() / 4);
  int64_t row_lo = ts, row_hi = -1;
  const float hwf = float(c_hw);
  const float opf = float(c_op);
  const float ffrom = std::max(hwf - 0.5f, 0.0f);
  const float fto = std::max(hwf + 0.5f, 1.0f);
  const float om = std::min(2.0f * hwf, 1.0f);
  const float dfe = fto - ffrom;
  const float plat255 = float(opf * om) * 255.0f;
  const int64_t m = int64_t(std::ceil(c_hw)) + 2;
  for (int64_t s = 0; s < n; ++s) {
    const int64_t x1 = g[s * 4], y1 = g[s * 4 + 1];
    const int64_t x2 = g[s * 4 + 2], y2 = g[s * 4 + 3];
    if (x1 == x2 && y1 == y2) continue;  // degenerate: paints nothing
    const int64_t dx = std::llabs(x2 - x1), dy = std::llabs(y2 - y1);
    const int64_t mn = std::min(dx, dy);
    const int64_t mx = std::max(std::max(dx, dy), int64_t(1));
    const float den = std::sqrt(float(dx * dx + dy * dy));
    const float inv = 1.0f / std::max(den, 1e-9f);
    const bool swap = dx > dy;
    const int64_t mn0 = swap ? y1 : x1, mx0 = swap ? x1 : y1;
    const int64_t x_inc = x1 <= x2 ? 1 : -1, y_inc = y1 <= y2 ? 1 : -1;
    const int64_t mn_i = swap ? y_inc : x_inc, mx_i = swap ? x_inc : y_inc;
    const int64_t nc = x2 * y1 - y2 * x1, sdx = x2 - x1, sdy = y2 - y1;
    const int64_t cK = (2 * mx * mn + mx - 1) / (2 * mx);
    const int64_t gK = (2 * cK * mn + mx - 1) / (2 * mx);
    const int64_t hK = mx + gK;
    const int64_t ylo = std::max(std::min(y1, y2) - m, int64_t(0));
    const int64_t yhi = std::min(std::max(y1, y2) + m, int64_t(ts - 1));
    const int64_t xlo = std::max(std::min(x1, x2) - m, int64_t(0));
    const int64_t xhi = std::min(std::max(x1, x2) + m, int64_t(ts - 1));
    if (ylo > yhi || xlo > xhi) continue;
    for (int64_t y = ylo; y <= yhi; ++y) {
      float* arow = acc.data() + size_t(y) * size_t(ts);
      for (int64_t x = xlo; x <= xhi; ++x) {
        const int64_t raw = nc + sdy * x - sdx * y;
        const float cd = float(std::llabs(raw)) * inv;
        const float vrm = (fto - cd) / dfe;
        const float vr = cd < ffrom ? 1.0f : (cd < fto ? vrm : 0.0f);
        const float op = om * vr;
        if (!(op > 0.0f)) continue;
        const int64_t MN = swap ? y : x, MX = swap ? x : y;
        const int64_t n0 = (MN - mn0) * mn_i;
        const int64_t m0 = (MX - mx0) * mx_i;
        const int64_t A = 2 * mn * n0 + 2 * mx * m0 + (mx - 1);
        const int64_t T = floor_div(A, 2 * mx);
        const bool edge = (A - T * (2 * mx)) == (2 * mx - 1);
        const bool in_slab = (A >= 0) && (T <= hK);
        const bool ok_edge = (in_slab && T < hK) ||
                             ((T == hK) && (n0 >= mn)) ||
                             ((A == -1) && (n0 <= 0));
        if (!(edge ? ok_edge : in_slab)) continue;
        const float v = opf * op;
        if (v > arow[x]) arow[x] = v;
      }
    }
    row_lo = std::min(row_lo, ylo);
    row_hi = std::max(row_hi, yhi);
  }
  // Compression with row-range merging (then clear the touched rows —
  // the canvas is thread-local and must leave all-zero).
  std::vector<size_t> prev_row, cur_row;
  int64_t prev_y = INT64_MIN;
  std::vector<SpanLane> row_out;
  for (int64_t y = row_lo; y <= row_hi; ++y) {
    float* arow = acc.data() + size_t(y) * size_t(ts);
    row_out.clear();
    int64_t x = 0;
    while (x < ts) {
      if (!(arow[x] > 0.0f)) {
        ++x;
        continue;
      }
      const int64_t x0r = x;
      while (x < ts && arow[x] > 0.0f) ++x;
      emit_run_tents(y, x0r, arow + x0r, x - x0r, plat255, &row_out);
    }
    std::memset(arow, 0, size_t(ts) * sizeof(float));
    if (row_out.empty()) {
      prev_row.clear();
      prev_y = INT64_MIN;
      continue;
    }
    cur_row.clear();
    std::vector<size_t> cand =
        (prev_y == y - 1) ? prev_row : std::vector<size_t>();
    for (const SpanLane& lane : row_out) {
      bool merged = false;
      for (size_t ci = 0; ci < cand.size(); ++ci) {
        SpanLane& Lm = (*lanes)[cand[ci]];
        if (Lm.xlo == lane.xlo && Lm.xhi == lane.xhi &&
            f32_bits(Lm.a) == f32_bits(lane.a) &&
            f32_bits(Lm.b) == f32_bits(lane.b) &&
            f32_bits(Lm.xc) == f32_bits(lane.xc) &&
            (y - Lm.y0) < SPAN_ROW_MERGE) {
          Lm.y1 = y;
          cur_row.push_back(cand[ci]);
          cand.erase(cand.begin() + std::ptrdiff_t(ci));
          merged = true;
          break;
        }
      }
      if (!merged) {
        lanes->push_back(lane);
        cur_row.push_back(lanes->size() - 1);
      }
    }
    prev_row = cur_row;
    prev_y = y;
  }
}

void stroke_items(const int64_t* g, int64_t n, double c_hw, int32_t ts,
                  std::vector<int32_t>* items, int32_t isec[NSEC]) {
  items->clear();
  std::memset(isec, 0, NSEC * sizeof(int32_t));
  const int n_halves = ts / 128;
  if (n == 0) return;
  const int64_t m = int64_t(std::ceil(c_hw)) + 1;

  // Per-segment class (0 shallow-alive (8,128) / 1 steep-alive (16,64)
  // / 2 general-dead (8,128)).  Axis segments need no special class:
  // the general-alive math collapses for mn = 0 and seg_all_alive
  // routes them alive (for hw > 0) — matches
  // render_pallas._stroke_items.
  std::vector<int8_t> cls_of(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    const int64_t x1 = g[i * 4], y1 = g[i * 4 + 1];
    const int64_t x2 = g[i * 4 + 2], y2 = g[i * 4 + 3];
    const bool steep = std::llabs(y2 - y1) > std::llabs(x2 - x1);
    if (!seg_all_alive(x1, y1, x2, y2, c_hw))
      cls_of[size_t(i)] = 2;
    else
      cls_of[size_t(i)] = steep ? 1 : 0;
  }

  // Per half: steep (16, 64) emission pays only when its
  // paired-and-padded cost beats plain (8, 128) windows for the same
  // segments (equalizing unbalanced sub-half lists with duplicates can
  // double them); spilled halves route steep items into the shallow
  // section instead.  Mirrors render_pallas._stroke_items exactly.
  std::vector<std::vector<int32_t>> steep_secs(static_cast<size_t>(n_halves));
  std::vector<uint8_t> spill8(static_cast<size_t>(n_halves), 0);
  std::vector<int32_t> L0, L1;
  for (int h = 0; h < n_halves; ++h) {
    L0.clear();
    L1.clear();
    int64_t raw8 = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (cls_of[size_t(i)] != 1) continue;
      const int64_t x1 = g[i * 4], y1 = g[i * 4 + 1];
      const int64_t x2 = g[i * 4 + 2], y2 = g[i * 4 + 3];
      int64_t b0, nblk;
      if (seg_sub_blocks(x1, y1, x2, y2, m, ts, h, 128, RB_I, &b0, &nblk))
        raw8 += nblk;
    }
    for (int sub = 0; sub < 2; ++sub) {
      std::vector<int32_t>* L = sub ? &L1 : &L0;
      const int hs = 2 * h + sub;
      for (int64_t i = 0; i < n; ++i) {
        if (cls_of[size_t(i)] != 1) continue;
        const int64_t x1 = g[i * 4], y1 = g[i * 4 + 1];
        const int64_t x2 = g[i * 4 + 2], y2 = g[i * 4 + 3];
        int64_t b0, nblk;
        if (!seg_sub_blocks(x1, y1, x2, y2, m, ts, hs, 64, RB16, &b0,
                            &nblk))
          continue;
        for (int64_t p = 0; p < nblk; ++p)
          L->push_back(int32_t(i | ((b0 + p) << 8) | (sub << 14)));
      }
    }
    const size_t n_pairs = std::max((L0.size() + 1) / 2, (L1.size() + 1) / 2);
    const int64_t cost16 = int64_t(4 * n_pairs);
    if (n_pairs && cost16 < raw8) {
      const int32_t fill0 = L0.empty() ? L1.back() : L0.back();
      const int32_t fill1 = L1.empty() ? L0.back() : L1.back();
      L0.resize(2 * n_pairs, fill0);
      L1.resize(2 * n_pairs, fill1);
      std::vector<int32_t>& sec = steep_secs[size_t(h)];
      sec.reserve(4 * n_pairs);
      for (size_t k = 0; k < n_pairs; ++k) {
        sec.push_back(L0[2 * k]);
        sec.push_back(L0[2 * k + 1]);
        sec.push_back(L1[2 * k]);
        sec.push_back(L1[2 * k + 1]);
      }
    } else {
      spill8[size_t(h)] = raw8 > 0;
    }
  }

  int32_t end = 0;
  for (int cls = 0; cls < 3; ++cls) {
    const int slot_base = 4 * cls;
    for (int h = 0; h < n_halves; ++h) {
      if (cls == 1) {
        const std::vector<int32_t>& sec = steep_secs[size_t(h)];
        items->insert(items->end(), sec.begin(), sec.end());
        end += int32_t(sec.size());
        isec[slot_base + h] = end;
        continue;
      }
      size_t count = 0;
      for (int64_t i = 0; i < n; ++i) {
        const int8_t ci = cls_of[size_t(i)];
        const bool take =
            ci == cls || (cls == 0 && ci == 1 && spill8[size_t(h)]);
        if (!take) continue;
        const int64_t x1 = g[i * 4], y1 = g[i * 4 + 1];
        const int64_t x2 = g[i * 4 + 2], y2 = g[i * 4 + 3];
        int64_t b0, nblk;
        if (!seg_sub_blocks(x1, y1, x2, y2, m, ts, h, 128, RB_I, &b0, &nblk))
          continue;
        for (int64_t p = 0; p < nblk; ++p)
          items->push_back(int32_t(i | ((b0 + p) << 8)));
        count += size_t(nblk);
      }
      // Pad with DUPLICATES of the last real item (the kernel emit is
      // an fmax, so re-evaluation is a no-op) — matches
      // render_pallas._stroke_items exactly.
      const size_t pad = count ? (4 - count % 4) % 4 : 0;
      for (size_t p = 0; p < pad; ++p) items->push_back(items->back());
      end += int32_t(count + pad);
      isec[slot_base + h] = end;
    }
    for (int h = n_halves; h < 4; ++h) isec[slot_base + h] = end;
  }
}

// ---------------------------------------------------------------------------
// The per-tile pipeline
// ---------------------------------------------------------------------------

struct PackGroup {
  std::vector<int> members;  // request indices
};

}  // namespace

extern "C" {

// Assemble one tile's styled primitives into chunk arrays.
//
// Inputs:
//   pts (n_pts, 2) i64 projected points, indexed by refs
//   refs (n_refs,) i64 indices into pts
//   rings (n_rings, 2) i64: (offset, length) into refs
//   req_* (R,): per-request metadata; req_rings (R, 2): ring off/cnt
//   prof_chain_free (n_profiles,) u8
// Outputs (capacity C_cap chunks, IT_CAP items each):
//   standard TileChunks fields + placeholder_req (-1 or request index)
// Returns the chunk count, or -1 if C_cap was too small.
int64_t osmr_assemble_tile(
    const int64_t* pts, const int64_t* refs, const int64_t* rings,
    int64_t n_rings_total, int32_t n_req, const uint8_t* req_kind,
    const int64_t* req_style_key, const double* req_color,
    const double* req_opacity, const double* req_hw,
    const int32_t* req_body_pidx, const int32_t* req_outer_pidx,
    const uint8_t* req_cap, const uint8_t* req_force_layer,
    const int32_t* req_pat, const int64_t* req_rings,
    const uint8_t* prof_chain_free, int32_t n_profiles, int32_t ts,
    int32_t view_px, int64_t C_cap,
    // outputs
    int32_t* o_geom /*C,4,CH*/, float* o_trav /*C,1,CH*/,
    int32_t* o_sprof /*C,1,CH*/, float* o_aux /*C,4,CH*/,
    int32_t* o_kind, int32_t* o_cnt, int32_t* o_last, int32_t* o_y0,
    int32_t* o_nb, int32_t* o_prim_y0, int32_t* o_prim_nb,
    float* o_color /*C,3*/, float* o_opacity, float* o_hw, int32_t* o_pat,
    int32_t* o_items /*C,IT_CAP*/, int32_t* o_item_len,
    int32_t* o_isec /*C,NSEC*/, int32_t* o_placeholder) {
  (void)n_rings_total;
  std::vector<Request> rq(n_req);
  std::vector<Built> built(n_req);

  for (int32_t r = 0; r < n_req; ++r) {
    Request& q = rq[r];
    q.kind = req_kind[r];
    q.style_key = req_style_key[r];
    q.color[0] = float(req_color[r * 3]);
    q.color[1] = float(req_color[r * 3 + 1]);
    q.color[2] = float(req_color[r * 3 + 2]);
    q.opacity = req_opacity[r];
    q.hw = req_hw[r];
    q.body_pidx = req_body_pidx[r];
    q.outer_pidx = req_outer_pidx[r];
    q.cap = req_cap[r];
    q.force_layer = req_force_layer[r];
    q.pat = req_pat[r];
    bool cf = true;
    if (q.body_pidx > 0)
      cf = cf && (q.body_pidx < n_profiles && prof_chain_free[q.body_pidx]);
    if (q.outer_pidx > 0)
      cf = cf && (q.outer_pidx < n_profiles && prof_chain_free[q.outer_pidx]);
    q.item_ok = cf ? 1 : 0;
  }

  // -- geometry building ----------------------------------------------------
  std::vector<int64_t> scratch_pairs;
  for (int32_t r = 0; r < n_req; ++r) {
    const int64_t ring_off = req_rings[r * 2];
    const int64_t ring_cnt = req_rings[r * 2 + 1];
    Built& b = built[r];
    if (rq[r].kind == 0) {
      // Fill: edges are consecutive point pairs per ring.
      for (int64_t k = 0; k < ring_cnt; ++k) {
        const int64_t off = rings[(ring_off + k) * 2];
        const int64_t len = rings[(ring_off + k) * 2 + 1];
        for (int64_t i = 0; i + 1 < len; ++i) {
          const int64_t a = refs[off + i], c = refs[off + i + 1];
          b.edges.insert(b.edges.end(),
                         {pts[a * 2], pts[a * 2 + 1], pts[c * 2],
                          pts[c * 2 + 1]});
        }
      }
    } else {
      // Stroke: single polyline ring.
      scratch_pairs.clear();
      for (int64_t k = 0; k < ring_cnt; ++k) {
        const int64_t off = rings[(ring_off + k) * 2];
        const int64_t len = rings[(ring_off + k) * 2 + 1];
        for (int64_t i = 0; i + 1 < len; ++i) {
          const int64_t a = refs[off + i], c = refs[off + i + 1];
          scratch_pairs.insert(scratch_pairs.end(),
                               {pts[a * 2], pts[a * 2 + 1], pts[c * 2],
                                pts[c * 2 + 1]});
        }
      }
      build_stroke(scratch_pairs.data(), int64_t(scratch_pairs.size() / 4),
                   rq[r], view_px, &b);
    }
  }

  // -- bboxes + oob routing (draw/packing.py) -------------------------------
  for (int32_t r = 0; r < n_req; ++r) {
    Built& b = built[r];
    const bool is_fill = rq[r].kind == 0;
    const std::vector<int64_t>& g = is_fill ? b.edges : b.segs;
    const int64_t n = int64_t(g.size() / 4);
    if (n == 0) {
      b.has_bb = false;
    } else {
      const int64_t margin =
          is_fill ? 0 : int64_t(std::ceil(rq[r].hw)) + 2;
      int64_t xlo = g[0], xhi = g[0], ylo = g[1], yhi = g[1];
      for (int64_t i = 0; i < n; ++i) {
        xlo = std::min({xlo, g[i * 4], g[i * 4 + 2]});
        xhi = std::max({xhi, g[i * 4], g[i * 4 + 2]});
        ylo = std::min({ylo, g[i * 4 + 1], g[i * 4 + 3]});
        yhi = std::max({yhi, g[i * 4 + 1], g[i * 4 + 3]});
      }
      b.bb[0] = xlo - margin;
      b.bb[1] = xhi + margin;
      b.bb[2] = ylo - margin;
      b.bb[3] = yhi + margin;
      b.has_bb = true;
      if (std::max(std::max(std::abs(b.bb[0]), std::abs(b.bb[1])),
                   std::max(std::abs(b.bb[2]), std::abs(b.bb[3]))) >=
          FAST_COORD_BOUND)
        b.oob = true;
    }
    if (rq[r].force_layer) b.oob = true;
    // Dashed strokes on far-reaching ways: phase exactness rule uses
    // the RAW (pre-cull) extent.
    if (!is_fill && rq[r].body_pidx > 0 && b.raw_absmax >= FAST_COORD_BOUND)
      b.oob = true;
  }

  // -- fill span extraction (only prims on the device span path) -----------
  for (int32_t r = 0; r < n_req; ++r) {
    if (rq[r].kind == 0 && !built[r].oob && !built[r].edges.empty())
      fill_spans(built[r].edges.data(), int64_t(built[r].edges.size() / 4),
                 ts, &built[r].spans);
  }

  // -- packing (draw/packing.py pack_prims) ---------------------------------
  std::vector<ChunkT> chunks;
  auto emit_fill_group = [&](const std::vector<int>& members, int kind,
                             int32_t pat, double op_override,
                             bool has_override) {
    // Concatenate members' spans, stable-sort by row, push one
    // generation (split at CH at emission).
    std::vector<std::array<int32_t, 3>> spans;
    for (int m : members) {
      const std::vector<int32_t>& s = built[m].spans;
      for (size_t i = 0; i < s.size(); i += 3)
        spans.push_back({s[i], s[i + 1], s[i + 2]});
    }
    if (spans.empty()) return;
    std::stable_sort(spans.begin(), spans.end(),
                     [](const std::array<int32_t, 3>& a,
                        const std::array<int32_t, 3>& b) {
                       return a[0] < b[0];
                     });
    const Request& q = rq[members[0]];
    const size_t S = spans.size();
    for (size_t off = 0; off < S; off += CH) {
      const size_t end = std::min(off + size_t(CH), S);
      ChunkT c;
      c.kind = kind;
      for (size_t i = off; i < end; ++i)
        c.geom.insert(c.geom.end(), {int64_t(spans[i][0]),
                                     int64_t(spans[i][1]),
                                     int64_t(spans[i][2]), 0});
      c.last = end == S;
      c.color[0] = q.color[0];
      c.color[1] = q.color[1];
      c.color[2] = q.color[2];
      c.opacity = float(has_override ? op_override : q.opacity);
      c.hw = 0.0;
      c.pat = pat;
      chunks.push_back(std::move(c));
    }
  };

  auto emit_stroke_group = [&](const std::vector<int>& members) {
    // Concatenate members' segments into one generation, split at CH.
    const Request& q = rq[members[0]];
    std::vector<int64_t> segs;
    std::vector<double> travs;
    std::vector<int32_t> pidx;
    for (int m : members) {
      const Built& b = built[m];
      const int64_t n = int64_t(b.trav.size());
      segs.insert(segs.end(), b.segs.begin(), b.segs.end());
      for (int64_t i = 0; i < n; ++i) {
        travs.push_back(b.trav[i]);
        pidx.push_back(b.outer[i] ? rq[m].outer_pidx : rq[m].body_pidx);
      }
    }
    const int64_t S = int64_t(travs.size());
    if (S == 0) return;
    for (int64_t off = 0; off < S; off += CH) {
      const int64_t end = std::min(off + int64_t(CH), S);
      ChunkT c;
      c.kind = KIND_STROKE;
      c.geom.assign(segs.begin() + off * 4, segs.begin() + end * 4);
      for (int64_t i = off; i < end; ++i) {
        c.trav.push_back(float(travs[i]));
        c.prof.push_back(pidx[i]);
      }
      c.last = end == S;
      c.color[0] = q.color[0];
      c.color[1] = q.color[1];
      c.color[2] = q.color[2];
      c.opacity = float(q.opacity);
      c.hw = q.hw;
      c.pat = -1;
      chunks.push_back(std::move(c));
    }
  };

  auto emit_placeholder = [&](int r) {
    ChunkT c;
    c.kind = KIND_PLACEHOLDER;
    c.placeholder_req = r;
    c.last = true;  // a host layer is its own generation
    chunks.push_back(std::move(c));
  };

  int i = 0;
  while (i < n_req) {
    const int64_t key = rq[i].style_key;
    int j = i;
    while (j < n_req && rq[j].style_key == key) ++j;

    const bool is_fill_run = rq[i].kind == 0;
    std::vector<int> small, big;
    for (int k = i; k < j; ++k) {
      const int64_t len = int64_t(
          (is_fill_run ? built[k].edges.size() : built[k].segs.size()) / 4);
      if (built[k].oob || (is_fill_run && rq[k].pat >= 0 && built[k].oob)) {
        big.push_back(k);
      } else if (is_fill_run && rq[k].pat >= 0) {
        // Icon fills: own span chunk (KIND_FILL_IMAGE), not packed.
        big.push_back(k);
      } else if (is_fill_run) {
        (len > 0 ? small : big).push_back(k);
      } else if (len <= CH) {
        small.push_back(k);
      } else {
        big.push_back(k);
      }
    }

    auto emit_big = [&](int k) {
      if (built[k].oob) {
        emit_placeholder(k);
      } else if (is_fill_run && rq[k].pat >= 0) {
        emit_fill_group({k}, KIND_FILL_IMAGE, rq[k].pat, 1.0, true);
      } else if (is_fill_run) {
        emit_fill_group({k}, KIND_FILL, -1, 0.0, false);
      } else {
        emit_stroke_group({k});
      }
    };

    if (is_fill_run && !small.empty() && rq[i].opacity == 1.0) {
      emit_fill_group(small, KIND_FILL, -1, 0.0, false);
      for (int k : big) emit_big(k);
      i = j;
      continue;
    }

    // Spatial sort: (bb_ylo // 64, bb_xlo), stable.
    std::vector<int> with_bb;
    for (int k : small)
      if (built[k].has_bb) with_bb.push_back(k);
    std::stable_sort(with_bb.begin(), with_bb.end(), [&](int a, int b) {
      const int64_t ka = built[a].bb[2] >= 0 ? built[a].bb[2] / 64
                                             : (built[a].bb[2] - 63) / 64;
      const int64_t kb = built[b].bb[2] >= 0 ? built[b].bb[2] / 64
                                             : (built[b].bb[2] - 63) / 64;
      if (ka != kb) return ka < kb;
      return built[a].bb[0] < built[b].bb[0];
    });

    // First-fit pack with disjointness.
    struct Pack {
      std::vector<int> members;
      int64_t count = 0;
    };
    std::vector<Pack> packs;
    std::vector<std::pair<std::array<int64_t, 4>, int>> placed;  // bbox, pack
    for (int k : with_bb) {
      const std::array<int64_t, 4> bb = {built[k].bb[0], built[k].bb[1],
                                         built[k].bb[2], built[k].bb[3]};
      const int64_t cnt = int64_t(
          (is_fill_run ? built[k].edges.size() : built[k].segs.size()) / 4);
      std::vector<uint8_t> ok(packs.size());
      for (size_t p = 0; p < packs.size(); ++p)
        ok[p] = packs[p].count + cnt <= CH;
      for (const auto& pb : placed) {
        const std::array<int64_t, 4>& B = pb.first;
        const bool overlap = !(bb[1] < B[0] || B[1] < bb[0] ||
                               bb[3] < B[2] || B[3] < bb[2]);
        if (overlap) ok[pb.second] = 0;
      }
      int pi = -1;
      for (size_t p = 0; p < packs.size(); ++p)
        if (ok[p]) {
          pi = int(p);
          break;
        }
      if (pi < 0) {
        packs.push_back({});
        pi = int(packs.size()) - 1;
      }
      packs[pi].members.push_back(k);
      packs[pi].count += cnt;
      placed.push_back({bb, pi});
    }

    for (const Pack& p : packs) {
      if (is_fill_run)
        emit_fill_group(p.members, KIND_FILL, -1, 0.0, false);
      else
        emit_stroke_group(p.members);
    }
    for (int k : big) emit_big(k);
    i = j;
  }

  // -- _route_stroke_spans (tent lanes for alive solid strokes) -------------
  if (ts <= 512) {
    std::vector<ChunkT> routed;
    routed.reserve(chunks.size());
    for (ChunkT& c : chunks) {
      const int64_t n = int64_t(c.trav.size());
      bool solid = c.kind == KIND_STROKE && n > 0;
      if (solid)
        for (int64_t s = 0; s < n; ++s)
          if (c.prof[s]) {
            solid = false;
            break;
          }
      if (!solid) {
        routed.push_back(std::move(c));
        continue;
      }
      std::vector<uint8_t> sel(size_t(n), 0);
      std::vector<int64_t> gsel;
      bool any_rest = false;
      for (int64_t s = 0; s < n; ++s) {
        const int64_t* sg = c.geom.data() + s * 4;
        const bool alive = seg_all_alive(sg[0], sg[1], sg[2], sg[3], c.hw);
        const int64_t se =
            stroke_span_cost_est(sg[0], sg[1], sg[2], sg[3], c.hw, ts);
        const int64_t ie = stroke_item_count(sg, 1, c.hw, ts);
        if (alive && se <= SPAN_VS_ITEM * ie) {
          sel[size_t(s)] = 1;
          gsel.insert(gsel.end(), sg, sg + 4);
        } else {
          any_rest = true;
        }
      }
      std::vector<SpanLane> lanes;
      if (!gsel.empty())
        stroke_spans(gsel, c.hw, double(c.opacity), ts, &lanes);
      std::vector<ChunkT> pieces;
      // One chunk per CH lanes, full tile width, row-walk order (see
      // render_pallas._route_stroke_spans for the measured dead ends:
      // half sectioning and half re-ordering both lost to this).
      const int64_t S = int64_t(lanes.size());
      for (int64_t off = 0; off < S; off += CH) {
        const int64_t end = std::min<int64_t>(off + CH, S);
        ChunkT p;
        p.kind = KIND_STROKE_SPAN;
        for (int64_t s = off; s < end; ++s) {
          const SpanLane& L = lanes[size_t(s)];
          p.geom.insert(p.geom.end(), {L.y0, L.y1, L.xlo, L.xhi});
          p.trav.push_back(L.a);
          p.spanb.push_back(L.b);
          p.spanxc.push_back(L.xc);
          p.prof.push_back(0);
        }
        std::memcpy(p.color, c.color, sizeof(c.color));
        p.opacity = c.opacity;
        p.hw = c.hw;
        p.pat = c.pat;
        pieces.push_back(std::move(p));
      }
      if (any_rest) {
        ChunkT p;
        p.kind = KIND_STROKE;
        for (int64_t s = 0; s < n; ++s) {
          if (sel[size_t(s)]) continue;
          p.geom.insert(p.geom.end(), c.geom.begin() + s * 4,
                        c.geom.begin() + (s + 1) * 4);
          p.trav.push_back(c.trav[size_t(s)]);
          p.prof.push_back(c.prof[size_t(s)]);
        }
        std::memcpy(p.color, c.color, sizeof(c.color));
        p.opacity = c.opacity;
        p.hw = c.hw;
        p.pat = c.pat;
        pieces.push_back(std::move(p));
      }
      if (pieces.empty()) {
        // Nothing painted and no remainder: keep an empty span chunk so
        // the generation's `last` still blends.
        ChunkT p;
        p.kind = KIND_STROKE_SPAN;
        std::memcpy(p.color, c.color, sizeof(c.color));
        p.opacity = c.opacity;
        p.hw = c.hw;
        p.pat = c.pat;
        pieces.push_back(std::move(p));
      }
      for (size_t pi = 0; pi < pieces.size(); ++pi) {
        pieces[pi].last = (pi + 1 == pieces.size()) ? c.last : false;
        routed.push_back(std::move(pieces[pi]));
      }
    }
    chunks = std::move(routed);
  }

  // -- _split_big_stroke_chunks (item budget) -------------------------------
  {
    std::vector<ChunkT> split;
    split.reserve(chunks.size());
    for (ChunkT& c : chunks) {
      const int64_t n = int64_t(c.trav.size());
      bool item_path = c.kind == KIND_STROKE && n > 0;
      if (item_path) {
        bool any_prof = false, all_cf = true;
        for (int64_t s = 0; s < n; ++s) {
          if (c.prof[s]) any_prof = true;
          if (c.prof[s] &&
              !(c.prof[s] < n_profiles && prof_chain_free[c.prof[s]]))
            all_cf = false;
        }
        if (any_prof && !all_cf) item_path = false;
      }
      if (!item_path || ts > 512) {
        split.push_back(std::move(c));
        continue;
      }
      // per-seg counts
      std::vector<int64_t> counts(n);
      int64_t tot = 0;
      for (int64_t s = 0; s < n; ++s) {
        counts[s] = stroke_item_count(c.geom.data() + s * 4, 1, c.hw, ts);
        tot += counts[s];
      }
      if (tot <= IT_CAP) {
        split.push_back(std::move(c));
        continue;
      }
      std::vector<int64_t> cum(n);
      int64_t acc = 0;
      for (int64_t s = 0; s < n; ++s) {
        acc += counts[s];
        cum[s] = acc;
      }
      int64_t start = 0;
      while (start < n) {
        const int64_t base = start ? cum[start - 1] : 0;
        // searchsorted(cum, base + IT_CAP, side="right")
        int64_t endi =
            std::upper_bound(cum.begin(), cum.end(), base + IT_CAP) -
            cum.begin();
        endi = std::max(endi, start + 1);
        const bool is_tail = endi >= n;
        ChunkT part;
        part.kind = c.kind;
        part.geom.assign(c.geom.begin() + start * 4,
                         c.geom.begin() + std::min(endi, n) * 4);
        part.trav.assign(c.trav.begin() + start,
                         c.trav.begin() + std::min(endi, n));
        part.prof.assign(c.prof.begin() + start,
                         c.prof.begin() + std::min(endi, n));
        part.last = is_tail ? c.last : false;
        std::memcpy(part.color, c.color, sizeof(c.color));
        part.opacity = c.opacity;
        part.hw = c.hw;
        part.pat = c.pat;
        split.push_back(std::move(part));
        start = endi;
      }
    }
    chunks = std::move(split);
  }

  // -- array emission (build_tile_chunks) -----------------------------------
  const int64_t n_chunks = std::max<int64_t>(int64_t(chunks.size()), 1);
  if (n_chunks > C_cap) return -1;

  std::memset(o_geom, 0, size_t(n_chunks) * 4 * CH * sizeof(int32_t));
  std::memset(o_trav, 0, size_t(n_chunks) * CH * sizeof(float));
  std::memset(o_sprof, 0, size_t(n_chunks) * CH * sizeof(int32_t));
  std::memset(o_aux, 0, size_t(n_chunks) * 4 * CH * sizeof(float));
  std::memset(o_kind, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_cnt, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_last, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_y0, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_nb, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_prim_y0, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_prim_nb, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_color, 0, size_t(n_chunks) * 3 * sizeof(float));
  std::memset(o_opacity, 0, size_t(n_chunks) * sizeof(float));
  std::memset(o_hw, 0, size_t(n_chunks) * sizeof(float));
  for (int64_t c = 0; c < n_chunks; ++c) o_pat[c] = -1;
  for (int64_t c = 0; c < n_chunks * IT_CAP; ++c) o_items[c] = -1;
  std::memset(o_item_len, 0, size_t(n_chunks) * sizeof(int32_t));
  std::memset(o_isec, 0, size_t(n_chunks) * NSEC * sizeof(int32_t));
  for (int64_t c = 0; c < n_chunks; ++c) o_placeholder[c] = -1;

  // chunk_meta: (b0, nblocks) per chunk.
  const int64_t NC = int64_t(chunks.size());
  std::vector<int64_t> meta_b0(NC, 0), meta_nb(NC, 0);
  for (int64_t ci = 0; ci < NC; ++ci) {
    const ChunkT& c = chunks[ci];
    const int64_t n = int64_t(c.geom.size() / 4);
    int64_t ylo = 0, yhi = 0;
    if (c.kind == KIND_STROKE_SPAN) {
      // Tent lanes: row range in columns 0 (y0) / 1 (y1).
      if (n) {
        ylo = c.geom[0];
        yhi = c.geom[1];
        for (int64_t s = 0; s < n; ++s) {
          ylo = std::min(ylo, c.geom[s * 4]);
          yhi = std::max(yhi, c.geom[s * 4 + 1]);
        }
      }
    } else if (c.kind == KIND_FILL || c.kind == KIND_FILL_IMAGE) {
      if (n) {
        ylo = yhi = c.geom[0];
        for (int64_t s = 0; s < n; ++s) {
          ylo = std::min(ylo, c.geom[s * 4]);
          yhi = std::max(yhi, c.geom[s * 4]);
        }
      }
    } else if (c.kind == KIND_STROKE) {
      if (n) {
        const int64_t m = int64_t(std::ceil(c.hw)) + 2;
        ylo = yhi = c.geom[1];
        for (int64_t s = 0; s < n; ++s) {
          ylo = std::min({ylo, c.geom[s * 4 + 1], c.geom[s * 4 + 3]});
          yhi = std::max({yhi, c.geom[s * 4 + 1], c.geom[s * 4 + 3]});
        }
        ylo -= m;
        yhi += m;
      }
    }
    ylo = std::max<int64_t>(std::min<int64_t>(ylo, ts - 1), 0);
    yhi = std::max<int64_t>(std::min<int64_t>(yhi, ts - 1), 0);
    meta_b0[ci] = ylo / RB_F;
    meta_nb[ci] = n ? yhi / RB_F - meta_b0[ci] + 1 : 0;
  }
  // prim_rows on last chunks.
  {
    int64_t start = 0;
    for (int64_t ci = 0; ci < NC; ++ci) {
      if (!chunks[ci].last) continue;
      int64_t p0 = INT64_MAX, pe = INT64_MIN;
      for (int64_t k = start; k <= ci; ++k) {
        if (meta_nb[k]) {
          p0 = std::min(p0, meta_b0[k]);
          pe = std::max(pe, meta_b0[k] + meta_nb[k]);
        }
      }
      if (p0 == INT64_MAX) {
        o_prim_y0[ci] = 0;
        o_prim_nb[ci] = 0;
      } else {
        o_prim_y0[ci] = int32_t(p0);
        o_prim_nb[ci] = int32_t(pe - p0);
      }
      start = ci + 1;
    }
  }

  for (int64_t ci = 0; ci < NC; ++ci) {
    const ChunkT& c = chunks[ci];
    const int64_t n = int64_t(c.geom.size() / 4);
    if (c.kind == KIND_PLACEHOLDER) {
      o_kind[ci] = 0;  // PAD until python replaces it
      o_placeholder[ci] = c.placeholder_req;
      continue;
    }
    o_kind[ci] = c.kind;
    o_cnt[ci] = int32_t(n);
    o_last[ci] = c.last ? 1 : 0;
    o_y0[ci] = int32_t(meta_b0[ci]);
    o_nb[ci] = int32_t(meta_nb[ci]);
    o_color[ci * 3] = c.color[0];
    o_color[ci * 3 + 1] = c.color[1];
    o_color[ci * 3 + 2] = c.color[2];
    o_opacity[ci] = c.opacity;
    o_hw[ci] = float(c.hw);
    o_pat[ci] = c.pat;
    int32_t* geom = o_geom + ci * 4 * CH;
    if (n && (c.kind == KIND_FILL || c.kind == KIND_FILL_IMAGE)) {
      for (int64_t s = 0; s < n; ++s) {
        geom[0 * CH + s] = int32_t(c.geom[s * 4]);
        geom[1 * CH + s] = int32_t(c.geom[s * 4 + 1]);
        geom[2 * CH + s] = int32_t(c.geom[s * 4 + 2]);
        geom[3 * CH + s] = int32_t(c.geom[s * 4 + 3]);
      }
      // Dead lanes cover nothing: no row match, empty x interval.
      for (int64_t s = n; s < CH; ++s) {
        geom[0 * CH + s] = -1;
        geom[1 * CH + s] = 1;
      }
    } else if (n && c.kind == KIND_STROKE_SPAN) {
      // Tent lanes: geometry (y0, y1, xlo, xhi); (a, b, xc) in the f32
      // aux lanes 0..2.  Pad lanes cover no row and an empty interval.
      float* aux = o_aux + ci * 4 * CH;
      for (int64_t s = 0; s < n; ++s) {
        geom[0 * CH + s] = int32_t(c.geom[s * 4]);
        geom[1 * CH + s] = int32_t(c.geom[s * 4 + 1]);
        geom[2 * CH + s] = int32_t(c.geom[s * 4 + 2]);
        geom[3 * CH + s] = int32_t(c.geom[s * 4 + 3]);
        aux[0 * CH + s] = c.trav[size_t(s)];
        aux[1 * CH + s] = c.spanb[size_t(s)];
        aux[2 * CH + s] = c.spanxc[size_t(s)];
      }
      for (int64_t s = n; s < CH; ++s) {
        geom[0 * CH + s] = -1;
        geom[1 * CH + s] = -2;
        geom[2 * CH + s] = 1;
      }
    } else if (n) {
      float* trav = o_trav + ci * CH;
      int32_t* sprof = o_sprof + ci * CH;
      float* aux = o_aux + ci * 4 * CH;
      bool any_prof = false, all_cf = true;
      for (int64_t s = 0; s < n; ++s) {
        geom[0 * CH + s] = int32_t(c.geom[s * 4]);
        geom[1 * CH + s] = int32_t(c.geom[s * 4 + 1]);
        geom[2 * CH + s] = int32_t(c.geom[s * 4 + 2]);
        geom[3 * CH + s] = int32_t(c.geom[s * 4 + 3]);
        trav[s] = c.trav[s];
        sprof[s] = c.prof[s];
        if (c.prof[s]) any_prof = true;
        if (c.prof[s] &&
            !(c.prof[s] < n_profiles && prof_chain_free[c.prof[s]]))
          all_cf = false;
        const int64_t dx = std::abs(c.geom[s * 4 + 2] - c.geom[s * 4]);
        const int64_t dy = std::abs(c.geom[s * 4 + 3] - c.geom[s * 4 + 1]);
        const int64_t mn = std::min(dx, dy);
        const int64_t mx = std::max(std::max(dx, dy), int64_t(1));
        const float den = std::sqrt(float(dx * dx + dy * dy));
        aux[0 * CH + s] = den > 0 ? 1.0f / std::max(den, 1e-9f) : 0.0f;
        aux[1 * CH + s] = float(mx * mx) / float(mx * mx + mn * mn);
        const int64_t cK = (2 * mx * mn + mx - 1) / (2 * mx);
        const int64_t gK = (2 * cK * mn + mx - 1) / (2 * mx);
        aux[2 * CH + s] = float(mx + gK);
      }
      const bool item_eligible =
          (!any_prof || all_cf) && ts <= 512;
      if (item_eligible) {
        o_kind[ci] = !any_prof ? KIND_STROKE_SOLID : KIND_STROKE_DASH;
        std::vector<int32_t> items;
        int32_t isec[NSEC];
        stroke_items(c.geom.data(), n, c.hw, ts, &items, isec);
        const int64_t ni = int64_t(items.size());
        for (int64_t t = 0; t < std::min<int64_t>(ni, IT_CAP); ++t)
          o_items[ci * IT_CAP + t] = items[t];
        o_item_len[ci] = int32_t(ni);
        std::memcpy(o_isec + ci * NSEC, isec, NSEC * sizeof(int32_t));
      }
    }
  }
  return NC ? NC : 1;
}

}  // extern "C"
