// CPU oracle rasterizer for osm_renderer_tpu.
//
// A faithful, from-scratch C++ implementation of the reference
// renderer's per-tile draw semantics (dfyz/osm-renderer, src/draw/*):
//   - tile_pixels.rs: premultiplied-alpha f64 RGBA buffer over an
//     extended 3x3-tile canvas; two-phase writes with per-generation
//     max-alpha staging; src-over blending; label generations.
//   - fill.rs: even-odd scanline fill over Bresenham-rasterized edges
//     with the poisoned-vertex rule.
//   - line.rs + opacity_calculator.rs: Murphy-style thick-line walk
//     with per-pixel opacity = min(dash profile, distance feather),
//     round/square caps, dash arc-length continuity.
//   - font/rasterizer.rs: trapezoidal-coverage glyph scanline
//     accumulator used for text labels.
//
// This is the pixel-parity ground truth for both the host serving path
// (CPU fallback) and the JAX/Pallas device kernels.
//
// Exposed as a C API consumed via ctypes (see osm_renderer_tpu/draw/oracle.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

namespace {

constexpr int TILE_SIZE = 256;
constexpr int EXTENDED_TILE_SIZE = 3 * TILE_SIZE;

struct RgbaColor {
  double r = 0.0, g = 0.0, b = 0.0, a = 0.0;
};

RgbaColor premultiply(uint8_t r, uint8_t g, uint8_t b, double opacity) {
  auto f = [&](uint8_t c) { return opacity * (double(c) / 255.0); };
  return RgbaColor{f(r), f(g), f(b), opacity};
}

struct BoundingBox {
  int32_t min_x, max_x, min_y, max_y;
};

struct NextPixel {
  RgbaColor color;
  size_t generation = 0;
  bool present = false;
};

// --- TilePixels: staging + blending state for one tile ----------------------

class TilePixels {
 public:
  explicit TilePixels(size_t scale)
      : scaled_tile_size_(TILE_SIZE * scale),
        scaled_extended_tile_size_(EXTENDED_TILE_SIZE * scale) {
    const int32_t ts = int32_t(scaled_tile_size_);
    bb_ = BoundingBox{0, ts - 1, 0, ts - 1};
    labels_bb_ = BoundingBox{-ts, 2 * ts - 1, -ts, 2 * ts - 1};
    const size_t pixel_count =
        scaled_extended_tile_size_ * scaled_extended_tile_size_;
    pixels_.assign(pixel_count, kDefaultPixel);
    next_pixels_.assign(pixel_count, NextPixel{});
  }

  void Reset(bool has_canvas_color, uint8_t r, uint8_t g, uint8_t b) {
    const RgbaColor initial =
        has_canvas_color ? premultiply(r, g, b, 1.0) : kDefaultPixel;
    std::fill(pixels_.begin(), pixels_.end(), initial);
    for (auto& np : next_pixels_) np.present = false;
    generation_ = 0;
    label_generation_statuses_.clear();
  }

  void SetPixel(int32_t x, int32_t y, const RgbaColor& color) {
    int64_t idx = GlobalCoordsToIdx(x, y, /*for_labels=*/false);
    if (idx < 0) return;
    NextPixel& np = next_pixels_[size_t(idx)];
    bool from_same_generation = false;
    if (np.present && np.generation == generation_) {
      if (color.a > np.color.a) np.color = color;
      from_same_generation = true;
    }
    if (!from_same_generation) {
      BlendPixel(size_t(idx), /*for_labels=*/false);
      np.color = color;
      np.generation = generation_;
      np.present = true;
    }
  }

  // Returns false when the write collides with an earlier successful label.
  bool SetLabelPixel(int32_t x, int32_t y, const RgbaColor& color) {
    int64_t idx = GlobalCoordsToIdx(x, y, /*for_labels=*/true);
    if (idx < 0) return true;
    NextPixel& np = next_pixels_[size_t(idx)];
    const size_t label_generation = label_generation_statuses_.size();
    if (np.present && np.generation < label_generation &&
        label_generation_statuses_[np.generation]) {
      return false;
    }
    np.color = color;
    np.generation = label_generation;
    np.present = true;
    return true;
  }

  void BumpGeneration() { ++generation_; }

  void BumpLabelGeneration(bool succeeded) {
    label_generation_statuses_.push_back(succeeded ? 1 : 0);
  }

  void BlendUnfinishedPixels(bool for_labels) {
    for (size_t idx = 0; idx < next_pixels_.size(); ++idx) {
      BlendPixel(idx, for_labels);
    }
  }

  void ToRgbTriples(uint8_t* out) const {
    // Center tile window only; un-premultiply and truncate like `as u8`.
    size_t out_idx = 0;
    for (size_t y = scaled_tile_size_; y < 2 * scaled_tile_size_; ++y) {
      for (size_t x = scaled_tile_size_; x < 2 * scaled_tile_size_; ++x) {
        const RgbaColor& p = pixels_[LocalCoordsToIdx(x, y)];
        auto postdivide = [&](double val) -> uint8_t {
          const double mul = (p.a == 0.0) ? 0.0 : val / p.a;
          const double v = 255.0 * mul;
          if (!(v > 0.0)) return 0;  // NaN or <= 0
          if (v >= 255.0) return 255;
          return uint8_t(v);
        };
        out[out_idx++] = postdivide(p.r);
        out[out_idx++] = postdivide(p.g);
        out[out_idx++] = postdivide(p.b);
      }
    }
  }

  // Successful-label staging of the center window as premult RGBA.
  void ExportLabelLayer(double* out) const {
    size_t out_idx = 0;
    for (size_t y = scaled_tile_size_; y < 2 * scaled_tile_size_; ++y) {
      for (size_t x = scaled_tile_size_; x < 2 * scaled_tile_size_; ++x) {
        const NextPixel& np = next_pixels_[LocalCoordsToIdx(x, y)];
        const bool ok = np.present && np.generation < label_generation_statuses_.size() &&
                        label_generation_statuses_[np.generation];
        out[out_idx++] = ok ? np.color.r : 0.0;
        out[out_idx++] = ok ? np.color.g : 0.0;
        out[out_idx++] = ok ? np.color.b : 0.0;
        out[out_idx++] = ok ? np.color.a : 0.0;
      }
    }
  }

  const BoundingBox& bb() const { return bb_; }
  size_t dimension() const { return scaled_tile_size_; }

 private:
  int64_t GlobalCoordsToIdx(int32_t x, int32_t y, bool for_labels) const {
    const BoundingBox& bb = for_labels ? labels_bb_ : bb_;
    if (x < bb.min_x || x > bb.max_x || y < bb.min_y || y > bb.max_y) return -1;
    const size_t local_x = size_t(x - labels_bb_.min_x);
    const size_t local_y = size_t(y - labels_bb_.min_y);
    return int64_t(LocalCoordsToIdx(local_x, local_y));
  }

  size_t LocalCoordsToIdx(size_t x, size_t y) const {
    return y * scaled_extended_tile_size_ + x;
  }

  void BlendPixel(size_t idx, bool for_labels) {
    NextPixel& np = next_pixels_[idx];
    if (np.present) {
      if (!for_labels || label_generation_statuses_[np.generation]) {
        RgbaColor& old_pixel = pixels_[idx];
        const double keep = 1.0 - np.color.a;
        old_pixel.r = np.color.r + keep * old_pixel.r;
        old_pixel.g = np.color.g + keep * old_pixel.g;
        old_pixel.b = np.color.b + keep * old_pixel.b;
        old_pixel.a = np.color.a + keep * old_pixel.a;
      }
    }
    np.present = false;
  }

  static constexpr RgbaColor kDefaultPixel{0.0, 0.0, 0.0, 1.0};

  size_t scaled_tile_size_;
  size_t scaled_extended_tile_size_;
  BoundingBox bb_{}, labels_bb_{};
  std::vector<RgbaColor> pixels_;
  std::vector<NextPixel> next_pixels_;
  size_t generation_ = 0;
  std::vector<uint8_t> label_generation_statuses_;
};

// --- Scanline polygon fill (fill.rs) ----------------------------------------

struct FillEdge {
  int32_t x_min, x_max;
  bool poisoned;
};

// y -> (edge index -> accumulated span), keyed maps keep edge-idx order.
using EdgesByY = std::map<int32_t, std::map<size_t, FillEdge>>;

// Rasterize one contour edge with the stripped-down symmetric Bresenham
// (fill.rs:49-104), recording per-row x extents and the poisoned flag:
// the start pixel is poisoned iff p1.y <= p2.y, the end iff p2.y <= p1.y.
void FillRasterizeEdge(size_t edge_idx, int32_t x1, int32_t y1, int32_t x2,
                       int32_t y2, EdgesByY& y_to_edges, int32_t min_y,
                       int32_t max_y) {
  const int32_t dx = std::abs(x2 - x1);
  const int32_t dy = -std::abs(y2 - y1);
  const int32_t sx = (x1 < x2) ? 1 : -1;
  const int32_t sy = (y1 < y2) ? 1 : -1;

  int32_t err = dx + dy;
  int32_t cx = x1, cy = y1;

  while (true) {
    const bool is_start = (cx == x1 && cy == y1);
    const bool is_end = (cx == x2 && cy == y2);
    const bool is_poisoned =
        is_start ? (y1 <= y2) : (is_end ? (y2 <= y1) : false);

    if (cy >= min_y && cy <= max_y) {
      auto& row = y_to_edges[cy];
      auto it = row.find(edge_idx);
      if (it == row.end()) {
        row.emplace(edge_idx, FillEdge{cx, cx, is_poisoned});
      } else {
        FillEdge& e = it->second;
        e.x_min = std::min(e.x_min, cx);
        e.x_max = std::max(e.x_max, cx);
        e.poisoned = e.poisoned || is_poisoned;
      }
    }

    if (is_end) break;
    const int32_t e2 = 2 * err;
    if (e2 >= dy) {
      err += dy;
      cx += sx;
    }
    if (e2 <= dx) {
      err += dx;
      cy += sy;
    }
  }
}

struct IconData {
  const double* rgba = nullptr;  // premultiplied, 4 per pixel
  size_t width = 0, height = 0;
};

void FillContour(TilePixels& pixels, const int32_t* edges, size_t n_edges,
                 bool use_icon, uint8_t r, uint8_t g, uint8_t b, double opacity,
                 const IconData& icon) {
  EdgesByY y_to_edges;
  for (size_t i = 0; i < n_edges; ++i) {
    FillRasterizeEdge(i, edges[4 * i], edges[4 * i + 1], edges[4 * i + 2],
                      edges[4 * i + 3], y_to_edges, pixels.bb().min_y,
                      pixels.bb().max_y);
  }

  std::vector<const FillEdge*> good_edges;
  for (const auto& [y, row] : y_to_edges) {
    good_edges.clear();
    for (const auto& [idx, e] : row) {
      if (!e.poisoned) good_edges.push_back(&e);
    }
    std::stable_sort(good_edges.begin(), good_edges.end(),
                     [](const FillEdge* a, const FillEdge* b) {
                       return a->x_min < b->x_min;
                     });
    for (size_t i = 0; i + 1 < good_edges.size(); i += 2) {
      const int32_t from_x = std::max(good_edges[i]->x_min, pixels.bb().min_x);
      const int32_t to_x =
          std::min(good_edges[i + 1]->x_max, pixels.bb().max_x) + 1;
      for (int32_t x = from_x; x < to_x; ++x) {
        if (use_icon) {
          // Tiled fill image: icon pixel by coordinate modulo (fill.rs:36-40).
          const size_t ix = size_t(x) % icon.width;
          const size_t iy = size_t(y) % icon.height;
          const double* px = icon.rgba + 4 * (iy * icon.width + ix);
          pixels.SetPixel(x, y, RgbaColor{px[0], px[1], px[2], px[3]});
        } else {
          pixels.SetPixel(x, y, premultiply(r, g, b, opacity));
        }
      }
    }
  }
}

// --- Dash / feather opacity (opacity_calculator.rs) -------------------------

enum class LineCap { kButt = 0, kRound = 1, kSquare = 2 };

bool IsNonTrivialCap(int cap) {
  return cap == int(LineCap::kRound) || cap == int(LineCap::kSquare);
}

struct DashSegment {
  double start_from, start_to, end_from, end_to;
  double opacity_mul;
  bool has_original;
  double orig_a, orig_b;
};

class OpacityCalculator {
 public:
  OpacityCalculator(double half_line_width, const double* dashes,
                    int64_t n_dashes, int cap)
      : half_line_width_(half_line_width) {
    if (n_dashes >= 0) {
      ComputeSegments(dashes, size_t(n_dashes), cap);
    }
  }

  void AddTraveledDistance(double d) { traveled_distance_ += d; }

  struct Result {
    double opacity;
    bool is_in_line;
  };

  Result Calculate(double center_distance, double start_distance) const {
    double sd_opacity = 1.0;
    bool has_cap_dist = false;
    double cap_dist = 0.0;
    if (!segments_.empty()) {
      double dist_rem = traveled_distance_ + start_distance;
      if (total_dash_len_ > 0.0) dist_rem = std::fmod(dist_rem, total_dash_len_);
      sd_opacity = 0.0;
      for (const DashSegment& d : segments_) {
        double op;
        if (!SegmentOpacity(dist_rem, d, &op)) continue;
        sd_opacity = std::fmax(sd_opacity, op);
        if (d.has_original) {
          const double c = DistanceInCap(dist_rem, d);
          if (!has_cap_dist || c < cap_dist) {
            has_cap_dist = true;
            cap_dist = c;
          }
        }
      }
    }
    const double cd = has_cap_dist ? cap_dist : 0.0;
    const double hw =
        std::sqrt(half_line_width_ * half_line_width_ - cd * cd);
    const double cd_opacity = OpacityByCenterDistance(center_distance, hw);
    return Result{std::fmin(sd_opacity, cd_opacity), cd_opacity > 0.0};
  }

 private:
  void ComputeSegments(const double* dashes, size_t n, int cap) {
    // The first dash is processed twice so the very first cap isn't
    // missed (opacity_calculator.rs:98-143).
    for (size_t pass = 0; pass < n + (n > 0 ? 1 : 0); ++pass) {
      const size_t idx = (pass < n) ? pass : 0;
      const double dash = dashes[idx];
      double start = total_dash_len_;
      if (idx != 0 || segments_.empty()) total_dash_len_ += dash;
      if (idx % 2 != 0) continue;
      double end = start + dash;

      const bool has_original = (cap == int(LineCap::kRound));
      const double orig_a = start, orig_b = end;
      if (IsNonTrivialCap(cap)) {
        start -= half_line_width_;
        end += half_line_width_;
      }
      const double midpoint = (start + end) / 2.0;
      segments_.push_back(DashSegment{
          std::min(start - 0.5, midpoint - 1.0),
          std::min(start + 0.5, midpoint),
          std::max(end - 0.5, midpoint),
          std::max(end + 0.5, midpoint + 1.0),
          std::min(end - start, 1.0),
          has_original, orig_a, orig_b});
    }
  }

  static bool SegmentOpacity(double dist, const DashSegment& seg, double* out) {
    double base;
    if (dist < seg.start_from || dist > seg.end_to) return false;
    if (dist <= seg.start_to) {
      base = (dist - seg.start_from) / (seg.start_to - seg.start_from);
    } else if (dist < seg.end_from) {
      base = 1.0;
    } else {
      base = (seg.end_to - dist) / (seg.end_to - seg.end_from);
    }
    *out = seg.opacity_mul * base;
    return true;
  }

  static double DistanceInCap(double dist, const DashSegment& seg) {
    if (dist < seg.orig_a) return seg.orig_a - dist;
    if (dist <= seg.orig_b) return 0.0;
    return dist - seg.orig_b;
  }

  static double OpacityByCenterDistance(double center_distance,
                                        double half_line_width) {
    // Rust's f64::min/max ignore NaN operands (relevant when the round-cap
    // circle equation yields sqrt of a negative) — hence fmin/fmax.
    const double feather_from = std::fmax(half_line_width - 0.5, 0.0);
    const double feather_to = std::fmax(half_line_width + 0.5, 1.0);
    const double feather_dist = feather_to - feather_from;
    const double opacity_mul = std::fmin(2.0 * half_line_width, 1.0);
    double v;
    if (center_distance < feather_from) {
      v = 1.0;
    } else if (center_distance < feather_to) {
      v = (feather_to - center_distance) / feather_dist;
    } else {
      v = 0.0;
    }
    return opacity_mul * v;
  }

  double half_line_width_;
  std::vector<DashSegment> segments_;
  double total_dash_len_ = 0.0;
  double traveled_distance_ = 0.0;
};

// --- Murphy-style anti-aliased thick line (line.rs) -------------------------

double PointDist(int32_t ax, int32_t ay, int32_t bx, int32_t by) {
  const double dx = double(ax - bx), dy = double(ay - by);
  return std::sqrt(dx * dx + dy * dy);
}

void DrawThickLine(TilePixels& pixels, int32_t p1x, int32_t p1y, int32_t p2x,
                   int32_t p2y, uint8_t r, uint8_t g, uint8_t b,
                   double initial_opacity, const OpacityCalculator& calc) {
  if (p1x == p2x && p1y == p2y) return;

  const int32_t dx = std::abs(p2x - p1x);
  const int32_t dy = std::abs(p2y - p1y);
  const bool swap_xy = dx > dy;  // walk the major axis

  // mn = minor coordinate, mx = major coordinate.
  int32_t mn = swap_xy ? p1y : p1x;
  int32_t mx = swap_xy ? p1x : p1y;
  const int32_t mn_last = swap_xy ? p2y : p2x;
  const int32_t mx_last = swap_xy ? p2x : p2y;
  const int32_t mn_delta = swap_xy ? dy : dx;
  const int32_t mx_delta = swap_xy ? dx : dy;
  const int32_t x_inc = (p1x <= p2x) ? 1 : -1;
  const int32_t y_inc = (p1y <= p2y) ? 1 : -1;
  const int32_t mn_inc = swap_xy ? y_inc : x_inc;
  const int32_t mx_inc = swap_xy ? x_inc : y_inc;

  auto update_error = [&](int32_t& error) -> bool {
    bool corrected = false;
    if (error + 2 * mn_delta > mx_delta) {
      error -= 2 * mx_delta;
      corrected = true;
    }
    error += 2 * mn_delta;
    return corrected;
  };

  // Exact perpendicular distance via the integer cross product
  // (line.rs:102-105,116-118).
  const int64_t numer_const =
      int64_t(p2x) * int64_t(p1y) - int64_t(p2y) * int64_t(p1x);
  const int64_t sdx = int64_t(p2x) - int64_t(p1x);
  const int64_t sdy = int64_t(p2y) - int64_t(p1y);
  const double denom =
      std::sqrt(double(dx) * double(dx) + double(dy) * double(dy));

  auto draw_perpendiculars = [&](int32_t mn0, int32_t mx0, int32_t p_error) {
    for (int mul : {1, -1}) {
      int32_t p_mn = mx0;  // major coordinate along the perpendicular
      int32_t p_mx = mn0;  // minor coordinate along the perpendicular
      int32_t error = mul * p_error;
      while (true) {
        const int32_t px = swap_xy ? p_mn : p_mx;
        const int32_t py = swap_xy ? p_mx : p_mn;

        const int64_t numer =
            numer_const + sdy * int64_t(px) - sdx * int64_t(py);
        const double center_dist = std::abs(double(numer)) / denom;
        const double long_start = PointDist(px, py, p1x, p1y);
        const double short_start = std::sqrt(
            std::max(long_start * long_start - center_dist * center_dist, 0.0));

        const auto op = calc.Calculate(center_dist, short_start);
        if (!op.is_in_line) break;
        pixels.SetPixel(px, py,
                        premultiply(r, g, b, initial_opacity * op.opacity));

        if (update_error(error)) p_mn -= mul * mx_inc;
        p_mx += mul * mn_inc;
      }
    }
  };

  int32_t error = 0, p_error = 0;
  while (true) {
    draw_perpendiculars(mn, mx, p_error);
    if (mn == mn_last && mx == mx_last) break;
    if (update_error(error)) {
      mn += mn_inc;
      if (update_error(p_error)) {
        draw_perpendiculars(mn, mx, p_error);  // gap filler
      }
    }
    mx += mx_inc;
  }
}

void PushAwayFrom(int32_t sx, int32_t sy, int32_t ox, int32_t oy, double by,
                  int32_t* out_x, int32_t* out_y) {
  const double dist = PointDist(sx, sy, ox, oy);
  const double f = by / dist;
  *out_x = sx + int32_t(std::llround(double(sx - ox) * f));
  *out_y = sy + int32_t(std::llround(double(sy - oy) * f));
}

void DrawLines(TilePixels& pixels, const int32_t* pairs, size_t n_pairs,
               double width, uint8_t r, uint8_t g, uint8_t b, double opacity,
               const double* dashes, int64_t n_dashes, int cap,
               bool use_caps_for_dashes) {
  const double half_width = width / 2.0;
  const int cap_for_dashes = use_caps_for_dashes ? cap : int(LineCap::kButt);
  // A dashes pointer of nullptr means "no dashes" (n_dashes < 0).
  OpacityCalculator calc(half_width, dashes, n_dashes, cap_for_dashes);
  const double zero_dash = 0.0;
  OpacityCalculator outer_cap_calc(half_width, &zero_dash, 1, cap);

  const bool has_caps = IsNonTrivialCap(cap);

  for (size_t i = 0; i < n_pairs; ++i) {
    const int32_t p1x = pairs[4 * i], p1y = pairs[4 * i + 1];
    const int32_t p2x = pairs[4 * i + 2], p2y = pairs[4 * i + 3];

    DrawThickLine(pixels, p1x, p1y, p2x, p2y, r, g, b, opacity, calc);
    calc.AddTraveledDistance(PointDist(p1x, p1y, p2x, p2y));

    if ((p1x != p2x || p1y != p2y) && has_caps) {
      if (i == 0) {
        int32_t cx, cy;
        PushAwayFrom(p1x, p1y, p2x, p2y, half_width, &cx, &cy);
        DrawThickLine(pixels, p1x, p1y, cx, cy, r, g, b, opacity,
                      outer_cap_calc);
      }
      if (i + 1 == n_pairs) {
        int32_t cx, cy;
        PushAwayFrom(p2x, p2y, p1x, p1y, half_width, &cx, &cy);
        DrawThickLine(pixels, p2x, p2y, cx, cy, r, g, b, opacity,
                      outer_cap_calc);
      }
    }
  }
}

// --- Glyph scanline rasterizer (font/rasterizer.rs) -------------------------

struct Stripe {
  std::map<int32_t, double> a;  // exact per-pixel coverage areas
  std::map<int32_t, double> s;  // running winding deltas
};

class GlyphRasterizer {
 public:
  GlyphRasterizer(uint8_t r, uint8_t g, uint8_t b) : r_(r), g_(g), b_(b) {}

  void DrawLine(double x0, double y0, double x1, double y1) {
    const double delta = y1 - y0;
    if (delta == 0.0) return;
    const double sign = (y0 <= y1) ? 1.0 : -1.0;
    const double slope = (x1 - x0) / delta;
    const double inv_slope = 1.0 / slope;

    const double y_min = std::min(y0, y1);
    const double y_max = std::max(y0, y1);

    for (int32_t y = int32_t(std::floor(y_min)); y <= int32_t(std::floor(y_max));
         ++y) {
      Stripe& stripe = stripes_[y];
      const double y_bottom = std::max(double(y), y_min);
      const double y_top = std::min(double(y + 1), y_max);
      const double y_delta = y_top - y_bottom;

      const double x_at_bottom = x0 + (y_bottom - y0) * slope;
      const double x_at_top = x0 + (y_top - y0) * slope;

      const bool flip_edge = !(x_at_bottom <= x_at_top);
      const double x_smallest = flip_edge ? x_at_top : x_at_bottom;
      const double x_largest = flip_edge ? x_at_bottom : x_at_top;

      const int32_t x_to = int32_t(std::floor(x_largest));
      for (int32_t x = int32_t(std::floor(x_smallest)); x <= x_to; ++x) {
        const double x_left = std::max(double(x), x_smallest);
        const double x_next = double(x + 1);
        const double x_right = std::min(x_next, x_largest);

        double pixel_area = (x_next - x_right) * y_delta;
        const double trapezoid_width = x_right - x_left;
        if (trapezoid_width > 0.0) {
          const double y_at_left = y0 + (x_left - x0) * inv_slope;
          const double y_at_right = y0 + (x_right - x0) * inv_slope;
          const double trapezoid_height =
              flip_edge ? (y_top - y_at_left) + (y_top - y_at_right)
                        : (y_at_left - y_bottom) + (y_at_right - y_bottom);
          pixel_area += trapezoid_width * trapezoid_height / 2.0;
        }
        stripe.a[x] += sign * pixel_area;
      }
      stripe.s[x_to + 1] += sign * y_delta;
    }
  }

  void DrawQuad(double x0, double y0, double x1, double y1, double x2,
                double y2) {
    auto dist = [](double xa, double ya, double xb, double yb) {
      return std::hypot(std::abs(xa - xb), std::abs(ya - yb));
    };
    const double d01 = dist(x0, y0, x1, y1);
    const double d12 = dist(x1, y1, x2, y2);
    const double d02 = dist(x0, y0, x2, y2);
    if (d01 + d12 <= 1.0001 * d02) {
      DrawLine(x0, y0, x2, y2);
      return;
    }
    const double m01x = (x0 + x1) / 2.0, m01y = (y0 + y1) / 2.0;
    const double m12x = (x1 + x2) / 2.0, m12y = (y1 + y2) / 2.0;
    const double mx = (m01x + m12x) / 2.0, my = (m01y + m12y) / 2.0;
    DrawQuad(x0, y0, m01x, m01y, mx, my);
    DrawQuad(mx, my, m12x, m12y, x2, y2);
  }

  // Stripe-key bounding box of everything drawn: {x_min, x_max, y_min,
  // y_max}.  Returns false when nothing was drawn.
  bool Bounds(int32_t* out4) const {
    bool any = false;
    int32_t xmin = INT32_MAX, xmax = INT32_MIN;
    int32_t ymin = INT32_MAX, ymax = INT32_MIN;
    for (const auto& [y, stripe] : stripes_) {
      if (stripe.a.empty() && stripe.s.empty()) continue;
      any = true;
      ymin = std::min(ymin, y);
      ymax = std::max(ymax, y);
      if (!stripe.a.empty()) {
        xmin = std::min(xmin, stripe.a.begin()->first);
        xmax = std::max(xmax, stripe.a.rbegin()->first);
      }
      if (!stripe.s.empty()) {
        xmin = std::min(xmin, stripe.s.begin()->first);
        xmax = std::max(xmax, stripe.s.rbegin()->first);
      }
    }
    if (!any) return false;
    out4[0] = xmin;
    out4[1] = xmax;
    out4[2] = ymin;
    out4[3] = ymax;
    return true;
  }

  // Dense alpha export over the window [x0, x0+w) x [y0, y0+h): the
  // same min(a + running_s, 1) emission as SaveToFigure, zero where it
  // would emit nothing.  Used to bake glyph-atlas patches.
  void Export(int32_t x0, int32_t y0, size_t w, size_t h, double* out) const {
    std::fill(out, out + w * h, 0.0);
    for (const auto& [y, stripe] : stripes_) {
      if (y < y0 || y >= y0 + int32_t(h)) continue;
      if (stripe.a.empty() && stripe.s.empty()) continue;
      int32_t x_min = INT32_MAX, x_max = INT32_MIN;
      if (!stripe.a.empty()) {
        x_min = std::min(x_min, stripe.a.begin()->first);
        x_max = std::max(x_max, stripe.a.rbegin()->first);
      }
      if (!stripe.s.empty()) {
        x_min = std::min(x_min, stripe.s.begin()->first);
        x_max = std::max(x_max, stripe.s.rbegin()->first);
      }
      double s_acc = 0.0;
      for (int32_t x = x_min; x <= x_max; ++x) {
        auto s_it = stripe.s.find(x);
        if (s_it != stripe.s.end()) s_acc += s_it->second;
        double total = s_acc;
        auto a_it = stripe.a.find(x);
        if (a_it != stripe.a.end()) total += a_it->second;
        total = std::min(total, 1.0);
        if (total > 0.0 && x >= x0 && x < x0 + int32_t(w)) {
          out[size_t(y - y0) * w + size_t(x - x0)] = total;
        }
      }
    }
  }

  // Emits min(a + running_s, 1) as label alpha; aborts on collision.
  bool SaveToFigure(TilePixels& pixels) const {
    for (const auto& [y, stripe] : stripes_) {
      if (stripe.a.empty() && stripe.s.empty()) continue;
      int32_t x_min = INT32_MAX, x_max = INT32_MIN;
      if (!stripe.a.empty()) {
        x_min = std::min(x_min, stripe.a.begin()->first);
        x_max = std::max(x_max, stripe.a.rbegin()->first);
      }
      if (!stripe.s.empty()) {
        x_min = std::min(x_min, stripe.s.begin()->first);
        x_max = std::max(x_max, stripe.s.rbegin()->first);
      }
      double s_acc = 0.0;
      for (int32_t x = x_min; x <= x_max; ++x) {
        auto s_it = stripe.s.find(x);
        if (s_it != stripe.s.end()) s_acc += s_it->second;
        double total = s_acc;
        auto a_it = stripe.a.find(x);
        if (a_it != stripe.a.end()) total += a_it->second;
        total = std::min(total, 1.0);
        if (total > 0.0 &&
            !pixels.SetLabelPixel(x, y, premultiply(r_, g_, b_, total))) {
          return false;
        }
      }
    }
    return true;
  }

 private:
  std::map<int32_t, Stripe> stripes_;
  uint8_t r_, g_, b_;
};

}  // namespace

// --- C API ------------------------------------------------------------------

extern "C" {

void* osmr_tile_new(size_t scale) { return new TilePixels(scale); }

void osmr_tile_free(void* t) { delete static_cast<TilePixels*>(t); }

void osmr_tile_reset(void* t, int has_canvas_color, uint8_t r, uint8_t g,
                     uint8_t b) {
  static_cast<TilePixels*>(t)->Reset(has_canvas_color != 0, r, g, b);
}

void osmr_tile_bump_generation(void* t) {
  static_cast<TilePixels*>(t)->BumpGeneration();
}

void osmr_tile_bump_label_generation(void* t, int succeeded) {
  static_cast<TilePixels*>(t)->BumpLabelGeneration(succeeded != 0);
}

void osmr_tile_blend_unfinished(void* t, int for_labels) {
  static_cast<TilePixels*>(t)->BlendUnfinishedPixels(for_labels != 0);
}

void osmr_tile_to_rgb(void* t, uint8_t* out) {
  static_cast<TilePixels*>(t)->ToRgbTriples(out);
}

void osmr_tile_export_label_layer(void* t, double* out) {
  static_cast<TilePixels*>(t)->ExportLabelLayer(out);
}

void osmr_fill_contour_color(void* t, const int32_t* edges, size_t n_edges,
                             uint8_t r, uint8_t g, uint8_t b, double opacity) {
  FillContour(*static_cast<TilePixels*>(t), edges, n_edges, /*use_icon=*/false,
              r, g, b, opacity, IconData{});
}

void osmr_fill_contour_icon(void* t, const int32_t* edges, size_t n_edges,
                            const double* icon_rgba, size_t icon_w,
                            size_t icon_h) {
  IconData icon{icon_rgba, icon_w, icon_h};
  FillContour(*static_cast<TilePixels*>(t), edges, n_edges, /*use_icon=*/true,
              0, 0, 0, 0.0, icon);
}

void osmr_draw_lines(void* t, const int32_t* pairs, size_t n_pairs,
                     double width, uint8_t r, uint8_t g, uint8_t b,
                     double opacity, const double* dashes, int64_t n_dashes,
                     int line_cap, int use_caps_for_dashes) {
  DrawLines(*static_cast<TilePixels*>(t), pairs, n_pairs, width, r, g, b,
            opacity, dashes, n_dashes, line_cap, use_caps_for_dashes != 0);
}

// Returns 1 on success, 0 when the label collided and was aborted.
int osmr_label_icon(void* t, int32_t start_x, int32_t start_y, size_t w,
                    size_t h, const double* rgba_premult) {
  TilePixels& pixels = *static_cast<TilePixels*>(t);
  for (size_t x = 0; x < w; ++x) {
    for (size_t y = 0; y < h; ++y) {
      const double* px = rgba_premult + 4 * (y * w + x);
      if (!pixels.SetLabelPixel(start_x + int32_t(x), start_y + int32_t(y),
                                RgbaColor{px[0], px[1], px[2], px[3]})) {
        return 0;
      }
    }
  }
  return 1;
}

void* osmr_glyph_rasterizer_new(uint8_t r, uint8_t g, uint8_t b) {
  return new GlyphRasterizer(r, g, b);
}

void osmr_glyph_rasterizer_free(void* g) {
  delete static_cast<GlyphRasterizer*>(g);
}

void osmr_glyph_draw_line(void* g, double x0, double y0, double x1, double y1) {
  static_cast<GlyphRasterizer*>(g)->DrawLine(x0, y0, x1, y1);
}

void osmr_glyph_draw_quad(void* g, double x0, double y0, double x1, double y1,
                          double x2, double y2) {
  static_cast<GlyphRasterizer*>(g)->DrawQuad(x0, y0, x1, y1, x2, y2);
}

// Batched outline: ops are records of 7 doubles [kind, x0, y0, x1, y1,
// x2, y2]; kind 0 = line (x2/y2 unused), 1 = quad.  One call per glyph
// instead of one per curve (ctypes call overhead dominates otherwise).
void osmr_glyph_draw_path(void* g, const double* ops, size_t n_ops) {
  auto* gr = static_cast<GlyphRasterizer*>(g);
  for (size_t i = 0; i < n_ops; ++i) {
    const double* op = ops + 7 * i;
    if (op[0] == 0.0) {
      gr->DrawLine(op[1], op[2], op[3], op[4]);
    } else {
      gr->DrawQuad(op[1], op[2], op[3], op[4], op[5], op[6]);
    }
  }
}

int osmr_glyph_save(void* g, void* t) {
  return static_cast<GlyphRasterizer*>(g)->SaveToFigure(
             *static_cast<TilePixels*>(t))
             ? 1
             : 0;
}

int osmr_glyph_bounds(void* g, int32_t* out4) {
  return static_cast<GlyphRasterizer*>(g)->Bounds(out4) ? 1 : 0;
}

void osmr_glyph_export(void* g, int32_t x0, int32_t y0, size_t w, size_t h,
                       double* out) {
  static_cast<GlyphRasterizer*>(g)->Export(x0, y0, w, h, out);
}

}  // extern "C"

// Debug/test helper: evaluate the dash/feather opacity formula directly.
extern "C" void osmr_debug_opacity(double half_width, const double* dashes,
                                   int64_t n_dashes, int cap, double traveled,
                                   double center_distance, double start_distance,
                                   double* out_opacity, int* out_in_line) {
  OpacityCalculator calc(half_width, dashes, n_dashes, cap);
  calc.AddTraveledDistance(traveled);
  auto res = calc.Calculate(center_distance, start_distance);
  *out_opacity = res.opacity;
  *out_in_line = res.is_in_line ? 1 : 0;
}
