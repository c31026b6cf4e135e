// Native PNG encoder for the tile server's output path.
//
// The reference encodes tiles with the Rust `png` crate
// (png_writer.rs:4-21); at >1000 tiles/s/chip the encoder becomes the
// serving bottleneck, so this is the C++ "turbo path": scanline
// assembly with an Up filter plus libdeflate (2-3x faster than zlib at
// equal ratios, zlib-compatible stream).  Output is a standard
// 8-bit RGB PNG; pixel content is lossless regardless of level.

#include <libdeflate.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

void put_u32_be(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v >> 24);
  p[1] = uint8_t(v >> 16);
  p[2] = uint8_t(v >> 8);
  p[3] = uint8_t(v);
}

size_t write_chunk(uint8_t* out, const char tag[4], const uint8_t* payload,
                   size_t n) {
  put_u32_be(out, uint32_t(n));
  std::memcpy(out + 4, tag, 4);
  if (n) std::memcpy(out + 8, payload, n);
  uint32_t crc = libdeflate_crc32(0, out + 4, n + 4);
  put_u32_be(out + 8 + n, crc);
  return 12 + n;
}

}  // namespace

extern "C" {

// Decode a device-produced run-length tile (ops/rle.py encoding:
// packed 0x00RRGGBB values + per-run length-1, row-major over h*w
// pixels) into an interleaved RGB8 buffer.  Returns 1 on success, 0 if
// the runs don't cover exactly h*w pixels.
int32_t osmr_rle_decode(const int32_t* vals, const int32_t* lens,
                        int32_t n_runs, int32_t h, int32_t w,
                        uint8_t* out_rgb) {
  const int64_t total = int64_t(h) * w;
  int64_t pos = 0;
  for (int32_t r = 0; r < n_runs; ++r) {
    const int64_t len = int64_t(lens[r]) + 1;
    if (pos + len > total) return 0;
    const uint32_t v = uint32_t(vals[r]);
    const uint8_t c0 = uint8_t(v >> 16), c1 = uint8_t(v >> 8), c2 = uint8_t(v);
    uint8_t* p = out_rgb + pos * 3;
    for (int64_t i = 0; i < len; ++i) {
      p[0] = c0;
      p[1] = c1;
      p[2] = c2;
      p += 3;
    }
    pos += len;
  }
  return pos == total ? 1 : 0;
}

// Decode one tile's slice of the batch-wide packed RLE stream
// (ops/rle.py encode_batch: one int32 per run, (len-1)<<24 | 0xRRGGBB,
// run length <= 256).  Returns 1 on success, 0 if the runs don't cover
// exactly h*w pixels.
int32_t osmr_rle_decode_packed(const int32_t* packed, int32_t n_runs,
                               int32_t h, int32_t w, uint8_t* out_rgb) {
  const int64_t total = int64_t(h) * w;
  int64_t pos = 0;
  for (int32_t r = 0; r < n_runs; ++r) {
    const uint32_t pv = uint32_t(packed[r]);
    const int64_t len = int64_t(pv >> 24) + 1;
    if (pos + len > total) return 0;
    const uint8_t c0 = uint8_t(pv >> 16), c1 = uint8_t(pv >> 8), c2 = uint8_t(pv);
    uint8_t* p = out_rgb + pos * 3;
    for (int64_t i = 0; i < len; ++i) {
      p[0] = c0;
      p[1] = c1;
      p[2] = c2;
      p += 3;
    }
    pos += len;
  }
  return pos == total ? 1 : 0;
}

// Decode one tile's slice of the INDEXED 16-bit-word wire (ops/rle.py
// encode_batch_words): palette run = one word (idx << 8 | len-1) with
// idx < 255 resolved through `table`; literal run = three words
// (0xFF00 | len-1, rgb_lo16, rgb_hi8).  Words arrive as an int32 array
// of packed pairs with a word offset.  Returns 1 on success, 0 if the
// runs don't cover exactly h*w pixels or words run out mid-literal.
int32_t osmr_rle_decode_words(const int32_t* packed32, int64_t word_off,
                              int32_t n_words, const int32_t* table,
                              int32_t h, int32_t w, uint8_t* out_rgb) {
  const int64_t total = int64_t(h) * w;
  int64_t pos = 0;
  int64_t i = word_off;
  const int64_t end = word_off + n_words;
  auto word_at = [&](int64_t k) -> uint32_t {
    const uint32_t pair = uint32_t(packed32[k >> 1]);
    return (k & 1) ? (pair >> 16) : (pair & 0xFFFF);
  };
  while (i < end) {
    const uint32_t hdr = word_at(i);
    const uint32_t pidx = hdr >> 8;
    const int64_t len = int64_t(hdr & 0xFF) + 1;
    uint32_t v;
    if (pidx == 0xFF) {
      if (i + 3 > end) return 0;
      v = word_at(i + 1) | ((word_at(i + 2) & 0xFF) << 16);
      i += 3;
    } else {
      v = uint32_t(table[pidx]);
      i += 1;
    }
    if (pos + len > total) return 0;
    const uint8_t c0 = uint8_t(v >> 16), c1 = uint8_t(v >> 8), c2 = uint8_t(v);
    uint8_t* p = out_rgb + pos * 3;
    for (int64_t k = 0; k < len; ++k) {
      p[0] = c0;
      p[1] = c1;
      p[2] = c2;
      p += 3;
    }
    pos += len;
  }
  return pos == total ? 1 : 0;
}

// Decode a v2 indexed word stream (ops/rle.py encode_batch_words
// layout: 16-bit words, header pidx<<8 | len-1, pidx 0xFF = 3-word
// literal escape) STRAIGHT to palette-index rows, extending the global
// palette with the tile's literal colors.  Returns the final palette
// size (<= 256), or 0 when the tile must take the RGB path (palette
// overflow / malformed stream).  plte must hold 256 int32 slots and
// comes back as 0x00RRGGBB entries.
int32_t osmr_rle_decode_words_idx(const int32_t* packed32, int64_t word_off,
                                  int32_t n_words, const int32_t* table,
                                  int32_t n_table, int32_t h, int32_t w,
                                  uint8_t* out_idx, int32_t* plte) {
  const int64_t total = int64_t(h) * w;
  // The PLTE holds only the colors THIS tile references (a tile uses
  // far fewer than the global 255-entry wire palette), so literal
  // escapes extend it freely up to 256 total.
  int32_t remap[256];
  for (int32_t k = 0; k < 256; ++k) remap[k] = -1;
  int32_t n_pal = 0;
  int64_t pos = 0;
  int64_t i = word_off;
  const int64_t end = word_off + n_words;
  auto word_at = [&](int64_t k) -> uint32_t {
    const uint32_t pair = uint32_t(packed32[k >> 1]);
    return (k & 1) ? (pair >> 16) : (pair & 0xFFFF);
  };
  while (i < end) {
    const uint32_t hdr = word_at(i);
    const uint32_t pidx = hdr >> 8;
    const int64_t len = int64_t(hdr & 0xFF) + 1;
    int32_t idx;
    if (pidx == 0xFF) {
      if (i + 3 > end) return 0;
      const int32_t v =
          int32_t(word_at(i + 1) | ((word_at(i + 2) & 0xFF) << 16));
      i += 3;
      idx = -1;
      for (int32_t k = 0; k < n_pal; ++k) {
        if (plte[k] == v) {
          idx = k;
          break;
        }
      }
      if (idx < 0) {
        if (n_pal >= 256) return 0;  // palette overflow: RGB path
        plte[n_pal] = v;
        idx = n_pal++;
      }
    } else {
      if (int32_t(pidx) >= n_table) return 0;
      idx = remap[pidx];
      if (idx < 0) {
        if (n_pal >= 256) return 0;
        plte[n_pal] = table[pidx];
        idx = remap[pidx] = n_pal++;
      }
      i += 1;
    }
    if (pos + len > total) return 0;
    std::memset(out_idx + pos, int(idx), size_t(len));
    pos += len;
  }
  return pos == total ? n_pal : 0;
}

// Palette (color type 3) PNG from index rows — the serving wire's
// adaptive <= 255-color palette IS a PLTE, so the encoder compresses
// 1 byte/px instead of 3 (reference role: png_writer.rs:4-21).
size_t osmr_png_encode_pal(const uint8_t* idx, int32_t h, int32_t w,
                           const int32_t* plte, int32_t n_pal, int32_t level,
                           uint8_t* out, size_t out_cap) {
  const size_t stride = size_t(w);
  const size_t raw_len = size_t(h) * (stride + 1);
  std::vector<uint8_t> raw(raw_len);
  // Filter 2 (Up): map tiles repeat vertically, so index rows mostly
  // cancel to zero.  First scanline uses filter 0.
  uint8_t* dst = raw.data();
  *dst++ = 0;
  std::memcpy(dst, idx, stride);
  dst += stride;
  for (int32_t y = 1; y < h; ++y) {
    *dst++ = 2;
    const uint8_t* cur = idx + size_t(y) * stride;
    const uint8_t* up = cur - stride;
    for (size_t i = 0; i < stride; ++i) dst[i] = uint8_t(cur[i] - up[i]);
    dst += stride;
  }

  libdeflate_compressor* comp = libdeflate_alloc_compressor(level);
  if (!comp) return 0;
  std::vector<uint8_t> idat(libdeflate_zlib_compress_bound(comp, raw_len));
  size_t idat_len = libdeflate_zlib_compress(comp, raw.data(), raw_len,
                                             idat.data(), idat.size());
  libdeflate_free_compressor(comp);
  if (idat_len == 0) return 0;

  const size_t plte_len = size_t(n_pal) * 3;
  const size_t total =
      8 + (12 + 13) + (12 + plte_len) + (12 + idat_len) + 12;
  if (total > out_cap) return 0;

  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  uint8_t* p = out;
  std::memcpy(p, kSig, 8);
  p += 8;
  uint8_t ihdr[13];
  put_u32_be(ihdr, uint32_t(w));
  put_u32_be(ihdr + 4, uint32_t(h));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 3;   // color type: palette
  ihdr[10] = 0;
  ihdr[11] = 0;
  ihdr[12] = 0;
  p += write_chunk(p, "IHDR", ihdr, 13);
  std::vector<uint8_t> plte_bytes(plte_len);
  for (int32_t k = 0; k < n_pal; ++k) {
    const uint32_t v = uint32_t(plte[k]);
    plte_bytes[size_t(k) * 3] = uint8_t(v >> 16);
    plte_bytes[size_t(k) * 3 + 1] = uint8_t(v >> 8);
    plte_bytes[size_t(k) * 3 + 2] = uint8_t(v);
  }
  p += write_chunk(p, "PLTE", plte_bytes.data(), plte_len);
  p += write_chunk(p, "IDAT", idat.data(), idat_len);
  p += write_chunk(p, "IEND", nullptr, 0);
  return size_t(p - out);
}

// src-over a compact premultiplied label patch (labeler.py
// _compact_label_layer: rgb*255 f64 + alpha f64, bbox-restricted) onto
// an RGB tile in place.  Bit-identical to the numpy expression
// clip(trunc(rgb255 + (1 - alpha) * base + 1e-9), 0, 255) — same f64
// operation order (tests/test_labels.py pins equality).
void osmr_label_composite(uint8_t* rgb, int32_t w, int32_t py0, int32_t py1,
                          int32_t px0, int32_t px1, const double* rgb255,
                          const double* alpha) {
  const int32_t pw = px1 - px0;
  for (int32_t y = py0; y < py1; ++y) {
    const double* prow = rgb255 + size_t(y - py0) * size_t(pw) * 3;
    const double* arow = alpha + size_t(y - py0) * size_t(pw);
    uint8_t* brow = rgb + (size_t(y) * size_t(w) + size_t(px0)) * 3;
    for (int32_t x = 0; x < pw; ++x) {
      const double keep = 1.0 - arow[x];
      for (int32_t c = 0; c < 3; ++c) {
        const double sub = prow[x * 3 + c] + keep * double(brow[x * 3 + c]);
        double v = std::trunc(sub + 1e-9);
        if (v < 0.0) v = 0.0;
        if (v > 255.0) v = 255.0;
        brow[x * 3 + c] = uint8_t(v);
      }
    }
  }
}

// rgb: h*w*3 bytes.  out must have capacity out_cap; returns the PNG
// size, or 0 if out_cap was too small.
size_t osmr_png_encode(const uint8_t* rgb, int32_t h, int32_t w,
                       int32_t level, uint8_t* out, size_t out_cap) {
  const size_t stride = size_t(w) * 3;
  const size_t raw_len = size_t(h) * (stride + 1);
  std::vector<uint8_t> raw(raw_len);
  // Filter 2 (Up): cheap and effective on maps' flat color runs.
  // First scanline uses filter 0 (no previous row).
  uint8_t* dst = raw.data();
  *dst++ = 0;
  std::memcpy(dst, rgb, stride);
  dst += stride;
  for (int32_t y = 1; y < h; ++y) {
    *dst++ = 2;
    const uint8_t* cur = rgb + size_t(y) * stride;
    const uint8_t* up = cur - stride;
    for (size_t i = 0; i < stride; ++i) dst[i] = uint8_t(cur[i] - up[i]);
    dst += stride;
  }

  libdeflate_compressor* comp = libdeflate_alloc_compressor(level);
  if (!comp) return 0;
  std::vector<uint8_t> idat(libdeflate_zlib_compress_bound(comp, raw_len));
  size_t idat_len = libdeflate_zlib_compress(comp, raw.data(), raw_len,
                                             idat.data(), idat.size());
  libdeflate_free_compressor(comp);
  if (idat_len == 0) return 0;

  const size_t total = 8 + (12 + 13) + (12 + idat_len) + 12;
  if (total > out_cap) return 0;

  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  uint8_t* p = out;
  std::memcpy(p, kSig, 8);
  p += 8;
  uint8_t ihdr[13];
  put_u32_be(ihdr, uint32_t(w));
  put_u32_be(ihdr + 4, uint32_t(h));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter method
  ihdr[12] = 0;  // interlace
  p += write_chunk(p, "IHDR", ihdr, 13);
  p += write_chunk(p, "IDAT", idat.data(), idat_len);
  p += write_chunk(p, "IEND", nullptr, 0);
  return size_t(p - out);
}

}  // extern "C"
