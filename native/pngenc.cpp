// Native PNG encoder for the tile server's output path.
//
// The reference encodes tiles with the Rust `png` crate
// (png_writer.rs:4-21); at >1000 tiles/s/chip the encoder becomes the
// serving bottleneck, so this is the C++ "turbo path": scanline
// assembly with an Up filter plus libdeflate (2-3x faster than zlib at
// equal ratios, zlib-compatible stream).  Output is a standard
// 8-bit RGB PNG; pixel content is lossless regardless of level.

#include <libdeflate.h>

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
