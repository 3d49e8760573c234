// Native data-loader: batch grayscale-PNG decoding for the volume pipeline.
//
// The reference's data layer decodes PNG slices through PIL one image at a
// time, per epoch (`create_dataset.py:46-60`).  This library decodes whole
// slice batches in C++ via libpng with no interpreter round-trips, feeding
// the framework's preloaded volume pool (data/volumes.py binds it through
// ctypes with a pure-PIL fallback).
//
// Exported C ABI (stable, ctypes-friendly):
//   v3d_decode_png_gray8(path, out, capacity, &w, &h) -> 0 | error code
//   v3d_decode_batch(paths, n, out, size)             -> 0 | (i+1) of the
//       first failing path; `out` is an (n, size, size) uint8 buffer; every
//       image must be exactly size x size 8-bit grayscale (the ProstateX
//       export format).
//   v3d_version() -> ABI version int

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kAbiVersion = 1;

// Decode one 8-bit grayscale PNG into `out` (row-major). Returns 0 on
// success. Non-grayscale / 16-bit inputs are converted to 8-bit gray.
int decode_one(const char* path, uint8_t* out, int expected_size) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 2;

  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return 3;
  }

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return 4;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return 4;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 5;
  }

  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  if (expected_size > 0 &&
      (width != static_cast<png_uint_32>(expected_size) ||
       height != static_cast<png_uint_32>(expected_size))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 6;
  }

  // normalize to 8-bit grayscale
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB ||
      color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y) rows[y] = out + y * width;
  png_read_image(png, rows.data());

  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

}  // namespace

extern "C" {

int v3d_version() { return kAbiVersion; }

int v3d_decode_png_gray8(const char* path, uint8_t* out, int expected_size) {
  return decode_one(path, out, expected_size);
}

// Decode n images into (n, size, size), in parallel (libpng read structs
// are per-call, so decodes are independent). Returns 0, or i+1 for the
// lowest-indexed path that failed.
int v3d_decode_batch(const char* const* paths, int n, uint8_t* out,
                     int size) {
  const size_t stride = static_cast<size_t>(size) * size;
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = static_cast<int>(hw ? hw : 4);
  if (n_threads > 16) n_threads = 16;  // spawn cost beats decode past this
  if (n_threads > n) n_threads = n;
  if (n_threads <= 1) {
    for (int i = 0; i < n; ++i) {
      if (decode_one(paths[i], out + stride * i, size) != 0) return i + 1;
    }
    return 0;
  }

  std::atomic<int> next(0);
  std::atomic<int> first_err(n);  // lowest failing index, n = none
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        if (i >= first_err.load(std::memory_order_relaxed)) break;
        if (decode_one(paths[i], out + stride * i, size) != 0) {
          int cur = first_err.load();
          while (i < cur && !first_err.compare_exchange_weak(cur, i)) {
          }
        }
      }
    });
  }
  for (auto& w : workers) w.join();
  int err = first_err.load();
  return err == n ? 0 : err + 1;
}

}  // extern "C"
