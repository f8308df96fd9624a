// Native host-side data loader for snvc_tpu.
//
// Keeps the TPU fed without Python in the pixel path: decodes KITTI PNGs
// (libpng) directly into preallocated, padded batch buffers, in parallel
// across a thread pool, and bulk-reads velodyne .bin files.  Bound from
// Python via ctypes (snvc_tpu/data/native_loader.py).
//
// Build: g++ -O2 -shared -fPIC -o libsnvc_loader.so dataloader.cpp -lpng -lz -lpthread
//
// C ABI:
//   int  snvc_decode_png_rgb(const char* path, uint8_t* out, int oh, int ow);
//   int  snvc_decode_batch(const char** paths, int n, uint8_t* out,
//                          int oh, int ow, int n_threads);
//   long snvc_load_velodyne(const char* path, float* out, long max_floats);

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <png.h>
#include <thread>
#include <vector>

namespace {

// Decode one PNG into out[oh, ow, 3] (RGB, zero-padded / cropped).
int decode_png(const char* path, uint8_t* out, int oh, int ow) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  // row is constructed BEFORE setjmp: a longjmp back here must not skip
  // a live vector's destructor (the error path below returns normally, so
  // row is destroyed and the buffer is not leaked on malformed PNGs).
  std::vector<uint8_t> row;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 4;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize to 8-bit RGB
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  row.resize(png_get_rowbytes(png, info));
  const int copy_w = static_cast<int>(w) < ow ? static_cast<int>(w) : ow;
  const int copy_h = static_cast<int>(h) < oh ? static_cast<int>(h) : oh;
  for (int y = 0; y < static_cast<int>(h); ++y) {
    png_read_row(png, row.data(), nullptr);
    if (y < copy_h) {
      std::memcpy(out + static_cast<size_t>(y) * ow * 3, row.data(),
                  static_cast<size_t>(copy_w) * 3);
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

}  // namespace

extern "C" {

int snvc_decode_png_rgb(const char* path, uint8_t* out, int oh, int ow) {
  std::memset(out, 0, static_cast<size_t>(oh) * ow * 3);
  return decode_png(path, out, oh, ow);
}

int snvc_decode_batch(const char** paths, int n, uint8_t* out, int oh, int ow,
                      int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> rc(n, 0);
  std::vector<std::thread> workers;
  const size_t stride = static_cast<size_t>(oh) * ow * 3;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads) {
        rc[i] = snvc_decode_png_rgb(paths[i], out + stride * i, oh, ow);
      }
    });
  }
  for (auto& w : workers) w.join();
  for (int i = 0; i < n; ++i)
    if (rc[i]) return rc[i];
  return 0;
}

long snvc_load_velodyne(const char* path, float* out, long max_floats) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  long got = static_cast<long>(fread(out, sizeof(float), max_floats, fp));
  fclose(fp);
  return got;
}

}  // extern "C"
