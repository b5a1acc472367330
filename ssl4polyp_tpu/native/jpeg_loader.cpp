// Native host-side JPEG decode + resize for the TPU input pipeline.
//
// The reference feeds its DataLoader workers with full-size PIL decodes
// followed by a torchvision resize.  Endoscopy frames are ~1158x1008 while
// the network consumes 224x224, so most of that decode work is wasted.
// This loader uses libjpeg's DCT-domain scaling (scale_num/8) to decode
// directly at the smallest size >= target, then bilinear-resizes to the
// exact target — typically 4-8x less IDCT work — across a std::thread pool.
//
// C ABI (consumed via ctypes from ssl4polyp_tpu.native):
//   decode_resize(path, out, out_h, out_w)            -> 0 on success
//   decode_resize_batch(paths, n, out, out_h, out_w, n_threads)
//       -> number of successful decodes; failed slots are zero-filled.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize (H, W, 3) uint8 -> (out_h, out_w, 3).
void bilinear_resize(const uint8_t* src, int src_h, int src_w,
                     uint8_t* dst, int dst_h, int dst_w) {
  const float scale_y = static_cast<float>(src_h) / dst_h;
  const float scale_x = static_cast<float>(src_w) / dst_w;
  for (int y = 0; y < dst_h; ++y) {
    // Pixel-center convention matching PIL's bilinear resize.
    float fy = (y + 0.5f) * scale_y - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < src_h ? y0 + 1 : src_h - 1;
    float wy = fy - y0;
    for (int x = 0; x < dst_w; ++x) {
      float fx = (x + 0.5f) * scale_x - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      int x1 = x0 + 1 < src_w ? x0 + 1 : src_w - 1;
      float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * src_w + x0) * 3;
      const uint8_t* p01 = src + (y0 * src_w + x1) * 3;
      const uint8_t* p10 = src + (y1 * src_w + x0) * 3;
      const uint8_t* p11 = src + (y1 * src_w + x1) * 3;
      uint8_t* out = dst + (y * dst_w + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = p00[c] * (1 - wy) * (1 - wx) + p01[c] * (1 - wy) * wx +
                  p10[c] * wy * (1 - wx) + p11[c] * wy * wx;
        out[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success, nonzero on failure.  `out` must hold out_h*out_w*3.
int decode_resize(const char* path, uint8_t* out, int out_h, int out_w) {
  FILE* file = std::fopen(path, "rb");
  if (!file) return 1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<uint8_t> decoded;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(file);
    return 2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, file);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain downscale: smallest N/8 scale whose output still covers the
  // target in both dimensions.
  cinfo.scale_num = 8;
  cinfo.scale_denom = 8;
  for (int num = 1; num <= 8; ++num) {
    long sw = (static_cast<long>(cinfo.image_width) * num + 7) / 8;
    long sh = (static_cast<long>(cinfo.image_height) * num + 7) / 8;
    if (sw >= out_w && sh >= out_h) {
      cinfo.scale_num = num;
      break;
    }
  }

  jpeg_start_decompress(&cinfo);
  const int src_w = cinfo.output_width;
  const int src_h = cinfo.output_height;
  const int channels = cinfo.output_components;
  if (channels != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(file);
    return 3;
  }
  decoded.resize(static_cast<size_t>(src_w) * src_h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = decoded.data() + static_cast<size_t>(cinfo.output_scanline) * src_w * 3;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(file);

  if (src_h == out_h && src_w == out_w) {
    std::memcpy(out, decoded.data(), static_cast<size_t>(out_h) * out_w * 3);
  } else {
    bilinear_resize(decoded.data(), src_h, src_w, out, out_h, out_w);
  }
  return 0;
}

// Decodes n files into a contiguous (n, out_h, out_w, 3) buffer using a
// thread pool.  Per-frame success is written to `status` (1 = decoded,
// 0 = failed; may be null).  Returns the number of successful decodes.
int decode_resize_batch_status(const char** paths, int n, uint8_t* out,
                               int out_h, int out_w, int n_threads,
                               uint8_t* status) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  const size_t frame_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    while (true) {
      int index = next.fetch_add(1);
      if (index >= n) break;
      uint8_t* slot = out + frame_bytes * index;
      const bool success = decode_resize(paths[index], slot, out_h, out_w) == 0;
      if (success) {
        ok.fetch_add(1);
      } else {
        std::memset(slot, 0, frame_bytes);
      }
      if (status) status[index] = success ? 1 : 0;
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

int decode_resize_batch(const char** paths, int n, uint8_t* out,
                        int out_h, int out_w, int n_threads) {
  return decode_resize_batch_status(paths, n, out, out_h, out_w, n_threads,
                                    nullptr);
}

}  // extern "C"
