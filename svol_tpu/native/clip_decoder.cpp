// Native clip decoder: batched JPEG decode + bilinear resize for video clips.
//
// The reference's dataloader bottleneck is per-frame JPEG decode on Python
// workers (it is the phase its train loop times first, train.py:213;
// svol_dataset.py:203-207 opens T files through PIL one by one). This
// library decodes a whole clip in one call — one thread per frame, libjpeg
// (-turbo) directly, bilinear resize to the target square — removing the
// Python/GIL round trip per frame. Exposed to Python via ctypes
// (svol_tpu/native/__init__.py); falls back to OpenCV when unavailable.
//
// Build: g++ -O3 -fPIC -shared clip_decoder.cpp -o libclipdecoder.so -ljpeg -lpthread
#include <cstdio>
#include <cstdlib>
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

// Decode one JPEG file into an RGB buffer. Returns true on success.
bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb, int& w,
                 int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize (H, W, 3) uint8 -> (out_h, out_w, 3), cv2-compatible
// half-pixel sampling.
void resize_bilinear(const unsigned char* src, int sh, int sw,
                     unsigned char* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy);
    if (fy < 0) { fy = 0; y0 = 0; }
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx);
      if (fx < 0) { fx = 0; x0 = 0; }
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        const float v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
        const float v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
        const float v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
        const float v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
        const float top = v00 + (v01 - v00) * wx;
        const float bot = v10 + (v11 - v10) * wx;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<unsigned char>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode n JPEG files into out[n, out_h, out_w, 3] uint8 RGB.
// Returns 0 on success, or (1 + index) of the first file that failed.
int decode_clip(const char** paths, int n, int out_h, int out_w,
                unsigned char* out, int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  std::vector<int> status(n, 0);

  auto work = [&](int begin, int end) {
    std::vector<unsigned char> rgb;
    for (int i = begin; i < end; ++i) {
      int w = 0, h = 0;
      if (!decode_jpeg(paths[i], rgb, w, h)) {
        status[i] = 1;
        continue;
      }
      unsigned char* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      if (w == out_w && h == out_h) {
        std::memcpy(dst, rgb.data(), static_cast<size_t>(out_h) * out_w * 3);
      } else {
        resize_bilinear(rgb.data(), h, w, dst, out_h, out_w);
      }
    }
  };

  if (n_threads == 1 || n == 1) {
    work(0, n);
  } else {
    int n_workers = n_threads < n ? n_threads : n;
    std::vector<std::thread> threads;
    int per = (n + n_workers - 1) / n_workers;
    for (int t = 0; t < n_workers; ++t) {
      int begin = t * per;
      int end = begin + per < n ? begin + per : n;
      if (begin >= end) break;
      threads.emplace_back(work, begin, end);
    }
    for (auto& th : threads) th.join();
  }

  for (int i = 0; i < n; ++i) {
    if (status[i]) return i + 1;
  }
  return 0;
}

}  // extern "C"
