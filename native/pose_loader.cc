// Native host-side image loader for the pose_tpu input pipeline.
//
// Replaces the GIL-bound Python decode path: a persistent worker pool decodes
// JPEG files with libjpeg (the reference leaned on libjpeg-turbo via jpeg4py,
// datasets.py:5) and packs each frame into a zero-padded uint8 canvas slot of
// a caller-provided batch buffer, recording true (h, w) extents and the
// prescale factor folded into the warp homography when a source frame
// exceeds the canvas.
//
// Exposed as a C API consumed from Python via ctypes
// (pose_tpu/data/native_loader.py). Build: `make -C native`.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG into RGB; returns empty vector on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>* pixels, int* height,
                 int* width) {
  FILE* file = std::fopen(path, "rb");
  if (!file) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(file);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, file);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *height = cinfo.output_height;
  *width = cinfo.output_width;
  const int row_stride = cinfo.output_width * cinfo.output_components;
  pixels->resize(static_cast<size_t>(*height) * row_stride);

  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(file);
  return true;
}

// Area-average downscale (INTER_AREA-style) used only when a source frame
// exceeds the canvas; matches pose_tpu.data.crop.pad_to_canvas semantics.
void area_downscale(const std::vector<uint8_t>& src, int sh, int sw, int dh,
                    int dw, std::vector<uint8_t>* dst) {
  dst->assign(static_cast<size_t>(dh) * dw * 3, 0);
  const float fy = static_cast<float>(sh) / dh;
  const float fx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    const int y0 = static_cast<int>(y * fy);
    int y1 = static_cast<int>((y + 1) * fy);
    if (y1 <= y0) y1 = y0 + 1;
    for (int x = 0; x < dw; ++x) {
      const int x0 = static_cast<int>(x * fx);
      int x1 = static_cast<int>((x + 1) * fx);
      if (x1 <= x0) x1 = x0 + 1;
      int acc[3] = {0, 0, 0};
      int count = 0;
      for (int yy = y0; yy < y1 && yy < sh; ++yy) {
        for (int xx = x0; xx < x1 && xx < sw; ++xx) {
          const uint8_t* p = &src[(static_cast<size_t>(yy) * sw + xx) * 3];
          acc[0] += p[0];
          acc[1] += p[1];
          acc[2] += p[2];
          ++count;
        }
      }
      uint8_t* q = &(*dst)[(static_cast<size_t>(y) * dw + x) * 3];
      if (count > 0) {
        q[0] = static_cast<uint8_t>(acc[0] / count);
        q[1] = static_cast<uint8_t>(acc[1] / count);
        q[2] = static_cast<uint8_t>(acc[2] / count);
      }
    }
  }
}

class WorkerPool {
 public:
  explicit WorkerPool(int num_threads) : stop_(false) {
    for (int i = 0; i < num_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }

  ~WorkerPool() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lock(mu_);
      tasks_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      task();
    }
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Loader {
  WorkerPool pool;
  int canvas_h;
  int canvas_w;
  Loader(int threads, int ch, int cw)
      : pool(threads), canvas_h(ch), canvas_w(cw) {}
};

// Decode `path` into canvas slot `slot` of `out` (B, ch, cw, 3).
void decode_into_slot(Loader* loader, const char* path, uint8_t* out_slot,
                      int32_t* extent, float* prescale, int* status) {
  // prescale: TWO floats per sample — the realized (sy, sx) downscale
  // factors (independent floors realize slightly different per-axis
  // scales; averaging them misplaces source lookups sub-pixel)
  std::vector<uint8_t> pixels;
  int h = 0, w = 0;
  if (!decode_jpeg(path, &pixels, &h, &w)) {
    *status = 1;
    extent[0] = 0;
    extent[1] = 0;
    prescale[0] = 1.0f;
    prescale[1] = 1.0f;
    return;
  }

  const int ch = loader->canvas_h;
  const int cw = loader->canvas_w;
  float scale_y = 1.0f, scale_x = 1.0f;
  if (h > ch || w > cw) {
    // double-precision size math so nh/nw match the numpy fallback
    // (crop.pad_to_canvas computes in float64) on exact-ratio sources
    const double s = std::min(static_cast<double>(ch) / h,
                              static_cast<double>(cw) / w);
    const int nh = std::max(1, static_cast<int>(h * s));
    const int nw = std::max(1, static_cast<int>(w * s));
    std::vector<uint8_t> scaled;
    area_downscale(pixels, h, w, nh, nw, &scaled);
    scale_y = static_cast<float>(static_cast<double>(nh) / h);
    scale_x = static_cast<float>(static_cast<double>(nw) / w);
    pixels.swap(scaled);
    h = nh;
    w = nw;
  }

  std::memset(out_slot, 0, static_cast<size_t>(ch) * cw * 3);
  for (int y = 0; y < h; ++y) {
    std::memcpy(out_slot + static_cast<size_t>(y) * cw * 3,
                pixels.data() + static_cast<size_t>(y) * w * 3,
                static_cast<size_t>(w) * 3);
  }
  extent[0] = h;
  extent[1] = w;
  prescale[0] = scale_y;
  prescale[1] = scale_x;
  *status = 0;
}

}  // namespace

extern "C" {

void* pl_create(int num_threads, int canvas_h, int canvas_w) {
  return new Loader(num_threads, canvas_h, canvas_w);
}

void pl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Decode a batch of JPEG paths into out (n, canvas_h, canvas_w, 3) uint8,
// extents (n, 2) int32, prescales (n, 2) float32 (realized (sy, sx)
// downscale factors). Returns the number of failures (0 = all decoded).
int pl_decode_batch(void* handle, const char** paths, int n, uint8_t* out,
                    int32_t* extents, float* prescales) {
  Loader* loader = static_cast<Loader*>(handle);
  const size_t slot_size =
      static_cast<size_t>(loader->canvas_h) * loader->canvas_w * 3;

  std::vector<int> status(n, 0);
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;

  for (int i = 0; i < n; ++i) {
    loader->pool.Submit([=, &status, &remaining, &done_mu, &done_cv] {
      decode_into_slot(loader, paths[i], out + slot_size * i, extents + 2 * i,
                       prescales + 2 * i, &status[i]);
      if (remaining.fetch_sub(1) == 1) {
        std::unique_lock<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }

  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return remaining.load() == 0; });

  int failures = 0;
  for (int s : status) failures += s;
  return failures;
}

}  // extern "C"

// ---------------------------------------------------------------- PNG depth

#include <png.h>

namespace {

// Decode a grayscale PNG (8- or 16-bit) into float32 scaled like
// matplotlib.image.imread (pose_tpu/data/loader.py imread): 16-bit / 65535,
// 8-bit / 255.
bool decode_png_gray(const char* path, std::vector<float>* pixels,
                     int* height, int* width) {
  FILE* file = std::fopen(path, "rb");
  if (!file) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, file) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(file);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) {
    std::fclose(file);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(file);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(file);
    return false;
  }
  png_init_io(png, file);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  const int bit_depth = png_get_bit_depth(png, info);
  const int color_type = png_get_color_type(png, info);

  // collapse everything to single-channel gray
  if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_RGBA ||
      color_type == PNG_COLOR_TYPE_PALETTE) {
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  }
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian; host is LE
  png_read_update_info(png, info);

  const size_t row_bytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> raw(static_cast<size_t>(h) * row_bytes);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = raw.data() + y * row_bytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(file);

  *height = h;
  *width = w;
  pixels->resize(static_cast<size_t>(h) * w);
  if (bit_depth == 16) {
    const uint16_t* src16 = reinterpret_cast<const uint16_t*>(raw.data());
    for (size_t i = 0; i < pixels->size(); ++i) {
      (*pixels)[i] = src16[i] / 65535.0f;
    }
  } else {
    for (size_t i = 0; i < pixels->size(); ++i) {
      (*pixels)[i] = raw[i] / 255.0f;
    }
  }
  return true;
}

void decode_png_into_slot(Loader* loader, const char* path, float* out_slot,
                          int32_t* extent, float* prescale, int* status) {
  std::vector<float> pixels;
  int h = 0, w = 0;
  if (!decode_png_gray(path, &pixels, &h, &w)) {
    *status = 1;
    extent[0] = 0;
    extent[1] = 0;
    prescale[0] = 1.0f;
    prescale[1] = 1.0f;
    return;
  }
  const int ch = loader->canvas_h;
  const int cw = loader->canvas_w;
  float scale_y = 1.0f, scale_x = 1.0f;
  if (h > ch || w > cw) {
    // nearest-subsample (NOT area-average: averaging depth across object
    // boundaries fabricates sensor values that exist nowhere in the scene);
    // matches pose_tpu.data.crop.pad_to_canvas's float path bit-for-bit
    // (double-precision index math, floor) and reports the realized
    // prescale for the caller to fold into depth_homography.
    const double s = std::min(static_cast<double>(ch) / h,
                              static_cast<double>(cw) / w);
    const int nh = std::max(1, static_cast<int>(h * s));
    const int nw = std::max(1, static_cast<int>(w * s));
    std::vector<float> scaled(static_cast<size_t>(nh) * nw);
    for (int y = 0; y < nh; ++y) {
      int sy = static_cast<int>(static_cast<double>(y) * h / nh);
      if (sy >= h) sy = h - 1;
      for (int x = 0; x < nw; ++x) {
        int sx = static_cast<int>(static_cast<double>(x) * w / nw);
        if (sx >= w) sx = w - 1;
        scaled[static_cast<size_t>(y) * nw + x] =
            pixels[static_cast<size_t>(sy) * w + sx];
      }
    }
    scale_y = static_cast<float>(static_cast<double>(nh) / h);
    scale_x = static_cast<float>(static_cast<double>(nw) / w);
    pixels.swap(scaled);
    h = nh;
    w = nw;
  }
  std::memset(out_slot, 0, sizeof(float) * static_cast<size_t>(ch) * cw);
  for (int y = 0; y < h; ++y) {
    std::memcpy(out_slot + static_cast<size_t>(y) * cw,
                pixels.data() + static_cast<size_t>(y) * w,
                sizeof(float) * w);
  }
  extent[0] = h;
  extent[1] = w;
  prescale[0] = scale_y;
  prescale[1] = scale_x;
  *status = 0;
}

}  // namespace

extern "C" {

// Decode a batch of grayscale PNG paths into out (n, canvas_h, canvas_w)
// float32 canvases (oversized frames nearest-subsampled with the realized
// per-axis (sy, sx) prescales reported, 2 floats/sample). Returns the
// number of decode failures.
int pl_decode_png_batch(void* handle, const char** paths, int n, float* out,
                        int32_t* extents, float* prescales) {
  Loader* loader = static_cast<Loader*>(handle);
  const size_t slot_size =
      static_cast<size_t>(loader->canvas_h) * loader->canvas_w;

  std::vector<int> status(n, 0);
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;

  for (int i = 0; i < n; ++i) {
    loader->pool.Submit([=, &status, &remaining, &done_mu, &done_cv] {
      decode_png_into_slot(loader, paths[i], out + slot_size * i,
                           extents + 2 * i, prescales + 2 * i, &status[i]);
      if (remaining.fetch_sub(1) == 1) {
        std::unique_lock<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return remaining.load() == 0; });

  int failures = 0;
  for (int s : status) failures += (s == 1);
  return failures;
}

}  // extern "C"
