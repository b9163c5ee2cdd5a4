// Native data-loading runtime: threaded JPEG/PNG decode -> resize -> center
// crop -> [-1, 1] float32 NHWC batches.
//
// The reference feeds its trainer with PIL workers inside torch DataLoader
// processes (/root/reference/pit/data.py:48-54).  On TPU hosts the Python
// GIL + PIL decode is the input bottleneck at high images/sec; this library
// is the tpu-native equivalent of that native-data-path role: a C++ thread
// pool using libjpeg's DCT-domain scaled decode (1/2, 1/4, 1/8) so large
// photos are never fully decoded, plus separable bilinear resampling.
//
// C API (ctypes-friendly, see data/native_loader.py):
//   gvq_loader_create(paths, n_paths, image_size, batch, workers, shuffle,
//                     seed, drop_last) -> handle
//   gvq_loader_epoch(handle, epoch)        reshuffle + rewind
//   gvq_loader_next(handle, out, idx_out) -> items filled (0 = epoch end)
//   gvq_loader_destroy(handle)
//   gvq_decode_one(path, image_size, out) -> 0 on success   (single image)

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

// jpeglib.h requires stdio/stddef types to be declared first
#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
};

// ------------------------------------------------------------------ JPEG

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(const char* path, int target, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain downscale: largest 1/2^k with short side still >= target
  int denom = 1;
  const int short_side = std::min<int>(cinfo.image_width, cinfo.image_height);
  while (denom < 8 && short_side / (denom * 2) >= target) denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<uint8_t*> rows(cinfo.rec_outbuf_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    JSAMPROW rp = row;
    jpeg_read_scanlines(&cinfo, &rp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ------------------------------------------------------------------- PNG

bool decode_png(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);           // palette/gray->8bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

bool decode_any(const char* path, int target, Image* out) {
  const char* dot = strrchr(path, '.');
  if (dot && (!strcasecmp(dot, ".png"))) return decode_png(path, out);
  return decode_jpeg(path, target, out);
}

// ------------------------------------------------------- resize + crop

// antialiased separable triangle (bilinear) filter, PIL-style: the filter
// support scales with the downscale factor so decimation doesn't alias.
struct FilterTaps {
  std::vector<int> start;     // first source index per output pixel
  std::vector<int> count;     // taps per output pixel
  std::vector<float> weight;  // taps, max_count-strided
  int max_count = 0;
};

FilterTaps make_taps(int in_size, int out_size, int out_offset, int out_count) {
  FilterTaps t;
  const double scale = double(in_size) / out_size;
  const double support = scale < 1.0 ? 1.0 : scale;  // triangle radius
  t.max_count = int(std::ceil(support)) * 2 + 1;
  t.start.resize(out_count);
  t.count.resize(out_count);
  t.weight.assign(size_t(out_count) * t.max_count, 0.f);
  for (int o = 0; o < out_count; ++o) {
    const double center = (o + out_offset + 0.5) * scale;
    int lo = std::max(0, int(center - support + 0.5));
    int hi = std::min(in_size, int(center + support + 0.5));
    double total = 0.0;
    for (int i = lo; i < hi; ++i) {
      const double x = (i + 0.5 - center) / (scale < 1.0 ? 1.0 : scale);
      const double w = x < 0 ? 1.0 + x : 1.0 - x;  // triangle
      if (w > 0) total += w;
    }
    int n = 0;
    for (int i = lo; i < hi; ++i) {
      const double x = (i + 0.5 - center) / (scale < 1.0 ? 1.0 : scale);
      const double w = x < 0 ? 1.0 + x : 1.0 - x;
      if (w > 0) t.weight[size_t(o) * t.max_count + n++] = float(w / total);
    }
    t.start[o] = lo;
    t.count[o] = n;
  }
  return t;
}

void resize_crop_normalize(const Image& img, int target, float* out) {
  const double scale = double(target) / std::min(img.w, img.h);
  const int nw = std::max<int>(target, int(std::lround(img.w * scale)));
  const int nh = std::max<int>(target, int(std::lround(img.h * scale)));
  const int left = (nw - target) / 2;
  const int top = (nh - target) / 2;

  const FilterTaps tx = make_taps(img.w, nw, left, target);
  const FilterTaps ty = make_taps(img.h, nh, top, target);

  // horizontal pass into a (img.h, target) strip restricted to crop columns
  std::vector<float> strip(size_t(img.h) * target * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.data.data() + size_t(y) * img.w * 3;
    float* orow = strip.data() + size_t(y) * target * 3;
    for (int ox = 0; ox < target; ++ox) {
      float acc[3] = {0.f, 0.f, 0.f};
      const float* w = tx.weight.data() + size_t(ox) * tx.max_count;
      const uint8_t* src = row + size_t(tx.start[ox]) * 3;
      for (int k = 0; k < tx.count[ox]; ++k) {
        acc[0] += w[k] * src[3 * k];
        acc[1] += w[k] * src[3 * k + 1];
        acc[2] += w[k] * src[3 * k + 2];
      }
      orow[3 * ox] = acc[0];
      orow[3 * ox + 1] = acc[1];
      orow[3 * ox + 2] = acc[2];
    }
  }
  // vertical pass + normalize to [-1, 1]
  for (int oy = 0; oy < target; ++oy) {
    float* o = out + size_t(oy) * target * 3;
    std::memset(o, 0, sizeof(float) * target * 3);
    const float* w = ty.weight.data() + size_t(oy) * ty.max_count;
    for (int k = 0; k < ty.count[oy]; ++k) {
      const float* r = strip.data() + size_t(ty.start[oy] + k) * target * 3;
      const float wk = w[k];
      for (int i = 0; i < target * 3; ++i) o[i] += wk * r[i];
    }
    for (int i = 0; i < target * 3; ++i) o[i] = o[i] * (2.f / 255.f) - 1.f;
  }
}

// ------------------------------------------------------------- pipeline

struct Loader {
  std::vector<std::string> paths;
  std::vector<int32_t> order;
  int image_size, batch, workers;
  bool shuffle, drop_last;
  uint64_t seed;

  std::atomic<size_t> cursor{0};
  struct Item {
    std::vector<float> pix;
    int32_t index;
    bool ok;
  };
  std::deque<Item> queue;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};
  size_t max_queue;

  void worker() {
    while (!stop.load()) {
      const size_t i = cursor.fetch_add(1);
      if (i >= order.size()) return;
      Item it;
      it.index = order[i];
      it.pix.resize(size_t(image_size) * image_size * 3);
      Image img;
      it.ok = decode_any(paths[it.index].c_str(), image_size, &img) && img.w > 0;
      if (it.ok) resize_crop_normalize(img, image_size, it.pix.data());
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] { return queue.size() < max_queue || stop.load(); });
      if (stop.load()) return;
      queue.push_back(std::move(it));
      cv_get.notify_one();
    }
  }

  void start_epoch(uint64_t epoch) {
    join();
    order.resize(paths.size());
    for (size_t i = 0; i < paths.size(); ++i) order[i] = int32_t(i);
    if (shuffle) {
      std::mt19937_64 rng(seed + epoch);
      std::shuffle(order.begin(), order.end(), rng);
    }
    cursor = 0;
    stop = false;
    queue.clear();
    for (int t = 0; t < workers; ++t)
      threads.emplace_back([this] { worker(); });
  }

  void join() {
    stop = true;
    cv_put.notify_all();
    for (auto& t : threads)
      if (t.joinable()) t.join();
    threads.clear();
    stop = false;
  }

  // fills up to `batch` items; returns count (0 once the epoch is drained)
  int next(float* out, int32_t* idx_out) {
    int got = 0;
    while (got < batch) {
      std::unique_lock<std::mutex> lk(mu);
      const bool workers_done = cursor.load() >= order.size();
      if (!cv_get.wait_for(lk, std::chrono::milliseconds(50),
                           [&] { return !queue.empty(); })) {
        if (workers_done && queue.empty()) {
          bool all_idle = true;
          for (auto& t : threads) (void)t, all_idle = all_idle;
          // epoch drained
          break;
        }
        continue;
      }
      Item it = std::move(queue.front());
      queue.pop_front();
      cv_put.notify_one();
      lk.unlock();
      if (!it.ok) continue;  // skip undecodable files
      std::memcpy(out + size_t(got) * image_size * image_size * 3,
                  it.pix.data(), it.pix.size() * sizeof(float));
      if (idx_out) idx_out[got] = it.index;
      ++got;
    }
    if (drop_last && got < batch) return 0;
    return got;
  }
};

}  // namespace

extern "C" {

void* gvq_loader_create(const char** paths, int n_paths, int image_size,
                        int batch, int workers, int shuffle, uint64_t seed,
                        int drop_last) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n_paths);
  l->image_size = image_size;
  l->batch = batch;
  l->workers = std::max(1, workers);
  l->shuffle = shuffle != 0;
  l->drop_last = drop_last != 0;
  l->seed = seed;
  l->max_queue = size_t(batch) * 4;
  return l;
}

void gvq_loader_epoch(void* handle, uint64_t epoch) {
  static_cast<Loader*>(handle)->start_epoch(epoch);
}

int gvq_loader_next(void* handle, float* out, int32_t* idx_out) {
  return static_cast<Loader*>(handle)->next(out, idx_out);
}

void gvq_loader_destroy(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->join();
  delete l;
}

int gvq_decode_one(const char* path, int image_size, float* out) {
  Image img;
  if (!decode_any(path, image_size, &img) || img.w <= 0) return -1;
  resize_crop_normalize(img, image_size, out);
  return 0;
}

}  // extern "C"
