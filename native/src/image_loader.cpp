// Native image loader + prefetcher for the TPU SLAM pipeline.
//
// Role: the reference does per-frame cv::imread on the tracking thread
// (test/test_vo.cpp:680) — synchronous disk + decode latency lands on the
// critical path. Here decode runs in a C++ thread pool that stays ahead of
// the consumer, so the host hands the device a ready frame every step.
//
// Formats: PNG (libpng, gray/rgb/16-bit -> 8-bit gray), PGM (P5), raw .npy
// (uint8/float32 2-D little-endian). Grayscale conversion uses the usual
// BT.601 luma weights.
//
// C ABI (consumed by trackingbench_slam_tpu/utils/native_loader.py via
// ctypes):
//   tbs_loader*  tbs_loader_create(const char** paths, int n,
//                                  int prefetch, int threads);
//   int          tbs_loader_get(tbs_loader*, int idx, unsigned char* out,
//                               int* h, int* w);       // 0 on success
//   int          tbs_loader_shape(tbs_loader*, int idx, int* h, int* w);
//   void         tbs_loader_destroy(tbs_loader*);
//   const char*  tbs_loader_error(tbs_loader*);

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> data;
  bool ok = false;
  std::string err;
};

Image decode_png(const std::string& path) {
  Image img;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) {
    img.err = "open failed: " + path;
    return img;
  }
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    img.err = "not a png: " + path;
    return img;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    img.err = "png decode error: " + path;
    return img;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  const int channels = png_get_channels(png, info);
  std::vector<uint8_t> row(static_cast<size_t>(w) * channels);
  img.data.resize(static_cast<size_t>(w) * h);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    uint8_t* dst = img.data.data() + static_cast<size_t>(y) * w;
    if (channels == 1) {
      std::memcpy(dst, row.data(), w);
    } else {
      for (int x = 0; x < w; ++x) {
        const uint8_t* p = row.data() + static_cast<size_t>(x) * channels;
        dst[x] = static_cast<uint8_t>((299 * p[0] + 587 * p[1] + 114 * p[2]) / 1000);
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  img.h = h;
  img.w = w;
  img.ok = true;
  return img;
}

Image decode_pgm(const std::string& path) {
  Image img;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) {
    img.err = "open failed: " + path;
    return img;
  }
  char magic[3] = {0};
  int w = 0, h = 0, maxv = 0;
  if (std::fscanf(fp, "%2s", magic) != 1 || std::strcmp(magic, "P5") != 0) {
    std::fclose(fp);
    img.err = "not a P5 pgm: " + path;
    return img;
  }
  // skip comments
  int c;
  auto skip_ws = [&]() {
    while ((c = std::fgetc(fp)) != EOF) {
      if (c == '#') {
        while ((c = std::fgetc(fp)) != EOF && c != '\n') {
        }
      } else if (!std::isspace(c)) {
        std::ungetc(c, fp);
        break;
      }
    }
  };
  skip_ws();
  if (std::fscanf(fp, "%d", &w) != 1) goto fail;
  skip_ws();
  if (std::fscanf(fp, "%d", &h) != 1) goto fail;
  skip_ws();
  if (std::fscanf(fp, "%d", &maxv) != 1) goto fail;
  std::fgetc(fp);  // single whitespace
  img.data.resize(static_cast<size_t>(w) * h);
  if (std::fread(img.data.data(), 1, img.data.size(), fp) != img.data.size())
    goto fail;
  std::fclose(fp);
  img.h = h;
  img.w = w;
  img.ok = true;
  return img;
fail:
  std::fclose(fp);
  img.err = "pgm parse error: " + path;
  return img;
}

Image decode_npy(const std::string& path) {
  // minimal .npy v1 reader for 2-D uint8 / float32 C-order
  Image img;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) {
    img.err = "open failed: " + path;
    return img;
  }
  uint8_t magic[6];
  if (std::fread(magic, 1, 6, fp) != 6 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(fp);
    img.err = "not npy: " + path;
    return img;
  }
  uint8_t ver[2];
  uint16_t hlen;
  if (std::fread(ver, 1, 2, fp) != 2 || std::fread(&hlen, 2, 1, fp) != 1) {
    std::fclose(fp);
    img.err = "npy header: " + path;
    return img;
  }
  std::string hdr(hlen, '\0');
  if (std::fread(hdr.data(), 1, hlen, fp) != hlen) {
    std::fclose(fp);
    img.err = "npy header read: " + path;
    return img;
  }
  const bool is_u8 = hdr.find("'|u1'") != std::string::npos;
  const bool is_f32 = hdr.find("'<f4'") != std::string::npos;
  auto sh = hdr.find("'shape': (");
  int h = 0, w = 0;
  if (sh == std::string::npos ||
      std::sscanf(hdr.c_str() + sh, "'shape': (%d, %d)", &h, &w) != 2 ||
      (!is_u8 && !is_f32)) {
    std::fclose(fp);
    img.err = "npy unsupported dtype/shape: " + path;
    return img;
  }
  img.data.resize(static_cast<size_t>(h) * w);
  if (is_u8) {
    if (std::fread(img.data.data(), 1, img.data.size(), fp) != img.data.size()) {
      std::fclose(fp);
      img.err = "npy data: " + path;
      return img;
    }
  } else {
    std::vector<float> buf(static_cast<size_t>(h) * w);
    if (std::fread(buf.data(), 4, buf.size(), fp) != buf.size()) {
      std::fclose(fp);
      img.err = "npy data: " + path;
      return img;
    }
    for (size_t i = 0; i < buf.size(); ++i) {
      float v = buf[i];
      if (v < 0) v = 0;
      if (v > 255) v = 255;
      img.data[i] = static_cast<uint8_t>(v);
    }
  }
  std::fclose(fp);
  img.h = h;
  img.w = w;
  img.ok = true;
  return img;
}

Image decode(const std::string& path) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot);
  for (auto& ch : ext) ch = static_cast<char>(std::tolower(ch));
  if (ext == ".png") return decode_png(path);
  if (ext == ".pgm") return decode_pgm(path);
  if (ext == ".npy") return decode_npy(path);
  Image img;
  img.err = "unsupported extension: " + path;
  return img;
}

}  // namespace

struct tbs_loader {
  std::vector<std::string> paths;
  int prefetch;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_work;
  std::map<int, Image> cache;
  std::atomic<int> cursor{0};  // consumer position (prefetch target base)
  int next_job = 0;
  bool stop = false;
  std::string last_error;

  void worker() {
    for (;;) {
      int job = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] {
          if (stop) return true;
          // next job within the prefetch window and not cached/claimed
          while (next_job < static_cast<int>(paths.size()) &&
                 cache.count(next_job)) {
            ++next_job;
          }
          return next_job < static_cast<int>(paths.size()) &&
                 next_job < cursor.load() + prefetch;
        });
        if (stop) return;
        job = next_job++;
        cache.emplace(job, Image{});  // claim
      }
      Image img = decode(paths[job]);
      {
        std::lock_guard<std::mutex> lk(mu);
        cache[job] = std::move(img);
      }
      cv_ready.notify_all();
    }
  }
};

extern "C" {

tbs_loader* tbs_loader_create(const char** paths, int n, int prefetch,
                              int threads) {
  auto* ld = new tbs_loader();
  ld->paths.assign(paths, paths + n);
  ld->prefetch = prefetch > 0 ? prefetch : 4;
  const int nt = threads > 0 ? threads : 2;
  for (int i = 0; i < nt; ++i)
    ld->workers.emplace_back([ld] { ld->worker(); });
  ld->cv_work.notify_all();
  return ld;
}

int tbs_loader_shape(tbs_loader* ld, int idx, int* h, int* w) {
  if (idx < 0 || idx >= static_cast<int>(ld->paths.size())) return -1;
  std::unique_lock<std::mutex> lk(ld->mu);
  ld->cursor.store(std::max(ld->cursor.load(), idx));
  ld->cv_work.notify_all();
  // backward seek: the worker frontier (next_job) only moves forward, so a
  // previously evicted index must be decoded inline on the caller thread
  if (!ld->cache.count(idx) && idx < ld->next_job) {
    ld->cache.emplace(idx, Image{});  // claim
    lk.unlock();
    Image img = decode(ld->paths[idx]);
    lk.lock();
    ld->cache[idx] = std::move(img);
    ld->cv_ready.notify_all();
  }
  ld->cv_ready.wait(lk, [&] {
    auto it = ld->cache.find(idx);
    return it != ld->cache.end() && (it->second.ok || !it->second.err.empty());
  });
  const Image& img = ld->cache[idx];
  if (!img.ok) {
    ld->last_error = img.err;
    return -2;
  }
  *h = img.h;
  *w = img.w;
  return 0;
}

int tbs_loader_get(tbs_loader* ld, int idx, unsigned char* out, int* h,
                   int* w) {
  int rc = tbs_loader_shape(ld, idx, h, w);
  if (rc != 0) return rc;
  std::lock_guard<std::mutex> lk(ld->mu);
  Image& img = ld->cache[idx];
  std::memcpy(out, img.data.data(), img.data.size());
  // evict everything at or before idx (forward-streaming consumer)
  for (auto it = ld->cache.begin(); it != ld->cache.end();) {
    if (it->first <= idx)
      it = ld->cache.erase(it);
    else
      ++it;
  }
  ld->cursor.store(idx + 1);
  ld->cv_work.notify_all();
  return 0;
}

const char* tbs_loader_error(tbs_loader* ld) { return ld->last_error.c_str(); }

void tbs_loader_destroy(tbs_loader* ld) {
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->stop = true;
  }
  ld->cv_work.notify_all();
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
