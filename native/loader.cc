// Threaded prefetching stereo-pair loader (SURVEY.md §3 #1: the native
// data path — the TPU pipeline should never wait on host file IO/decode).
//
// A pool of worker threads reads and decodes (left, right) image pairs
// `depth` frames ahead of the consumer, in submission order; the consumer
// blocks only when decode genuinely lags compute. Formats: PGM (P5, own
// decoder shared with tpustereo_native.cc's codec) and 8/16-bit gray or
// RGB(A) PNG via libpng (converted to 8-bit grayscale — KITTI odometry
// image_0/1 are grayscale PNGs).
//
// C API (ctypes-friendly; see tpustereo/native/__init__.py):
//   ts_prefetch_open(lpaths, rpaths, n, depth, workers) -> handle | NULL
//   ts_prefetch_dims(h, &lh, &lw, &rh, &rw) -> 0 | 1 end | <0 decode error
//       (blocks until the NEXT in-order pair is decoded)
//   ts_prefetch_take(h, lbuf, rbuf) -> 0   (copy pair, advance)
//   ts_prefetch_close(h)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> px;
  int32_t h = 0, w = 0;
  bool ok = false;
};

int skip_ws_comments_f(FILE *f) {
  int c = fgetc(f);
  while (c == '#' || c == ' ' || c == '\t' || c == '\n' || c == '\r') {
    if (c == '#') {
      while (c != '\n' && c != EOF) c = fgetc(f);
    }
    c = fgetc(f);
  }
  return c;
}

bool read_pgm_gray(const char *path, Image *out) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  if (fgetc(f) != 'P' || fgetc(f) != '5') { fclose(f); return false; }
  int c = skip_ws_comments_f(f);
  long w = 0, h = 0, maxval = 0;
  for (; c >= '0' && c <= '9'; c = fgetc(f)) w = w * 10 + (c - '0');
  c = skip_ws_comments_f(f);
  for (; c >= '0' && c <= '9'; c = fgetc(f)) h = h * 10 + (c - '0');
  c = skip_ws_comments_f(f);
  for (; c >= '0' && c <= '9'; c = fgetc(f)) maxval = maxval * 10 + (c - '0');
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) { fclose(f); return false; }
  out->w = (int32_t)w; out->h = (int32_t)h;
  out->px.resize((size_t)w * h);
  bool ok = fread(out->px.data(), 1, out->px.size(), f) == out->px.size();
  fclose(f);
  out->ok = ok;
  return ok;
}

bool read_png_gray(const char *path, Image *out) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) { fclose(f); return false; }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) { fclose(f); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(f); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_uint_32 w, h;
  int depth, color;
  png_get_IHDR(png, info, &w, &h, &depth, &color, nullptr, nullptr, nullptr);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    // ITU-R BT.601 weights, error-diffused by libpng; matches the
    // cv2/imageio grayscale convention closely enough for the loaders'
    // uint8 path (KITTI gray PNGs never take this branch)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  out->w = (int32_t)w; out->h = (int32_t)h;
  out->px.resize((size_t)w * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out->px.data() + (size_t)y * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  out->ok = true;
  return true;
}

bool decode(const std::string &path, Image *out) {
  size_t dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot);
  for (auto &ch : ext) ch = (char)tolower(ch);
  if (ext == ".pgm") return read_pgm_gray(path.c_str(), out);
  if (ext == ".png") return read_png_gray(path.c_str(), out);
  return false;
}

struct Pair {
  Image left, right;
};

struct Prefetcher {
  std::vector<std::string> lpaths, rpaths;
  int n = 0, depth = 2;
  int next_submit = 0;   // next index a worker may claim
  int next_take = 0;     // next index the consumer wants
  std::map<int, Pair> done;
  std::mutex mu;
  std::condition_variable cv_worker, cv_consumer;
  std::vector<std::thread> threads;
  bool closing = false;

  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          return closing ||
                 (next_submit < n &&
                  next_submit - next_take < depth + (int)threads.size());
        });
        if (closing) return;
        idx = next_submit++;
      }
      Pair p;
      decode(lpaths[idx], &p.left);
      decode(rpaths[idx], &p.right);
      {
        std::lock_guard<std::mutex> lk(mu);
        done.emplace(idx, std::move(p));
      }
      cv_consumer.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void *ts_prefetch_open(const char *const *lpaths, const char *const *rpaths,
                       int32_t n, int32_t depth, int32_t workers) {
  if (n < 0 || depth < 1 || workers < 1) return nullptr;
  auto *p = new Prefetcher();
  p->n = n;
  p->depth = depth;
  p->lpaths.reserve(n);
  p->rpaths.reserve(n);
  for (int i = 0; i < n; ++i) {
    p->lpaths.emplace_back(lpaths[i]);
    p->rpaths.emplace_back(rpaths[i]);
  }
  for (int i = 0; i < workers; ++i)
    p->threads.emplace_back(&Prefetcher::worker, p);
  return p;
}

// Blocks until pair `next_take` is decoded; fills its dims. Returns 0 on
// success, 1 at end-of-sequence, -1 on decode failure (dims of the failed
// side are 0).
int32_t ts_prefetch_dims(void *h, int32_t *lh, int32_t *lw, int32_t *rh,
                         int32_t *rw) {
  auto *p = (Prefetcher *)h;
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_take >= p->n) return 1;
  p->cv_consumer.wait(lk, [&] { return p->done.count(p->next_take) > 0; });
  const Pair &pr = p->done.at(p->next_take);
  *lh = pr.left.h; *lw = pr.left.w;
  *rh = pr.right.h; *rw = pr.right.w;
  return (pr.left.ok && pr.right.ok) ? 0 : -1;
}

// Copies the current pair into caller buffers (sized from ts_prefetch_dims)
// and advances. Must follow a successful ts_prefetch_dims.
int32_t ts_prefetch_take(void *h, uint8_t *lbuf, uint8_t *rbuf) {
  auto *p = (Prefetcher *)h;
  Pair pr;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    auto it = p->done.find(p->next_take);
    if (it == p->done.end()) return -1;
    pr = std::move(it->second);
    p->done.erase(it);
    p->next_take++;
  }
  p->cv_worker.notify_all();
  memcpy(lbuf, pr.left.px.data(), pr.left.px.size());
  memcpy(rbuf, pr.right.px.data(), pr.right.px.size());
  return 0;
}

void ts_prefetch_close(void *h) {
  auto *p = (Prefetcher *)h;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->closing = true;
  }
  p->cv_worker.notify_all();
  for (auto &t : p->threads) t.join();
  delete p;
}

}  // extern "C"
