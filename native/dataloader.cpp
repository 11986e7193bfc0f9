// vio360 native data loader: threaded image decode + prefetch.
//
// TPU-native counterpart of the reference's host-side frame IO
// (app/main.cpp:105-119 image listing + main.cpp:199-204 imread/resize
// via OpenCV): a C++ worker pool decodes and resizes frames ahead of
// the consumer so the Python pipeline never stalls on disk/decode.
// Supported formats: .npy (float32/float64/uint8 2-D), .pgm (P5),
// .png (libpng), .jpg/.jpeg (libjpeg). Output: float32 grayscale
// row-major [out_h, out_w] in [0, 1].
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   vio_loader_open(paths_joined, n, out_w, out_h, threads, prefetch)
//   vio_loader_get(handle, idx, out)   -> 0 ok / -1 error
//   vio_loader_last_error(handle)      -> const char*
//   vio_loader_close(handle)

#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

#include <csetjmp>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<float> px;  // row-major grayscale in [0,1]
};

// ---------------------------------------------------------------- decoders

bool decode_npy(const std::string& path, Image* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { *err = "open failed: " + path; return false; }
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f); *err = "bad npy magic: " + path; return false;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major >= 2) {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); *err = "npy header"; return false; }
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  } else {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); *err = "npy header"; return false; }
    hlen = b[0] | (b[1] << 8);
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) { fclose(f); *err = "npy header"; return false; }

  auto find_val = [&](const char* key) -> std::string {
    size_t p = header.find(key);
    if (p == std::string::npos) return "";
    p = header.find(':', p);
    size_t e = header.find_first_of(",}", p);
    return header.substr(p + 1, e - p - 1);
  };
  std::string descr = find_val("'descr'");
  bool fortran = find_val("'fortran_order'").find("True") != std::string::npos;
  if (fortran) { fclose(f); *err = "fortran-order npy unsupported"; return false; }
  size_t sp = header.find("'shape'");
  sp = header.find('(', sp);
  size_t se = header.find(')', sp);
  int h = 0, w = 0;
  if (sscanf(header.substr(sp, se - sp + 1).c_str(), "(%d, %d)", &h, &w) != 2) {
    fclose(f); *err = "npy shape not 2-D: " + path; return false;
  }
  out->w = w; out->h = h; out->px.resize(size_t(w) * h);
  size_t n = size_t(w) * h;
  bool ok = true;
  if (descr.find("<f4") != std::string::npos) {
    ok = fread(out->px.data(), 4, n, f) == n;
  } else if (descr.find("<f8") != std::string::npos) {
    std::vector<double> tmp(n);
    ok = fread(tmp.data(), 8, n, f) == n;
    for (size_t i = 0; i < n; i++) out->px[i] = float(tmp[i]);
  } else if (descr.find("u1") != std::string::npos) {
    std::vector<unsigned char> tmp(n);
    ok = fread(tmp.data(), 1, n, f) == n;
    for (size_t i = 0; i < n; i++) out->px[i] = tmp[i] / 255.0f;
  } else {
    fclose(f); *err = "npy dtype unsupported: " + descr; return false;
  }
  fclose(f);
  if (!ok) { *err = "npy truncated: " + path; return false; }
  return true;
}

bool decode_pgm(const std::string& path, Image* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { *err = "open failed: " + path; return false; }
  auto next_token = [&]() -> long {
    int c;
    // skip whitespace and '#' comments
    while ((c = fgetc(f)) != EOF) {
      if (c == '#') { while ((c = fgetc(f)) != EOF && c != '\n') {} }
      else if (!isspace(c)) break;
    }
    if (c == EOF) return -1;
    long v = 0;
    while (c != EOF && isdigit(c)) { v = v * 10 + (c - '0'); c = fgetc(f); }
    return v;
  };
  char m0 = fgetc(f), m1 = fgetc(f);
  if (m0 != 'P' || m1 != '5') { fclose(f); *err = "not P5 pgm: " + path; return false; }
  long w = next_token(), h = next_token(), maxv = next_token();
  if (w <= 0 || h <= 0 || maxv <= 0) { fclose(f); *err = "bad pgm header"; return false; }
  out->w = int(w); out->h = int(h);
  size_t n = size_t(w) * h;
  out->px.resize(n);
  bool ok;
  if (maxv < 256) {
    std::vector<unsigned char> tmp(n);
    ok = fread(tmp.data(), 1, n, f) == n;
    for (size_t i = 0; i < n; i++) out->px[i] = tmp[i] / float(maxv);
  } else {
    std::vector<unsigned char> tmp(n * 2);  // big-endian 16-bit
    ok = fread(tmp.data(), 1, n * 2, f) == n * 2;
    for (size_t i = 0; i < n; i++)
      out->px[i] = ((tmp[2 * i] << 8) | tmp[2 * i + 1]) / float(maxv);
  }
  fclose(f);
  if (!ok) { *err = "pgm truncated: " + path; return false; }
  return true;
}

bool decode_png(const std::string& path, Image* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { *err = "open failed: " + path; return false; }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) { fclose(f); *err = "libpng init failed"; return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f); *err = "png decode error: " + path; return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);          // palette/low-bit -> 8-bit
  png_set_strip_16(png);        // 16-bit -> 8-bit
  png_set_strip_alpha(png);
  int color = png_get_color_type(png, info);
  if (color & PNG_COLOR_MASK_COLOR)
    png_set_rgb_to_gray(png, 1 /*error_action: silent*/, -1, -1);
  png_read_update_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  std::vector<unsigned char> row(png_get_rowbytes(png, info));
  out->w = w; out->h = h; out->px.resize(size_t(w) * h);
  for (int y = 0; y < h; y++) {
    png_read_row(png, row.data(), nullptr);
    for (int x = 0; x < w; x++) out->px[size_t(y) * w + x] = row[x] / 255.0f;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

bool decode_jpeg(const std::string& path, Image* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { *err = "open failed: " + path; return false; }
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f); *err = "jpeg decode error: " + path; return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  out->w = w; out->h = h; out->px.resize(size_t(w) * h);
  std::vector<unsigned char> row(w);
  unsigned char* rp = row.data();
  for (int y = 0; y < h; y++) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    for (int x = 0; x < w; x++) out->px[size_t(y) * w + x] = row[x] / 255.0f;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++)
    if (tolower(s[s.size() - n + i]) != suf[i]) return false;
  return true;
}

bool decode_any(const std::string& path, Image* out, std::string* err) {
  if (ends_with(path, ".npy")) return decode_npy(path, out, err);
  if (ends_with(path, ".pgm")) return decode_pgm(path, out, err);
  if (ends_with(path, ".png")) return decode_png(path, out, err);
  if (ends_with(path, ".jpg") || ends_with(path, ".jpeg"))
    return decode_jpeg(path, out, err);
  *err = "unsupported image format: " + path;
  return false;
}

// Separable triangle-filter resampling matching PIL's BILINEAR
// (filter support scales with the downscale factor — area-weighted —
// which is what the pure-Python path produces via Image.resize).
struct ResampleAxis {
  std::vector<int> start;      // first source index per output pixel
  std::vector<int> count;      // taps per output pixel
  std::vector<float> weights;  // flattened [out, max_taps]
  int max_taps = 0;
};

ResampleAxis triangle_axis(int in_size, int out_size) {
  ResampleAxis ax;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // triangle filter support = 1
  ax.max_taps = int(ceil(support)) * 2 + 1;
  ax.start.resize(out_size);
  ax.count.resize(out_size);
  ax.weights.assign(size_t(out_size) * ax.max_taps, 0.0f);
  for (int x = 0; x < out_size; x++) {
    double center = (x + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    float* w = &ax.weights[size_t(x) * ax.max_taps];
    for (int i = xmin; i < xmax; i++) {
      double d = fabs((i - center + 0.5) / filterscale);
      double tw = d < 1.0 ? 1.0 - d : 0.0;
      w[i - xmin] = float(tw);
      total += tw;
    }
    if (total > 0)
      for (int i = 0; i < xmax - xmin; i++) w[i] /= float(total);
    ax.start[x] = xmin;
    ax.count[x] = xmax - xmin;
  }
  return ax;
}

void resize_bilinear(const Image& src, int out_w, int out_h, float* dst) {
  if (src.w == out_w && src.h == out_h) {
    memcpy(dst, src.px.data(), sizeof(float) * size_t(out_w) * out_h);
    return;
  }
  ResampleAxis hx = triangle_axis(src.w, out_w);
  ResampleAxis vy = triangle_axis(src.h, out_h);
  // horizontal pass: [src.h, out_w]
  std::vector<float> mid(size_t(src.h) * out_w);
  for (int y = 0; y < src.h; y++) {
    const float* row = &src.px[size_t(y) * src.w];
    for (int x = 0; x < out_w; x++) {
      const float* w = &hx.weights[size_t(x) * hx.max_taps];
      float acc = 0.0f;
      for (int i = 0; i < hx.count[x]; i++) acc += row[hx.start[x] + i] * w[i];
      mid[size_t(y) * out_w + x] = acc;
    }
  }
  // vertical pass
  for (int y = 0; y < out_h; y++) {
    const float* w = &vy.weights[size_t(y) * vy.max_taps];
    for (int x = 0; x < out_w; x++) {
      float acc = 0.0f;
      for (int i = 0; i < vy.count[y]; i++)
        acc += mid[size_t(vy.start[y] + i) * out_w + x] * w[i];
      dst[size_t(y) * out_w + x] = acc;
    }
  }
}

// ---------------------------------------------------------------- prefetcher

struct Loader {
  std::vector<std::string> paths;
  int out_w, out_h, prefetch;
  std::vector<std::thread> workers;

  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for a slot
  std::condition_variable cv_work;    // workers wait for tasks
  std::deque<int> queue;              // indices to decode
  enum Status { kEmpty = 0, kPending, kReady, kError };
  struct Slot { std::vector<float> data; Status status = kEmpty; };
  std::map<int, Slot> cache;
  bool stop = false;
  std::string error;

  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop) return;
        idx = queue.front();
        queue.pop_front();
      }
      Image img;
      std::string err;
      bool ok = decode_any(paths[idx], &img, &err);
      std::vector<float> out(size_t(out_w) * out_h);
      if (ok) resize_bilinear(img, out_w, out_h, out.data());
      {
        std::lock_guard<std::mutex> lk(mu);
        auto& slot = cache[idx];
        slot.status = ok ? kReady : kError;
        if (ok) slot.data = std::move(out);
        else if (error.empty()) error = err;
      }
      cv_ready.notify_all();
    }
  }

  void schedule_locked(int idx) {
    if (idx < 0 || idx >= int(paths.size())) return;
    auto& slot = cache[idx];
    if (slot.status == kEmpty) {
      slot.status = kPending;
      queue.push_back(idx);
      cv_work.notify_one();
    }
  }

  int get(int idx, float* out) {
    if (idx < 0 || idx >= int(paths.size())) {
      std::lock_guard<std::mutex> lk(mu);
      error = "index out of range";
      return -1;
    }
    std::unique_lock<std::mutex> lk(mu);
    // evict decoded frames behind the cursor, schedule the window ahead
    for (auto it = cache.begin(); it != cache.end();)
      it = (it->first < idx && it->second.status != kPending) ? cache.erase(it) : ++it;
    for (int i = idx; i < idx + 1 + prefetch; i++) schedule_locked(i);
    cv_ready.wait(lk, [&] {
      auto it = cache.find(idx);
      return it != cache.end() &&
             (it->second.status == kReady || it->second.status == kError);
    });
    auto& slot = cache[idx];
    if (slot.status == kError) return -1;
    memcpy(out, slot.data.data(), sizeof(float) * size_t(out_w) * out_h);
    return 0;
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }
};

}  // namespace

extern "C" {

void* vio_loader_open(const char* paths_joined, int n_paths, int out_w, int out_h,
                      int n_threads, int prefetch) {
  auto* L = new Loader();
  const char* p = paths_joined;
  for (int i = 0; i < n_paths; i++) {
    L->paths.emplace_back(p);
    p += L->paths.back().size() + 1;
  }
  L->out_w = out_w;
  L->out_h = out_h;
  L->prefetch = prefetch > 0 ? prefetch : 4;
  if (n_threads <= 0) n_threads = 2;
  for (int i = 0; i < n_threads; i++)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

int vio_loader_count(void* h) { return int(static_cast<Loader*>(h)->paths.size()); }

int vio_loader_get(void* h, int idx, float* out) {
  return static_cast<Loader*>(h)->get(idx, out);
}

const char* vio_loader_last_error(void* h) {
  return static_cast<Loader*>(h)->error.c_str();
}

void vio_loader_close(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
