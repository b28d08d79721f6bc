// tpustereo native runtime components (SURVEY.md §3 #1, #8).
//
// The reference family (classical C++ SGBM repos) keeps its irregular
// algorithms and image I/O in C++; these are the equivalents for the host
// side of the TPU framework. The TPU compute path itself is Pallas/Mosaic
// (tpustereo/kernels/) — this library covers what legitimately belongs on
// the host: union-find connected components (the one sequential algorithm
// in the pipeline, used as the exact oracle/fallback for the on-device
// segmented-scan labelling) and PGM/PFM codecs for the data loader.
//
// Exposed as a plain C ABI consumed via ctypes (tpustereo/native/__init__.py).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// speckle filter: 4-connected components via union-find, invalidate small
// ones. Exact mirror of golden.speckle_numpy (tpustereo/golden/sgbm_numpy.py)
// and ops.speckle.
// ---------------------------------------------------------------------------

static int32_t uf_find(int32_t *parent, int32_t i) {
  int32_t root = i;
  while (parent[root] != root) root = parent[root];
  while (parent[i] != root) {
    int32_t next = parent[i];
    parent[i] = root;
    i = next;
  }
  return root;
}

// disp: HxW float32; valid: HxW uint8 in/out. Components of connected valid
// pixels (|d(p)-d(q)| <= range, 4-neighbourhood) smaller than min_size are
// invalidated in place.
void speckle_filter(const float *disp, uint8_t *valid, int32_t H, int32_t W,
                    float range, int32_t min_size) {
  if (min_size <= 0) return;
  const int64_t n = (int64_t)H * W;
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;

  for (int32_t y = 0; y < H; ++y) {
    const float *dr = disp + (int64_t)y * W;
    const uint8_t *vr = valid + (int64_t)y * W;
    for (int32_t x = 0; x + 1 < W; ++x) {
      if (vr[x] && vr[x + 1] && std::fabs(dr[x] - dr[x + 1]) <= range) {
        int32_t a = uf_find(parent.data(), y * W + x);
        int32_t b = uf_find(parent.data(), y * W + x + 1);
        if (a != b) parent[b] = a;
      }
    }
  }
  for (int32_t y = 0; y + 1 < H; ++y) {
    const float *dr = disp + (int64_t)y * W;
    const uint8_t *vr = valid + (int64_t)y * W;
    for (int32_t x = 0; x < W; ++x) {
      if (vr[x] && vr[x + W] && std::fabs(dr[x] - dr[x + W]) <= range) {
        int32_t a = uf_find(parent.data(), y * W + x);
        int32_t b = uf_find(parent.data(), (y + 1) * W + x);
        if (a != b) parent[b] = a;
      }
    }
  }

  std::vector<int32_t> sizes(n, 0);
  for (int64_t i = 0; i < n; ++i) sizes[uf_find(parent.data(), (int32_t)i)]++;
  for (int64_t i = 0; i < n; ++i)
    if (valid[i] && sizes[uf_find(parent.data(), (int32_t)i)] < min_size)
      valid[i] = 0;
}

// Component labels (min linear index per component) — oracle for the
// on-device segmented-scan labelling. conn_h: Hx(W-1), conn_v: (H-1)xW.
void cc_labels(const uint8_t *conn_h, const uint8_t *conn_v, int32_t H,
               int32_t W, int32_t *labels_out) {
  const int64_t n = (int64_t)H * W;
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;
  for (int32_t y = 0; y < H; ++y)
    for (int32_t x = 0; x + 1 < W; ++x)
      if (conn_h[(int64_t)y * (W - 1) + x]) {
        int32_t a = uf_find(parent.data(), y * W + x);
        int32_t b = uf_find(parent.data(), y * W + x + 1);
        if (a != b) parent[b] = a;
      }
  for (int32_t y = 0; y + 1 < H; ++y)
    for (int32_t x = 0; x < W; ++x)
      if (conn_v[(int64_t)y * W + x]) {
        int32_t a = uf_find(parent.data(), y * W + x);
        int32_t b = uf_find(parent.data(), (y + 1) * W + x);
        if (a != b) parent[b] = a;
      }
  // min linear index per root, then relabel
  std::vector<int32_t> mins(n, INT32_MAX);
  for (int64_t i = 0; i < n; ++i) {
    int32_t r = uf_find(parent.data(), (int32_t)i);
    if ((int32_t)i < mins[r]) mins[r] = (int32_t)i;
  }
  for (int64_t i = 0; i < n; ++i)
    labels_out[i] = mins[uf_find(parent.data(), (int32_t)i)];
}

// ---------------------------------------------------------------------------
// PGM (P5) / PFM codecs — binary, no external deps (stb/OpenCV stand-in).
// Return 0 on success, negative errno-style codes on failure.
// ---------------------------------------------------------------------------

static int skip_ws_comments(FILE *f) {
  int c;
  for (;;) {
    c = fgetc(f);
    if (c == '#') {
      while (c != '\n' && c != EOF) c = fgetc(f);
    } else if (!isspace(c)) {
      if (c == EOF) return -1;
      ungetc(c, f);
      return 0;
    }
  }
}

int pgm_read_header(const char *path, int32_t *w, int32_t *h, int32_t *maxval) {
  FILE *f = fopen(path, "rb");
  if (!f) return -2;
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0) {
    fclose(f);
    return -3;
  }
  if (skip_ws_comments(f) || fscanf(f, "%d", w) != 1 || skip_ws_comments(f) ||
      fscanf(f, "%d", h) != 1 || skip_ws_comments(f) ||
      fscanf(f, "%d", maxval) != 1) {
    fclose(f);
    return -4;
  }
  fclose(f);
  return 0;
}

int pgm_read(const char *path, uint8_t *out, int64_t out_size) {
  FILE *f = fopen(path, "rb");
  if (!f) return -2;
  char magic[3] = {0};
  int32_t w, h, maxval;
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0 ||
      skip_ws_comments(f) || fscanf(f, "%d", &w) != 1 ||
      skip_ws_comments(f) || fscanf(f, "%d", &h) != 1 ||
      skip_ws_comments(f) || fscanf(f, "%d", &maxval) != 1) {
    fclose(f);
    return -3;
  }
  fgetc(f);  // single whitespace after maxval
  int64_t need = (int64_t)w * h;
  if (need > out_size || maxval > 255) {
    fclose(f);
    return -5;
  }
  int64_t got = (int64_t)fread(out, 1, need, f);
  fclose(f);
  return got == need ? 0 : -6;
}

int pgm_write(const char *path, const uint8_t *img, int32_t w, int32_t h) {
  FILE *f = fopen(path, "wb");
  if (!f) return -2;
  fprintf(f, "P5\n%d %d\n255\n", w, h);
  int64_t nw = (int64_t)fwrite(img, 1, (int64_t)w * h, f);
  fclose(f);
  return nw == (int64_t)w * h ? 0 : -6;
}

int pfm_read_header(const char *path, int32_t *w, int32_t *h,
                    int32_t *channels, float *scale) {
  FILE *f = fopen(path, "rb");
  if (!f) return -2;
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1) {
    fclose(f);
    return -3;
  }
  if (strcmp(magic, "PF") == 0)
    *channels = 3;
  else if (strcmp(magic, "Pf") == 0)
    *channels = 1;
  else {
    fclose(f);
    return -3;
  }
  if (skip_ws_comments(f) || fscanf(f, "%d", w) != 1 || skip_ws_comments(f) ||
      fscanf(f, "%d", h) != 1 || skip_ws_comments(f) ||
      fscanf(f, "%f", scale) != 1) {
    fclose(f);
    return -4;
  }
  fclose(f);
  return 0;
}

// Reads into row-major top-down float32 (PFM stores bottom-up); handles
// byte order via the scale sign. out_size in floats.
int pfm_read(const char *path, float *out, int64_t out_size) {
  FILE *f = fopen(path, "rb");
  if (!f) return -2;
  char magic[3] = {0};
  int32_t w, h, channels;
  float scale;
  if (fscanf(f, "%2s", magic) != 1) {
    fclose(f);
    return -3;
  }
  channels = strcmp(magic, "PF") == 0 ? 3 : 1;
  if (skip_ws_comments(f) || fscanf(f, "%d", &w) != 1 ||
      skip_ws_comments(f) || fscanf(f, "%d", &h) != 1 ||
      skip_ws_comments(f) || fscanf(f, "%f", &scale) != 1) {
    fclose(f);
    return -4;
  }
  fgetc(f);
  int64_t per_row = (int64_t)w * channels;
  if (per_row * h > out_size) {
    fclose(f);
    return -5;
  }
  // bottom-up rows -> top-down output
  for (int32_t y = h - 1; y >= 0; --y) {
    if ((int64_t)fread(out + (int64_t)y * per_row, 4, per_row, f) != per_row) {
      fclose(f);
      return -6;
    }
  }
  fclose(f);
  if (scale > 0) {  // big-endian file: swap
    for (int64_t i = 0; i < per_row * h; ++i) {
      uint32_t v;
      memcpy(&v, out + i, 4);
      v = __builtin_bswap32(v);
      memcpy(out + i, &v, 4);
    }
  }
  return 0;
}

int pfm_write(const char *path, const float *img, int32_t w, int32_t h) {
  FILE *f = fopen(path, "wb");
  if (!f) return -2;
  fprintf(f, "Pf\n%d %d\n-1.0\n", w, h);  // little-endian
  for (int32_t y = h - 1; y >= 0; --y) {
    if ((int64_t)fwrite(img + (int64_t)y * w, 4, w, f) != w) {
      fclose(f);
      return -6;
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
