// dlco_native: host-side data-plane runtime for the TPU DLCO framework.
//
// Native equivalent of the reference's conv-impatches hot path
// (reference: src/conv-impatches.cpp:176-224 — BMP sheet decode + 16x16
// patch-grid cropping) plus the m50 pair-index parser (:139-161). The
// reference leans on OpenCV imread + single-threaded crops; feeding a TPU
// needs the loader to sustain >1 GB/s of patch data, so this library
// decodes BMP sheets and crops patch grids across a std::thread pool with
// zero Python-object overhead (ctypes into preallocated numpy buffers).
//
// Exposed C ABI (see opencv_dlco_tpu/native.py):
//   dlco_bmp_probe(path, &w, &h)              -> 0 on success
//   dlco_bmp_load_gray(path, out, w, h)       -> grayscale rows, top-down
//   dlco_load_patch_sheets(paths, n, out, patch, grid, threads)
//   dlco_parse_m50(path, out_i32, max_rows)   -> rows parsed
//   dlco_version()

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

int dlco_version() { return 10; }

namespace {

#pragma pack(push, 1)
struct BmpFileHeader {
  uint16_t magic;
  uint32_t size;
  uint32_t reserved;
  uint32_t offset;
};
struct BmpInfoHeader {
  uint32_t header_size;
  int32_t width;
  int32_t height;
  uint16_t planes;
  uint16_t bpp;
  uint32_t compression;
  uint32_t image_size;
  int32_t xppm, yppm;
  uint32_t colors_used, colors_important;
};
#pragma pack(pop)

// Decode an uncompressed 8-bit (palette) or 24/32-bit BMP into a top-down
// grayscale buffer. Returns 0 on success.
int decode_bmp_gray(const char *path, uint8_t *out, int exp_w, int exp_h) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  BmpFileHeader fh;
  BmpInfoHeader ih;
  if (fread(&fh, sizeof fh, 1, f) != 1 || fh.magic != 0x4D42 ||
      fread(&ih, sizeof ih, 1, f) != 1 || ih.compression != 0) {
    fclose(f);
    return -2;
  }
  const int w = ih.width;
  const int habs = ih.height < 0 ? -ih.height : ih.height;
  const bool topdown = ih.height < 0;
  if (w != exp_w || habs != exp_h) {
    fclose(f);
    return -3;
  }
  uint8_t palette_gray[256];
  const int bpp = ih.bpp;
  if (bpp == 8) {
    // palette sits between the info header and pixel data
    long pal_off = sizeof(BmpFileHeader) + ih.header_size;
    int n_colors = ih.colors_used ? (int)ih.colors_used : 256;
    if (n_colors > 256) n_colors = 256;
    std::vector<uint8_t> pal(4 * n_colors);
    if (fseek(f, pal_off, SEEK_SET) != 0 ||
        fread(pal.data(), 1, pal.size(), f) != pal.size()) {
      fclose(f);
      return -4;
    }
    for (int i = 0; i < n_colors; i++) {
      // BGR0 entries; OpenCV-style integer luma
      uint32_t b = pal[4 * i], g = pal[4 * i + 1], r = pal[4 * i + 2];
      palette_gray[i] = (uint8_t)((r * 77 + g * 150 + b * 29 + 128) >> 8);
    }
    for (int i = n_colors; i < 256; i++) palette_gray[i] = 0;
  } else if (bpp != 24 && bpp != 32) {
    fclose(f);
    return -5;
  }
  if (fseek(f, fh.offset, SEEK_SET) != 0) {
    fclose(f);
    return -6;
  }
  const int bytes_pp = bpp / 8;
  const size_t stride = ((size_t)w * bytes_pp + 3) & ~(size_t)3;
  std::vector<uint8_t> row(stride);
  for (int y = 0; y < habs; y++) {
    if (fread(row.data(), 1, stride, f) != stride) {
      fclose(f);
      return -7;
    }
    uint8_t *dst = out + (size_t)(topdown ? y : habs - 1 - y) * w;
    if (bpp == 8) {
      for (int x = 0; x < w; x++) dst[x] = palette_gray[row[x]];
    } else {
      for (int x = 0; x < w; x++) {
        uint32_t b = row[x * bytes_pp], g = row[x * bytes_pp + 1],
                 r = row[x * bytes_pp + 2];
        dst[x] = (uint8_t)((r * 77 + g * 150 + b * 29 + 128) >> 8);
      }
    }
  }
  fclose(f);
  return 0;
}

}  // namespace

int dlco_bmp_probe(const char *path, int *w, int *h) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  BmpFileHeader fh;
  BmpInfoHeader ih;
  if (fread(&fh, sizeof fh, 1, f) != 1 || fh.magic != 0x4D42 ||
      fread(&ih, sizeof ih, 1, f) != 1) {
    fclose(f);
    return -2;
  }
  *w = ih.width;
  *h = ih.height < 0 ? -ih.height : ih.height;
  fclose(f);
  return 0;
}

int dlco_bmp_load_gray(const char *path, uint8_t *out, int w, int h) {
  return decode_bmp_gray(path, out, w, h);
}

// Decode n_sheets BMPs (grid x grid patches of patch x patch each) straight
// into a packed (n_sheets*grid*grid, patch, patch) uint8 buffer, sheets
// distributed over a thread pool.
int dlco_load_patch_sheets(const char **paths, int n_sheets, uint8_t *out,
                           int patch, int grid, int n_threads) {
  const int sheet_px = patch * grid;
  const size_t patches_per_sheet = (size_t)grid * grid;
  const size_t patch_bytes = (size_t)patch * patch;
  std::atomic<int> next(0), err(0);
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();

  auto worker = [&]() {
    std::vector<uint8_t> sheet((size_t)sheet_px * sheet_px);
    int i;
    while ((i = next.fetch_add(1)) < n_sheets && !err.load()) {
      int rc = decode_bmp_gray(paths[i], sheet.data(), sheet_px, sheet_px);
      if (rc != 0) {
        err.store(rc);
        return;
      }
      uint8_t *base = out + (size_t)i * patches_per_sheet * patch_bytes;
      for (int gy = 0; gy < grid; gy++)
        for (int gx = 0; gx < grid; gx++) {
          uint8_t *dst = base + ((size_t)gy * grid + gx) * patch_bytes;
          const uint8_t *src =
              sheet.data() + (size_t)gy * patch * sheet_px + (size_t)gx * patch;
          for (int r = 0; r < patch; r++)
            memcpy(dst + (size_t)r * patch, src + (size_t)r * sheet_px, patch);
        }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto &th : pool) th.join();
  return err.load();
}

// Parse the m50 pair-index file: rows of
//   patch1 point1 unused patch2 point2 unused [...]
// into (n, 4) int32 [patch1, point1, patch2, point2]. Returns rows parsed.
long dlco_parse_m50(const char *path, int32_t *out, long max_rows) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  long n = 0;
  while (n < max_rows && fgets(line, sizeof line, f)) {
    int p1, q1, p2, q2;
    if (sscanf(line, "%d %d %*s %d %d", &p1, &q1, &p2, &q2) == 4) {
      out[n * 4 + 0] = p1;
      out[n * 4 + 1] = q1;
      out[n * 4 + 2] = p2;
      out[n * 4 + 3] = q2;
      n++;
    }
  }
  fclose(f);
  return n;
}

}  // extern "C"
