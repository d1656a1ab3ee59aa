// Native data-pipeline kernels for densematchingbenchmark_tpu.
//
// TPU-native counterpart of the runtime-native pieces of the reference
// (its CUDA SPN op is replaced by a Pallas/XLA scan on the compute path;
// the host-side hot path — image decode + preprocessing that feeds the
// accelerator — lives here in C++). Exposed as a plain C ABI consumed via
// ctypes (densematchingbenchmark_tpu/native/__init__.py); no pybind11.
//
// Functions:
//   dmb_decode_pfm        : PFM (SceneFlow disparity) -> float32 HxWxC
//   dmb_decode_png_rgb    : 8/16-bit PNG -> float32 HxWx3 (RGB, drops alpha)
//   dmb_decode_png_disp16 : 16-bit PNG / 256.0 (KITTI disparity), 0=invalid
//   dmb_normalize_crop    : fused crop + (x - mean) / std
//
// Build: make (produces libdmb_native.so next to this file).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <png.h>

extern "C" {

// Returns 0 on success. On success *out is malloc'd (caller frees with
// dmb_free) holding h*w*c float32, top-down row order.
int dmb_decode_pfm(const char* path, float** out, int* height, int* width,
                   int* channels) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  char header[3] = {0};
  if (fscanf(fp, "%2s", header) != 1) { fclose(fp); return 2; }
  int c;
  if (strcmp(header, "PF") == 0) c = 3;
  else if (strcmp(header, "Pf") == 0) c = 1;
  else { fclose(fp); return 3; }
  int w, h;
  double scale;
  if (fscanf(fp, "%d %d %lf", &w, &h, &scale) != 3) { fclose(fp); return 4; }
  fgetc(fp);  // single whitespace after the scale line
  const size_t n = (size_t)w * h * c;
  float* data = (float*)malloc(n * sizeof(float));
  if (!data) { fclose(fp); return 5; }
  if (fread(data, sizeof(float), n, fp) != n) {
    free(data); fclose(fp); return 6;
  }
  fclose(fp);
  const bool little_endian = scale < 0;
  uint16_t probe = 1;
  const bool host_le = *(uint8_t*)&probe == 1;
  if (little_endian != host_le) {
    for (size_t i = 0; i < n; ++i) {
      uint32_t v;
      memcpy(&v, &data[i], 4);
      v = __builtin_bswap32(v);
      memcpy(&data[i], &v, 4);
    }
  }
  // PFM rows are bottom-up; flip to top-down.
  float* flipped = (float*)malloc(n * sizeof(float));
  if (!flipped) { free(data); return 5; }
  const size_t row = (size_t)w * c;
  for (int y = 0; y < h; ++y)
    memcpy(flipped + (size_t)y * row, data + (size_t)(h - 1 - y) * row,
           row * sizeof(float));
  free(data);
  *out = flipped;
  *height = h;
  *width = w;
  *channels = c;
  return 0;
}

static int read_png(const char* path, png_image* image,
                    std::vector<uint16_t>* buf16,
                    std::vector<uint8_t>* buf8, bool want_rgb) {
  memset(image, 0, sizeof(*image));
  image->version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(image, path)) return 1;
  const bool sixteen = (image->format & PNG_FORMAT_FLAG_LINEAR) != 0 ||
                       PNG_IMAGE_SAMPLE_COMPONENT_SIZE(image->format) == 2;
  if (want_rgb) {
    image->format = sixteen ? PNG_FORMAT_LINEAR_RGB : PNG_FORMAT_RGB;
  } else {
    image->format = sixteen ? PNG_FORMAT_LINEAR_Y : PNG_FORMAT_GRAY;
  }
  const size_t stride = PNG_IMAGE_ROW_STRIDE(*image);
  const size_t size = PNG_IMAGE_BUFFER_SIZE(*image, stride);
  void* buffer;
  if (sixteen) {
    buf16->resize(size / 2);
    buffer = buf16->data();
  } else {
    buf8->resize(size);
    buffer = buf8->data();
  }
  if (!png_image_finish_read(image, nullptr, buffer, (png_int_32)stride,
                             nullptr)) return 2;
  return sixteen ? 16 : 8;
}

int dmb_decode_png_rgb(const char* path, float** out, int* height,
                       int* width) {
  png_image image;
  std::vector<uint16_t> b16;
  std::vector<uint8_t> b8;
  int bits = read_png(path, &image, &b16, &b8, true);
  if (bits != 8 && bits != 16) return bits == 1 ? 1 : 2;
  const int h = image.height, w = image.width;
  const size_t n = (size_t)h * w * 3;
  float* data = (float*)malloc(n * sizeof(float));
  if (!data) return 5;
  if (bits == 8) {
    for (size_t i = 0; i < n; ++i) data[i] = (float)b8[i];
  } else {
    // linear 16-bit: scale to the 0-255 convention the pipeline expects
    for (size_t i = 0; i < n; ++i) data[i] = b16[i] * (255.0f / 65535.0f);
  }
  *out = data;
  *height = h;
  *width = w;
  return 0;
}

int dmb_decode_png_disp16(const char* path, float** out, int* height,
                          int* width) {
  png_image image;
  std::vector<uint16_t> b16;
  std::vector<uint8_t> b8;
  int bits = read_png(path, &image, &b16, &b8, false);
  if (bits != 8 && bits != 16) return bits == 1 ? 1 : 2;
  const int h = image.height, w = image.width;
  const size_t n = (size_t)h * w;
  float* data = (float*)malloc(n * sizeof(float));
  if (!data) return 5;
  if (bits == 16) {
    for (size_t i = 0; i < n; ++i) data[i] = b16[i] / 256.0f;
  } else {
    for (size_t i = 0; i < n; ++i) data[i] = b8[i] / 256.0f;
  }
  *out = data;
  *height = h;
  *width = w;
  return 0;
}

// dst[th, tw, c] = (src[y1:y1+th, x1:x1+tw, :] - mean[c]) / std[c]
void dmb_normalize_crop(const float* src, int src_h, int src_w, int c,
                        int y1, int x1, int th, int tw, const float* mean,
                        const float* stdev, float* dst) {
  for (int y = 0; y < th; ++y) {
    const float* srow = src + ((size_t)(y1 + y) * src_w + x1) * c;
    float* drow = dst + (size_t)y * tw * c;
    for (int x = 0; x < tw; ++x)
      for (int k = 0; k < c; ++k)
        drow[x * c + k] = (srow[x * c + k] - mean[k]) / stdev[k];
  }
}

void dmb_free(void* p) { free(p); }

}  // extern "C"
