// Native data-loading runtime: threaded image decode + resize + normalize.
//
// Replaces the reference's torch DataLoader worker processes
// (code/multi-mnist/main.py:86-88) with an in-process C++ thread pool that
// decodes PNG/JPEG, bilinearly resizes, and writes normalized [-1, 1]
// float32 NHWC directly into a caller-provided batch buffer — no Python
// object churn, no GIL contention, one memcpy-free pass.
//
// Exposed via a C ABI consumed through ctypes
// (multiple_objects_gan_tpu/data/native_loader.py). Build: native/Makefile.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Decoded {
  std::vector<uint8_t> pixels;  // interleaved, 8-bit
  int width = 0;
  int height = 0;
  int channels = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- PNG ----
Decoded decode_png(FILE* fp) {
  Decoded out;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return out;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return out;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return out;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out.width = static_cast<int>(w);
  out.height = static_cast<int>(h);
  out.channels = channels;
  out.pixels.resize(static_cast<size_t>(w) * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out.pixels.data() + static_cast<size_t>(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  out.ok = true;
  return out;
}

// --------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

Decoded decode_jpeg(FILE* fp) {
  Decoded out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.width = cinfo.output_width;
  out.height = cinfo.output_height;
  out.channels = cinfo.output_components;
  out.pixels.resize(static_cast<size_t>(out.width) * out.height *
                    out.channels);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.pixels.data() +
                   static_cast<size_t>(cinfo.output_scanline) * out.width *
                       out.channels;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

Decoded decode_file(const char* path) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return {};
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, fp) != 4) {
    fclose(fp);
    return {};
  }
  rewind(fp);
  Decoded out;
  if (magic[0] == 0x89 && magic[1] == 'P')
    out = decode_png(fp);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    out = decode_jpeg(fp);
  fclose(fp);
  return out;
}

// Output conversion policies: float32 [-1, 1] (legacy) or raw uint8
// [0, 255] rounded to nearest — the transport format for the device path
// (the reference pipeline keeps uint8 through every PIL transform and only
// normalizes in ToTensor, code/multi-mnist/main.py:80-82; shipping uint8
// and normalizing on-device cuts host->device bytes 4x and the cast fuses
// into the first consumer on TPU).
struct WriteF32 {
  using T = float;
  static inline float convert(float v) { return v / 127.5f - 1.0f; }
};
struct WriteU8 {
  using T = uint8_t;
  static inline uint8_t convert(float v) {
    float r = v + 0.5f;
    if (r < 0.0f) r = 0.0f;
    if (r > 255.0f) r = 255.0f;
    return static_cast<uint8_t>(r);
  }
};

// Bilinear resize (half-pixel centers, matches PIL.Image.BILINEAR closely)
// + channel conversion + output conversion (see policies above), NHWC.
//
// Hot path: per-axis sample positions/weights are precomputed once and the
// inner loops are specialized per channel layout so the compiler can
// vectorize them (the naive per-pixel-per-channel formulation was ~5x
// slower and made the native loader lose to PIL on one core).
template <typename Policy>
void resize_convert(const Decoded& img, typename Policy::T* dst, int out_h,
                    int out_w, int out_c) {
  const float sx = static_cast<float>(img.width) / out_w;
  const float sy = static_cast<float>(img.height) / out_h;
  const int ic = img.channels;

  std::vector<int> xs0(out_w), xs1(out_w);
  std::vector<float> wxs(out_w);
  for (int ox = 0; ox < out_w; ++ox) {
    float fx = (ox + 0.5f) * sx - 0.5f;
    int x0 = fx < 0 ? 0 : static_cast<int>(fx);
    int x1 = x0 + 1 < img.width ? x0 + 1 : img.width - 1;
    float wx = fx - static_cast<float>(x0);
    xs0[ox] = x0 * ic;
    xs1[ox] = x1 * ic;
    wxs[ox] = wx < 0 ? 0 : wx;
  }

  // one horizontally-resampled row pair buffer, reused per output row
  std::vector<float> row(static_cast<size_t>(out_w) * ic);
  const bool rgb_to_gray = (out_c == 1 && ic >= 3);

  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < img.height ? y0 + 1 : img.height - 1;
    float wy = fy - static_cast<float>(y0);
    if (wy < 0) wy = 0;
    const uint8_t* r0 = img.pixels.data() + static_cast<size_t>(y0) * img.width * ic;
    const uint8_t* r1 = img.pixels.data() + static_cast<size_t>(y1) * img.width * ic;
    const float w0 = 1.0f - wy, w1 = wy;

    if (ic == 3) {
      for (int ox = 0; ox < out_w; ++ox) {
        const int a = xs0[ox], b = xs1[ox];
        const float wx = wxs[ox], vx = 1.0f - wx;
        for (int c = 0; c < 3; ++c) {
          float top = vx * r0[a + c] + wx * r0[b + c];
          float bot = vx * r1[a + c] + wx * r1[b + c];
          row[static_cast<size_t>(ox) * 3 + c] = w0 * top + w1 * bot;
        }
      }
    } else {  // ic == 1 (and other layouts fall back to channel 0)
      for (int ox = 0; ox < out_w; ++ox) {
        const int a = xs0[ox], b = xs1[ox];
        const float wx = wxs[ox], vx = 1.0f - wx;
        float top = vx * r0[a] + wx * r0[b];
        float bot = vx * r1[a] + wx * r1[b];
        row[ox] = w0 * top + w1 * bot;
      }
    }

    typename Policy::T* out_row =
        dst + static_cast<size_t>(oy) * out_w * out_c;
    if (rgb_to_gray) {
      for (int ox = 0; ox < out_w; ++ox) {
        const float* px = row.data() + static_cast<size_t>(ox) * 3;
        float v = 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
        out_row[ox] = Policy::convert(v);
      }
    } else if (ic >= out_c) {
      const int cc = out_c;
      for (int ox = 0; ox < out_w; ++ox)
        for (int c = 0; c < cc; ++c)
          out_row[static_cast<size_t>(ox) * cc + c] =
              Policy::convert(row[static_cast<size_t>(ox) * ic + c]);
    } else {  // gray source -> RGB out: broadcast channel 0
      for (int ox = 0; ox < out_w; ++ox)
        for (int c = 0; c < out_c; ++c)
          out_row[static_cast<size_t>(ox) * out_c + c] =
              Policy::convert(row[ox]);
    }
  }
}

template <typename Policy>
int decode_batch_impl(const char* paths, int n, typename Policy::T* out,
                      int out_h, int out_w, int out_c, int threads) {
  std::vector<const char*> files(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    files[i] = p;
    p += strlen(p) + 1;
  }
  if (threads < 1) threads = 1;
  std::vector<int> ok(n, 0);
  std::vector<std::thread> pool;
  std::size_t per = static_cast<size_t>(out_h) * out_w * out_c;
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += threads) {
        Decoded img = decode_file(files[i]);
        if (!img.ok) {
          memset(out + per * i, 0, per * sizeof(typename Policy::T));
          continue;
        }
        resize_convert<Policy>(img, out + per * i, out_h, out_w, out_c);
        ok[i] = 1;
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int v : ok) total += v;
  return total;
}

}  // namespace

extern "C" {

// Decode `n` images (paths as \0-separated buffer) into a preallocated
// float32 NHWC buffer (n, out_h, out_w, out_c) in [-1, 1], using `threads`
// worker threads. Returns the number of successfully decoded images.
int mog_decode_batch(const char* paths, int n, float* out, int out_h,
                     int out_w, int out_c, int threads) {
  return decode_batch_impl<WriteF32>(paths, n, out, out_h, out_w, out_c,
                                     threads);
}

// Same, but into a raw uint8 NHWC buffer in [0, 255] — the transport
// format for the device input path (normalization happens on-device).
int mog_decode_batch_u8(const char* paths, int n, uint8_t* out, int out_h,
                        int out_w, int out_c, int threads) {
  return decode_batch_impl<WriteU8>(paths, n, out, out_h, out_w, out_c,
                                    threads);
}

// Single-image probe: returns (w << 20 | h) or -1.
long mog_probe(const char* path) {
  Decoded img = decode_file(path);
  if (!img.ok) return -1;
  return (static_cast<long>(img.width) << 20) | img.height;
}
}
