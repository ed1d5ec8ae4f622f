// Native image-loading pipeline — the TPU-side equivalent of the reference's
// torch DataLoader worker pool (AnyLoc dvgl_benchmark/parser.py:60
// `num_workers` prefetch; every pipeline feeds PIL-decoded, torchvision-
// resized, ImageNet-normalized tensors). One C call decodes a batch of
// JPEG/PNG files on a thread pool, resizes with either tensor-mode
// bilinear (torchvision Resize on tensors, the reference pipelines'
// semantics, float-exact vs transforms.load_image) or PIL-convention
// antialiased bilinear (demo-style PIL resizes), and writes normalized channels-last float32 — the exact layout `jax.device_put`
// ships to the chip with zero further host work.
//
// C ABI for ctypes (anyloc_tpu/native.py); no C++ types cross the
// boundary.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------------ decode

struct Image {
    int w = 0, h = 0;
    std::vector<uint8_t> rgb;  // [h, w, 3]
};

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jmp, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, Image* out) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jmp)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr for us
    jpeg_start_decompress(&cinfo);
    out->w = cinfo.output_width;
    out->h = cinfo.output_height;
    out->rgb.resize(size_t(out->w) * out->h * 3);
    const size_t stride = size_t(out->w) * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out->rgb.data() + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

struct PngReadCtx {
    const uint8_t* data;
    size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep dst, png_size_t n) {
    PngReadCtx* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
    if (ctx->pos + n > ctx->len) {
        png_error(png, "truncated");
    }
    std::memcpy(dst, ctx->data + ctx->pos, n);
    ctx->pos += n;
}

bool decode_png(const uint8_t* data, size_t len, Image* out) {
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    PngReadCtx ctx{data, len, 0};
    png_set_read_fn(png, &ctx, png_read_fn);
    png_read_info(png, info);
    // Normalize every variant to 8-bit RGB.
    png_set_strip_16(png);
    png_set_palette_to_rgb(png);
    png_set_expand_gray_1_2_4_to_8(png);
    png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_read_update_info(png, info);
    out->w = png_get_image_width(png, info);
    out->h = png_get_image_height(png, info);
    if (png_get_rowbytes(png, info) != size_t(out->w) * 3) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    out->rgb.resize(size_t(out->w) * out->h * 3);
    std::vector<png_bytep> rows(out->h);
    for (int y = 0; y < out->h; ++y)
        rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_any(const uint8_t* data, size_t len, Image* out) {
    if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF)
        return decode_jpeg(data, len, out);
    if (len >= 8 && !std::memcmp(data, "\x89PNG\r\n\x1a\n", 8))
        return decode_png(data, len, out);
    return false;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    if (sz <= 0) {
        std::fclose(f);
        return false;
    }
    std::fseek(f, 0, SEEK_SET);
    buf->resize(sz);
    bool ok = std::fread(buf->data(), 1, sz, f) == size_t(sz);
    std::fclose(f);
    return ok;
}

// ------------------------------------------------------------------ resize

// PIL-convention antialiased separable resize weights (the semantics of
// torchvision Resize on PIL images, which every reference loader uses):
// center = (i + 0.5) * scale, kernel support widened by `scale` on
// downscale, window [int(center - support + 0.5), int(center + support +
// 0.5)), weights renormalized over in-range taps.
struct Taps {
    std::vector<int> start;      // [dst]
    std::vector<int> count;      // [dst]
    std::vector<float> weights;  // [dst, max_count] row-major
    int max_count = 0;
};

float lin_kernel(float t) {
    t = std::fabs(t);
    return t < 1.0f ? 1.0f - t : 0.0f;
}

Taps make_taps(int src, int dst, bool antialias) {
    Taps taps;
    const double scale = double(src) / dst;
    // antialias=true: PIL convention (support widened by the downscale
    // factor) — what torchvision Resize does on PIL inputs. false:
    // tensor-mode torchvision/torch F.interpolate bilinear (plain 2-tap,
    // align_corners=False) — the reference pipelines' semantics
    // (see anyloc_tpu/data/transforms.py:base_transform).
    const double filterscale = antialias ? std::max(scale, 1.0) : 1.0;
    const double support = 1.0 * filterscale;  // bilinear support = 1
    const int max_count = int(std::ceil(support)) * 2 + 1;
    taps.start.resize(dst);
    taps.count.resize(dst);
    taps.weights.assign(size_t(dst) * max_count, 0.0f);
    taps.max_count = max_count;
    for (int i = 0; i < dst; ++i) {
        const double center = (i + 0.5) * scale;
        int xmin = int(center - support + 0.5);
        int xmax = int(center + support + 0.5);
        xmin = std::max(xmin, 0);
        xmax = std::min(xmax, src);
        double total = 0.0;
        std::vector<double> w(xmax - xmin);
        for (int x = xmin; x < xmax; ++x) {
            w[x - xmin] = lin_kernel(float((x - center + 0.5) / filterscale));
            total += w[x - xmin];
        }
        if (total <= 0.0) total = 1.0;
        taps.start[i] = xmin;
        taps.count[i] = xmax - xmin;
        for (int x = 0; x < xmax - xmin; ++x)
            taps.weights[size_t(i) * max_count + x] = float(w[x] / total);
    }
    return taps;
}

// u8 [h, w, 3] -> normalized f32 [out_h, out_w, 3] (channels-last).
void resize_normalize(const Image& img, int out_h, int out_w, bool antialias,
                      const float* mean, const float* stdev, float* out) {
    const Taps tx = make_taps(img.w, out_w, antialias);
    const Taps ty = make_taps(img.h, out_h, antialias);
    // Pass 1: horizontal, u8 -> f32 [h, out_w, 3]
    std::vector<float> tmp(size_t(img.h) * out_w * 3);
    for (int y = 0; y < img.h; ++y) {
        const uint8_t* row = img.rgb.data() + size_t(y) * img.w * 3;
        float* trow = tmp.data() + size_t(y) * out_w * 3;
        for (int x = 0; x < out_w; ++x) {
            float acc[3] = {0, 0, 0};
            const float* w = tx.weights.data() + size_t(x) * tx.max_count;
            const uint8_t* px = row + size_t(tx.start[x]) * 3;
            for (int t = 0; t < tx.count[x]; ++t, px += 3) {
                acc[0] += w[t] * px[0];
                acc[1] += w[t] * px[1];
                acc[2] += w[t] * px[2];
            }
            trow[x * 3 + 0] = acc[0];
            trow[x * 3 + 1] = acc[1];
            trow[x * 3 + 2] = acc[2];
        }
    }
    // Pass 2: vertical + (x/255 - mean)/std epilogue.
    const float inv255 = 1.0f / 255.0f;
    float scl[3], off[3];
    for (int c = 0; c < 3; ++c) {
        scl[c] = inv255 / stdev[c];
        off[c] = -mean[c] / stdev[c];
    }
    for (int y = 0; y < out_h; ++y) {
        const float* w = ty.weights.data() + size_t(y) * ty.max_count;
        float* orow = out + size_t(y) * out_w * 3;
        std::fill(orow, orow + size_t(out_w) * 3, 0.0f);
        for (int t = 0; t < ty.count[y]; ++t) {
            const float* trow = tmp.data() + size_t(ty.start[y] + t) * out_w * 3;
            const float wt = w[t];
            for (int i = 0; i < out_w * 3; ++i) orow[i] += wt * trow[i];
        }
        for (int x = 0; x < out_w; ++x)
            for (int c = 0; c < 3; ++c)
                orow[x * 3 + c] = orow[x * 3 + c] * scl[c] + off[c];
    }
}

// Shared epilogue of the u8 outputs: resize via the identity-normalize
// trick (mean 0 / std 1/255 keeps the 0..255 scale), clamp, round-half-up.
// ``scratch`` is the caller's f32 staging buffer (per-thread in the batch
// path), resized here as needed.
void resize_to_u8(const Image& img, int out_h, int out_w, bool antialias,
                  std::vector<float>* scratch, uint8_t* out) {
    const size_t px = size_t(out_h) * out_w * 3;
    const float zeros[3] = {0.f, 0.f, 0.f};
    const float inv255[3] = {1.f / 255.f, 1.f / 255.f, 1.f / 255.f};
    if (scratch->size() < px) scratch->resize(px);
    resize_normalize(img, out_h, out_w, antialias, zeros, inv255,
                     scratch->data());
    for (size_t p = 0; p < px; ++p) {
        float v = (*scratch)[p];
        v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
        out[p] = uint8_t(v + 0.5f);
    }
}

}  // namespace

extern "C" {

// Decode + resize + normalize a batch of image files on a thread pool.
//   paths:   n null-terminated C strings
//   out:     [n, out_h, out_w, 3] float32, channels-last
//   ok:      [n] int64, 1 = decoded, 0 = failed (output rows zeroed)
// Returns the number of failures.
int64_t decode_batch(const char** paths, int64_t n, int out_h, int out_w,
                     int antialias, const float* mean, const float* stdev,
                     float* out, int64_t* ok, int n_threads) {
    if (n_threads <= 0)
        n_threads = std::max(1u, std::thread::hardware_concurrency());
    n_threads = int(std::min<int64_t>(n_threads, n));
    const size_t px_per_img = size_t(out_h) * out_w * 3;
    std::atomic<int64_t> next(0), failures(0);
    auto worker = [&] {
        for (;;) {
            const int64_t i = next.fetch_add(1);
            if (i >= n) return;
            Image img;
            std::vector<uint8_t> buf;
            float* dst = out + size_t(i) * px_per_img;
            if (read_file(paths[i], &buf) &&
                decode_any(buf.data(), buf.size(), &img)) {
                resize_normalize(img, out_h, out_w, antialias != 0, mean,
                                 stdev, dst);
                ok[i] = 1;
            } else {
                std::memset(dst, 0, px_per_img * sizeof(float));
                ok[i] = 0;
                failures.fetch_add(1);
            }
        }
    };
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failures.load();
}

// Batch decode + resize to uint8 RGB [n, out_h, out_w, 3] (no normalization)
// — the low-bandwidth transfer format: ship 1 byte/channel to the device and
// normalize there. Same bilinear resize as decode_batch (f32 accumulation),
// rounded to the nearest 8-bit value at the end.
int64_t decode_batch_u8(const char** paths, int64_t n, int out_h, int out_w,
                        int antialias, uint8_t* out, int64_t* ok,
                        int n_threads) {
    if (n_threads <= 0)
        n_threads = std::max(1u, std::thread::hardware_concurrency());
    n_threads = int(std::min<int64_t>(n_threads, n));
    const size_t px_per_img = size_t(out_h) * out_w * 3;
    std::atomic<int64_t> next(0), failures(0);
    auto worker = [&] {
        std::vector<float> fimg(px_per_img);
        for (;;) {
            const int64_t i = next.fetch_add(1);
            if (i >= n) return;
            Image img;
            std::vector<uint8_t> buf;
            uint8_t* dst = out + size_t(i) * px_per_img;
            if (read_file(paths[i], &buf) &&
                decode_any(buf.data(), buf.size(), &img)) {
                resize_to_u8(img, out_h, out_w, antialias != 0, &fimg, dst);
                ok[i] = 1;
            } else {
                std::memset(dst, 0, px_per_img);
                ok[i] = 0;
                failures.fetch_add(1);
            }
        }
    };
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failures.load();
}

// Decode ONE in-memory JPEG/PNG buffer and resize to uint8 RGB
// [got_h, got_w, 3] — the serving daemon's per-request fast path (bytes
// arrive over HTTP and never touch disk; pipelines/serve_http.py).
// Target size: fixed [fixed_h, fixed_w] when fixed_h > 0, else the
// longest edge capped at max_edge with a truncating scale — exactly
// serve_http._preprocess's uint8 branch (`int(h * sc)`), so `out` sized
// max(fixed, max_edge)^2 * 3 always suffices. antialias=0 is tensor-mode
// bilinear (resize_tensor_bilinear semantics). Returns 1 on success.
int decode_bytes_u8(const uint8_t* data, int64_t len, int fixed_h,
                    int fixed_w, int max_edge, int antialias, uint8_t* out,
                    int* got_h, int* got_w) {
    Image img;
    if (!decode_any(data, size_t(len), &img)) return 0;
    int oh, ow;
    if (fixed_h > 0) {
        oh = fixed_h;
        ow = fixed_w;
    } else {
        const int longest = std::max(img.h, img.w);
        const double sc = longest > max_edge ? double(max_edge) / longest : 1.0;
        oh = int(img.h * sc);
        ow = int(img.w * sc);
    }
    std::vector<float> fimg;
    resize_to_u8(img, oh, ow, antialias != 0, &fimg, out);
    *got_h = oh;
    *got_w = ow;
    return 1;
}

// Raw decode of one file to u8 RGB (no resize). Two-call protocol:
// first call with rgb_out == nullptr fills w/h; second call writes pixels.
// Returns 1 on success.
int decode_probe(const char* path, int* w, int* h, uint8_t* rgb_out) {
    std::vector<uint8_t> buf;
    Image img;
    if (!read_file(path, &buf) || !decode_any(buf.data(), buf.size(), &img))
        return 0;
    *w = img.w;
    *h = img.h;
    if (rgb_out) std::memcpy(rgb_out, img.rgb.data(), img.rgb.size());
    return 1;
}

}  // extern "C"
