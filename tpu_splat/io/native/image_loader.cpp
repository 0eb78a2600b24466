// Native image decode + resample for the training dataloader.
//
// TPU-native equivalent of the reference's native IO path (src/core/image_io.cpp: OpenImageIO
// decode on dataloader worker threads into pinned buffers, SURVEY.md §8.10). Python threads
// call these functions through ctypes, which releases the GIL for the duration of the call —
// decodes from the prefetch pool run truly in parallel, like the reference's
// torch-dataloader workers.
//
// Pipeline per image (image_io.cpp:114-200 semantics):
//   decode (libjpeg / libpng) -> RGB u8 -> integer-factor box resample (resize_factor)
//   -> long-side cap to max_width (bilinear) -> float32 CHW in [0,1].
//
// Build: g++ -O3 -shared -fPIC image_loader.cpp -ljpeg -lpng -o libtpusplat_io.so
// (compiled on first import by native_loader.py; no pip packages involved).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, std::vector<uint8_t>& rgb, int& w, int& h) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    rgb.resize(static_cast<size_t>(w) * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

bool decode_png(FILE* f, std::vector<uint8_t>& rgb, int& w, int& h) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
    png_init_io(png, f);
    png_read_info(png, info);
    w = png_get_image_width(png, info);
    h = png_get_image_height(png, info);
    png_byte color_type = png_get_color_type(png, info);
    png_byte bit_depth = png_get_bit_depth(png, info);

    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    // drop alpha (image_io.cpp: alpha dropped)
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);

    rgb.resize(static_cast<size_t>(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y) rows[y] = rgb.data() + static_cast<size_t>(y) * w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

// integer-factor box resample, u8 RGB
void box_resample(const std::vector<uint8_t>& src, int w, int h, int factor,
                  std::vector<uint8_t>& dst, int& ow, int& oh) {
    ow = w / factor;
    oh = h / factor;
    dst.resize(static_cast<size_t>(ow) * oh * 3);
    const int area = factor * factor;
    for (int y = 0; y < oh; ++y) {
        for (int x = 0; x < ow; ++x) {
            int acc[3] = {0, 0, 0};
            for (int dy = 0; dy < factor; ++dy) {
                const uint8_t* row = src.data() +
                    (static_cast<size_t>(y * factor + dy) * w + x * factor) * 3;
                for (int dx = 0; dx < factor; ++dx) {
                    acc[0] += row[dx * 3 + 0];
                    acc[1] += row[dx * 3 + 1];
                    acc[2] += row[dx * 3 + 2];
                }
            }
            uint8_t* out = dst.data() + (static_cast<size_t>(y) * ow + x) * 3;
            out[0] = static_cast<uint8_t>(acc[0] / area);
            out[1] = static_cast<uint8_t>(acc[1] / area);
            out[2] = static_cast<uint8_t>(acc[2] / area);
        }
    }
}

// bilinear resample, u8 RGB
void bilinear_resample(const std::vector<uint8_t>& src, int w, int h,
                       std::vector<uint8_t>& dst, int ow, int oh) {
    dst.resize(static_cast<size_t>(ow) * oh * 3);
    const float sx = static_cast<float>(w) / ow;
    const float sy = static_cast<float>(h) / oh;
    for (int y = 0; y < oh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = std::clamp(static_cast<int>(fy), 0, h - 1);
        int y1 = std::min(y0 + 1, h - 1);
        float wy = std::clamp(fy - y0, 0.0f, 1.0f);
        for (int x = 0; x < ow; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = std::clamp(static_cast<int>(fx), 0, w - 1);
            int x1 = std::min(x0 + 1, w - 1);
            float wx = std::clamp(fx - x0, 0.0f, 1.0f);
            uint8_t* out = dst.data() + (static_cast<size_t>(y) * ow + x) * 3;
            for (int c = 0; c < 3; ++c) {
                float v00 = src[(static_cast<size_t>(y0) * w + x0) * 3 + c];
                float v01 = src[(static_cast<size_t>(y0) * w + x1) * 3 + c];
                float v10 = src[(static_cast<size_t>(y1) * w + x0) * 3 + c];
                float v11 = src[(static_cast<size_t>(y1) * w + x1) * 3 + c];
                float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                          wy * ((1 - wx) * v10 + wx * v11);
                out[c] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
}

bool has_suffix(const std::string& s, const char* suf) {
    std::string lower;
    lower.reserve(s.size());
    for (char c : s) lower.push_back(static_cast<char>(std::tolower(c)));
    std::string sufs(suf);
    return lower.size() >= sufs.size() &&
           lower.compare(lower.size() - sufs.size(), sufs.size(), sufs) == 0;
}

}  // namespace

extern "C" {

// Returns 0 on success. Probes decoded-after-resize dimensions only.
int tpusplat_image_size(const char* path, int resize_factor, int max_width,
                        int* out_w, int* out_h) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    int w = 0, h = 0;
    int ok = 1;
    std::string p(path);
    if (has_suffix(p, ".png")) {
        png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
        png_infop info = png_create_info_struct(png);
        if (png && info && !setjmp(png_jmpbuf(png))) {
            png_init_io(png, f);
            png_read_info(png, info);
            w = png_get_image_width(png, info);
            h = png_get_image_height(png, info);
            ok = 0;
        }
        png_destroy_read_struct(&png, &info, nullptr);
    } else {
        jpeg_decompress_struct cinfo;
        JpegErrorMgr jerr;
        cinfo.err = jpeg_std_error(&jerr.pub);
        jerr.pub.error_exit = jpeg_error_exit;
        if (!setjmp(jerr.setjmp_buffer)) {
            jpeg_create_decompress(&cinfo);
            jpeg_stdio_src(&cinfo, f);
            jpeg_read_header(&cinfo, TRUE);
            w = cinfo.image_width;
            h = cinfo.image_height;
            ok = 0;
        }
        jpeg_destroy_decompress(&cinfo);
    }
    fclose(f);
    if (ok) return 1;
    if (resize_factor > 1) {
        w /= resize_factor;
        h /= resize_factor;
    }
    int long_side = std::max(w, h);
    if (max_width > 0 && long_side > max_width) {
        double s = static_cast<double>(max_width) / long_side;
        w = static_cast<int>(w * s + 0.5);
        h = static_cast<int>(h * s + 0.5);
    }
    *out_w = w;
    *out_h = h;
    return 0;
}

// Decode + resample into caller-allocated float32 CHW buffer of size 3*out_w*out_h.
// out_w/out_h must come from tpusplat_image_size with the same arguments.
int tpusplat_load_image(const char* path, int resize_factor, int max_width,
                        float* out_chw, int out_w, int out_h) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    bool ok = has_suffix(path, ".png") ? decode_png(f, rgb, w, h)
                                       : decode_jpeg(f, rgb, w, h);
    fclose(f);
    if (!ok) return 2;

    std::vector<uint8_t> tmp;
    if (resize_factor > 1) {
        int ow, oh;
        box_resample(rgb, w, h, resize_factor, tmp, ow, oh);
        rgb.swap(tmp);
        w = ow;
        h = oh;
    }
    if (w != out_w || h != out_h) {
        bilinear_resample(rgb, w, h, tmp, out_w, out_h);
        rgb.swap(tmp);
        w = out_w;
        h = out_h;
    }

    // HWC u8 -> CHW f32 in [0,1]
    const size_t plane = static_cast<size_t>(out_w) * out_h;
    constexpr float inv255 = 1.0f / 255.0f;
    for (size_t i = 0; i < plane; ++i) {
        out_chw[i] = rgb[i * 3 + 0] * inv255;
        out_chw[plane + i] = rgb[i * 3 + 1] * inv255;
        out_chw[2 * plane + i] = rgb[i * 3 + 2] * inv255;
    }
    return 0;
}

}  // extern "C"
