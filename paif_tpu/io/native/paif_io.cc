// paif_io: native image decode for the host data pipeline.
//
// The reference feeds the GPU through PIL/cv2 in DataLoader workers; here the
// TPU-side compute is fast enough that python-level decode becomes the
// bottleneck (especially on few-core hosts). This library decodes PNG/JPEG
// into caller-provided uint8 HWC buffers, with a std::thread fan-out for
// whole batches. Exposed through ctypes (paif_tpu/io/native.py) — no
// pybind11 dependency.
//
// Build: make -C paif_tpu/io/native  (or the python wrapper builds it lazily)

#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

static int decode_png(FILE* fp, unsigned char* out, int out_h, int out_w,
                      int out_c) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if ((int)h != out_h || (int)w != out_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;
  }

  // normalize to 8-bit; expand palettes; keep gray as gray
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (out_c == 3 && (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA))
    png_set_gray_to_rgb(png);
  if (out_c == 1 && (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
                     color == PNG_COLOR_TYPE_PALETTE))
    png_set_rgb_to_gray(png, 1, -1, -1);  // default ITU coefficients
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != (size_t)out_w * out_c) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -5;
  }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out + (size_t)y * out_w * out_c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

static int decode_jpeg(FILE* fp, unsigned char* out, int out_h, int out_w,
                       int out_c) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (out_c == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != out_h || (int)cinfo.output_width != out_w ||
      (int)cinfo.output_components != out_c) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + (size_t)cinfo.output_scanline * out_w * out_c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// Public API
// ---------------------------------------------------------------------------

// Probe (h, w, native channel count). Returns 0 on success.
int paif_image_size(const char* path, int* h, int* w, int* c) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  unsigned char magic[8] = {0};
  if (fread(magic, 1, 8, fp) != 8) {
    fclose(fp);
    return -1;
  }
  rewind(fp);
  int rc = -1;
  if (!png_sig_cmp(magic, 0, 8)) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return -3;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    *h = png_get_image_height(png, info);
    *w = png_get_image_width(png, info);
    int color = png_get_color_type(png, info);
    *c = (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA) ? 1 : 3;
    png_destroy_read_struct(&png, &info, nullptr);
    rc = 0;
  } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
      jpeg_destroy_decompress(&cinfo);
      fclose(fp);
      return -3;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    *c = cinfo.num_components >= 3 ? 3 : 1;
    jpeg_destroy_decompress(&cinfo);
    rc = 0;
  }
  fclose(fp);
  return rc;
}

// Decode into a caller buffer of exactly h*w*c uint8 (c in {1,3};
// gray<->rgb conversion applied as needed). Returns 0 on success.
int paif_decode_into(const char* path, unsigned char* out, int h, int w,
                     int c) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  unsigned char magic[2] = {0};
  if (fread(magic, 1, 2, fp) != 2) {
    fclose(fp);
    return -1;
  }
  rewind(fp);
  int rc;
  if (magic[0] == 0x89 && magic[1] == 'P')
    rc = decode_png(fp, out, h, w, c);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    rc = decode_jpeg(fp, out, h, w, c);
  else
    rc = -6;
  fclose(fp);
  return rc;
}

// Threaded batch decode: n images, shared (h, w, c), contiguous output
// (n, h, w, c). status[i] receives the per-image return code.
void paif_decode_batch(const char** paths, int n, unsigned char* out, int h,
                       int w, int c, int* status, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> threads;
  const size_t stride = (size_t)h * w * c;
  for (int t = 0; t < num_threads; ++t) {
    threads.emplace_back([=]() {
      for (int i = t; i < n; i += num_threads)
        status[i] = paif_decode_into(paths[i], out + stride * i, h, w, c);
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
