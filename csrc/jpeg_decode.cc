// Native JPEG decode + crop/resize/flip for the host input pipeline.
//
// The Python pipeline's per-worker PIL decode measured 221-281 img/s on
// one core (docs/inputtable_r3.json), which puts the 24k img/s 8-chip
// input budget at ~100 workers — thin. libjpeg's DCT-domain scaling
// (scale_num/8) lets the decoder produce the smallest plane that still
// covers the requested crop at >= out_dim resolution, so most of the
// IDCT work for large sources vanishes; the crop+bilinear resample then
// runs over the reduced plane. Exported as a tiny C ABI consumed via
// ctypes (resnet_tpu/data/native_jpeg.py); crop-box RNG stays in Python
// so augmentation semantics match the PIL path.
//
// Build: make -C csrc (target build/libresnet_jpeg.so, links -ljpeg).

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  std::longjmp(e->jb, 1);
}

// separable bilinear: (sh, sw, 3) uint8 -> (out, out, 3) uint8,
// optional horizontal flip fused into the output write
void bilinear_resize(const unsigned char* src, int sh, int sw,
                     unsigned char* dst, int out, int flip) {
  std::vector<int> x0(out), x1(out);
  std::vector<float> fx(out);
  for (int o = 0; o < out; ++o) {
    float sx = (o + 0.5f) * sw / out - 0.5f;
    if (sx < 0) sx = 0;
    if (sx > sw - 1) sx = float(sw - 1);
    x0[o] = int(sx);
    x1[o] = x0[o] + 1 < sw ? x0[o] + 1 : sw - 1;
    fx[o] = sx - x0[o];
  }
  for (int oy = 0; oy < out; ++oy) {
    float sy = (oy + 0.5f) * sh / out - 0.5f;
    if (sy < 0) sy = 0;
    if (sy > sh - 1) sy = float(sh - 1);
    int y0 = int(sy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float fy = sy - y0;
    const unsigned char* r0 = src + size_t(y0) * sw * 3;
    const unsigned char* r1 = src + size_t(y1) * sw * 3;
    unsigned char* orow = dst + size_t(oy) * out * 3;
    for (int ox = 0; ox < out; ++ox) {
      int a = x0[ox] * 3, b = x1[ox] * 3;
      float f = fx[ox];
      int wx = flip ? (out - 1 - ox) * 3 : ox * 3;
      for (int c = 0; c < 3; ++c) {
        float top = r0[a + c] + f * (r0[b + c] - r0[a + c]);
        float bot = r1[a + c] + f * (r1[b + c] - r1[a + c]);
        float v = top + fy * (bot - top);
        orow[wx + c] = (unsigned char)(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Header-only parse: source dimensions. Returns 0 on success.
int rtpu_jpeg_dims(const unsigned char* data, unsigned long len,
                   int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode, crop (x0,y0,cw,ch in ORIGINAL coords), bilinear-resize to
// (out_dim, out_dim), optional horizontal flip. out = uint8 RGB HWC.
// Returns 0 on success, nonzero on decode error.
int rtpu_decode_crop(const unsigned char* data, unsigned long len,
                     int out_dim, int x0, int y0, int cw, int ch,
                     int flip, unsigned char* out) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  // decode buffers are malloc'd (not std::vector): a libjpeg error
  // longjmps back here, which would skip C++ destructors of any object
  // whose lifetime began after setjmp — each corrupt image would leak
  // its buffers in a long-lived worker. volatile pins the pointer values
  // across the longjmp so the error path can free them.
  unsigned char* volatile rowbuf = nullptr;
  unsigned char* volatile cropbuf = nullptr;
  if (setjmp(jerr.jb)) {
    std::free(rowbuf);
    std::free(cropbuf);
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  jpeg_read_header(&cinfo, TRUE);

  // smallest DCT scale (num/8, num=1..8) whose scaled crop still covers
  // out_dim on both axes (no upsampling loss); full size if crop < out
  int num = 8;
  for (int n = 1; n <= 8; ++n) {
    if ((long)cw * n / 8 >= out_dim && (long)ch * n / 8 >= out_dim) {
      num = n;
      break;
    }
  }
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width, sh = cinfo.output_height;

  // crop box in scaled coords, clamped
  auto scale = [&](int v) { return (int)((long)v * num / 8); };
  int sx0 = scale(x0), sy0 = scale(y0);
  int scw = scale(cw), sch = scale(ch);
  if (scw < 1) scw = 1;
  if (sch < 1) sch = 1;
  if (sx0 + scw > sw) sx0 = sw - scw < 0 ? 0 : sw - scw;
  if (sy0 + sch > sh) sy0 = sh - sch < 0 ? 0 : sh - sch;
  if (scw > sw) scw = sw;
  if (sch > sh) sch = sh;
  // the over-extent test above misses a still-negative origin when
  // scw == sw+1 (then sx0+scw > sw is false for sx0 == -1): a negative
  // origin would wrap in the unsigned JDIMENSION crop argument
  if (sx0 < 0) sx0 = 0;
  if (sy0 < 0) sy0 = 0;

  // partial decode (libjpeg-turbo API): restrict columns to the iMCU
  // span covering the crop, skip the rows above it, stop after it —
  // only the crop's DCT blocks are ever inverse-transformed
  JDIMENSION cx = sx0, cwid = scw;
  jpeg_crop_scanline(&cinfo, &cx, &cwid);  // widens to iMCU bounds
  const int rel_x = sx0 - (int)cx;         // crop offset inside the span
  if (sy0 > 0) jpeg_skip_scanlines(&cinfo, sy0);

  rowbuf = static_cast<unsigned char*>(std::malloc(size_t(cwid) * 3));
  cropbuf = static_cast<unsigned char*>(std::malloc(size_t(scw) * sch * 3));
  if (!rowbuf || !cropbuf) {
    std::free(rowbuf);
    std::free(cropbuf);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  JSAMPROW rp[1] = {rowbuf};
  for (int y = 0; y < sch; ++y) {
    jpeg_read_scanlines(&cinfo, rp, 1);
    std::memcpy(cropbuf + size_t(y) * scw * 3,
                rowbuf + size_t(rel_x) * 3, size_t(scw) * 3);
  }
  jpeg_abort_decompress(&cinfo);  // rows below the crop are never decoded
  jpeg_destroy_decompress(&cinfo);
  // no libjpeg calls (so no longjmp) past this point
  unsigned char* crop = cropbuf;

  // anti-aliased two-stage resample: integer k x k box reduction while
  // the crop is >= 2x the target (PIL's BILINEAR downscale is
  // area-adaptive; plain 2x2-tap bilinear at large ratios aliases), then
  // bilinear for the fractional remainder
  int k = scw / out_dim < sch / out_dim ? scw / out_dim : sch / out_dim;
  if (k >= 2) {
    int rw = scw / k, rh = sch / k;
    std::vector<unsigned char> red(size_t(rw) * rh * 3);
    const float inv = 1.0f / (k * k);
    for (int y = 0; y < rh; ++y) {
      for (int x = 0; x < rw; ++x) {
        float acc[3] = {0, 0, 0};
        for (int dy = 0; dy < k; ++dy) {
          const unsigned char* r =
              crop + (size_t(y) * k + dy) * scw * 3 + size_t(x) * k * 3;
          for (int dx = 0; dx < k; ++dx)
            for (int c = 0; c < 3; ++c) acc[c] += r[dx * 3 + c];
        }
        unsigned char* o = red.data() + (size_t(y) * rw + x) * 3;
        for (int c = 0; c < 3; ++c) o[c] = (unsigned char)(acc[c] * inv + 0.5f);
      }
    }
    bilinear_resize(red.data(), rh, rw, out, out_dim, flip);
  } else {
    bilinear_resize(crop, sch, scw, out, out_dim, flip);
  }
  std::free(rowbuf);
  std::free(cropbuf);
  return 0;
}

}  // extern "C"
