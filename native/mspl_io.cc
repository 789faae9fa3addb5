// mspl_io — native data-path runtime for mspl_tpu.
//
// The reference parallelizes its file edge with DataLoader worker processes
// (PIL decode, SURVEY.md §2 parallelism table).  Here the file edge is a
// small C++ library instead: a PNG codec (zlib) plus a pthread batch decoder
// that fills a preallocated uint8 batch buffer directly — no Python objects,
// no GIL, one memcpy into the host staging buffer that jax.device_put DMAs
// to the TPU.  Bound via ctypes (no pybind11 in this image).
//
// Supported PNG subset (covers every file this framework reads/writes):
// 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
// 6 (RGBA); non-interlaced; all five scanline filters.  Encoder writes
// 8-bit grayscale (label maps) and RGB (visualizations).
//
// Build: g++ -O3 -fPIC -shared -pthread mspl_io.cc -lz -o libmspl_io.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kPngSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void put_be32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

struct Image {
  int w = 0, h = 0, c = 0;  // c = channels after palette expansion
  std::vector<uint8_t> px;  // h*w*c
};

// ---------------------------------------------------------------- decode --
// keep_palette_indices: return raw palette indices as 1 channel (label maps
// store the class id in the palette index) instead of expanding to RGB.
int decode_png(const uint8_t* data, size_t len, Image* out,
               bool keep_palette_indices = false) {
  if (len < 8 || memcmp(data, kPngSig, 8) != 0) return -1;
  size_t pos = 8;
  int w = 0, h = 0, bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // 3*n
  while (pos + 8 <= len) {
    uint32_t clen = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + clen > len) return -2;
    if (!memcmp(type, "IHDR", 4)) {
      w = be32(body); h = be32(body + 4);
      bit_depth = body[8]; color_type = body[9];
      interlace = body[12];
      if (bit_depth != 8 || interlace != 0) return -3;  // unsupported
    } else if (!memcmp(type, "PLTE", 4)) {
      palette.assign(body, body + clen);
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), body, body + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (w <= 0 || h <= 0) return -2;
  int src_c;
  switch (color_type) {
    case 0: src_c = 1; break;  // gray
    case 2: src_c = 3; break;  // rgb
    case 3: src_c = 1; break;  // palette index
    case 4: src_c = 2; break;  // gray+alpha
    case 6: src_c = 4; break;  // rgba
    default: return -3;
  }
  size_t stride = size_t(w) * src_c;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return -4;
  if (raw_len != raw.size()) return -4;

  // unfilter in place into `img`
  std::vector<uint8_t> img(stride * h);
  const int bpp = src_c;
  for (int y = 0; y < h; ++y) {
    uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = img.data() + stride * y;
    const uint8_t* up = y ? img.data() + stride * (y - 1) : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -5;
      }
      dst[x] = uint8_t(v);
    }
  }

  // expand palette / drop alpha
  if (color_type == 3 && keep_palette_indices) {
    out->w = w; out->h = h; out->c = 1;
    out->px = std::move(img);
  } else if (color_type == 3) {
    if (palette.empty()) return -6;
    out->w = w; out->h = h; out->c = 3;
    out->px.resize(size_t(w) * h * 3);
    for (size_t i = 0; i < size_t(w) * h; ++i) {
      int idx = img[i] * 3;
      out->px[i * 3 + 0] = idx + 2 < int(palette.size()) ? palette[idx] : 0;
      out->px[i * 3 + 1] = idx + 2 < int(palette.size()) ? palette[idx + 1] : 0;
      out->px[i * 3 + 2] = idx + 2 < int(palette.size()) ? palette[idx + 2] : 0;
    }
  } else if (color_type == 4 || color_type == 6) {
    int keep = color_type == 4 ? 1 : 3;
    out->w = w; out->h = h; out->c = keep;
    out->px.resize(size_t(w) * h * keep);
    for (size_t i = 0; i < size_t(w) * h; ++i)
      for (int ch = 0; ch < keep; ++ch)
        out->px[i * keep + ch] = img[i * src_c + ch];
  } else {
    out->w = w; out->h = h; out->c = src_c;
    out->px = std::move(img);
  }
  return 0;
}

// nearest (labels) / bilinear half-pixel (images) resize, uint8
void resize_u8(const Image& src, uint8_t* dst, int oh, int ow, int oc,
               bool bilinear) {
  // channel adaptation: gray->rgb replicate, rgb->gray take first channel
  auto sample = [&](int y, int x, int ch) -> uint8_t {
    int sc = src.c == oc ? ch : (src.c == 1 ? 0 : (ch < src.c ? ch : 0));
    return src.px[(size_t(y) * src.w + x) * src.c + sc];
  };
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      if (!bilinear) {
        int sy = int((int64_t(y) * src.h) / oh);
        int sx = int((int64_t(x) * src.w) / ow);
        for (int ch = 0; ch < oc; ++ch)
          dst[(size_t(y) * ow + x) * oc + ch] = sample(sy, sx, ch);
      } else {
        float fy = (y + 0.5f) * src.h / oh - 0.5f;
        float fx = (x + 0.5f) * src.w / ow - 0.5f;
        if (fy < 0) fy = 0; if (fx < 0) fx = 0;
        int y0 = int(fy), x0 = int(fx);
        int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
        int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
        float wy = fy - y0, wx = fx - x0;
        for (int ch = 0; ch < oc; ++ch) {
          float v = (1 - wy) * ((1 - wx) * sample(y0, x0, ch) +
                                wx * sample(y0, x1, ch)) +
                    wy * ((1 - wx) * sample(y1, x0, ch) +
                          wx * sample(y1, x1, ch));
          dst[(size_t(y) * ow + x) * oc + ch] = uint8_t(v + 0.5f);
        }
      }
    }
  }
}

int decode_file_into(const char* path, uint8_t* dst, int oh, int ow, int oc,
                     bool bilinear) {
  const bool keep_palette = (oc == 1);
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != size_t(n)) { fclose(f); return -11; }
  fclose(f);
  Image img;
  int rc = decode_png(buf.data(), buf.size(), &img, keep_palette);
  if (rc) return rc;
  if (img.w == ow && img.h == oh && img.c == oc) {
    memcpy(dst, img.px.data(), img.px.size());
  } else {
    resize_u8(img, dst, oh, ow, oc, bilinear);
  }
  return 0;
}

// ---------------------------------------------------------------- encode --
void append_chunk(std::vector<uint8_t>* out, const char* type,
                  const uint8_t* body, size_t len) {
  size_t start = out->size();
  out->resize(start + 12 + len);
  uint8_t* p = out->data() + start;
  put_be32(p, uint32_t(len));
  memcpy(p + 4, type, 4);
  if (len) memcpy(p + 8, body, len);
  uint32_t crc = crc32(0, p + 4, uInt(len + 4));
  put_be32(p + 8 + len, crc);
}

int encode_png(const uint8_t* img, int h, int w, int c,
               std::vector<uint8_t>* out) {
  if (c != 1 && c != 3) return -1;
  out->assign(kPngSig, kPngSig + 8);
  uint8_t ihdr[13];
  put_be32(ihdr, uint32_t(w));
  put_be32(ihdr + 4, uint32_t(h));
  ihdr[8] = 8;                      // bit depth
  ihdr[9] = c == 1 ? 0 : 2;         // gray / rgb
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  append_chunk(out, "IHDR", ihdr, 13);

  size_t stride = size_t(w) * c;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[(stride + 1) * y] = 0;  // filter none
    memcpy(raw.data() + (stride + 1) * y + 1, img + stride * y, stride);
  }
  uLongf bound = compressBound(raw.size());
  std::vector<uint8_t> comp(bound);
  if (compress2(comp.data(), &bound, raw.data(), raw.size(), 6) != Z_OK)
    return -2;
  append_chunk(out, "IDAT", comp.data(), bound);
  append_chunk(out, "IEND", nullptr, 0);
  return 0;
}

}  // namespace

extern "C" {

// Decode one PNG file into a caller-owned uint8 buffer [oh, ow, oc],
// resizing if needed (bilinear=1 images, 0 nearest/labels).  Returns 0 on ok.
int mspl_decode_png_file(const char* path, uint8_t* dst, int oh, int ow,
                         int oc, int bilinear) {
  return decode_file_into(path, dst, oh, ow, oc, bilinear != 0);
}

// Decode a batch of PNG files in parallel into dst [n, oh, ow, oc].
// rc_out (len n) receives per-file status.  Returns first nonzero status.
int mspl_decode_png_batch(const char** paths, int n, uint8_t* dst, int oh,
                          int ow, int oc, int bilinear, int num_threads,
                          int* rc_out) {
  if (num_threads < 1) num_threads = 1;
  size_t item = size_t(oh) * ow * oc;
  std::vector<std::thread> threads;
  int shard = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int lo = t * shard, hi = std::min(n, lo + shard);
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int i = lo; i < hi; ++i)
        rc_out[i] = decode_file_into(paths[i], dst + item * i, oh, ow, oc,
                                     bilinear != 0);
    });
  }
  for (auto& th : threads) th.join();
  for (int i = 0; i < n; ++i)
    if (rc_out[i]) return rc_out[i];
  return 0;
}

// Encode + write to file.  Returns 0 on ok.
int mspl_encode_png_file(const char* path, const uint8_t* img, int h, int w,
                         int c) {
  std::vector<uint8_t> out;
  int rc = encode_png(img, h, w, c, &out);
  if (rc) return rc;
  FILE* f = fopen(path, "wb");
  if (!f) return -10;
  size_t written = fwrite(out.data(), 1, out.size(), f);
  fclose(f);
  return written == out.size() ? 0 : -11;
}

}  // extern "C"
