// Baseline JPEG encoder (4:4:4, quality-scaled Annex-K tables), C ABI.
//
// Native replacement for the reference's stb_image_write dependency
// (/root/reference/inc/images.hpp writes frame/depth/normal maps as JPEG
// quality 90). Standard baseline algorithm: RGB -> YCbCr, per-8x8 forward
// DCT (AAN factorization), quality-scaled quantization, zigzag, and the
// JFIF standard Huffman tables. Python falls back to PIL when this library
// isn't built.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// --- standard tables (ITU T.81 Annex K) ------------------------------------

const int ZIGZAG[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

const int YQT[64] = {16, 11, 10, 16, 24,  40,  51,  61,  12, 12, 14, 19, 26,
                     58, 60, 55, 14, 13,  16,  24,  40,  57, 69, 56, 14, 17,
                     22, 29, 51, 87, 80,  62,  18,  22,  37, 56, 68, 109, 103,
                     77, 24, 35, 55, 64,  81,  104, 113, 92, 49, 64, 78,  87,
                     103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};
const int UVQT[64] = {17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99,
                      99, 99, 24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99,
                      99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
                      99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
                      99, 99, 99, 99, 99, 99, 99, 99};

const uint8_t DC_L_BITS[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0};
const uint8_t DC_L_VALS[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const uint8_t DC_C_BITS[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0};
const uint8_t DC_C_VALS[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const uint8_t AC_L_BITS[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d};
const uint8_t AC_L_VALS[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};
const uint8_t AC_C_BITS[17] = {0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77};
const uint8_t AC_C_VALS[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

struct HuffCode {
  uint16_t code[256];
  uint8_t len[256];
};

void build_huff(const uint8_t *bits, const uint8_t *vals, HuffCode *h) {
  std::memset(h->len, 0, sizeof(h->len));
  uint16_t code = 0;
  int k = 0;
  for (int l = 1; l <= 16; l++) {
    for (int i = 0; i < bits[l]; i++) {
      h->code[vals[k]] = code;
      h->len[vals[k]] = uint8_t(l);
      code++;
      k++;
    }
    code <<= 1;
  }
}

struct BitWriter {
  std::vector<uint8_t> *out;
  uint32_t acc = 0;
  int nbits = 0;
  void put(uint16_t code, int len) {
    acc = (acc << len) | code;
    nbits += len;
    while (nbits >= 8) {
      uint8_t b = uint8_t((acc >> (nbits - 8)) & 0xff);
      out->push_back(b);
      if (b == 0xff) out->push_back(0x00);  // byte stuffing
      nbits -= 8;
    }
  }
  void flush() {
    if (nbits) put(uint16_t((1 << (8 - nbits)) - 1), 8 - nbits);
  }
};

// AAN forward DCT on an 8x8 block (floats), as in the IJG/stb encoders.
void fdct8x8(float *d) {
  for (int pass = 0; pass < 2; pass++) {
    for (int i = 0; i < 8; i++) {
      float *p = pass == 0 ? d + 8 * i : d + i;
      int s = pass == 0 ? 1 : 8;
      float d0 = p[0 * s], d1 = p[1 * s], d2 = p[2 * s], d3 = p[3 * s];
      float d4 = p[4 * s], d5 = p[5 * s], d6 = p[6 * s], d7 = p[7 * s];
      float tmp0 = d0 + d7, tmp7 = d0 - d7;
      float tmp1 = d1 + d6, tmp6 = d1 - d6;
      float tmp2 = d2 + d5, tmp5 = d2 - d5;
      float tmp3 = d3 + d4, tmp4 = d3 - d4;
      float tmp10 = tmp0 + tmp3, tmp13 = tmp0 - tmp3;
      float tmp11 = tmp1 + tmp2, tmp12 = tmp1 - tmp2;
      p[0 * s] = tmp10 + tmp11;
      p[4 * s] = tmp10 - tmp11;
      float z1 = (tmp12 + tmp13) * 0.707106781f;
      p[2 * s] = tmp13 + z1;
      p[6 * s] = tmp13 - z1;
      tmp10 = tmp4 + tmp5;
      tmp11 = tmp5 + tmp6;
      tmp12 = tmp6 + tmp7;
      float z5 = (tmp10 - tmp12) * 0.382683433f;
      float z2 = tmp10 * 0.541196100f + z5;
      float z4 = tmp12 * 1.306562965f + z5;
      float z3 = tmp11 * 0.707106781f;
      float z11 = tmp7 + z3, z13 = tmp7 - z3;
      p[5 * s] = z13 + z2;
      p[3 * s] = z13 - z2;
      p[1 * s] = z11 + z4;
      p[7 * s] = z11 - z4;
    }
  }
}

// AAN output scaling factors
void aan_scale(float *fdtbl, const uint8_t *qt) {
  static const float aasf[8] = {1.0f,          1.387039845f, 1.306562965f,
                                1.175875602f,  1.0f,         0.785694958f,
                                0.541196100f,  0.275899379f};
  for (int row = 0, k = 0; row < 8; row++)
    for (int col = 0; col < 8; col++, k++)
      fdtbl[k] = 1.0f / (qt[ZIGZAG[k]] * aasf[row] * aasf[col] * 8.0f);
}

int encode_block(BitWriter &bw, float *blk, const float *fdtbl, int dc_prev,
                 const HuffCode &hdc, const HuffCode &hac) {
  fdct8x8(blk);
  int du[64];
  for (int k = 0; k < 64; k++) {
    float v = blk[ZIGZAG[k]] * fdtbl[k];
    du[k] = int(v < 0 ? v - 0.5f : v + 0.5f);
  }
  // DC
  int diff = du[0] - dc_prev;
  if (diff == 0) {
    bw.put(hdc.code[0], hdc.len[0]);
  } else {
    int tmp = diff < 0 ? -diff : diff;
    int nb = 0;
    while (tmp) {
      nb++;
      tmp >>= 1;
    }
    int bits = diff < 0 ? diff + (1 << nb) - 1 : diff;
    bw.put(hdc.code[nb], hdc.len[nb]);
    bw.put(uint16_t(bits & ((1 << nb) - 1)), nb);
  }
  // AC
  int end = 63;
  while (end > 0 && du[end] == 0) end--;
  int run = 0;
  for (int k = 1; k <= end; k++) {
    if (du[k] == 0) {
      run++;
      continue;
    }
    while (run > 15) {
      bw.put(hac.code[0xf0], hac.len[0xf0]);
      run -= 16;
    }
    int tmp = du[k] < 0 ? -du[k] : du[k];
    int nb = 0;
    while (tmp) {
      nb++;
      tmp >>= 1;
    }
    int bits = du[k] < 0 ? du[k] + (1 << nb) - 1 : du[k];
    int sym = (run << 4) | nb;
    bw.put(hac.code[sym], hac.len[sym]);
    bw.put(uint16_t(bits & ((1 << nb) - 1)), nb);
    run = 0;
  }
  if (end != 63) bw.put(hac.code[0x00], hac.len[0x00]);  // EOB
  return du[0];
}

void put16(std::vector<uint8_t> &o, uint16_t v) {
  o.push_back(uint8_t(v >> 8));
  o.push_back(uint8_t(v & 0xff));
}

}  // namespace

extern "C" {

// Encode an interleaved RGB8 image as baseline JPEG. Returns 0 on success.
int cutrace_jpeg_write(const char *path, const uint8_t *rgb, int w, int h,
                       int quality) {
  if (w <= 0 || h <= 0 || !rgb) return 1;
  if (quality < 1) quality = 1;
  if (quality > 100) quality = 100;
  int scale = quality < 50 ? 5000 / quality : 200 - quality * 2;

  uint8_t yq[64], cq[64];
  for (int i = 0; i < 64; i++) {
    int yv = (YQT[i] * scale + 50) / 100;
    int cv = (UVQT[i] * scale + 50) / 100;
    yq[i] = uint8_t(yv < 1 ? 1 : (yv > 255 ? 255 : yv));
    cq[i] = uint8_t(cv < 1 ? 1 : (cv > 255 ? 255 : cv));
  }
  float fdy[64], fdc[64];
  aan_scale(fdy, yq);
  aan_scale(fdc, cq);

  HuffCode hdcl, hacl, hdcc, hacc;
  build_huff(DC_L_BITS, DC_L_VALS, &hdcl);
  build_huff(AC_L_BITS, AC_L_VALS, &hacl);
  build_huff(DC_C_BITS, DC_C_VALS, &hdcc);
  build_huff(AC_C_BITS, AC_C_VALS, &hacc);

  std::vector<uint8_t> out;
  out.reserve(size_t(w) * h / 2 + 1024);
  // SOI + JFIF APP0
  const uint8_t head[] = {0xff, 0xd8, 0xff, 0xe0, 0, 16, 'J', 'F', 'I', 'F',
                          0, 1, 1, 0, 0, 1, 0, 1, 0, 0};
  out.insert(out.end(), head, head + sizeof(head));
  // DQT
  out.push_back(0xff);
  out.push_back(0xdb);
  put16(out, 132);
  out.push_back(0);
  for (int i = 0; i < 64; i++) out.push_back(yq[ZIGZAG[i]]);
  out.push_back(1);
  for (int i = 0; i < 64; i++) out.push_back(cq[ZIGZAG[i]]);
  // SOF0: 8-bit, 3 components, 4:4:4
  out.push_back(0xff);
  out.push_back(0xc0);
  put16(out, 17);
  out.push_back(8);
  put16(out, uint16_t(h));
  put16(out, uint16_t(w));
  out.push_back(3);
  const uint8_t sof[] = {1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1};
  out.insert(out.end(), sof, sof + 9);
  // DHT x4
  auto dht = [&](uint8_t cls_id, const uint8_t *bits, const uint8_t *vals,
                 int nvals) {
    out.push_back(0xff);
    out.push_back(0xc4);
    put16(out, uint16_t(2 + 1 + 16 + nvals));
    out.push_back(cls_id);
    for (int i = 1; i <= 16; i++) out.push_back(bits[i]);
    for (int i = 0; i < nvals; i++) out.push_back(vals[i]);
  };
  dht(0x00, DC_L_BITS, DC_L_VALS, 12);
  dht(0x10, AC_L_BITS, AC_L_VALS, 162);
  dht(0x01, DC_C_BITS, DC_C_VALS, 12);
  dht(0x11, AC_C_BITS, AC_C_VALS, 162);
  // SOS
  const uint8_t sos[] = {0xff, 0xda, 0, 12, 3, 1, 0x00,
                         2,    0x11, 3, 0x11, 0, 63, 0};
  out.insert(out.end(), sos, sos + sizeof(sos));

  BitWriter bw{&out};
  int dcy = 0, dcb = 0, dcr = 0;
  float Y[64], Cb[64], Cr[64];
  for (int by = 0; by < h; by += 8) {
    for (int bx = 0; bx < w; bx += 8) {
      for (int y = 0; y < 8; y++) {
        int sy = by + y >= h ? h - 1 : by + y;
        for (int x = 0; x < 8; x++) {
          int sx = bx + x >= w ? w - 1 : bx + x;
          const uint8_t *px = rgb + 3 * (size_t(sy) * w + sx);
          float r = px[0], g = px[1], b = px[2];
          Y[8 * y + x] = 0.299f * r + 0.587f * g + 0.114f * b - 128.0f;
          Cb[8 * y + x] = -0.168736f * r - 0.331264f * g + 0.5f * b;
          Cr[8 * y + x] = 0.5f * r - 0.418688f * g - 0.081312f * b;
        }
      }
      dcy = encode_block(bw, Y, fdy, dcy, hdcl, hacl);
      dcb = encode_block(bw, Cb, fdc, dcb, hdcc, hacc);
      dcr = encode_block(bw, Cr, fdc, dcr, hdcc, hacc);
    }
  }
  bw.flush();
  out.push_back(0xff);
  out.push_back(0xd9);  // EOI

  FILE *f = std::fopen(path, "wb");
  if (!f) return 2;
  size_t wrote = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return wrote == out.size() ? 0 : 3;
}

}  // extern "C"
