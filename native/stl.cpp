// STL mesh importer (binary + ASCII), C ABI for ctypes.
//
// Native replacement for the reference's Assimp dependency
// (/root/reference/inc/default_schema.hpp:516-545 imports meshes via Assimp
// and flattens every sub-mesh into one triangle list). All four bundled
// assets are binary STL, so a self-contained STL reader covers the
// reference's actual usage; the Python loader keeps a pure-Python fallback
// when this library isn't built.
//
// Binary STL layout: 80-byte header, uint32 triangle count, then per
// triangle: 12 floats (normal + 3 vertices) + uint16 attribute byte count.
// ASCII STL: "solid ... facet normal ... vertex x y z ... endsolid".

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#ifndef _GNU_SOURCE
#define _GNU_SOURCE
#endif
#include <vector>

namespace {

bool looks_binary(const unsigned char *data, size_t len) {
  if (len < 84) return false;
  uint32_t n;
  std::memcpy(&n, data + 80, 4);
  // exact binary size match is the strongest signal
  if (84 + size_t(n) * 50 == len) return true;
  // otherwise: ASCII files start with "solid" and contain "facet"
  std::string head(reinterpret_cast<const char *>(data),
                   std::min<size_t>(len, 512));
  if (head.rfind("solid", 0) == 0 &&
      head.find("facet") != std::string::npos)
    return false;
  return true;
}

float *parse_binary(const unsigned char *data, size_t len, int64_t *count) {
  if (len < 84) return nullptr;
  uint32_t n;
  std::memcpy(&n, data + 80, 4);
  if (84 + size_t(n) * 50 > len) return nullptr;
  float *out = static_cast<float *>(std::malloc(sizeof(float) * 9 * n));
  if (!out) return nullptr;
  const unsigned char *p = data + 84;
  for (uint32_t i = 0; i < n; i++) {
    // skip the 3-float normal, copy 9 vertex floats
    std::memcpy(out + 9 * i, p + 12, 36);
    p += 50;
  }
  *count = n;
  return out;
}

float *parse_ascii(const char *text, size_t len, int64_t *count) {
  std::vector<float> verts;
  const char *p = text;
  const char *end = text + len;
  while (p < end) {
    // find "vertex"
    const char *v = static_cast<const char *>(
        memmem(p, size_t(end - p), "vertex", 6));
    if (!v) break;
    p = v + 6;
    char *next = nullptr;
    for (int k = 0; k < 3; k++) {
      float f = std::strtof(p, &next);
      if (next == p) return nullptr;  // malformed
      verts.push_back(f);
      p = next;
    }
  }
  if (verts.size() % 9 != 0) return nullptr;
  *count = int64_t(verts.size() / 9);
  float *out = static_cast<float *>(std::malloc(verts.size() * sizeof(float)));
  if (!out) return nullptr;
  std::memcpy(out, verts.data(), verts.size() * sizeof(float));
  return out;
}

}  // namespace

extern "C" {

// Parse an STL file. On success returns a malloc'd array of 9*count floats
// (triangles x 3 corners x xyz) and sets *count; on failure returns NULL
// with *count = -1 (unreadable) or -2 (malformed).
float *cutrace_stl_parse(const char *path, int64_t *count) {
  *count = -1;
  FILE *f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz < 0) {
    std::fclose(f);
    return nullptr;
  }
  std::vector<unsigned char> data(static_cast<size_t>(sz) + 0);
  size_t got = sz ? std::fread(data.data(), 1, size_t(sz), f) : 0;
  std::fclose(f);
  if (got != size_t(sz)) return nullptr;

  *count = -2;
  if (looks_binary(data.data(), data.size()))
    return parse_binary(data.data(), data.size(), count);
  return parse_ascii(reinterpret_cast<const char *>(data.data()),
                     data.size(), count);
}

void cutrace_free(void *p) { std::free(p); }

}  // extern "C"
