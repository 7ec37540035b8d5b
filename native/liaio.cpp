// liaio — native feature-file I/O for lia_ral_tpu.
//
// The reference's runtime layer is C++ (ALIZE FeatureServer and the file
// readers behind it, SURVEY.md §1.1); this library provides the
// equivalent native hot path for the new framework: SPRO3/SPRO4/RAW
// parsing with byte swapping, column masking, and multi-file
// concatenated loading, exposed through a minimal C ABI consumed via
// ctypes (lia_ral_tpu/io/native.py).  Python remains the fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int FMT_SPRO3 = 0;
constexpr int FMT_SPRO4 = 1;
constexpr int FMT_RAW_F32 = 2;
constexpr int FMT_RAW_F64 = 3;

// SPro qualifier bits (features.py spro_total_dim)
constexpr uint32_t WITHE = 0x01;
constexpr uint32_t WITHN = 0x04;
constexpr uint32_t WITHD = 0x08;
constexpr uint32_t WITHA = 0x10;

inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }

inline float swap_float(float f) {
  uint32_t v;
  std::memcpy(&v, &f, 4);
  v = bswap32(v);
  std::memcpy(&f, &v, 4);
  return f;
}

int spro_total_dim(uint32_t dim, uint32_t flag) {
  int stat = dim + ((flag & WITHE) && !(flag & WITHN) ? 1 : 0);
  int block = dim + ((flag & WITHE) ? 1 : 0);
  int total = stat;
  if (flag & WITHD) total += block;
  if (flag & WITHA) total += block;
  return total;
}

std::vector<uint8_t> read_all(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n > 0) {
    buf.resize(static_cast<size_t>(n));
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  }
  std::fclose(f);
  return buf;
}

// Parse into out (caller-sized) or report dims. Returns 0 on success.
int parse(const std::vector<uint8_t>& raw, int fmt, int big_endian,
          int vect_size, float* out, int64_t* out_frames, int* out_dim) {
  const uint8_t* p = raw.data();
  size_t n = raw.size();
  auto rd_u32 = [&](size_t off) {
    uint32_t v;
    std::memcpy(&v, p + off, 4);
    return big_endian ? bswap32(v) : v;
  };
  if (fmt == FMT_SPRO3) {
    if (n < 16) return 1;
    uint32_t dim = rd_u32(4), flag = rd_u32(12);
    int total = spro_total_dim(dim, flag);
    if (total <= 0) return 1;
    size_t payload = (n - 16) / 4;
    if (payload % total != 0) return 1;
    int64_t frames = static_cast<int64_t>(payload) / total;
    *out_frames = frames;
    *out_dim = total;
    if (out) {
      std::memcpy(out, p + 16, payload * 4);
      if (big_endian)
        for (size_t i = 0; i < payload; i++) out[i] = swap_float(out[i]);
    }
    return 0;
  }
  if (fmt == FMT_SPRO4) {
    size_t off = 0;
    if (n >= 8 && std::memcmp(p, "<header>", 8) == 0) {
      const char* end = static_cast<const char*>(
          memmem(p, n, "</header>", 9));
      if (!end) return 1;
      off = (end - reinterpret_cast<const char*>(p)) + 9;
      if (off < n && p[off] == '\n') off++;
    }
    if (n < off + 10) return 1;
    uint16_t dim;
    std::memcpy(&dim, p + off, 2);
    if (big_endian) dim = bswap16(dim);
    if (dim == 0) return 1;
    size_t payload = (n - off - 10) / 4;
    if (payload % dim != 0) return 1;
    *out_frames = static_cast<int64_t>(payload) / dim;
    *out_dim = dim;
    if (out) {
      std::memcpy(out, p + off + 10, payload * 4);
      if (big_endian)
        for (size_t i = 0; i < payload; i++) out[i] = swap_float(out[i]);
    }
    return 0;
  }
  if (fmt == FMT_RAW_F32 || fmt == FMT_RAW_F64) {
    int esize = fmt == FMT_RAW_F32 ? 4 : 8;
    if (vect_size <= 0) return 1;
    size_t count = n / esize;
    if (count % vect_size != 0) return 1;
    *out_frames = static_cast<int64_t>(count) / vect_size;
    *out_dim = vect_size;
    if (out) {
      if (fmt == FMT_RAW_F32) {
        std::memcpy(out, p, count * 4);
        if (big_endian)
          for (size_t i = 0; i < count; i++) out[i] = swap_float(out[i]);
      } else {
        for (size_t i = 0; i < count; i++) {
          uint64_t v;
          std::memcpy(&v, p + i * 8, 8);
          if (big_endian) v = __builtin_bswap64(v);
          double d;
          std::memcpy(&d, &v, 8);
          out[i] = static_cast<float>(d);
        }
      }
    }
    return 0;
  }
  return 1;
}

}  // namespace

extern "C" {

// Probe a feature file: fills frames/dim. Returns 0 on success.
int liaio_probe(const char* path, int fmt, int big_endian, int vect_size,
                int64_t* frames, int* dim) {
  auto raw = read_all(path);
  if (raw.empty()) return 1;
  return parse(raw, fmt, big_endian, vect_size, nullptr, frames, dim);
}

// Read a feature file into a caller-allocated (frames*dim) float32 buffer.
int liaio_read(const char* path, int fmt, int big_endian, int vect_size,
               float* out, int64_t frames, int dim) {
  auto raw = read_all(path);
  if (raw.empty()) return 1;
  int64_t f2;
  int d2;
  int rc = parse(raw, fmt, big_endian, vect_size, out, &f2, &d2);
  if (rc) return rc;
  return (f2 == frames && d2 == dim) ? 0 : 2;
}

// Column-mask copy: src (frames, src_dim) → dst (frames, n_idx) using the
// given column indices (the featureServerMask hot loop).
void liaio_mask(const float* src, int64_t frames, int src_dim,
                const int* idx, int n_idx, float* dst) {
  for (int64_t t = 0; t < frames; t++) {
    const float* row = src + t * src_dim;
    float* orow = dst + t * n_idx;
    for (int j = 0; j < n_idx; j++) orow[j] = row[idx[j]];
  }
}

}  // extern "C"
