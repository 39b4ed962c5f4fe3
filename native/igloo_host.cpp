// igloo_host: native host-side kernels for the dictionary hot path.
//
// The reference's native substrate is Arrow C++/Rust end to end; in this
// engine the device plane is XLA and host decode is pyarrow (Arrow C++),
// leaving one genuinely hot host loop: per-dictionary-entry string work
// (function transforms, LIKE matching, hash partitioning) which would
// otherwise run as Python-level str operations per distinct value.
//
// Strings arrive in Arrow layout: one UTF-8 byte buffer + (n+1) int64
// offsets. ASCII content takes the fast path here; any entry with a
// non-ASCII byte is flagged in `needs_py` and the Python caller handles
// just those entries (keeping Unicode semantics byte-exact with
// Python's str methods).
//
// Build: scripts/build_native.sh → libigloo_host.so (loaded via ctypes,
// see igloo_tpu/native.py).

#include <cstdint>
#include <cstring>

extern "C" {

enum TransformOp {
  OP_UPPER = 0,
  OP_LOWER = 1,
  OP_REVERSE = 2,
  OP_TRIM = 3,
  OP_LTRIM = 4,
  OP_RTRIM = 5,
};

// Length-preserving ops write in place into out_data (same offsets);
// trim ops write compacted bytes and fresh out_offsets.
// Returns 0 on success.
int64_t ascii_transform(const uint8_t* data, const int64_t* offsets,
                        int64_t n, int32_t op, uint8_t* out_data,
                        int64_t* out_offsets, uint8_t* needs_py) {
  int64_t out_pos = 0;
  out_offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t beg = offsets[i];
    const int64_t end = offsets[i + 1];
    bool ascii = true;
    for (int64_t j = beg; j < end; ++j) {
      if (data[j] & 0x80) { ascii = false; break; }
    }
    needs_py[i] = ascii ? 0 : 1;
    if (!ascii) {
      // copy through unchanged; Python fixes this entry afterwards
      std::memcpy(out_data + out_pos, data + beg, end - beg);
      out_pos += end - beg;
      out_offsets[i + 1] = out_pos;
      continue;
    }
    switch (op) {
      case OP_UPPER:
        for (int64_t j = beg; j < end; ++j) {
          uint8_t c = data[j];
          out_data[out_pos++] = (c >= 'a' && c <= 'z') ? c - 32 : c;
        }
        break;
      case OP_LOWER:
        for (int64_t j = beg; j < end; ++j) {
          uint8_t c = data[j];
          out_data[out_pos++] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
        }
        break;
      case OP_REVERSE:
        for (int64_t j = end - 1; j >= beg; --j) out_data[out_pos++] = data[j];
        break;
      case OP_TRIM:
      case OP_LTRIM:
      case OP_RTRIM: {
        int64_t b = beg, e = end;
        if (op != OP_RTRIM) while (b < e && (data[b] == ' ' || data[b] == '\t'
                                             || data[b] == '\n' || data[b] == '\r')) ++b;
        if (op != OP_LTRIM) while (e > b && (data[e - 1] == ' ' || data[e - 1] == '\t'
                                             || data[e - 1] == '\n' || data[e - 1] == '\r')) --e;
        std::memcpy(out_data + out_pos, data + b, e - b);
        out_pos += e - b;
        break;
      }
      default:
        return -1;
    }
    out_offsets[i + 1] = out_pos;
  }
  return 0;
}

// SQL LIKE matcher: '%' = any run, '_' = one char, '\' escapes.
// Case-insensitive flag applies ASCII folding (non-ASCII entries are
// flagged in needs_py for Python handling when ci is set).
static inline uint8_t fold(uint8_t c, bool ci) {
  return (ci && c >= 'A' && c <= 'Z') ? c + 32 : c;
}

static bool like_one(const uint8_t* s, int64_t slen, const uint8_t* p,
                     int64_t plen, bool ci) {
  int64_t si = 0, pi = 0, star_si = -1, star_pi = -1;
  while (si < slen) {
    if (pi < plen) {
      uint8_t pc = p[pi];
      if (pc == '\\' && pi + 1 < plen) {
        if (fold(s[si], ci) == fold(p[pi + 1], ci)) { ++si; pi += 2; continue; }
      } else if (pc == '%') {
        star_pi = ++pi;
        star_si = si;
        continue;
      } else if (pc == '_' || fold(pc, ci) == fold(s[si], ci)) {
        ++si; ++pi;
        continue;
      }
    }
    if (star_pi >= 0) {       // backtrack: let % absorb one more char
      pi = star_pi;
      si = ++star_si;
      continue;
    }
    return false;
  }
  while (pi < plen && p[pi] == '%') ++pi;
  return pi == plen;
}

void like_match(const uint8_t* data, const int64_t* offsets, int64_t n,
                const uint8_t* pattern, int64_t plen, int32_t ci,
                uint8_t* out, uint8_t* needs_py) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t beg = offsets[i];
    const int64_t end = offsets[i + 1];
    if (ci) {
      bool ascii = true;
      for (int64_t j = beg; j < end; ++j)
        if (data[j] & 0x80) { ascii = false; break; }
      if (!ascii) { needs_py[i] = 1; out[i] = 0; continue; }
    }
    needs_py[i] = 0;
    out[i] = like_one(data + beg, end - beg, pattern, plen, ci != 0) ? 1 : 0;
  }
}

// splitmix-style string hash (matches no particular spec; used only for
// partition placement, never equality).
void hash64_strings(const uint8_t* data, const int64_t* offsets, int64_t n,
                    uint64_t seed, uint64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = seed ^ 0x9E3779B97F4A7C15ull;
    for (int64_t j = offsets[i]; j < offsets[i + 1]; ++j) {
      h ^= data[j];
      h *= 0x100000001B3ull;
      h ^= h >> 29;
    }
    h *= 0xBF58476D1CE4E5B9ull;
    h ^= h >> 32;
    out[i] = h;
  }
}

// per-entry byte lengths (SQL length() on ASCII; non-ASCII flagged)
void string_lengths(const uint8_t* data, const int64_t* offsets, int64_t n,
                    int64_t* out, uint8_t* needs_py) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t beg = offsets[i];
    const int64_t end = offsets[i + 1];
    bool ascii = true;
    for (int64_t j = beg; j < end; ++j)
      if (data[j] & 0x80) { ascii = false; break; }
    needs_py[i] = ascii ? 0 : 1;
    out[i] = end - beg;
  }
}

}  // extern "C"
