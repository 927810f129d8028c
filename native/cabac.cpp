// Native CABAC coder — C++ implementation of the ic2t-cabac v1 spec.
//
// Byte-identical to the Python reference in
// image_compression_2_tpu/coding/cabac.py (tested cross-wise).  This is the
// host-sequential hot loop of the codec: the per-symbol adaptive context
// update + range-coder renormalisation that cannot batch onto the TPU
// (SURVEY §3.4 marks it as the dominant host loop in the reference, where it
// runs as Python at ~1k symbols/sec; here it runs at tens of millions).
//
// Build: g++ -O3 -fPIC -shared -o libcabac.so cabac.cpp
// ABI (ctypes):
//   int64_t ic2t_cabac_encode(const int32_t* data, int64_t n_elems,
//                             int64_t B, int64_t T, int64_t D,
//                             int32_t n_symbols, const uint16_t* priors,
//                             uint8_t* out, int64_t out_cap);
//     priors: NULL for adaptive quantized-left contexts, else a
//     [T, D, n_symbols] per-position initial-frequency table (>= 1).
//     -> bytes written, or -1 on error / insufficient capacity
//   int32_t ic2t_cabac_decode(const uint8_t* in, int64_t in_len,
//                             int64_t B, int64_t T, int64_t D,
//                             int32_t n_symbols, const uint16_t* priors,
//                             int32_t* out);
//     -> 0 on success

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint32_t kTop = 1u << 24;
constexpr uint32_t kIncrement = 32;
constexpr uint32_t kMaxTotal = 1u << 16;

struct RangeEncoder {
  uint64_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint8_t cache = 0;
  uint64_t cache_size = 1;
  uint8_t* out;
  int64_t cap;
  int64_t pos = 0;
  bool overflow = false;

  void put(uint8_t b) {
    if (pos >= cap) { overflow = true; return; }
    out[pos++] = b;
  }

  void shift_low() {
    if ((uint32_t)low < 0xFF000000u || (low >> 32) != 0) {
      uint8_t carry = (uint8_t)(low >> 32);
      uint8_t c = cache;
      do {
        put((uint8_t)(c + carry));
        c = 0xFF;
      } while (--cache_size);
      cache = (uint8_t)(low >> 24);
    }
    cache_size++;
    low = (uint32_t)low << 8;
  }

  void encode(uint32_t cum_lo, uint32_t cum_hi, uint32_t total) {
    uint32_t r = range / total;
    low += (uint64_t)r * cum_lo;
    range = r * (cum_hi - cum_lo);
    while (range < kTop) {
      range <<= 8;
      shift_low();
    }
  }

  void finish() {
    for (int i = 0; i < 5; i++) shift_low();
  }
};

struct RangeDecoder {
  const uint8_t* in;
  int64_t len;
  int64_t pos = 1;  // skip the encoder's initial zero cache byte
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;
  uint32_t r = 0;

  explicit RangeDecoder(const uint8_t* data, int64_t n) : in(data), len(n) {
    for (int i = 0; i < 4; i++) code = (code << 8) | byte();
  }

  uint8_t byte() { return pos < len ? in[pos++] : 0; }

  uint32_t decode_target(uint32_t total) {
    r = range / total;
    uint32_t t = code / r;
    return t >= total ? total - 1 : t;
  }

  void advance(uint32_t cum_lo, uint32_t cum_hi) {
    code -= r * cum_lo;
    range = r * (cum_hi - cum_lo);
    while (range < kTop) {
      code = (code << 8) | byte();
      range <<= 8;
    }
  }
};

inline int context_shift(int32_t n_symbols) {
  int bits = 0;
  uint32_t v = (uint32_t)(n_symbols - 1);
  while (v) { bits++; v >>= 1; }
  return bits > 5 ? bits - 5 : 0;
}

// Frequency tables for both context modes. Context keys are dense small
// integers (<= 33 adaptive buckets, or T*D prior positions), so a flat
// lazily-filled vector beats a hash map.
struct ContextModel {
  int32_t n_symbols;
  const uint16_t* priors;  // [T, D, n_symbols] or NULL
  int64_t D;
  int shift;
  std::vector<std::vector<uint32_t>> models;
  std::vector<uint32_t> totals;

  ContextModel(int32_t n, const uint16_t* p, int64_t T_, int64_t D_)
      : n_symbols(n), priors(p), D(D_), shift(context_shift(n)) {
    int64_t n_ctx = p ? T_ * D_ : ((int64_t)((n - 1) >> shift) + 2);
    models.resize(n_ctx);
    totals.resize(n_ctx, 0);
  }

  inline int64_t key(const int32_t* data, int64_t b, int64_t t, int64_t T,
                     int64_t d) const {
    if (priors) return t * D + d;
    if (d == 0) return 0;
    return (data[(b * T + t) * D + d - 1] >> shift) + 1;
  }

  std::vector<uint32_t>& freqs(int64_t key, uint32_t** total_out) {
    auto& f = models[key];
    if (f.empty()) {
      f.resize(n_symbols);
      uint32_t tot = 0;
      if (priors) {
        const uint16_t* p = priors + key * n_symbols;
        for (int32_t i = 0; i < n_symbols; i++) { f[i] = p[i]; tot += p[i]; }
      } else {
        for (int32_t i = 0; i < n_symbols; i++) f[i] = 1;
        tot = (uint32_t)n_symbols;
      }
      totals[key] = tot;
    }
    *total_out = &totals[key];
    return f;
  }

  static void update(std::vector<uint32_t>& f, uint32_t* total, int32_t s) {
    f[s] += kIncrement;
    uint32_t t = *total + kIncrement;
    if (t >= kMaxTotal) {
      t = 0;
      for (auto& v : f) {
        v = (v + 1) >> 1;
        t += v;
      }
    }
    *total = t;
  }
};

}  // namespace

extern "C" {

int64_t ic2t_cabac_encode(const int32_t* data, int64_t n_elems, int64_t B,
                          int64_t T, int64_t D, int32_t n_symbols,
                          const uint16_t* priors, uint8_t* out,
                          int64_t out_cap) {
  if (n_elems != B * T * D || n_symbols < 2) return -1;
  for (int64_t i = 0; i < n_elems; i++)
    if (data[i] < 0 || data[i] >= n_symbols) return -1;
  if (priors) {
    // per-position prior mass must stay below the halving threshold so the
    // range coder's range/total never underflows
    for (int64_t k = 0; k < T * D; k++) {
      uint64_t tot = 0;
      for (int32_t i = 0; i < n_symbols; i++) {
        if (priors[k * n_symbols + i] < 1) return -1;
        tot += priors[k * n_symbols + i];
      }
      if (tot >= kMaxTotal) return -1;
    }
  }

  ContextModel model(n_symbols, priors, T, D);
  RangeEncoder enc;
  enc.out = out;
  enc.cap = out_cap;
  for (int64_t b = 0; b < B; b++)
    for (int64_t t = 0; t < T; t++)
      for (int64_t d = 0; d < D; d++) {
        int64_t key = model.key(data, b, t, T, d);
        uint32_t* total;
        auto& f = model.freqs(key, &total);
        int32_t s = data[(b * T + t) * D + d];
        uint32_t cum_lo = 0;
        for (int32_t i = 0; i < s; i++) cum_lo += f[i];
        enc.encode(cum_lo, cum_lo + f[s], *total);
        if (enc.overflow) return -1;
        ContextModel::update(f, total, s);
      }
  enc.finish();
  if (enc.overflow) return -1;
  return enc.pos;
}

int32_t ic2t_cabac_decode(const uint8_t* in, int64_t in_len, int64_t B,
                          int64_t T, int64_t D, int32_t n_symbols,
                          const uint16_t* priors, int32_t* out) {
  if (n_symbols < 2) return -1;
  ContextModel model(n_symbols, priors, T, D);
  RangeDecoder dec(in, in_len);
  for (int64_t b = 0; b < B; b++)
    for (int64_t t = 0; t < T; t++)
      for (int64_t d = 0; d < D; d++) {
        int64_t key = model.key(out, b, t, T, d);
        uint32_t* total;
        auto& f = model.freqs(key, &total);
        uint32_t target = dec.decode_target(*total);
        uint32_t cum = 0;
        int32_t s = 0;
        for (; s < n_symbols; s++) {
          if (cum + f[s] > target) break;
          cum += f[s];
        }
        if (s >= n_symbols) return -2;
        dec.advance(cum, cum + f[s]);
        out[(b * T + t) * D + d] = s;
        ContextModel::update(f, total, s);
      }
  return 0;
}

}  // extern "C"
