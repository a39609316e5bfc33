// First-party FLAC codec (RFC 9639 subset).
//
// Encoder: fixed-blocksize stream, independent channels, per-channel choice
// of constant / verbatim / fixed-predictor(0..4) subframes, Rice-coded
// residuals (partition order 0, escape to raw when cheaper), MD5 signature.
// Decoder: full RFC 9639 subframe coverage — constant / verbatim / fixed /
// LPC (orders 1..32, quantized coefficients) with left/side, right/side and
// mid/side stereo decorrelation, generic Rice partition orders, both Rice
// methods, and any STREAMINFO bit depth 4..32. libFLAC's default output is
// LPC + stereo decorrelation, so real-world voice-reference files decode
// first-party (the reference plays arbitrary files through
// torchaudio/librosa, common/utilities.py:74-98); remaining failures fall
// back to ffmpeg in audio_io.load_audio when a binary is on PATH.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "../include/auralis_native.h"

namespace {

// ----------------------------------------------------------------- CRC / MD5

uint8_t crc8(const uint8_t* data, size_t len) {
  uint8_t crc = 0;
  for (size_t i = 0; i < len; ++i) {
    crc ^= data[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? static_cast<uint8_t>((crc << 1) ^ 0x07)
                         : static_cast<uint8_t>(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* data, size_t len) {
  uint16_t crc = 0;
  for (size_t i = 0; i < len; ++i) {
    crc ^= static_cast<uint16_t>(data[i]) << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? static_cast<uint16_t>((crc << 1) ^ 0x8005)
                           : static_cast<uint16_t>(crc << 1);
  }
  return crc;
}

struct MD5 {
  uint32_t a = 0x67452301, b = 0xefcdab89, c = 0x98badcfe, d = 0x10325476;
  uint64_t total = 0;
  uint8_t buf[64];
  size_t buf_len = 0;

  static uint32_t rotl(uint32_t x, int s) { return (x << s) | (x >> (32 - s)); }

  void block(const uint8_t* p) {
    static const uint32_t K[64] = {
        0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
        0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
        0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
        0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
        0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
        0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
        0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
        0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
        0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
        0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
        0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};
    static const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                              7, 12, 17, 22, 5, 9,  14, 20, 5, 9,  14, 20,
                              5, 9,  14, 20, 5, 9,  14, 20, 4, 11, 16, 23,
                              4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                              6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
                              6, 10, 15, 21};
    uint32_t m[16];
    for (int i = 0; i < 16; ++i)
      m[i] = static_cast<uint32_t>(p[i * 4]) | (static_cast<uint32_t>(p[i * 4 + 1]) << 8) |
             (static_cast<uint32_t>(p[i * 4 + 2]) << 16) |
             (static_cast<uint32_t>(p[i * 4 + 3]) << 24);
    uint32_t A = a, B = b, C = c, D = d;
    for (int i = 0; i < 64; ++i) {
      uint32_t f;
      int g;
      if (i < 16) {
        f = (B & C) | (~B & D);
        g = i;
      } else if (i < 32) {
        f = (D & B) | (~D & C);
        g = (5 * i + 1) & 15;
      } else if (i < 48) {
        f = B ^ C ^ D;
        g = (3 * i + 5) & 15;
      } else {
        f = C ^ (B | ~D);
        g = (7 * i) & 15;
      }
      uint32_t tmp = D;
      D = C;
      C = B;
      B = B + rotl(A + f + K[i] + m[g], S[i]);
      A = tmp;
    }
    a += A;
    b += B;
    c += C;
    d += D;
  }

  void update(const uint8_t* p, size_t len) {
    total += len;
    while (len) {
      size_t take = 64 - buf_len;
      if (take > len) take = len;
      std::memcpy(buf + buf_len, p, take);
      buf_len += take;
      p += take;
      len -= take;
      if (buf_len == 64) {
        block(buf);
        buf_len = 0;
      }
    }
  }

  void final(uint8_t out[16]) {
    uint64_t bits = total * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t zero = 0;
    while (buf_len != 56) update(&zero, 1);
    uint8_t len_le[8];
    for (int i = 0; i < 8; ++i) len_le[i] = static_cast<uint8_t>(bits >> (8 * i));
    // bypass total accounting for the length field
    std::memcpy(buf + 56, len_le, 8);
    block(buf);
    uint32_t vals[4] = {a, b, c, d};
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4; ++j) out[i * 4 + j] = static_cast<uint8_t>(vals[i] >> (8 * j));
  }
};

// ------------------------------------------------------------------ bit I/O

struct BitWriter {
  std::vector<uint8_t> bytes;
  uint64_t acc = 0;
  int nbits = 0;

  void put(uint64_t value, int bits) {
    // MSB-first append of `bits` low bits of value
    while (bits > 0) {
      int take = bits > 32 ? 32 : bits;
      uint32_t v = static_cast<uint32_t>((value >> (bits - take)) &
                                         ((take == 32) ? 0xFFFFFFFFu : ((1u << take) - 1)));
      acc = (acc << take) | v;
      nbits += take;
      bits -= take;
      while (nbits >= 8) {
        bytes.push_back(static_cast<uint8_t>((acc >> (nbits - 8)) & 0xFF));
        nbits -= 8;
      }
    }
  }
  void put_signed(int64_t value, int bits) {
    put(static_cast<uint64_t>(value) & ((bits == 64) ? ~0ull : ((1ull << bits) - 1)), bits);
  }
  void put_unary(uint32_t q) {
    while (q >= 32) {
      put(0, 32);
      q -= 32;
    }
    put(1, static_cast<int>(q) + 1);  // q zeros then a one
  }
  void align() {
    if (nbits) put(0, 8 - nbits);
  }
  size_t bit_length() const { return bytes.size() * 8 + nbits; }
};

struct BitReader {
  const uint8_t* data;
  size_t len;
  size_t pos_bits = 0;
  bool error = false;

  uint64_t get(int bits) {
    uint64_t v = 0;
    for (int i = 0; i < bits; ++i) {
      size_t byte = pos_bits >> 3;
      if (byte >= len) {
        error = true;
        return 0;
      }
      v = (v << 1) | ((data[byte] >> (7 - (pos_bits & 7))) & 1);
      ++pos_bits;
    }
    return v;
  }
  int64_t get_signed(int bits) {
    uint64_t v = get(bits);
    if (bits < 64 && (v & (1ull << (bits - 1)))) v |= ~((1ull << bits) - 1);
    return static_cast<int64_t>(v);
  }
  uint32_t get_unary() {
    uint32_t q = 0;
    while (!error && get(1) == 0) {
      if (++q > (1u << 24)) {  // corrupt stream guard
        error = true;
        return 0;
      }
    }
    return q;
  }
  void align() { pos_bits = (pos_bits + 7) & ~size_t(7); }
  bool eof() const { return (pos_bits >> 3) >= len; }
};

// ------------------------------------------------------- residuals & costing

// Fixed-predictor residual for order o (in place of out): binomial diffs.
void fixed_residual(const int32_t* x, int64_t n, int order, int64_t* out) {
  switch (order) {
    case 0:
      for (int64_t i = 0; i < n; ++i) out[i] = x[i];
      break;
    case 1:
      for (int64_t i = 1; i < n; ++i) out[i] = static_cast<int64_t>(x[i]) - x[i - 1];
      break;
    case 2:
      for (int64_t i = 2; i < n; ++i)
        out[i] = static_cast<int64_t>(x[i]) - 2LL * x[i - 1] + x[i - 2];
      break;
    case 3:
      for (int64_t i = 3; i < n; ++i)
        out[i] = static_cast<int64_t>(x[i]) - 3LL * x[i - 1] + 3LL * x[i - 2] - x[i - 3];
      break;
    case 4:
      for (int64_t i = 4; i < n; ++i)
        out[i] = static_cast<int64_t>(x[i]) - 4LL * x[i - 1] + 6LL * x[i - 2] -
                 4LL * x[i - 3] + x[i - 4];
      break;
  }
}

inline uint64_t zigzag(int64_t v) {
  return (static_cast<uint64_t>(v) << 1) ^ static_cast<uint64_t>(v >> 63);
}

// Exact Rice cost in bits for parameter k over residuals [first, n).
uint64_t rice_cost(const int64_t* r, int64_t first, int64_t n, int k) {
  uint64_t bits = 0;
  for (int64_t i = first; i < n; ++i) bits += (zigzag(r[i]) >> k) + 1 + k;
  return bits;
}

int best_rice_k(const int64_t* r, int64_t first, int64_t n, uint64_t* cost_out) {
  // mean-magnitude-guided search: evaluate a small window of k values
  uint64_t sum = 0;
  for (int64_t i = first; i < n; ++i) sum += zigzag(r[i]);
  int64_t cnt = n - first;
  if (cnt <= 0) {
    *cost_out = 0;
    return 0;
  }
  int k_est = 0;
  while ((cnt << (k_est + 1)) < static_cast<int64_t>(sum) && k_est < 28) ++k_est;
  uint64_t best = ~0ull;
  int best_k = 0;
  for (int k = (k_est > 2 ? k_est - 2 : 0); k <= k_est + 2 && k <= 30; ++k) {
    uint64_t c = rice_cost(r, first, n, k);
    if (c < best) {
      best = c;
      best_k = k;
    }
  }
  *cost_out = best;
  return best_k;
}

int bits_needed_signed(const int64_t* r, int64_t first, int64_t n) {
  int64_t mx = 0;
  for (int64_t i = first; i < n; ++i) {
    int64_t a = r[i] >= 0 ? r[i] : -(r[i] + 1);  // two's-complement width
    if (a > mx) mx = a;
  }
  int bits = 1;
  while (mx >> (bits - 1)) ++bits;
  return bits > 31 ? 31 : bits;
}

// ------------------------------------------------------------------ encoder

void write_utf8_number(BitWriter& bw, uint64_t v) {
  // UTF-8-style coded number: b bytes carry 5b+1 payload bits (b in 1..7)
  if (v < 0x80) {
    bw.put(v, 8);
    return;
  }
  int nbytes = 2;
  while (nbytes < 7 && v >= (1ull << (5 * nbytes + 1))) ++nbytes;
  uint32_t lead_ones = ((1u << nbytes) - 1) << (8 - nbytes);
  bw.put(lead_ones | (v >> (6 * (nbytes - 1))), 8);
  for (int i = nbytes - 2; i >= 0; --i)
    bw.put(0x80u | ((v >> (6 * i)) & 0x3F), 8);
}

uint64_t read_utf8_number(BitReader& br) {
  uint64_t b0 = br.get(8);
  if (b0 < 0x80) return b0;
  int extra = 0;
  uint8_t mask = 0x40;
  while (b0 & mask) {
    ++extra;
    mask >>= 1;
  }
  uint64_t v = b0 & (mask - 1);
  for (int i = 0; i < extra; ++i) v = (v << 6) | (br.get(8) & 0x3F);
  return v;
}

struct SubframePlan {
  int type;  // 0 constant, 1 verbatim, 2..6 fixed order type-2
  uint64_t cost;
  int rice_k;
  bool escape;
  int raw_bits;
};

SubframePlan plan_subframe(const int32_t* x, int64_t n, int bps,
                           std::vector<int64_t>& res_best,
                           std::vector<int64_t>& res_tmp) {
  SubframePlan plan{1, static_cast<uint64_t>(n) * bps + 8, 0, false, 0};
  bool all_same = true;
  for (int64_t i = 1; i < n; ++i)
    if (x[i] != x[0]) {
      all_same = false;
      break;
    }
  if (all_same) {
    plan.type = 0;
    plan.cost = bps + 8;
    return plan;
  }
  int max_order = n > 4 ? 4 : static_cast<int>(n) - 1;
  for (int o = 0; o <= max_order; ++o) {
    res_tmp.assign(n, 0);
    fixed_residual(x, n, o, res_tmp.data());
    uint64_t rice_bits;
    int k = best_rice_k(res_tmp.data(), o, n, &rice_bits);
    int raw_b = bits_needed_signed(res_tmp.data(), o, n);
    uint64_t esc_bits = 5 + static_cast<uint64_t>(n - o) * raw_b;
    bool escape = esc_bits + 0 < rice_bits;
    uint64_t body = (escape ? esc_bits : rice_bits) + 4 /*rice param*/ +
                    2 /*method*/ + 4 /*partition order*/ +
                    static_cast<uint64_t>(o) * bps + 8;
    if (body < plan.cost) {
      plan.type = 2 + o;
      plan.cost = body;
      plan.rice_k = k;
      plan.escape = escape;
      plan.raw_bits = raw_b;
      res_best = res_tmp;
    }
  }
  return plan;
}

void write_subframe(BitWriter& bw, const int32_t* x, int64_t n, int bps,
                    const SubframePlan& plan, const std::vector<int64_t>& res) {
  bw.put(0, 1);  // zero pad
  if (plan.type == 0) {
    bw.put(0, 6);
    bw.put(0, 1);  // wasted bits
    bw.put_signed(x[0], bps);
    return;
  }
  if (plan.type == 1) {
    bw.put(1, 6);
    bw.put(0, 1);
    for (int64_t i = 0; i < n; ++i) bw.put_signed(x[i], bps);
    return;
  }
  int order = plan.type - 2;
  bw.put(0b001000 | order, 6);
  bw.put(0, 1);
  for (int i = 0; i < order; ++i) bw.put_signed(x[i], bps);
  bw.put(0, 2);  // residual method: 4-bit Rice
  bw.put(0, 4);  // partition order 0
  if (plan.escape) {
    bw.put(0xF, 4);
    bw.put(plan.raw_bits, 5);
    for (int64_t i = order; i < n; ++i) bw.put_signed(res[i], plan.raw_bits);
  } else {
    bw.put(plan.rice_k, 4);
    for (int64_t i = order; i < n; ++i) {
      uint64_t u = zigzag(res[i]);
      bw.put_unary(static_cast<uint32_t>(u >> plan.rice_k));
      if (plan.rice_k) bw.put(u & ((1ull << plan.rice_k) - 1), plan.rice_k);
    }
  }
}

// Rice/escape-coded residual section shared by fixed and LPC subframes.
// Fills x[order..bs); returns false on malformed input.
bool read_residuals(BitReader& br, int64_t bs, int order, int64_t* x) {
  int method = static_cast<int>(br.get(2));
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  int esc = method == 0 ? 0xF : 0x1F;
  int porder = static_cast<int>(br.get(4));
  int64_t nparts = 1ll << porder;
  if ((bs >> porder) << porder != bs || (bs >> porder) <= order) {
    if (porder != 0) return false;  // partitions must divide the block
  }
  int64_t idx = order;
  for (int64_t p = 0; p < nparts; ++p) {
    int64_t cnt = (bs >> porder) - (p == 0 ? order : 0);
    if (cnt < 0 || idx + cnt > bs) return false;
    int k = static_cast<int>(br.get(pbits));
    if (k == esc) {
      int raw = static_cast<int>(br.get(5));
      for (int64_t i = 0; i < cnt; ++i) x[idx++] = raw ? br.get_signed(raw) : 0;
    } else {
      for (int64_t i = 0; i < cnt; ++i) {
        uint64_t q = br.get_unary();
        uint64_t u = (q << k) | (k ? br.get(k) : 0);
        x[idx++] = static_cast<int64_t>(u >> 1) ^ -static_cast<int64_t>(u & 1);
      }
    }
    if (br.error) return false;
  }
  return true;
}

// One subframe of `sbits`-wide samples into x[0..bs). Returns 0 ok,
// -1 malformed, -2 unsupported.
int read_subframe(BitReader& br, int64_t bs, int sbits, int64_t* x) {
  br.get(1);  // zero pad
  int type = static_cast<int>(br.get(6));
  int wasted = static_cast<int>(br.get(1));
  int shift = 0;
  if (wasted) {
    shift = 1;
    while (!br.error && br.get(1) == 0) ++shift;
  }
  int eff = sbits - shift;
  if (eff <= 0 || br.error) return -1;
  if (type == 0) {
    int64_t v = br.get_signed(eff);
    for (int64_t i = 0; i < bs; ++i) x[i] = v;
  } else if (type == 1) {
    for (int64_t i = 0; i < bs; ++i) x[i] = br.get_signed(eff);
  } else if (type >= 8 && type <= 12) {
    int order = type - 8;
    if (order > bs) return -1;
    for (int i = 0; i < order; ++i) x[i] = br.get_signed(eff);
    if (!read_residuals(br, bs, order, x)) return -1;
    if (order > 0) {
      static const int coef[5][4] = {
          {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};
      for (int64_t i = order; i < bs; ++i) {
        int64_t pred = 0;
        for (int j = 0; j < order; ++j) pred += coef[order][j] * x[i - 1 - j];
        x[i] += pred;
      }
    }
  } else if (type & 0x20) {
    // LPC, order 1..32 (RFC 9639 §9.2.5): warmup samples, quantized
    // coefficient precision/shift, coefficients, then the shared residual
    // coding; reconstruction is a right-shifted dot product
    int order = (type & 0x1F) + 1;
    if (order > bs) return -1;
    for (int i = 0; i < order; ++i) x[i] = br.get_signed(eff);
    int prec = static_cast<int>(br.get(4));
    if (prec == 0xF) return -1;  // invalid per spec
    prec += 1;
    int qshift = static_cast<int>(br.get_signed(5));
    if (qshift < 0) return -1;  // negative shift is spec-forbidden
    int64_t qcoef[32];
    for (int i = 0; i < order; ++i) qcoef[i] = br.get_signed(prec);
    if (!read_residuals(br, bs, order, x)) return -1;
    for (int64_t i = order; i < bs; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += qcoef[j] * x[i - 1 - j];
      x[i] += pred >> qshift;
    }
  } else {
    return -1;  // reserved subframe types
  }
  if (shift)
    for (int64_t i = 0; i < bs; ++i) x[i] <<= shift;
  return br.error ? -1 : 0;
}

int blocksize_code(int bs, int* follow_bits) {
  *follow_bits = 0;
  switch (bs) {
    case 192: return 1;
    case 576: return 2;
    case 1152: return 3;
    case 2304: return 4;
    case 4608: return 5;
    case 256: return 8;
    case 512: return 9;
    case 1024: return 10;
    case 2048: return 11;
    case 4096: return 12;
    case 8192: return 13;
    case 16384: return 14;
    case 32768: return 15;
  }
  *follow_bits = 16;
  return 7;
}

}  // namespace

extern "C" {

void at_free(void* p) { std::free(p); }

int at_abi_version(void) { return 1; }

int at_flac_encode(const float* samples, int64_t n_frames, int channels,
                   int sample_rate, int bits_per_sample, int block_size,
                   uint8_t** out, int64_t* out_len) {
  if (!samples || !out || !out_len || n_frames <= 0) return -1;
  if (channels < 1 || channels > 2) return -1;
  if (bits_per_sample != 16 && bits_per_sample != 24) return -1;
  if (block_size <= 0) block_size = 4096;
  if (block_size > 32768) block_size = 32768;
  const int bps = bits_per_sample;
  const double scale = (bps == 16) ? 32767.0 : 8388607.0;
  const int32_t lo = (bps == 16) ? -32768 : -8388608;
  const int32_t hi = (bps == 16) ? 32767 : 8388607;

  // quantize once (also feeds the MD5 signature)
  std::vector<int32_t> pcm(static_cast<size_t>(n_frames) * channels);
  for (int64_t i = 0; i < n_frames * channels; ++i) {
    float v = samples[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    double q = v * scale;
    int32_t s = static_cast<int32_t>(q >= 0 ? q + 0.5 : q - 0.5);
    if (s < lo) s = lo;
    if (s > hi) s = hi;
    pcm[i] = s;
  }

  MD5 md5;
  {
    std::vector<uint8_t> le(pcm.size() * (bps / 8));
    size_t w = 0;
    for (size_t i = 0; i < pcm.size(); ++i) {
      le[w++] = static_cast<uint8_t>(pcm[i]);
      le[w++] = static_cast<uint8_t>(pcm[i] >> 8);
      if (bps == 24) le[w++] = static_cast<uint8_t>(pcm[i] >> 16);
    }
    md5.update(le.data(), le.size());
  }
  uint8_t digest[16];
  md5.final(digest);

  BitWriter bw;
  bw.bytes.reserve(static_cast<size_t>(n_frames) * channels * 2);
  bw.put(0x664C6143, 32);  // "fLaC"
  // STREAMINFO (last metadata block)
  bw.put(1, 1);
  bw.put(0, 7);
  bw.put(34, 24);
  bw.put(block_size, 16);
  bw.put(block_size, 16);
  bw.put(0, 24);  // min frame size unknown
  bw.put(0, 24);  // max frame size unknown
  bw.put(sample_rate, 20);
  bw.put(channels - 1, 3);
  bw.put(bps - 1, 5);
  bw.put(static_cast<uint64_t>(n_frames), 36);
  for (int i = 0; i < 16; ++i) bw.put(digest[i], 8);

  std::vector<int32_t> chan(block_size);
  std::vector<int64_t> res_best, res_tmp;
  int64_t frame_index = 0;
  for (int64_t start = 0; start < n_frames; start += block_size, ++frame_index) {
    int64_t bs = n_frames - start < block_size ? n_frames - start : block_size;
    BitWriter fw;
    fw.put(0b11111111111110, 14);
    fw.put(0, 1);  // reserved
    fw.put(0, 1);  // fixed blocksize stream
    int follow = 0;
    int bs_code = blocksize_code(static_cast<int>(bs), &follow);
    fw.put(bs_code, 4);
    fw.put(0, 4);  // sample rate: from STREAMINFO
    fw.put(channels - 1, 4);
    fw.put(bps == 16 ? 0b100 : 0b110, 3);
    fw.put(0, 1);  // reserved
    write_utf8_number(fw, static_cast<uint64_t>(frame_index));
    if (follow == 16) fw.put(static_cast<uint64_t>(bs - 1), 16);
    fw.align();  // header is byte-aligned by construction; no-op safeguard
    fw.put(crc8(fw.bytes.data(), fw.bytes.size()), 8);

    for (int ch = 0; ch < channels; ++ch) {
      for (int64_t i = 0; i < bs; ++i) chan[i] = pcm[(start + i) * channels + ch];
      SubframePlan plan = plan_subframe(chan.data(), bs, bps, res_best, res_tmp);
      const std::vector<int64_t>& res = (plan.type >= 2) ? res_best : res_tmp;
      write_subframe(fw, chan.data(), bs, bps, plan, res);
    }
    fw.align();
    uint16_t c16 = crc16(fw.bytes.data(), fw.bytes.size());
    fw.put(c16, 16);
    bw.bytes.insert(bw.bytes.end(), fw.bytes.begin(), fw.bytes.end());
  }

  *out_len = static_cast<int64_t>(bw.bytes.size());
  *out = static_cast<uint8_t*>(std::malloc(bw.bytes.size()));
  if (!*out) return -3;
  std::memcpy(*out, bw.bytes.data(), bw.bytes.size());
  return 0;
}

int at_flac_decode(const uint8_t* data, int64_t len, float** out,
                   int64_t* n_frames, int* channels, int* sample_rate) {
  if (!data || len < 42 || !out || !n_frames || !channels || !sample_rate) return -1;
  BitReader br{data, static_cast<size_t>(len)};
  if (br.get(32) != 0x664C6143) return -1;  // "fLaC"

  int sr = 0, ch = 0, bps = 0;
  uint64_t total = 0;
  bool last = false;
  bool have_streaminfo = false;
  while (!last && !br.error) {
    last = br.get(1);
    uint32_t type = static_cast<uint32_t>(br.get(7));
    uint32_t blen = static_cast<uint32_t>(br.get(24));
    if (type == 0) {
      br.get(16);  // min block
      br.get(16);  // max block
      br.get(24);
      br.get(24);
      sr = static_cast<int>(br.get(20));
      ch = static_cast<int>(br.get(3)) + 1;
      bps = static_cast<int>(br.get(5)) + 1;
      total = br.get(36);
      for (int i = 0; i < 16; ++i) br.get(8);
      have_streaminfo = true;
    } else {
      for (uint32_t i = 0; i < blen; ++i) br.get(8);
    }
  }
  if (!have_streaminfo || br.error || ch < 1 || ch > 2) return -1;
  if (bps < 4 || bps > 32) return -2;

  std::vector<float> pcm;
  if (total) pcm.reserve(static_cast<size_t>(total) * ch);
  const double inv_scale = 1.0 / static_cast<double>((1ll << (bps - 1)) - 1);
  std::vector<std::vector<int64_t>> chans(ch);

  static const int kBlocksizes[16] = {0,   192,  576,  1152, 2304, 4608, -8, -16,
                                      256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
  while (!br.eof() && !br.error) {
    if (br.get(14) != 0b11111111111110) break;  // stream end / padding
    br.get(1);  // reserved
    br.get(1);  // blocking strategy
    int bs_code = static_cast<int>(br.get(4));
    int sr_code = static_cast<int>(br.get(4));
    int ch_code = static_cast<int>(br.get(4));
    int ss_code = static_cast<int>(br.get(3));
    br.get(1);  // reserved
    // 0..7 independent channels; 8 left/side, 9 right/side, 10 mid/side
    if (ch_code > 10) return -2;
    int nch = ch_code <= 7 ? ch_code + 1 : 2;
    if (nch != ch) return -1;  // frame disagrees with STREAMINFO
    read_utf8_number(br);
    int64_t bs;
    if (bs_code == 6) bs = static_cast<int64_t>(br.get(8)) + 1;
    else if (bs_code == 7) bs = static_cast<int64_t>(br.get(16)) + 1;
    else if (bs_code == 0) return -2;
    else bs = kBlocksizes[bs_code];
    if (sr_code == 12) br.get(8);
    else if (sr_code == 13 || sr_code == 14) br.get(16);
    int fbps = bps;
    switch (ss_code) {
      case 0: fbps = bps; break;
      case 1: fbps = 8; break;
      case 2: fbps = 12; break;
      case 4: fbps = 16; break;
      case 5: fbps = 20; break;
      case 6: fbps = 24; break;
      case 7: fbps = 32; break;
      default: return -2;
    }
    br.get(8);  // header CRC-8 (not verified)

    for (int c = 0; c < ch; ++c) {
      chans[c].assign(bs, 0);
      // the side channel carries one extra bit (RFC 9639 §9.1.3)
      bool is_side = (ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
                     (ch_code == 10 && c == 1);
      int rc = read_subframe(br, bs, fbps + (is_side ? 1 : 0), chans[c].data());
      if (rc != 0) return rc;
    }
    if (ch_code == 8) {  // left/side: right = left - side
      for (int64_t i = 0; i < bs; ++i) chans[1][i] = chans[0][i] - chans[1][i];
    } else if (ch_code == 9) {  // side/right: left = right + side
      for (int64_t i = 0; i < bs; ++i) chans[0][i] = chans[0][i] + chans[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int64_t i = 0; i < bs; ++i) {
        int64_t side = chans[1][i];
        int64_t mid = (chans[0][i] << 1) | (side & 1);
        chans[0][i] = (mid + side) >> 1;
        chans[1][i] = (mid - side) >> 1;
      }
    }
    br.align();
    br.get(16);  // frame CRC-16 (not verified)
    for (int64_t i = 0; i < bs; ++i)
      for (int c = 0; c < ch; ++c)
        pcm.push_back(static_cast<float>(chans[c][i] * inv_scale));
    // stop when we've read every sample STREAMINFO promised (trailing
    // padding bytes would otherwise confuse the sync search)
    if (total && pcm.size() >= total * ch) break;
  }

  *n_frames = static_cast<int64_t>(pcm.size()) / ch;
  *channels = ch;
  *sample_rate = sr;
  *out = static_cast<float*>(std::malloc(pcm.size() * sizeof(float)));
  if (!*out) return -3;
  std::memcpy(*out, pcm.data(), pcm.size() * sizeof(float));
  return 0;
}

}  // extern "C"
