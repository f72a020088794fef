// Host-side rANS entropy coder for the TPU wavelet codec.
//
// Native replacement for the reference's pip-native coding surface
// (compressai.ans BufferedRansEncoder/RansDecoder and the range_coder C
// extension used at reference LiftingBasedDWT_net.py:466,516 and
// utils/ae.py:13). Independent implementation of the public rANS scheme
// (Duda 2013; byte-renormalizing variant):
//
//   state x in [2^23, 2^31); 16-bit quantized CDF rows; encode runs over
//   symbols in reverse and the byte buffer is reversed on flush so the
//   decoder streams forward.
//
// Out-of-range symbols use an escape interval (the last CDF bin, which
// carries the tail mass) followed by a zigzag varint coded in 3-bit
// bypass nibbles through the same rANS state.
//
// Exposed as extern "C" for ctypes binding (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kProbBits = 16;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 23;  // lower bound of the state interval

// ---------------------------------------------------------------------
// core rANS state ops (byte renormalization)

struct RansEncState {
  uint32_t x = kRansL;
  std::vector<uint8_t> bytes;  // emitted in reverse; reversed on flush

  inline void put(uint32_t start, uint32_t freq) {
    // renormalize: keep x < ((L >> kProbBits) << 8) * freq after encoding
    const uint32_t x_max = ((kRansL >> kProbBits) << 8) * freq;
    while (x >= x_max) {
      bytes.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    x = ((x / freq) << kProbBits) + (x % freq) + start;
  }

  // raw-bit bypass: value in [0, 2^nbits) with uniform probability
  inline void put_bits(uint32_t val, uint32_t nbits) {
    put(val << (kProbBits - nbits), 1u << (kProbBits - nbits));
  }

  void flush(std::vector<uint8_t>* out) {
    uint32_t xx = x;
    for (int i = 0; i < 4; ++i) {
      bytes.push_back(static_cast<uint8_t>(xx & 0xff));
      xx >>= 8;
    }
    out->assign(bytes.rbegin(), bytes.rend());
  }
};

struct RansDecState {
  uint32_t x = 0;
  const uint8_t* ptr = nullptr;
  const uint8_t* end = nullptr;

  void init(const uint8_t* data, int64_t n) {
    ptr = data;
    end = data + n;
    x = 0;
    for (int i = 0; i < 4; ++i) {
      x = (x << 8) | (ptr < end ? *ptr++ : 0);
    }
  }

  inline uint32_t peek() const { return x & (kProbScale - 1); }

  inline void advance(uint32_t start, uint32_t freq) {
    x = freq * (x >> kProbBits) + peek() - start;
    while (x < kRansL) {
      x = (x << 8) | (ptr < end ? *ptr++ : 0);
    }
  }

  inline uint32_t get_bits(uint32_t nbits) {
    const uint32_t val = peek() >> (kProbBits - nbits);
    advance(val << (kProbBits - nbits), 1u << (kProbBits - nbits));
    return val;
  }
};

// ---------------------------------------------------------------------
// symbol <-> escape mapping
//
// A CDF row of length Lr covers symbols 0..Lr-2 (the last interval,
// index Lr-2, is the escape/tail bin). A raw value r = symbol - offset
// outside [0, Lr-3] is coded as escape + zigzag varint of the overflow.

constexpr uint32_t kBypassBits = 3;         // payload bits per nibble
constexpr uint32_t kBypassCont = 1u << 3;   // continuation flag bit

struct SymOp {
  uint32_t start, freq;   // main interval
  std::vector<uint8_t> nibbles;  // bypass payload (empty if in range)
};

inline void make_op(int32_t symbol, const uint32_t* cdf_row, int32_t cdf_len,
                    int32_t offset, SymOp* op) {
  const int32_t max_sym = cdf_len - 2;   // escape index
  int64_t r = static_cast<int64_t>(symbol) - offset;
  op->nibbles.clear();
  if (r >= 0 && r < max_sym) {
    op->start = cdf_row[r];
    op->freq = cdf_row[r + 1] - cdf_row[r];
    return;
  }
  // escape + zigzag varint
  op->start = cdf_row[max_sym];
  op->freq = cdf_row[max_sym + 1] - cdf_row[max_sym];
  uint64_t ov;
  uint32_t sign;
  if (r >= max_sym) {
    ov = static_cast<uint64_t>(r - max_sym);
    sign = 0;
  } else {
    ov = static_cast<uint64_t>(-(r + 1));
    sign = 1;
  }
  uint64_t zig = (ov << 1) | sign;
  while (zig >= kBypassCont) {
    op->nibbles.push_back(
        static_cast<uint8_t>((zig & (kBypassCont - 1)) | kBypassCont));
    zig >>= kBypassBits;
  }
  op->nibbles.push_back(static_cast<uint8_t>(zig));
}

inline int32_t decode_symbol(RansDecState* dec, const uint32_t* cdf_row,
                             int32_t cdf_len, int32_t offset) {
  const int32_t max_sym = cdf_len - 2;
  const uint32_t cum = dec->peek();
  // binary search the interval containing cum
  int32_t lo = 0, hi = cdf_len - 1;
  while (hi - lo > 1) {
    const int32_t mid = (lo + hi) >> 1;
    if (cdf_row[mid] <= cum) {
      lo = mid;
    } else {
      hi = mid;
    }
  }
  dec->advance(cdf_row[lo], cdf_row[lo + 1] - cdf_row[lo]);
  if (lo < max_sym) {
    return lo + offset;
  }
  // escape: read zigzag varint nibbles
  uint64_t zig = 0;
  uint32_t shift = 0;
  while (true) {
    const uint32_t nib = dec->get_bits(kBypassBits + 1);
    zig |= static_cast<uint64_t>(nib & (kBypassCont - 1)) << shift;
    shift += kBypassBits;
    if (!(nib & kBypassCont)) break;
  }
  const uint32_t sign = zig & 1;
  const int64_t ov = static_cast<int64_t>(zig >> 1);
  const int64_t r = sign ? -(ov + 1) : ov + max_sym;
  return static_cast<int32_t>(r + offset);
}

}  // namespace

extern "C" {

// Encode n symbols against per-symbol CDF rows. cdfs is row-major with
// stride cdf_stride (uint32 entries). Returns bytes written, or -1 if
// out_capacity is insufficient.
int64_t rans_encode_with_indexes(
    const int32_t* symbols, const int32_t* indexes, int64_t n,
    const uint32_t* cdfs, int32_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, uint8_t* out, int64_t out_capacity) {
  // precompute ops forward, encode in reverse (rANS is LIFO)
  std::vector<SymOp> ops(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    make_op(symbols[i], cdfs + static_cast<int64_t>(idx) * cdf_stride,
            cdf_lengths[idx], offsets[idx], &ops[static_cast<size_t>(i)]);
  }
  RansEncState enc;
  for (int64_t i = n - 1; i >= 0; --i) {
    const SymOp& op = ops[static_cast<size_t>(i)];
    // bypass nibbles decode after the main symbol, so encode them first
    // (reverse order within the op, too)
    for (auto it = op.nibbles.rbegin(); it != op.nibbles.rend(); ++it) {
      enc.put_bits(*it, kBypassBits + 1);
    }
    enc.put(op.start, op.freq);
  }
  std::vector<uint8_t> bytes;
  enc.flush(&bytes);
  if (static_cast<int64_t>(bytes.size()) > out_capacity) return -1;
  std::memcpy(out, bytes.data(), bytes.size());
  return static_cast<int64_t>(bytes.size());
}

// One-shot decode of n symbols.
int64_t rans_decode_with_indexes(
    const uint8_t* bytes, int64_t nbytes, const int32_t* indexes, int64_t n,
    const uint32_t* cdfs, int32_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, int32_t* out_symbols) {
  RansDecState dec;
  dec.init(bytes, nbytes);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    out_symbols[i] = decode_symbol(
        &dec, cdfs + static_cast<int64_t>(idx) * cdf_stride,
        cdf_lengths[idx], offsets[idx]);
  }
  return n;
}

// Streaming decoder (for wavefront AR decode: repeated decode calls
// against one stream, mirroring compressai's RansDecoder.decode_stream).
struct StreamDecoder {
  std::vector<uint8_t> data;
  RansDecState st;
};

void* rans_decoder_new(const uint8_t* bytes, int64_t nbytes) {
  auto* d = new StreamDecoder();
  d->data.assign(bytes, bytes + nbytes);
  d->st.init(d->data.data(), static_cast<int64_t>(d->data.size()));
  return d;
}

void rans_decoder_free(void* dec) {
  delete static_cast<StreamDecoder*>(dec);
}

int64_t rans_decoder_decode(
    void* dec, const int32_t* indexes, int64_t n, const uint32_t* cdfs,
    int32_t cdf_stride, const int32_t* cdf_lengths, const int32_t* offsets,
    int32_t* out_symbols) {
  auto* d = static_cast<StreamDecoder*>(dec);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    out_symbols[i] = decode_symbol(
        &d->st, cdfs + static_cast<int64_t>(idx) * cdf_stride,
        cdf_lengths[idx], offsets[idx]);
  }
  return n;
}

// Quantize a pmf row (tail mass as final element) to a 16-bit CDF with no
// zero-width intervals: largest-interval stealing, deterministic.
// cdf_out must hold n+1 entries; returns 0 on success.
int32_t pmf_to_quantized_cdf(const double* pmf, int32_t n, int32_t precision,
                             uint32_t* cdf_out) {
  if (n < 1 || precision < 8 || precision > 16) return -1;
  const uint32_t scale = 1u << precision;
  double total = 0.0;
  for (int32_t i = 0; i < n; ++i) total += (pmf[i] > 0 ? pmf[i] : 0.0);
  if (total <= 0.0) total = 1.0;
  std::vector<uint32_t> freqs(static_cast<size_t>(n));
  uint64_t sum = 0;
  for (int32_t i = 0; i < n; ++i) {
    const double p = pmf[i] > 0 ? pmf[i] : 0.0;
    uint32_t f = static_cast<uint32_t>(p / total * scale + 0.5);
    if (f == 0) f = 1;  // every symbol must be codable
    freqs[static_cast<size_t>(i)] = f;
    sum += f;
  }
  // rebalance to exactly `scale` by adjusting the largest interval(s)
  while (sum != scale) {
    int32_t best = 0;
    for (int32_t i = 1; i < n; ++i) {
      if (freqs[static_cast<size_t>(i)] > freqs[static_cast<size_t>(best)]) {
        best = i;
      }
    }
    if (sum > scale) {
      const uint64_t excess = sum - scale;
      const uint32_t take = freqs[static_cast<size_t>(best)] > excess + 1
                                ? static_cast<uint32_t>(excess)
                                : freqs[static_cast<size_t>(best)] - 1;
      if (take == 0) return -2;  // cannot normalize (n > scale)
      freqs[static_cast<size_t>(best)] -= take;
      sum -= take;
    } else {
      const uint32_t add = static_cast<uint32_t>(scale - sum);
      freqs[static_cast<size_t>(best)] += add;
      sum += add;
    }
  }
  cdf_out[0] = 0;
  for (int32_t i = 0; i < n; ++i) {
    cdf_out[i + 1] = cdf_out[i] + freqs[static_cast<size_t>(i)];
  }
  return 0;
}

}  // extern "C"
