#pragma once
#include "core.h"

namespace nlzm {

// Encoder-side frame accumulator. Spans are packed (freq << 16) | start.
struct FrameSink {
  std::vector<u32> spans;
  std::vector<u8> bits;
  std::vector<u8> rans_rev;
  u32 word = 0;
  u32 word_bits = 0;
  u32 ops = 0;
  u64 est_bits = 0;

  void reset();

  inline void put_span(u32 start, u32 freq) {
    ops++;
    spans.push_back((freq << 16) | start);
    est_bits += g_cost.v[freq >> (kScaleBits - 8)];
  }
  template <typename F>
  inline void put_cdf(const F& f, int y) {
    put_span(f.c[y], f.width(y));
  }
  inline void put_bits(u32 v, u32 nb) {
    ops++;
    word |= v << (32 - word_bits - nb);
    word_bits += nb;
    while (word_bits >= 8) {
      bits.push_back(u8(word >> 24));
      word <<= 8;
      word_bits -= 8;
    }
  }

  void serialize(std::vector<u8>& out);
};

// Decoder-side frame reader.
struct FrameSource {
  const u8* bit_ptr = nullptr;
  const u8* rans_ptr = nullptr;
  u32 word = 0, word_bits = 0;
  u32 lanes[4] = {};
  u32 lane_idx = 0;
  u32 ops = 0;
  u32 consumed = 0;

  // Returns true if a data frame was parsed; false on sentinel/short input.
  bool init(const u8* p, const u8* limit);

  template <typename F>
  inline int get_cdf(F& f) {
    ops--;
    u32& x = lanes[lane_idx++ & 3];
    int fr = int(x & kScaleMask);
    int y = f.find(fr);
    x = f.width(y) * (x >> kScaleBits) + u32(fr) - f.c[y];
    if (x < kRansMid) {
      x = (x << 16) | (u32(rans_ptr[0]) << 8) | rans_ptr[1];
      rans_ptr += 2;
    }
    f.adapt(y);
    return y;
  }

  inline u32 get_bits(u32 nb) {
    ops--;
    while (word_bits < 24) {
      word |= u32(*bit_ptr++) << (24 - word_bits);
      word_bits += 8;
    }
    u32 y = word >> (32 - nb);
    word <<= nb;
    word_bits -= nb;
    return y;
  }
};

}  // namespace nlzm
