// Frame container: staged symbol spans + direct bits in, serialized frame
// bytes out (backward 4-lane rANS pass); and the streaming reader.
// Wire parity: NLZM.cpp:440-731.
#include "frame.h"

namespace nlzm {

void FrameSink::reset() {
  spans.clear();
  bits.clear();
  word = 0;
  word_bits = 0;
  ops = 0;
  est_bits = 0;
}

void FrameSink::serialize(std::vector<u8>& out) {
  // finish the bit section: staged bytes + exactly 4 drain bytes
  u32 w = word;
  u8 drain[4];
  for (int i = 0; i < 4; i++) {
    drain[i] = u8(w >> 24);
    w <<= 8;
  }

  // backward interleaved rANS pass (lane = symbol_index & 3)
  rans_rev.clear();
  u32 st[4] = {kRansMid, kRansMid, kRansMid, kRansMid};
  for (size_t i = spans.size(); i-- > 0;) {
    u32 sf = spans[i];
    u32 start = sf & 0xFFFF, freq = sf >> 16;
    u32& x = st[i & 3];
    if (x >= (freq << 18)) {
      rans_rev.push_back(u8(x));
      rans_rev.push_back(u8(x >> 8));
      x >>= 16;
    }
    x = ((x / freq) << kScaleBits) + (x % freq) + start;
  }
  for (int lane = 3; lane >= 0; lane--) {
    u32 x = st[lane];
    rans_rev.push_back(u8(x >> 24));
    rans_rev.push_back(u8(x >> 16));
    rans_rev.push_back(u8(x >> 8));
    rans_rev.push_back(u8(x));
  }

  u32 nbits_bytes = 12 + u32(bits.size()) + 4;
  u32 nrans_bytes = u32(rans_rev.size());

  size_t base = out.size();
  out.resize(base + nbits_bytes + nrans_bytes);
  u8* h = out.data() + base;
  u32 no = ops;
  h[0] = u8(no >> 24); h[1] = u8(no >> 16); h[2] = u8(no >> 8); h[3] = u8(no);
  h[4] = u8(nbits_bytes >> 24); h[5] = u8(nbits_bytes >> 16); h[6] = u8(nbits_bytes >> 8); h[7] = u8(nbits_bytes);
  h[8] = u8(nrans_bytes >> 24); h[9] = u8(nrans_bytes >> 16); h[10] = u8(nrans_bytes >> 8); h[11] = u8(nrans_bytes);
  if (!bits.empty()) std::memcpy(h + 12, bits.data(), bits.size());
  std::memcpy(h + 12 + bits.size(), drain, 4);
  u8* rp = h + nbits_bytes;
  for (size_t i = rans_rev.size(); i-- > 0;) *rp++ = rans_rev[i];

  reset();
}

bool FrameSource::init(const u8* p, const u8* limit) {
  if (p + 4 > limit) return false;
  ops = (u32(p[0]) << 24) | (u32(p[1]) << 16) | (u32(p[2]) << 8) | p[3];
  if (ops == 0) {
    consumed = 4;
    return false;
  }
  u32 nbits = (u32(p[4]) << 24) | (u32(p[5]) << 16) | (u32(p[6]) << 8) | p[7];
  u32 nrans = (u32(p[8]) << 24) | (u32(p[9]) << 16) | (u32(p[10]) << 8) | p[11];
  consumed = nbits + nrans;
  bit_ptr = p + 12;
  word = 0;
  word_bits = 0;
  rans_ptr = p + nbits;
  for (int i = 0; i < 4; i++) {
    lanes[i] = u32(rans_ptr[0]) | (u32(rans_ptr[1]) << 8) | (u32(rans_ptr[2]) << 16) |
               (u32(rans_ptr[3]) << 24);
    rans_ptr += 4;
  }
  lane_idx = 0;
  return true;
}

}  // namespace nlzm
