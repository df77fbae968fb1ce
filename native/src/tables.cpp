// Cost LUT, CDF adaptation targets, CRC32.
#include "core.h"

namespace nlzm {

// Fixed-point -log2 table: 5 fractional bits, built by repeated squaring of
// the normalized mantissa (parity: NLZM.cpp:101-124).
CostLut::CostLut() {
  for (int i = 1; i < 256; i++) {
    u32 next = 1u << 16;
    u16 acc = 0;
    for (int s = 0; s < 32; s++) {
      u32 m = (u32(i) * next) >> 8;
      int top = 31 - __builtin_clz(m);     // index of msb
      int nbits = 16 - top;
      acc = u16(acc + nbits - 1);
      next = m << (nbits - 1);
    }
    v[i] = acc;
  }
  v[0] = v[1];
}
const CostLut g_cost;

MixinRows::MixinRows() {
  const int ns[3] = {4, 8, 16};
  for (int k = 0; k < 3; k++) {
    int n = ns[k];
    int bias = (1 << kAdaptBits) - 1 - n;
    for (int y = 0; y < n; y++) {
      for (int x = 0; x < n; x++) {
        rows[k][y][x] = (x <= y) ? x : (kScale + x + bias);
      }
    }
  }
}
const MixinRows g_mixin;

// CRC32 poly 0xEDB88320, slicing-by-8.
namespace {
struct CrcTables {
  u32 t[8][256];
  CrcTables() {
    for (u32 n = 0; n < 256; n++) {
      u32 c = n;
      for (int k = 0; k < 8; k++) c = (c & 1) ? (c >> 1) ^ 0xEDB88320u : c >> 1;
      t[0][n] = c;
    }
    for (u32 n = 0; n < 256; n++) {
      u32 c = t[0][n];
      for (int k = 1; k < 8; k++) {
        c = t[0][c & 0xFF] ^ (c >> 8);
        t[k][n] = c;
      }
    }
  }
};
const CrcTables g_crc;
}  // namespace

u32 crc32(const u8* p, i64 n, u32 prev) {
  u32 c = prev ^ 0xFFFFFFFFu;
  while (n >= 8) {
    u32 lo, hi;
    std::memcpy(&lo, p, 4);
    std::memcpy(&hi, p + 4, 4);
    lo ^= c;
    c = g_crc.t[7][lo & 0xFF] ^ g_crc.t[6][(lo >> 8) & 0xFF] ^ g_crc.t[5][(lo >> 16) & 0xFF] ^
        g_crc.t[4][lo >> 24] ^ g_crc.t[3][hi & 0xFF] ^ g_crc.t[2][(hi >> 8) & 0xFF] ^
        g_crc.t[1][(hi >> 16) & 0xFF] ^ g_crc.t[0][hi >> 24];
    p += 8;
    n -= 8;
  }
  while (n-- > 0) c = g_crc.t[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

}  // namespace nlzm
