// Match finders over a flat input buffer with virtual positions.
//
// The window is logical: virtual positions rebase by one window size when
// they reach twice the window ("shift"), and all finders enforce
// (p - candidate) <= window-1, so no physical ring is needed - any
// in-window virtual position maps to a flat buffer offset. Finder choice
// semantics are wire-parity with the reference (NLZM.cpp:733-1123),
// including its HT rebase quirk (see HtFinder::shift).
#pragma once
#include "core.h"

namespace nlzm {

// Flat-buffer dictionary view with virtual positions.
struct View {
  const u8* buf = nullptr;
  i64 abs_base = 0;  // abs offset of virtual position 0
  u32 hist_pos = 0;  // virtual position of the next uncommitted byte
  u32 mask = 0;      // window - 1
  u32 look_len = 0;  // bytes readable at >= hist_pos

  inline u8 at(u32 p) const { return buf[abs_base + p]; }
  inline const u8* ptr(u32 p) const { return buf + abs_base + p; }

  inline u32 max_match_at(u32 p) const {
    u32 m = look_len + hist_pos - p;
    return m < kMatchMax ? m : kMatchMax;
  }

  // Common prefix length from (p0, p1), top bit = "string at p0 sorts below".
  inline u32 match_len_signed(u32 p0, u32 p1, u32 max_len, u32 initial) const {
    const u8* a = ptr(p0) + initial;
    const u8* b = ptr(p1) + initial;
    u32 m = initial;
    // 8-byte strides on the flat buffer
    while (m + 8 <= max_len) {
      u64 va, vb;
      std::memcpy(&va, a, 8);
      std::memcpy(&vb, b, 8);
      u64 diff = va ^ vb;
      if (diff) {
        u32 k = u32(__builtin_ctzll(diff) >> 3);
        m += k;
        return m | (u32(a[k] < b[k]) << 31);
      }
      a += 8;
      b += 8;
      m += 8;
    }
    while (m < max_len) {
      if (*a != *b) return m | (u32(*a < *b) << 31);
      ++a;
      ++b;
      ++m;
    }
    return m;
  }
  inline u32 match_len(u32 p0, u32 p1, u32 max_len) const {
    return match_len_signed(p0, p1, max_len, 0) & 0x7FFFFFFF;
  }
};

// Candidate set: best (smallest) delta per achievable length.
struct Candidates {
  u16 max_len = 0;
  u32 delta[kMatchMax + 1];

  inline void carry_from(const Candidates& prev) {
    if (prev.max_len <= 1) {
      max_len = 0;
    } else {
      max_len = prev.max_len - 1;
      std::memcpy(delta, prev.delta + 1, (max_len + 1) * sizeof(u32));
    }
  }
  inline void update(u32 d, u32 len) {
    u32 i = 0, top = len < max_len ? len : max_len;
    for (; i <= top; i++)
      if (d < delta[i]) delta[i] = d;
    for (; i <= len; i++) delta[i] = d;
    if (len > max_len) max_len = u16(len);
  }
};

inline u32 hash_of(u32 v) { return v * kHashMult; }
inline u32 read2(const u8* p) { u16 v; std::memcpy(&v, p, 2); return v; }
inline u32 read3(const u8* p) { u32 v; std::memcpy(&v, p, 4); return v & 0xFFFFFF; }
inline u32 read4(const u8* p) { u32 v; std::memcpy(&v, p, 4); return v; }

// FIFO bucket hash table (2/3-byte finders).
struct HtFinder {
  u32 hash_shift, num_rows, window_bits, window_mask, check_mask;
  std::vector<u32> rows;

  void setup(u32 hash_bits, u32 nrows, u32 wbits) {
    hash_shift = 32 - hash_bits;
    num_rows = nrows;
    window_bits = wbits;
    window_mask = (1u << wbits) - 1;
    check_mask = (1u << (32 - wbits)) - 1;
    rows.assign(size_t(nrows) << hash_bits, kEmpty);
  }

  void probe(Candidates& mt, u32 h, u32 p, const View& d) {
    u32 check = h & check_mask;
    u32* cell = rows.data() + (h >> hash_shift);
    u32 carry = p | (check << window_bits);
    u32 max_len = d.max_match_at(p);
    u32 best = kMatchMin - 1;
    for (u32 i = 0; i < num_rows; i++) {
      u32 row = cell[i];
      if (best < max_len && (row >> window_bits) == check) {
        u32 sp = row & window_mask;
        if (sp < p && p - sp <= d.mask) {
          u32 mlen = d.match_len(sp, p, max_len);
          if (mlen > best && mlen >= match_min_for(p - sp)) {
            mt.update(p - sp, mlen);
            best = mlen;
          }
        }
      }
      cell[i] = carry;
      carry = row;
    }
  }

  void shift(u32) {
    // Reference quirk: its rebase loop strides one pointer but always
    // dereferences the first cell, so cell 0 ends empty and the rest keep
    // stale (byte-verified) positions. Reproduced for output parity.
    rows[0] = kEmpty;
  }
};

// Binary search tree finder over 4-byte hash heads, probe budget 256.
struct BtFinder {
  u32 hash_shift;
  std::vector<u32> heads;
  std::vector<u32> tree;

  void setup(u32 hash_bits, u32 wbits) {
    hash_shift = 32 - hash_bits;
    heads.assign(size_t(1) << hash_bits, kEmpty);
    tree.assign(size_t(2) << wbits, kEmpty);
  }

  void probe(Candidates& mt, u32 h4, u32 p, const View& d) {
    u32 mask = d.mask;
    u32 pl = (p & mask) << 1;
    u32 pr = pl + 1;
    u32 left_len = 0, right_len = 0;

    u32& head = heads[h4 >> hash_shift];
    u32 sp = head;
    head = p;

    u32 max_len = d.max_match_at(p);
    int budget = 256;
    while (sp != kEmpty && p > sp && p - sp <= mask && budget-- > 0) {
      u32 pair = (sp & mask) << 1;
      u32 ms = d.match_len_signed(sp, p, max_len, left_len < right_len ? left_len : right_len);
      u32 mlen = ms & 0x7FFFFFFF;
      if (mlen >= match_min_for(p - sp)) mt.update(p - sp, mlen);
      if (mlen == max_len) {
        tree[pl] = tree[pair];
        tree[pr] = tree[pair + 1];
        return;
      }
      if (ms >> 31) {
        tree[pl] = sp;
        pl = pair + 1;
        sp = tree[pl];
        right_len = mlen;
      } else {
        tree[pr] = sp;
        pr = pair;
        sp = tree[pr];
        left_len = mlen;
      }
    }
    tree[pr] = kEmpty;
    tree[pl] = kEmpty;
  }

  void shift(u32 w) {
    for (u32& v : heads) v = (v != kEmpty && v >= w) ? v - w : kEmpty;
    for (u32& v : tree) v = (v != kEmpty && v >= w) ? v - w : kEmpty;
  }
};

// Long-range rolling-hash finder, one fingerprint per 256-byte block,
// with carry of live long matches across positions.
struct RkFinder {
  u32 hash_shift, window_bits, check_mask, window_mask;
  std::vector<u32> table;
  u32 rh = 0, rh_end = 0;
  u32 carry_from = 0, carry_to = 0, carry_len = 0;

  void setup(u32 hash_bits, u32 wbits) {
    hash_shift = 32 - hash_bits;
    window_bits = wbits;
    check_mask = (1u << (32 - wbits)) - 1;
    window_mask = (1u << wbits) - 1;
    table.assign(size_t(1) << hash_bits, kEmpty);
  }

  void probe(Candidates& mt, u32 p, const View& d) {
    if (carry_len > 0) {
      u32 gap = p - carry_to;
      if (gap < carry_len) {
        u32 delta = carry_to - carry_from;
        u32 mlen = carry_len - gap;
        if (mlen >= match_min_for(delta)) mt.update(delta, mlen < kMatchMax ? mlen : kMatchMax);
      } else {
        carry_len = 0;
      }
    }

    u32 limit = p + 256;
    while (d.look_len >= (p - d.hist_pos) + 256 && rh_end < limit) {
      u32 c0 = d.at(rh_end);
      if (rh_end >= 256) {
        u32 c1 = d.at(rh_end - 256);
        rh = (c0 + rh - c1 * kRkRem) * kRkAdd;
      } else {
        rh = (c0 + rh) * kRkAdd;
      }
      rh_end++;
      if (!(rh_end & 255) && rh_end < limit) table[rh >> hash_shift] = p | (rh << window_bits);
    }

    if (carry_len < 256) {
      u32 row = table[rh >> hash_shift];
      u32 sp = row & window_mask;
      if ((row >> window_bits) == (rh & check_mask) && sp < p && p - sp <= d.mask) {
        // Parity quirk: the reference passes this u32 into a u16 parameter
        // (NLZM.cpp:1101 -> MatchLengthSigned, :854), truncating mod 65536
        // when the lookahead exceeds 64 KiB (frame_bits 17). Long-repetition
        // carries must clip identically or parses diverge at window >= 19.
        u32 max_len = u32(u16(d.look_len + d.hist_pos - p));
        u32 mlen = d.match_len(sp, p, max_len);
        if (mlen >= carry_len && mlen >= match_min_for(p - sp)) {
          mt.update(p - sp, mlen < kMatchMax ? mlen : kMatchMax);
          carry_from = sp;
          carry_to = p;
          carry_len = mlen;
        }
      }
    }

    if (!(rh_end & 255) && rh_end == limit) table[rh >> hash_shift] = p | (rh << window_bits);
  }

  void shift(u32 w) {
    if (rh_end >= w) {
      rh_end -= w;
    } else {
      rh = 0;
      rh_end = 0;
    }
    // carry positions/table stay as-is (parity); stale entries die on the
    // wrap-around gap check or byte verification.
  }
};

}  // namespace nlzm
