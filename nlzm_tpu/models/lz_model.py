"""LZ command context model: 4-command alphabet over adaptive nibble CDFs.

Commands (wire values): 0 literal, 1 dictionary match, 2 repeat-distance
match (slot 3 reserved). Literals are coded as two nibbles with the low
nibble contexted on the high one. Lengths are (len - match_min(dist)): a
direct 3-bit CDF with value 7 escaping to two extension nibbles. Distances
use a 64-slot code (6 bits as 3+3 nibble CDFs contexted by a length class)
with the remaining bits written to the raw bit stream, always peeling the
low 4 bits as a separate field.

Model state totals ~2 KB and adapts continuously across the whole stream -
there is no per-frame reset. Wire parity: NLZM.cpp:1125-1456.
"""

from ..constants import CMD_DICT, CMD_LITERAL, CMD_REP, get_match_min
from ..utils.log2lut import LOG2_LUT
from .cdf import cdf_cost, cdf_update, new_cdf


class RepState:
    """4-slot recent-distance cache (most recent first; NLZM.cpp:1125-1181)."""

    __slots__ = ("table",)

    def __init__(self, table=None) -> None:
        self.table = list(table) if table is not None else [1, 2, 3, 4]

    def copy(self) -> "RepState":
        return RepState(self.table)

    def add(self, delta: int) -> None:
        t = self.table
        if delta in t:
            return
        t[3] = t[2]
        t[2] = t[1]
        t[1] = t[0]
        t[0] = delta

    def find(self, delta: int) -> int:
        """Slot index holding `delta`, or -1."""
        try:
            return self.table.index(delta)
        except ValueError:
            return -1


def _dist_slot(dv: int):
    """Map dv = delta-1 to (slot, extra_bit_count, extra_bits).

    dv < 4 codes directly as the slot. Otherwise the top two bits select the
    slot and the rest go to the raw bit stream.
    """
    if dv < 4:
        return dv, 0, 0
    nb = dv.bit_length()  # == bsr32(dv) + 1
    add_bits = nb - 2
    top = dv >> add_bits
    slot = ((nb - 1) << 1) + (top & 1)
    return slot, add_bits, dv & ((1 << add_bits) - 1)


class LZModel:
    """All adaptive CDF state plus the rep-distance cache."""

    __slots__ = (
        "rep",
        "cmd",
        "lit_hi",
        "lit_lo",
        "len_direct",
        "len_ext_hi",
        "len_ext_lo",
        "dist_slot_hi",
        "dist_slot_lo",
    )

    def __init__(self) -> None:
        self.rep = RepState()
        self.cmd = new_cdf(4)
        self.lit_hi = new_cdf(16)
        self.lit_lo = [new_cdf(16) for _ in range(16)]
        self.len_direct = new_cdf(8)
        self.len_ext_hi = new_cdf(16)
        self.len_ext_lo = [new_cdf(16) for _ in range(16)]
        self.dist_slot_hi = [new_cdf(8) for _ in range(4)]
        self.dist_slot_lo = [[new_cdf(8) for _ in range(8)] for _ in range(4)]

    # ---- costs (1/32-bit units; read-only) ----

    def cost_literal(self, y: int) -> int:
        hi, lo = y >> 4, y & 0xF
        return (
            cdf_cost(self.cmd, CMD_LITERAL)
            + cdf_cost(self.lit_hi, hi)
            + cdf_cost(self.lit_lo[hi], lo)
        )

    def _cost_length(self, lv: int) -> int:
        cost = cdf_cost(self.len_direct, min(lv, 7))
        if lv >= 7:
            ext = lv - 7
            hi, lo = ext >> 4, ext & 0xF
            cost += cdf_cost(self.len_ext_hi, hi) + cdf_cost(self.len_ext_lo[hi], lo)
        return cost

    def cost_match(self, delta: int, length: int) -> int:
        lv = length - get_match_min(delta)
        lc = min(lv, 3)
        cost = cdf_cost(self.cmd, CMD_DICT) + self._cost_length(lv)
        slot, add_bits, _ = _dist_slot(delta - 1)
        cost += add_bits << 5
        hi, lo = slot >> 3, slot & 0x7
        cost += cdf_cost(self.dist_slot_hi[lc], hi)
        cost += cdf_cost(self.dist_slot_lo[lc][hi], lo)
        return cost

    def cost_rep(self, rep_idx: int, delta: int, length: int) -> int:
        lv = length - get_match_min(delta)
        return cdf_cost(self.cmd, CMD_REP) + self._cost_length(lv) + (2 << 5)

    # ---- encode (mutates CDFs) ----

    def encode_literal(self, frame, y: int) -> None:
        hi, lo = y >> 4, y & 0xF
        frame.put_cdf(self.cmd, CMD_LITERAL)
        frame.put_cdf(self.lit_hi, hi)
        frame.put_cdf(self.lit_lo[hi], lo)
        cdf_update(self.cmd, CMD_LITERAL)
        cdf_update(self.lit_hi, hi)
        cdf_update(self.lit_lo[hi], lo)

    def _encode_length(self, frame, lv: int) -> None:
        d = min(lv, 7)
        frame.put_cdf(self.len_direct, d)
        cdf_update(self.len_direct, d)
        if lv >= 7:
            ext = lv - 7
            hi, lo = ext >> 4, ext & 0xF
            frame.put_cdf(self.len_ext_hi, hi)
            frame.put_cdf(self.len_ext_lo[hi], lo)
            cdf_update(self.len_ext_hi, hi)
            cdf_update(self.len_ext_lo[hi], lo)

    def encode_match(self, frame, delta: int, length: int) -> None:
        frame.put_cdf(self.cmd, CMD_DICT)
        cdf_update(self.cmd, CMD_DICT)

        lv = length - get_match_min(delta)
        lc = min(lv, 3)
        self._encode_length(frame, lv)

        slot, add_bits, extra = _dist_slot(delta - 1)
        hi, lo = slot >> 3, slot & 0x7
        frame.put_cdf(self.dist_slot_hi[lc], hi)
        frame.put_cdf(self.dist_slot_lo[lc][hi], lo)
        cdf_update(self.dist_slot_hi[lc], hi)
        cdf_update(self.dist_slot_lo[lc][hi], lo)

        if add_bits:
            if add_bits < 4:
                frame.put_bits(extra, add_bits)
            else:
                if add_bits > 4:
                    frame.put_bits(extra >> 4, add_bits - 4)
                frame.put_bits(extra & 0xF, 4)

    def encode_rep(self, frame, rep_idx: int, length: int) -> None:
        frame.put_cdf(self.cmd, CMD_REP)
        cdf_update(self.cmd, CMD_REP)
        lv = length - get_match_min(self.rep.table[rep_idx])
        self._encode_length(frame, lv)
        frame.put_bits(rep_idx, 2)

    # ---- decode (mutates CDFs) ----

    def decode_cmd(self, frame) -> int:
        y = frame.read_cdf(self.cmd)
        cdf_update(self.cmd, y)
        return y

    def decode_literal(self, frame) -> int:
        hi = frame.read_cdf(self.lit_hi)
        lo = frame.read_cdf(self.lit_lo[hi])
        cdf_update(self.lit_hi, hi)
        cdf_update(self.lit_lo[hi], lo)
        return (hi << 4) | lo

    def decode_lv(self, frame) -> int:
        lv = frame.read_cdf(self.len_direct)
        cdf_update(self.len_direct, lv)
        if lv == 7:
            hi = frame.read_cdf(self.len_ext_hi)
            lo = frame.read_cdf(self.len_ext_lo[hi])
            cdf_update(self.len_ext_hi, hi)
            cdf_update(self.len_ext_lo[hi], lo)
            lv += (hi << 4) + lo
        return lv

    def decode_dv(self, frame, lv: int) -> int:
        """Decode dv = delta - 1 given the already-decoded length value."""
        lc = min(lv, 3)
        hi = frame.read_cdf(self.dist_slot_hi[lc])
        lo = frame.read_cdf(self.dist_slot_lo[lc][hi])
        cdf_update(self.dist_slot_hi[lc], hi)
        cdf_update(self.dist_slot_lo[lc][hi], lo)
        dv = (hi << 3) + lo
        if dv >= 4:
            add_bits = (dv >> 1) - 1
            dv = (2 + (dv & 1)) << add_bits
            if add_bits < 4:
                dv += frame.read_bits(add_bits)
            else:
                add_bits -= 4
                if add_bits > 0:
                    dv += frame.read_bits(add_bits) << 4
                dv += frame.read_bits(4)
        return dv
