"""Ring history window with virtual positions.

Positions are monotonically increasing virtual offsets. A position at or past
`hist_pos` reads from the lookahead (the not-yet-committed chunk bytes);
anything older reads the ring modulo the window. When `hist_pos` reaches
twice the window the whole position space is rebased down by one window
("shift"), which every match-finder mirrors.

Parity: NLZM.cpp:754-764, 854-891.
"""

from ..constants import MATCH_MAX


class RingDict:
    __slots__ = ("hist", "hist_bits", "hist_mask", "hist_pos", "lookahead", "lookahead_len")

    def __init__(self, hist_bits: int) -> None:
        self.hist_bits = hist_bits
        self.hist_mask = (1 << hist_bits) - 1
        self.hist = bytearray(1 << hist_bits)
        self.hist_pos = 0
        self.lookahead: memoryview | bytes = b""
        self.lookahead_len = 0

    def set_lookahead(self, view, length: int) -> None:
        self.lookahead = view
        self.lookahead_len = length

    def char_at(self, p: int) -> int:
        if p >= self.hist_pos:
            return self.lookahead[p - self.hist_pos]
        return self.hist[p & self.hist_mask]

    def match_length_signed(self, p0: int, p1: int, max_len: int, initial_len: int):
        """Common-prefix length of the strings at virtual p0 < p1, plus an
        ordering flag (True if string(p0) < string(p1) at the mismatch)."""
        hist = self.hist
        look = self.lookahead
        hp = self.hist_pos
        mask = self.hist_mask
        a = p0 + initial_len
        b = p1 + initial_len
        mlen = initial_len
        while mlen < max_len:
            c0 = look[a - hp] if a >= hp else hist[a & mask]
            c1 = look[b - hp] if b >= hp else hist[b & mask]
            if c0 != c1:
                return mlen, c0 < c1
            a += 1
            b += 1
            mlen += 1
        return mlen, False

    def match_length(self, p0: int, p1: int, max_len: int) -> int:
        return self.match_length_signed(p0, p1, max_len, 0)[0]

    def max_match_at(self, p: int) -> int:
        """Longest representable match starting at virtual p."""
        return min(self.lookahead_len + self.hist_pos - p, MATCH_MAX)

    def push(self, y: int) -> None:
        """Commit one byte of history."""
        self.hist[self.hist_pos & self.hist_mask] = y
        self.hist_pos += 1

    def shift(self, window: int) -> None:
        self.hist_pos -= window
