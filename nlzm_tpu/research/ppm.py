"""PPM research codec: order-4 context mixing over a carry-less range coder.

Capability counterpart of the reference's research PPMd var.I
(research/ppmd-cleaned-cpp/: Subbotin-style carry-less range coder
ppmd_rc.cpp:1-92, suffix-chained context model with escape estimation
ppmd_model.cpp, mirror encode/decode drivers ppmd_file.cpp). This is a
fresh, compact design rather than a var.I re-implementation:

- 32-bit carry-less range coder (TOP = 2^24 renormalization), the same
  coder family as the reference's.
- Hashed context tables for orders 4..1 plus an order-0 table (no
  suballocator arena: Python dicts keyed by context hash; each context
  holds symbol frequencies). Escape probability is method-C-like
  (escape weight = number of distinct symbols), halving rescale at 8k.
- Exclusion of symbols already rejected at higher orders, as in PPM
  proper.

Slow host-reference implementation (research-grade, like the reference's
research tree); the batched TPU formulation follows the LZ engine's
SIMD-across-streams pattern and is roadmap (ADAPTIVE per-block tries are
memory-bound on HBM; see README roadmap).
"""

TOP = 1 << 24
BOT = 1 << 15
MAX_FREQ = 8192
ORDERS = (4, 3, 2, 1)


class RangeEncoder:
    def __init__(self) -> None:
        self.low = 0
        self.range_ = 0xFFFFFFFF
        self.out = bytearray()

    def encode(self, cum: int, freq: int, tot: int) -> None:
        r = self.range_ // tot
        self.low = (self.low + r * cum) & 0xFFFFFFFFFFFFFFFF
        self.range_ = r * freq
        self._normalize()

    def _normalize(self) -> None:
        # carry-less: force range shrink when low straddles a TOP boundary
        while True:
            if (self.low ^ (self.low + self.range_)) < TOP:
                pass
            elif self.range_ < BOT:
                self.range_ = (-self.low) & (BOT - 1)
            else:
                break
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFF
            self.range_ = (self.range_ << 8) & 0xFFFFFFFFFFFFFFFF

    def flush(self) -> bytes:
        for _ in range(4):
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFF
        return bytes(self.out)


class RangeDecoder:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 4
        self.low = 0
        self.range_ = 0xFFFFFFFF
        self.code = int.from_bytes(data[0:4], "big")

    def get_freq(self, tot: int) -> int:
        self.r = self.range_ // tot
        return min(tot - 1, (self.code - self.low) // self.r)

    def decode(self, cum: int, freq: int) -> None:
        self.low = (self.low + self.r * cum) & 0xFFFFFFFFFFFFFFFF
        self.range_ = self.r * freq
        while True:
            if (self.low ^ (self.low + self.range_)) < TOP:
                pass
            elif self.range_ < BOT:
                self.range_ = (-self.low) & (BOT - 1)
            else:
                break
            byte = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.code = ((self.code << 8) | byte) & 0xFFFFFFFF
            self.low = (self.low << 8) & 0xFFFFFFFF
            self.range_ = (self.range_ << 8) & 0xFFFFFFFFFFFFFFFF


class _Model:
    """Shared encode/decode model state (mirror-image drivers)."""

    def __init__(self) -> None:
        # per order: {ctx_hash: {symbol: freq}}
        self.tables = [dict() for _ in ORDERS]
        self.order0 = {}

    @staticmethod
    def _ctx_keys(hist: int):
        # hist holds the last 4 bytes, newest in the low byte
        return (
            hist & 0xFFFFFFFF,
            hist & 0xFFFFFF,
            hist & 0xFFFF,
            hist & 0xFF,
        )

    @staticmethod
    def _rescale(stats: dict) -> None:
        for s in list(stats):
            nf = stats[s] >> 1
            if nf:
                stats[s] = nf
            else:
                del stats[s]

    def update(self, hist: int, sym: int) -> None:
        for table, key in zip(self.tables, self._ctx_keys(hist)):
            stats = table.get(key)
            if stats is None:
                table[key] = {sym: 1}
            else:
                stats[sym] = stats.get(sym, 0) + 4
                if sum(stats.values()) > MAX_FREQ:
                    self._rescale(stats)
        self.order0[sym] = self.order0.get(sym, 0) + 1
        if sum(self.order0.values()) > MAX_FREQ:
            self._rescale(self.order0)


def _context_spans(stats: dict, excluded: set):
    """Cumulative layout of a context: included symbols then escape."""
    items = [(s, f) for s, f in sorted(stats.items()) if s not in excluded]
    if not items:
        return None
    esc = len(items)  # method-C-like escape weight
    tot = sum(f for _, f in items) + esc
    return items, esc, tot


def compress(data: bytes) -> bytes:
    enc = RangeEncoder()
    model = _Model()
    hist = 0
    for sym in data:
        excluded: set = set()
        coded = False
        for table, key in zip(model.tables, model._ctx_keys(hist)):
            stats = table.get(key)
            if not stats:
                continue
            layout = _context_spans(stats, excluded)
            if layout is None:
                continue
            items, esc, tot = layout
            cum = 0
            hit = None
            for s, f in items:
                if s == sym:
                    hit = (cum, f)
                    break
                cum += f
            if hit is not None:
                enc.encode(hit[0], hit[1], tot)
                coded = True
                break
            enc.encode(tot - esc, esc, tot)  # escape
            excluded.update(s for s, _ in items)
        if not coded:
            # order 0 with exclusions, then a flat order(-1) alphabet
            layout = _context_spans(model.order0, excluded)
            if layout is not None:
                items, esc, tot = layout
                cum = 0
                hit = None
                for s, f in items:
                    if s == sym:
                        hit = (cum, f)
                        break
                    cum += f
                if hit is not None:
                    enc.encode(hit[0], hit[1], tot)
                    coded = True
                else:
                    enc.encode(tot - esc, esc, tot)
                    excluded.update(s for s, _ in items)
            if not coded:
                rest = [s for s in range(256) if s not in excluded]
                idx = rest.index(sym)
                enc.encode(idx, 1, len(rest))
        model.update(hist, sym)
        hist = ((hist << 8) | sym) & 0xFFFFFFFF
    payload = enc.flush()
    return len(data).to_bytes(8, "big") + payload


def decompress(blob: bytes) -> bytes:
    n = int.from_bytes(blob[0:8], "big")
    dec = RangeDecoder(blob[8:])
    model = _Model()
    hist = 0
    out = bytearray()
    for _ in range(n):
        excluded: set = set()
        sym = None
        for table, key in zip(model.tables, model._ctx_keys(hist)):
            stats = table.get(key)
            if not stats:
                continue
            layout = _context_spans(stats, excluded)
            if layout is None:
                continue
            items, esc, tot = layout
            f = dec.get_freq(tot)
            cum = 0
            found = None
            for s, fr in items:
                if cum + fr > f:
                    found = (s, cum, fr)
                    break
                cum += fr
            if found is not None:
                dec.decode(found[1], found[2])
                sym = found[0]
                break
            dec.decode(tot - esc, esc)  # escape
            excluded.update(s for s, _ in items)
        if sym is None:
            layout = _context_spans(model.order0, excluded)
            if layout is not None:
                items, esc, tot = layout
                f = dec.get_freq(tot)
                cum = 0
                found = None
                for s, fr in items:
                    if cum + fr > f:
                        found = (s, cum, fr)
                        break
                    cum += fr
                if found is not None:
                    dec.decode(found[1], found[2])
                    sym = found[0]
                else:
                    dec.decode(tot - esc, esc)
                    excluded.update(s for s, _ in items)
            if sym is None:
                rest = [s for s in range(256) if s not in excluded]
                idx = dec.get_freq(len(rest))
                dec.decode(idx, 1)
                sym = rest[idx]
        out.append(sym)
        model.update(hist, sym)
        hist = ((hist << 8) | sym) & 0xFFFFFFFF
    return bytes(out)
