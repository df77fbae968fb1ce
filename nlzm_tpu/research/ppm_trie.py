"""PPM research codec v2: suffix-linked context trie (var.I-class).

Fills the two structural gaps the hashed-table PPM (research/ppm.py)
left open vs the reference's PPMd var.I
(/root/reference/research/ppmd-cleaned-cpp/):

- **Suffix-linked context trie with lazy successor creation.** Contexts
  are exact (no hash collisions) records with a `suffix` link to the
  next-shorter context (ppmd.h:271-293). Each (context, symbol) State
  carries a successor slot; deeper contexts materialize lazily the
  first time the model walks through them, inheriting their first
  symbol from the path that created them - the same role as
  CreateSuccessors (ppmd_model.cpp:210-298) without its raw-text
  pointer encoding (we key pending successors by (ctx, sym) instead).
- **CutOff pruning instead of full restart** (ppmd_model.cpp:520-598).
  At the node budget the model prunes: contexts whose total frequency
  is below a threshold are dropped recursively (children first),
  surviving stats halve, and coding continues with the pruned model.
  The trigger and rule are deterministic, so encoder and decoder prune
  identically at the same symbol - bitstream-compatible graceful
  degradation rather than a restart. A full reset remains as the
  last-resort tier (restart_model, mirroring RestoreModel's
  "free everything" arm).

The coder, SEE estimator bank, exclusion handling and driver structure
are shared with research/ppm.py (same carry-less range coder family as
ppmd_rc.cpp:1-92). Research-grade host code, like the reference's
research tree.
"""

from .ppm import _SEE, BOT, MAX_FREQ, RangeDecoder, RangeEncoder

MAX_ORDER = 6
NODE_BUDGET = 1 << 18  # states across the trie before CutOff
CUTOFF_FREQ = 3  # contexts with total freq below this are pruned
INIT_FREQ = 3  # inherited-ish cold start for fresh symbols (swept)
BUMP = 4

BIN_SCALE = 1 << 13  # binary-context probability scale
BIN_INIT = BIN_SCALE - (BIN_SCALE >> 2)  # deterministic contexts usually hit
BIN_SHIFT = 5


class _BinSEE:
    """Adaptive hit probability for deterministic (1-symbol) contexts.

    The var.I analog is tbl_bin_see[25][64] (ppmd.h:295-317): most
    high-order text contexts hold a single symbol, and a dedicated
    fine-grained estimator beats the generic escape bank there. Bucketed
    by (clamped order, frequency class)."""

    def __init__(self):
        self.acc = {}

    def prob(self, order, freq):
        key = (min(order, MAX_ORDER) << 5) | min(freq.bit_length(), 15)
        return self.acc.get(key, BIN_INIT), key

    def update(self, key, hit):
        p = self.acc.get(key, BIN_INIT)
        target = BIN_SCALE - 1 if hit else 0
        # clamp: the arithmetic shift walks p all the way to 0 on a miss
        # streak, which would hand the range coder a zero-width interval
        # (normalize never terminates)
        self.acc[key] = min(max(p + ((target - p) >> BIN_SHIFT), 1), BIN_SCALE - 1)


class _Ctx:
    __slots__ = ("suffix", "stats", "order")

    def __init__(self, suffix, order):
        self.suffix = suffix  # _Ctx | None (None only for root)
        self.order = order
        self.stats = {}  # sym -> [freq, successor_ctx_or_None]


class _TrieModel:
    """Mirror-deterministic suffix-trie model (shared by both drivers)."""

    def __init__(self):
        self.restart()

    def restart(self):
        self.root = _Ctx(None, 0)
        self.cur = self.root  # deepest active context
        self.nodes = 0
        self.see = _SEE()
        self.bin_see = _BinSEE()
        self.pruned = 0

    # -- structure maintenance -------------------------------------
    def _successor(self, ctx, sym):
        """Child context of `ctx` through `sym`, materialized lazily.

        The child's suffix links to the successor of ctx.suffix through
        the same symbol (recursively), which is how the suffix chain
        stays consistent - the CreateSuccessors walk, evaluated eagerly
        one level at a time.
        """
        if ctx.order >= MAX_ORDER:
            ctx = ctx.suffix
        st = ctx.stats.get(sym)
        if st is None:
            # symbol unseen here (can happen after pruning): root hop
            return self.root
        if st[1] is None:
            if ctx is self.root:
                sfx = self.root
            else:
                sfx = self._successor(ctx.suffix, sym)
            st[1] = _Ctx(sfx, ctx.order + 1)
        return st[1]

    def advance(self, sym):
        """Move the active context through `sym` (after update())."""
        self.cur = self._successor(self.cur, sym)

    def update(self, sym, matched_order):
        """Bump/insert `sym` in the active chain (update exclusion: only
        contexts at order >= matched_order bump; shallower ones that
        escaped get a fresh count)."""
        ctx = self.cur
        while ctx is not None:
            st = ctx.stats.get(sym)
            if st is None:
                ctx.stats[sym] = [INIT_FREQ, None]
                self.nodes += 1
            elif ctx.order >= matched_order:
                st[0] += BUMP
                if sum(f for f, _ in ctx.stats.values()) > MAX_FREQ:
                    self._rescale(ctx)
            ctx = ctx.suffix
        if self.nodes > NODE_BUDGET:
            self.cutoff()

    def _rescale(self, ctx):
        for s in list(ctx.stats):
            st = ctx.stats[s]
            st[0] >>= 1
            if st[0] == 0:
                del ctx.stats[s]
                self.nodes -= 1

    # -- graceful degradation --------------------------------------
    def cutoff(self):
        """Prune the trie at the node budget (CutOff analog).

        Walk depth-first from the root; a non-root context survives only
        if its total frequency >= CUTOFF_FREQ. Dropped contexts take
        their subtrees with them (the successor slot is cleared, so the
        chain re-materializes from scratch if re-entered). Surviving
        stats halve, shedding cold symbols. Deterministic: both coders
        hit the same budget at the same symbol and prune identically.
        """
        self.pruned += 1
        kept = 0

        def walk(ctx):
            nonlocal kept
            for s in list(ctx.stats):
                st = ctx.stats[s]
                child = st[1]
                if child is not None:
                    tot = sum(f for f, _ in child.stats.values())
                    if tot < CUTOFF_FREQ:
                        st[1] = None  # drop subtree
                    else:
                        walk(child)
                st[0] >>= 1
                if st[0] == 0:
                    del ctx.stats[s]
                else:
                    kept += 1

        walk(self.root)
        self.nodes = kept
        self.cur = self.root  # active path may be gone; restart the walk
        if self.nodes > (NODE_BUDGET * 3) // 4:
            # pruning failed to make room: last-resort full restart
            # (RestoreModel's free-everything arm)
            self.restart()


def _spans(ctx, excluded):
    items = [
        (s, st[0]) for s, st in sorted(ctx.stats.items()) if s not in excluded
    ]
    if not items:
        return None
    return items, sum(f for _, f in items)


def compress(data: bytes) -> bytes:
    m = _TrieModel()
    enc = RangeEncoder()
    out_header = len(data).to_bytes(8, "big")

    for byte in data:
        excluded = set()
        ctx = m.cur
        matched_order = 0
        # walk the suffix chain, escape until the symbol is found
        while ctx is not None:
            sp = _spans(ctx, excluded)
            if sp is None:
                ctx = ctx.suffix
                continue
            items, tot_inc = sp
            if len(items) == 1 and ctx is not m.root:
                # deterministic context: dedicated binary estimator
                s0, f0 = items[0]
                p, bkey = m.bin_see.prob(ctx.order, f0)
                if s0 == byte:
                    enc.encode(0, p, BIN_SCALE)
                    m.bin_see.update(bkey, True)
                    matched_order = ctx.order
                    break
                enc.encode(p, BIN_SCALE - p, BIN_SCALE)
                m.bin_see.update(bkey, False)
                excluded.add(s0)
                ctx = ctx.suffix
                continue
            esc, key = m.see.escape_weight(
                min(ctx.order, MAX_ORDER), len(items), tot_inc
            )
            if ctx is m.root:
                esc = 0 if len(excluded) + len(items) >= 256 else max(1, esc)
            cum = 0
            hit = None
            for s, f in items:
                if s == byte:
                    hit = (cum, f)
                    break
                cum += f
            if hit is not None:
                enc.encode(hit[0], hit[1], tot_inc + esc)
                if esc:
                    m.see.update(key, False)
                matched_order = ctx.order
                break
            # escape
            if esc == 0:
                raise AssertionError("root must cover all symbols")
            enc.encode(tot_inc, esc, tot_inc + esc)
            m.see.update(key, True)
            excluded.update(s for s, _ in items)
            ctx = ctx.suffix
        else:
            # escaped everything incl. root: code raw under uniform over
            # the not-yet-excluded alphabet
            rest = [s for s in range(256) if s not in excluded]
            enc.encode(rest.index(byte), 1, len(rest))
            matched_order = 0
        m.update(byte, matched_order)
        m.advance(byte)
    return out_header + enc.flush()


def decompress(blob: bytes) -> bytes:
    n = int.from_bytes(blob[:8], "big")
    dec = RangeDecoder(blob[8:])
    m = _TrieModel()
    out = bytearray()

    for _ in range(n):
        excluded = set()
        ctx = m.cur
        matched_order = 0
        byte = None
        while ctx is not None:
            sp = _spans(ctx, excluded)
            if sp is None:
                ctx = ctx.suffix
                continue
            items, tot_inc = sp
            if len(items) == 1 and ctx is not m.root:
                s0, f0 = items[0]
                p, bkey = m.bin_see.prob(ctx.order, f0)
                f = dec.get_freq(BIN_SCALE)
                if f < p:
                    dec.decode(0, p)
                    m.bin_see.update(bkey, True)
                    byte = s0
                    matched_order = ctx.order
                    break
                dec.decode(p, BIN_SCALE - p)
                m.bin_see.update(bkey, False)
                excluded.add(s0)
                ctx = ctx.suffix
                continue
            esc, key = m.see.escape_weight(
                min(ctx.order, MAX_ORDER), len(items), tot_inc
            )
            if ctx is m.root:
                esc = 0 if len(excluded) + len(items) >= 256 else max(1, esc)
            tot = tot_inc + esc
            f = dec.get_freq(tot)
            cum = 0
            hit = None
            for s, fr in items:
                if cum + fr > f:
                    hit = (s, cum, fr)
                    break
                cum += fr
            if hit is not None and f < tot_inc:
                dec.decode(hit[1], hit[2])
                if esc:
                    m.see.update(key, False)
                byte = hit[0]
                matched_order = ctx.order
                break
            dec.decode(tot_inc, esc)
            m.see.update(key, True)
            excluded.update(s for s, _ in items)
            ctx = ctx.suffix
        if byte is None:
            rest = [s for s in range(256) if s not in excluded]
            idx = dec.get_freq(len(rest))
            dec.decode(idx, 1)
            byte = rest[idx]
            matched_order = 0
        out.append(byte)
        m.update(byte, matched_order)
        m.advance(byte)
    return bytes(out)
