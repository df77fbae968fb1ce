"""PPM research codec v2: suffix-linked context trie (var.I-class).

Fills the structural gaps the hashed-table PPM (research/ppm.py) left
open vs the reference's PPMd var.I
(/root/reference/research/ppmd-cleaned-cpp/):

- **Suffix-linked context trie with lazy successor creation.** Contexts
  are exact (no hash collisions) records with a `suffix` link to the
  next-shorter context (ppmd.h:271-293). Each (context, symbol) State
  carries a successor slot; deeper contexts materialize lazily the
  first time the model walks through them, inheriting their first
  symbol from the path that created them - the same role as
  CreateSuccessors (ppmd_model.cpp:210-298) without its raw-text
  pointer encoding (we key pending successors by (ctx, sym) instead).
- **UNIT suballocator storage** (ppmd_alloc.cpp:76-275). Every Context
  record and stat vector lives in a fixed-capacity `UnitArena`
  (research/ppm_alloc.py): two-ended bump allocation, 128 size-class
  free lists, block splitting and forward coalescing, and a raw-text
  cursor (one byte per coded symbol, as in var.I) that the pool floor
  can shrink into. Vector growth/shedding runs through
  expand/shrink_units, so rescale churn genuinely recycles blocks.
- **CutOff pruning instead of full restart** (ppmd_model.cpp:520-598).
  At the node budget - or when the arena runs out of contiguous
  headroom - the model prunes: contexts whose total frequency is below
  a threshold are dropped recursively (children first), surviving
  stats halve, survivors are copy-collected into a fresh arena, and
  suffix links that pointed into pruned contexts relink to the nearest
  surviving suffix ancestor (the reference's CutOff fixes up suffixes
  the same way). The triggers and rules are deterministic, so encoder
  and decoder prune identically at the same symbol -
  bitstream-compatible graceful degradation rather than a restart. A
  full reset remains as the last-resort tier (mirroring RestoreModel's
  "free everything" arm, ppmd_model.cpp:136-154).

The coder, SEE estimator bank, exclusion handling and driver structure
are shared with research/ppm.py (same carry-less range coder family as
ppmd_rc.cpp:1-92). Research-grade host code, like the reference's
research tree.
"""

from .ppm import _SEE, BOT, MAX_FREQ, RangeDecoder, RangeEncoder
from .ppm_alloc import UNIT_STATES, UnitArena, units_for

MAX_ORDER = 6
NODE_BUDGET = 1 << 20  # states across the trie before CutOff
# (matches the hashed PPM's MAX_NODES and roughly var.I's default
# 4 MB arena in states; 2^18 measured 0.443 vs 0.387 at 512 KiB -
# the budget, not the modeling, was the gap vs research/ppm.py)
CUTOFF_FREQ = 3  # contexts with total freq below this are pruned
INIT_FREQ = 2  # cold start for fresh symbols (swept: 2 beats 1/3/4)
DERIVED_CF = False  # A/B toggle (round-5 PPM experiments)
BUMP = 4

ARENA_UNITS = 3 * (NODE_BUDGET >> 1)  # ~1.5 units per budgeted state
TEXT_RESERVE = ARENA_UNITS >> 3  # 1/8 reserved for the raw-text analog
STATE_BYTES = 6  # reference State size: text advances a unit per 12 B
# worst single-symbol demand: MAX_ORDER+2 chain contexts each possibly
# relocating a <=128-unit stat vector, plus <=MAX_ORDER new contexts
HEADROOM = (MAX_ORDER + 2) * 129 + MAX_ORDER

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

    def prob(self, order, freq, sfx_n=0, prev_hit=False):
        """var.I's GetBinSEE mixes the suffix width and the previous
        byte's binary success into the index (ppmd_model.cpp:613-616);
        both carry signal here too (run-of-hits contexts are much more
        deterministic than first encounters)."""
        key = (
            (min(order, MAX_ORDER) << 8)
            | (min(freq.bit_length(), 15) << 4)
            | (min(sfx_n, 3) << 1)
            | (1 if prev_hit else 0)
        )
        return self.acc.get(key, BIN_INIT), key

    def update(self, key, hit):
        p = self.acc.get(key, BIN_INIT)
        target = BIN_SCALE - 1 if hit else 0
        # clamp: the arithmetic shift walks p all the way to 0 on a miss
        # streak, which would hand the range coder a zero-width interval
        # (normalize never terminates)
        self.acc[key] = min(max(p + ((target - p) >> BIN_SHIFT), 1), BIN_SCALE - 1)


class _TrieModel:
    """Mirror-deterministic suffix-trie model (shared by both drivers).

    Storage layout (all indices into one UnitArena):
      context record = 1 unit `c`: sfx[c], order[c], nst[c], sptr[c]
      stat vector = units_for(nst) units at sptr[c]; state slot i lives
      at flat index sptr*UNIT_STATES + i in sym/freq/succ, kept sorted
      by symbol (the coder iterates symbols in sorted order).
    """

    def __init__(self):
        self.see = _SEE()
        self.bin_see = _BinSEE()
        self.pruned = 0
        self.prev_bin = False  # previous byte coded by a first-try binary hit
        self._fresh_arena()

    def _fresh_arena(self):
        self.arena = UnitArena(ARENA_UNITS, TEXT_RESERVE)
        ns = ARENA_UNITS * UNIT_STATES
        self.sym = [0] * ns
        self.freq = [0] * ns
        self.succ = [-1] * ns
        self.sfx = [-1] * ARENA_UNITS
        self.order = [0] * ARENA_UNITS
        self.nst = [0] * ARENA_UNITS
        self.sptr = [-1] * ARENA_UNITS
        self.text_bytes = 0
        self.root = self._new_ctx(-1, 0)
        self.cur = self.root
        self.nodes = 0

    def restart(self):
        """Free everything (RestoreModel's last-resort arm)."""
        self.see = _SEE()
        self.bin_see = _BinSEE()
        self._fresh_arena()

    # -- arena-backed context/state primitives -----------------------
    def _new_ctx(self, suffix, order):
        c = self.arena.alloc_context()
        # the per-symbol headroom check guarantees this never fails
        assert c is not None
        self.sfx[c] = suffix
        self.order[c] = order
        self.nst[c] = 0
        self.sptr[c] = -1
        return c

    def _find(self, c, s):
        """Flat state index of symbol s in context c, or -1."""
        base = self.sptr[c] * UNIT_STATES
        sym = self.sym
        for i in range(base, base + self.nst[c]):
            if sym[i] == s:
                return i
            if sym[i] > s:
                return -1
        return -1

    def _insert(self, c, s, f):
        """Sorted insert of a fresh state (expand_units on overflow)."""
        k = self.nst[c]
        if k == 0:
            head = self.arena.alloc_units(1)
            assert head is not None
            self.sptr[c] = head
        elif units_for(k + 1) > units_for(k):
            old = self.sptr[c]
            ob = old * UNIT_STATES

            def copy_fn(new, ob=ob, k=k):
                nb = new * UNIT_STATES
                self.sym[nb : nb + k] = self.sym[ob : ob + k]
                self.freq[nb : nb + k] = self.freq[ob : ob + k]
                self.succ[nb : nb + k] = self.succ[ob : ob + k]

            head = self.arena.expand_units(old, units_for(k), copy_fn)
            assert head is not None
            self.sptr[c] = head
        base = self.sptr[c] * UNIT_STATES
        i = base
        while i < base + k and self.sym[i] < s:
            i += 1
        # shift the tail up one slot
        self.sym[i + 1 : base + k + 1] = self.sym[i : base + k]
        self.freq[i + 1 : base + k + 1] = self.freq[i : base + k]
        self.succ[i + 1 : base + k + 1] = self.succ[i : base + k]
        self.sym[i], self.freq[i], self.succ[i] = s, f, -1
        self.nst[c] = k + 1

    def _shed_zero(self, c):
        """Drop zero-freq states after halving; shrink/free the block."""
        base = self.sptr[c] * UNIT_STATES
        k = self.nst[c]
        w = base
        for i in range(base, base + k):
            if self.freq[i] > 0:
                if w != i:
                    self.sym[w] = self.sym[i]
                    self.freq[w] = self.freq[i]
                    self.succ[w] = self.succ[i]
                w += 1
        kept = w - base
        dropped = k - kept
        if dropped:
            if kept == 0:
                self.arena.free_units(self.sptr[c], units_for(k))
                self.sptr[c] = -1
            else:
                old_u, new_u = units_for(k), units_for(kept)
                if new_u != old_u:
                    old = self.sptr[c]
                    ob = old * UNIT_STATES

                    def copy_fn(new, ob=ob, kept=kept):
                        nb = new * UNIT_STATES
                        self.sym[nb : nb + kept] = self.sym[ob : ob + kept]
                        self.freq[nb : nb + kept] = self.freq[ob : ob + kept]
                        self.succ[nb : nb + kept] = self.succ[ob : ob + kept]

                    self.sptr[c] = self.arena.shrink_units(
                        old, old_u, new_u, copy_fn
                    )
            self.nst[c] = kept
        return dropped

    def _total(self, c):
        base = self.sptr[c] * UNIT_STATES
        return sum(self.freq[base : base + self.nst[c]])

    # -- structure maintenance -------------------------------------
    def _successor(self, c, s):
        """Child context of `c` through `s`, materialized lazily.

        The child's suffix links to the successor of sfx[c] through the
        same symbol (recursively), which is how the suffix chain stays
        consistent - the CreateSuccessors walk, evaluated eagerly one
        level at a time.
        """
        if self.order[c] >= MAX_ORDER:
            c = self.sfx[c]
        i = self._find(c, s)
        if i < 0:
            # symbol unseen here (can happen after pruning): root hop
            return self.root
        if self.succ[i] < 0:
            if c == self.root:
                sfx = self.root
            else:
                sfx = self._successor(self.sfx[c], s)
            # _successor may relocate nothing (no allocs besides the new
            # context), but re-find the slot defensively is not needed:
            # _new_ctx never moves stat vectors
            self.succ[i] = self._new_ctx(sfx, self.order[c] + 1)
        return self.succ[i]

    def advance(self, sym):
        """Move the active context through `sym` (after update())."""
        self.cur = self._successor(self.cur, sym)

    def update(self, sym, matched_order):
        """Bump/insert `sym` in the active chain (update exclusion: only
        contexts at order >= matched_order bump; shallower ones that
        escaped get a fresh count)."""
        # var.I appends every coded byte to the raw-text area; headroom
        # check up front so no allocation below can fail mid-walk
        self.text_bytes += 1
        if self.text_bytes % (STATE_BYTES * UNIT_STATES) == 0:
            if not self.arena.text_advance(1):
                self.cutoff()
        a = self.arena
        if (a.hi - a.lo) + (a.units_start - a.text_used) < HEADROOM:
            self.cutoff()
        # matched context first: bump the found state (+4, var.I's
        # coder-side bump, ppmd_file.cpp:60) and capture (found_freq,
        # s0) for the derived insert frequency below
        mc = self.cur
        while mc >= 0 and self.order[mc] > matched_order:
            mc = self.sfx[mc]
        found_freq, s0 = INIT_FREQ, 0
        if mc >= 0:
            i = self._find(mc, sym)
            if i < 0:
                self._insert(mc, sym, INIT_FREQ)
                self.nodes += 1
            else:
                self.freq[i] += BUMP
                found_freq = int(self.freq[i])
                if self._total(mc) > MAX_FREQ:
                    self._rescale(mc)
            s0 = max(self._total(mc) - found_freq, 0)

        # contexts deeper than the match (the ones that escaped) get the
        # symbol inserted at var.I's DERIVED frequency (ppmd_model.cpp:
        # 402-414): proportional to how dominant the symbol is in the
        # matched context - a strong symbol starts strong upstream
        c = self.cur
        while c >= 0 and self.order[c] > matched_order:
            if self._find(c, sym) < 0:
                if DERIVED_CF:
                    tot = self._total(c)
                    cf = 2 * found_freq * (tot + 4)
                    sf = s0 + tot
                    if cf <= 6 * sf:
                        f = 1 + (cf > sf) + (cf > 3 * sf)
                    else:
                        f = 4 + (cf > 8 * sf) + (cf > 10 * sf) + (cf > 13 * sf)
                else:
                    f = INIT_FREQ
                self._insert(c, sym, f)
                self.nodes += 1
            c = self.sfx[c]

        # shallower contexts: cold-start insert where missing (whole-
        # chain reinforcement measured better than var.I's
        # touch-nothing-below-the-suffix here: 0.3609 vs 0.3673)
        c = self.sfx[mc] if mc >= 0 else -1
        while c >= 0:
            if self._find(c, sym) < 0:
                self._insert(c, sym, INIT_FREQ)
                self.nodes += 1
            c = self.sfx[c]
        if self.nodes > NODE_BUDGET:
            self.cutoff()

    def _rescale(self, c):
        base = self.sptr[c] * UNIT_STATES
        for i in range(base, base + self.nst[c]):
            self.freq[i] >>= 1
        self.nodes -= self._shed_zero(c)

    # -- graceful degradation --------------------------------------
    def cutoff(self):
        """Prune and copy-collect into a fresh arena (CutOff analog).

        Walk depth-first from the root; a non-root context survives only
        if its total frequency >= CUTOFF_FREQ. Dropped contexts take
        their subtrees with them; surviving stats halve, shedding cold
        symbols. Survivors are re-allocated compactly in a new arena
        (the reference compacts in place with MoveUnitsUp - same
        contract), and suffix links that pointed into pruned contexts
        relink to the nearest surviving suffix ancestor. Deterministic:
        both coders hit the same trigger at the same symbol and prune
        identically.
        """
        self.pruned += 1
        o_sym, o_freq, o_succ = self.sym, self.freq, self.succ
        o_sfx, o_nst, o_sptr = self.sfx, self.nst, self.sptr
        o_order, o_root = self.order, self.root

        def tot_of(c):
            b = o_sptr[c] * UNIT_STATES
            return sum(o_freq[b : b + o_nst[c]])

        # pass 1: tree walk, decide survivors (children judged on
        # pre-halve totals), halved freqs; record per-context kept states
        keep = {}  # old ctx -> list of (sym, halved_freq, old_child|-1)
        kept_states = 0

        def walk(c):
            nonlocal kept_states
            out = []
            b = o_sptr[c] * UNIT_STATES
            for i in range(b, b + o_nst[c]):
                child = o_succ[i]
                if child >= 0:
                    if tot_of(child) < CUTOFF_FREQ:
                        child = -1  # drop subtree
                    else:
                        walk(child)
                f = o_freq[i] >> 1
                if f:
                    out.append((o_sym[i], f, child))
                    kept_states += 1
                elif child >= 0:
                    child = -1  # state dies, its subtree goes with it
            keep[c] = out

        walk(o_root)
        if kept_states > (NODE_BUDGET * 3) // 4:
            # pruning failed to make room: last-resort full restart
            # (RestoreModel's free-everything arm)
            self.restart()
            return

        # pass 2a: rebuild surviving contexts + stats in a fresh arena
        self._fresh_arena()
        remap = {o_root: self.root}
        order_walk = [o_root]
        while order_walk:
            oc = order_walk.pop()
            nc = remap[oc]
            for s, f, child in keep[oc]:
                self._insert(nc, s, f)
                if child >= 0:
                    nchild = self._new_ctx(-1, o_order[child])
                    i = self._find(nc, s)
                    self.succ[i] = nchild
                    remap[child] = nchild
                    order_walk.append(child)
        # pass 2b: suffix links, once the full survivor set is known -
        # a suffix that points into a pruned context relinks to the
        # nearest surviving ancestor on the old suffix chain (the
        # reference's CutOff repairs suffixes the same way)
        for oc, nc in remap.items():
            if oc == o_root:
                continue
            s = o_sfx[oc]
            while s >= 0 and s not in remap:
                s = o_sfx[s]
            self.sfx[nc] = remap[s] if s >= 0 else self.root
        self.nodes = kept_states
        self.cur = self.root  # active path may be gone; restart the walk


def _spans(m, c, excluded):
    base = m.sptr[c] * UNIT_STATES
    items = [
        (m.sym[i], m.freq[i])
        for i in range(base, base + m.nst[c])
        if m.sym[i] not in excluded
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
        first_bin_hit = False
        # walk the suffix chain, escape until the symbol is found
        while ctx >= 0:
            sp = _spans(m, ctx, excluded)
            if sp is None:
                ctx = m.sfx[ctx]
                continue
            items, tot_inc = sp
            if len(items) == 1 and ctx != m.root:
                # deterministic context: dedicated binary estimator
                s0, f0 = items[0]
                p, bkey = m.bin_see.prob(
                    m.order[ctx], f0,
                    m.nst[m.sfx[ctx]] if m.sfx[ctx] >= 0 else 0, m.prev_bin)
                if s0 == byte:
                    enc.encode(0, p, BIN_SCALE)
                    m.bin_see.update(bkey, True)
                    matched_order = m.order[ctx]
                    first_bin_hit = not excluded
                    break
                enc.encode(p, BIN_SCALE - p, BIN_SCALE)
                m.bin_see.update(bkey, False)
                excluded.add(s0)
                ctx = m.sfx[ctx]
                continue
            esc, key = m.see.escape_weight(
                min(m.order[ctx], MAX_ORDER), len(items), tot_inc,
                m.nst[m.sfx[ctx]] if m.sfx[ctx] >= 0 else 256,
                len(excluded), m.prev_bin,
            )
            if ctx == m.root:
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
                matched_order = m.order[ctx]
                break
            # escape
            if esc == 0:
                raise AssertionError("root must cover all symbols")
            enc.encode(tot_inc, esc, tot_inc + esc)
            m.see.update(key, True)
            excluded.update(s for s, _ in items)
            ctx = m.sfx[ctx]
        else:
            # escaped everything incl. root: code raw under uniform over
            # the not-yet-excluded alphabet
            rest = [s for s in range(256) if s not in excluded]
            enc.encode(rest.index(byte), 1, len(rest))
            matched_order = 0
        m.prev_bin = first_bin_hit
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
        first_bin_hit = False
        while ctx >= 0:
            sp = _spans(m, ctx, excluded)
            if sp is None:
                ctx = m.sfx[ctx]
                continue
            items, tot_inc = sp
            if len(items) == 1 and ctx != m.root:
                s0, f0 = items[0]
                p, bkey = m.bin_see.prob(
                    m.order[ctx], f0,
                    m.nst[m.sfx[ctx]] if m.sfx[ctx] >= 0 else 0, m.prev_bin)
                f = dec.get_freq(BIN_SCALE)
                if f < p:
                    dec.decode(0, p)
                    m.bin_see.update(bkey, True)
                    byte = s0
                    matched_order = m.order[ctx]
                    first_bin_hit = not excluded
                    break
                dec.decode(p, BIN_SCALE - p)
                m.bin_see.update(bkey, False)
                excluded.add(s0)
                ctx = m.sfx[ctx]
                continue
            esc, key = m.see.escape_weight(
                min(m.order[ctx], MAX_ORDER), len(items), tot_inc,
                m.nst[m.sfx[ctx]] if m.sfx[ctx] >= 0 else 256,
                len(excluded), m.prev_bin,
            )
            if ctx == m.root:
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
                matched_order = m.order[ctx]
                break
            dec.decode(tot_inc, esc)
            m.see.update(key, True)
            excluded.update(s for s, _ in items)
            ctx = m.sfx[ctx]
        if byte is None:
            rest = [s for s in range(256) if s not in excluded]
            idx = dec.get_freq(len(rest))
            dec.decode(idx, 1)
            byte = rest[idx]
            matched_order = 0
        out.append(byte)
        m.prev_bin = first_bin_hit
        m.update(byte, matched_order)
        m.advance(byte)
    return bytes(out)
