"""PPMd var.I suballocator: UNIT arena with size-class free lists.

Index-based mirror of the reference's memory map
(/root/reference/research/ppmd-cleaned-cpp/ppmd_alloc.cpp:76-275,
ppmd.h:155-176). The reference carves one flat heap into a raw-text
area growing up from the bottom, a unit pool in the middle, and
context records bumping down from the top:

    [ text area | -> units_start ... lo -> pool <- hi ... | contexts ]

- **UNIT blocks.** All allocations are runs of UNITs (UNIT_SIZE=12 B in
  the reference = 2 six-byte States; a Context record is 1 unit). Here a
  unit is an index into parallel state arrays, so the same geometry is
  expressed as integer intervals instead of raw pointers.
- **128 size-class free lists** (N_INDEXES, ppmd.h:159): freed blocks of
  n units push onto list n-1, LIFO, exactly the reference's intrusive
  BlockNode linking (ppmd_alloc.cpp:35-76).
- **Block splitting** (SplitBlock, :131-137): allocating from a larger
  class returns the tail to the free list of the size difference.
- **Forward coalescing** (FreeUnits, :195-221): freeing walks forward
  while the adjacent block carries a free stamp, merging runs; merged
  runs larger than 128 units re-enter the top list in 128-unit chunks.
- **Two-ended bump allocation** (AllocUnits/AllocContext, :163-193):
  stat vectors grow from `lo` upward, context records from `hi`
  downward; the pool is exhausted when they meet.
- **Text-area shrink** (AllocUnitsRare, :139-161): when every list and
  the bump gap are empty, the pool floor `units_start` steps down into
  the unused text reserve; freeing a block that sits on the floor
  returns it to the text area instead of a list (FreeUnits else-arm).

The trie (ppm_trie.py) stores every State and Context in this arena, so
rescale/insert churn genuinely exercises split/coalesce/expand/shrink,
and exhaustion (None returns) drives the model's CutOff/restart tiers -
the contract var.I's RestoreModel builds on (ppmd_model.cpp:136-154).
"""

UNIT_STATES = 2  # states per unit (reference: UNIT_SIZE 12 B / State 6 B)
N_INDEXES = 128  # free-list size classes: 1..128 units


def units_for(n_states: int) -> int:
    """Units needed for an n-state vector (UnitsToBytes analog)."""
    return (n_states + UNIT_STATES - 1) // UNIT_STATES


class UnitArena:
    """Fixed-capacity unit arena; all methods return unit indices.

    `total` units overall; `text_reserve` units are initially fenced off
    below the pool floor for the raw-text analog (grown with
    text_advance; consumed by the rare-path shrink)."""

    def __init__(self, total_units: int, text_reserve_units: int = 0):
        if total_units <= text_reserve_units:
            raise ValueError("arena smaller than its text reserve")
        self.total = total_units
        self.text_used = 0  # text cursor, in units, from index 0 up
        self.units_start = text_reserve_units  # pool floor
        self.lo = text_reserve_units  # next bump-up unit (stat vectors)
        self.hi = total_units  # bump-down boundary (context records)
        self.avail = 0  # units sitting on free lists
        self.lists = [[] for _ in range(N_INDEXES)]  # LIFO stacks of heads
        self.stamp = {}  # head unit -> size, for every free block

    # -- free-list primitives (BlockNode Link/Unlink/Insert/Remove) --
    def _insert(self, head: int, n: int) -> None:
        self.lists[n - 1].append(head)
        self.stamp[head] = n

    def _pop(self, index: int) -> int:
        head = self.lists[index].pop()
        del self.stamp[head]
        return head

    def _unlink(self, head: int) -> None:
        n = self.stamp.pop(head)
        self.lists[n - 1].remove(head)

    def _split(self, head: int, old_index: int, new_index: int) -> None:
        """Return the tail of a larger block to its size class."""
        diff = old_index - new_index
        self.avail += diff
        self._insert(head + new_index + 1, diff)

    # -- allocation (AllocUnits / AllocContext / AllocUnitsRare) -----
    def alloc_units(self, n: int):
        """A block of n (1..128) units for a stat vector, or None."""
        index = n - 1
        if self.lists[index]:
            self.avail -= n
            return self._pop(index)
        if self.lo + n <= self.hi:
            head = self.lo
            self.lo += n
            return head
        return self._alloc_rare(index)

    def alloc_context(self):
        """One unit for a context record, from the top end, or None."""
        if self.lo < self.hi:
            self.hi -= 1
            return self.hi
        if self.lists[0]:
            self.avail -= 1
            return self._pop(0)
        return self._alloc_rare(0)

    def _alloc_rare(self, index: int):
        i = index
        while True:
            i += 1
            if i >= N_INDEXES:
                break
            if self.lists[i]:
                head = self._pop(i)
                self.avail -= i + 1
                self._split(head, i, index)
                return head
        # shrink the pool floor into the unused text reserve
        n = index + 1
        if self.text_used + n <= self.units_start:
            self.units_start -= n
            return self.units_start
        return None

    # -- freeing (FreeUnits, with forward coalescing) ----------------
    def free_units(self, head: int, n: int) -> None:
        sz = n
        while True:
            nxt = self.stamp.get(head + sz)
            if nxt is None:
                break
            self._unlink(head + sz)
            self.avail -= nxt
            sz += nxt
        if head > self.units_start:
            self.avail += sz
            while sz > N_INDEXES:
                self._insert(head, N_INDEXES)
                head += N_INDEXES
                sz -= N_INDEXES
            self._insert(head, sz)
        else:
            # block sits on the pool floor: hand it back to the text area
            self.units_start += sz

    def free_context(self, unit: int) -> None:
        self.free_units(unit, 1)

    # -- resizing stat vectors (Expand/ShrinkUnits) -------------------
    def expand_units(self, head: int, old_n: int, copy_fn):
        """Grow a block by one unit; copy_fn(new_head) moves the states.
        Returns the new head, or None when the arena is exhausted."""
        new = self.alloc_units(old_n + 1)
        if new is None:
            return None
        copy_fn(new)
        self.free_units(head, old_n)
        return new

    def shrink_units(self, head: int, old_n: int, new_n: int, copy_fn):
        """Shrink a block in place or by relocation (ShrinkUnits)."""
        i0, i1 = old_n - 1, new_n - 1
        if i0 == i1:
            return head
        if self.lists[i1]:
            self.avail -= new_n
            new = self._pop(i1)
            copy_fn(new)
            self.free_units(head, old_n)
            return new
        self._split(head, i0, i1)
        return head

    # -- text area ----------------------------------------------------
    def text_advance(self, n_units: int = 1) -> bool:
        """Advance the raw-text cursor; False when it hits the pool
        floor (the model must restore/restart)."""
        if self.text_used + n_units > self.units_start:
            return False
        self.text_used += n_units
        return True

    def used_units(self) -> int:
        """GetUsedMemory analog, in units."""
        return (
            self.total - (self.hi - self.lo)
            - (self.units_start - self.text_used) - self.avail
        )

    def verify_free_lists(self) -> None:
        """Free-list accounting invariant (the reference keeps this as a
        commented-out verifier inside GetUsedMemory,
        ppmd_alloc.cpp:108-117): every stamped block is on exactly one
        list of its size class, and their sizes sum to `avail`."""
        walked = 0
        for i, lst in enumerate(self.lists):
            for head in lst:
                assert self.stamp.get(head) == i + 1, (head, i + 1)
                walked += i + 1
        assert walked == self.avail, (walked, self.avail)
        assert len(self.stamp) == sum(len(l) for l in self.lists)
