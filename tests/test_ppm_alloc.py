"""UnitArena suballocator: the var.I memory-map machinery
(free lists, splitting, coalescing, two-ended bump, text-area shrink).

Reference behavior: /root/reference/research/ppmd-cleaned-cpp/
ppmd_alloc.cpp:76-275."""

import pytest

from nlzm_tpu.research.ppm_alloc import N_INDEXES, UnitArena, units_for


def test_units_for():
    assert [units_for(k) for k in (1, 2, 3, 4, 255, 256)] == [1, 1, 2, 2, 128, 128]


def test_two_ended_bump():
    a = UnitArena(100, 10)
    s1 = a.alloc_units(3)
    s2 = a.alloc_units(2)
    c1 = a.alloc_context()
    c2 = a.alloc_context()
    assert (s1, s2) == (10, 13)  # stat vectors bump up from the floor
    assert (c1, c2) == (99, 98)  # contexts bump down from the top
    assert a.used_units() == 7


def test_free_list_reuse_lifo():
    a = UnitArena(100, 0)
    a.alloc_units(1)  # keep later blocks off the pool floor
    b1 = a.alloc_units(4)
    b2 = a.alloc_units(4)
    a.free_units(b1, 4)
    a.free_units(b2, 4)
    # coalescing is forward-only at free time (FreeUnits walks up), so
    # freeing b1 before b2 leaves two separate 4-blocks; reuse is LIFO
    assert a.alloc_units(4) == b2
    assert a.alloc_units(4) == b1


def test_free_at_pool_floor_quirk():
    """A block allocated at the pool floor frees into the text area,
    not onto a list (the reference's `ptr > units_start` else-arm)."""
    a = UnitArena(100, 0)
    b = a.alloc_units(4)  # sits exactly on the floor
    a.free_units(b, 4)
    assert a.units_start == 4 and a.avail == 0


def test_forward_coalescing_merges_adjacent():
    a = UnitArena(100, 0)
    a.alloc_units(1)  # keep the merged run off the pool floor
    b1 = a.alloc_units(4)
    b2 = a.alloc_units(4)
    b3 = a.alloc_units(4)
    a.free_units(b2, 4)
    a.free_units(b3, 4)
    # freeing b1 walks forward over b2+b3 -> one 12-unit block
    a.free_units(b1, 4)
    assert a.stamp.get(b1) == 12
    assert a.avail == 12
    got = a.alloc_units(12)
    assert got == b1 and a.avail == 0


def test_split_block_returns_tail():
    a = UnitArena(12, 0)
    a.alloc_units(1)  # keep the block off the pool floor
    b = a.alloc_units(10)
    a.alloc_units(1)  # bump gap now empty
    a.free_units(b, 10)
    # no 3-list and no bump room: the rare path splits the 10-block
    small = a.alloc_units(3)
    assert small == b
    assert a.avail == 7  # tail of 7 units back on a list
    tail = a.alloc_units(7)
    assert tail == b + 3


def test_pool_exhaustion_shrinks_into_text_reserve():
    a = UnitArena(20, 8)  # pool = units 8..20
    blocks = [a.alloc_context() for _ in range(12)]
    assert None not in blocks  # pool exactly consumed
    # bump gap empty, no free lists: next alloc eats the text reserve
    got = a.alloc_units(4)
    assert got == 4 and a.units_start == 4
    # text cursor blocks further shrink
    assert a.text_advance(4)
    assert a.alloc_units(2) is None


def test_free_at_floor_returns_to_text_area():
    a = UnitArena(20, 8)
    for _ in range(12):
        a.alloc_context()
    got = a.alloc_units(4)  # floor shrinks to 4
    assert a.units_start == 4
    a.free_units(got, 4)  # block sits on the floor: text area grows back
    assert a.units_start == 8
    assert a.avail == 0


def test_expand_and_shrink_units_copy():
    a = UnitArena(100, 0)
    store = list(range(200))
    b = a.alloc_units(2)

    moved = {}

    def copy(new):
        moved["to"] = new

    nb = a.expand_units(b, 2, copy)
    assert nb is not None and moved["to"] == nb
    # shrink back: in-place split arm (no 2-list yet after expand freed b)
    sb = a.shrink_units(nb, 3, 2, copy)
    assert sb == nb or sb == moved["to"]
    assert a.used_units() <= 3


def test_oversize_runs_chunked_to_top_list():
    a = UnitArena(600, 0)
    a.alloc_units(1)  # keep the merged run off the pool floor
    b = a.alloc_units(100)
    b2 = a.alloc_units(100)
    b3 = a.alloc_units(100)
    a.free_units(b2, 100)
    a.free_units(b3, 100)
    a.free_units(b, 100)  # coalesces to 300 -> 128+128+44 chunks
    sizes = sorted(a.stamp.values())
    assert sizes == [44, 128, 128]
    assert a.avail == 300
    assert len(a.lists[N_INDEXES - 1]) == 2


def test_used_units_accounting():
    a = UnitArena(100, 10)
    xs = [a.alloc_units(5) for _ in range(4)]
    cs = [a.alloc_context() for _ in range(3)]
    assert a.used_units() == 23
    a.free_units(xs[1], 5)
    assert a.used_units() == 18
    a.free_context(cs[0])
    assert a.used_units() == 17


def test_trie_arena_stays_bounded(corpus_text):
    """End-to-end: the model's storage never exceeds the arena, and the
    churn exercises free lists (rescale sheds -> blocks recycle)."""
    from nlzm_tpu.research import ppm_trie

    m = ppm_trie._TrieModel()
    data = corpus_text(40000)
    for i, byte in enumerate(data):
        m.update(byte, 0)
        m.advance(byte)
    a = m.arena
    assert a.used_units() <= a.total
    assert a.lo <= a.hi
    # the arena actually recycled blocks at this scale
    assert a.avail > 0 or any(a.lists[i] for i in range(N_INDEXES)) or m.pruned


def test_free_list_accounting_invariant(corpus_text):
    """verify_free_lists (the reference's commented-out GetUsedMemory
    verifier, ppmd_alloc.cpp:108-117) holds through real model churn."""
    from nlzm_tpu.research import ppm_trie

    m = ppm_trie._TrieModel()
    data = corpus_text(20000)
    for i, byte in enumerate(data):
        m.update(byte, 0)
        m.advance(byte)
        if i % 4096 == 0:
            m.arena.verify_free_lists()
    m.arena.verify_free_lists()
