"""Forward-graph mostly-optimal parser.

Shortest-path relaxation over the next <=4096 input positions. The frontier
only extends as far as found matches reach, so the parse naturally cuts at
a position no match crosses. Repeat-distance state is carried per graph node
in a 512-slot ring - exact, because no edge spans more than MATCH_MAX=264
positions. Costs come from the current (frozen) model state; the model only
adapts during emission.

Choice parity: NLZM.cpp:1458-1651 (relaxation order, matcher gating by nice
length 64 with skip mask 7, candidate length sampling by tstep, explicit
rep probes). Output archives are byte-identical to the reference's.
"""

from ..constants import (
    MATCH_MAX,
    MATCH_MIN,
    MATCH_NICE_LENGTH,
    MATCH_SKIP_UPDATES_MASK,
    PARSE_STATE_RING,
    PARSE_TABLE_SIZE,
    CMD_DICT,
    CMD_LITERAL,
    CMD_REP,
    get_match_min,
)
from .matchers import MatchTable, hash2, hash3, hash4

_INF = 0xFFFFFFFF
_RING_MASK = PARSE_STATE_RING - 1


def _rep_add(rep: tuple, delta: int) -> tuple:
    if delta in rep:
        return rep
    return (delta, rep[0], rep[1], rep[2])


def parse_chunk(model, d, ht2, ht3, bt4, rk, mt_carry: MatchTable, max_parse_len: int):
    """Parse up to max_parse_len bytes from the current lookahead.

    Returns (ops, parsed_len) where ops is a list of
    (cmd, length, delta_or_rep_idx) in forward order covering parsed_len
    bytes. mt_carry is updated in place (persists across calls).
    """
    max_parse_len = min(max_parse_len, PARSE_TABLE_SIZE)
    look = d.lookahead
    hist_pos = d.hist_pos

    size = max_parse_len + 1
    cost = [_INF] * size
    cmd = [0] * size
    link = [0] * size
    length = [0] * size
    delta = [0] * size

    cost[0] = 0
    link[0] = _INF
    cost[1] = _INF
    cmd[1] = CMD_LITERAL
    length[1] = 0
    link[1] = 0

    carried = [None] * PARSE_STATE_RING
    carried[0] = tuple(model.rep.table)
    carried[1] = carried[0]

    mt = MatchTable()
    cost_literal = model.cost_literal
    cost_match = model.cost_match
    cost_rep = model.cost_rep

    p = 0
    end_p = 1
    while p < end_p:
        np = p + 1
        base_cost = cost[p]
        state_p = carried[p & _RING_MASK]

        # literal edge
        c = base_cost + cost_literal(look[p])
        if cost[np] > c:
            cost[np] = c
            cmd[np] = CMD_LITERAL
            link[np] = p
            length[np] = 0
            carried[np & _RING_MASK] = state_p

        # carry the previous position's candidates forward one byte and
        # cheaply extend the longest one
        mt.max_len = 0
        mt.carry_from(mt_carry, 1)
        if mt.max_len > 0 and hist_pos + p >= mt.delta[mt.max_len]:
            dlt = mt.delta[mt.max_len]
            sp = hist_pos + p - dlt
            dl = mt.delta
            while (
                mt.max_len < MATCH_MAX
                and d.lookahead_len > mt.max_len + p
                and d.char_at(sp + mt.max_len) == look[p + mt.max_len]
            ):
                mt.max_len += 1
                dl[mt.max_len] = dlt

        # run the matcher suite (full while below nice length, sampled after)
        vp = hist_pos + p
        if mt.max_len < MATCH_NICE_LENGTH:
            if d.lookahead_len >= 4 + p:
                ht2.find_update(mt, hash2(look, p), vp, d)
                ht3.find_update(mt, hash3(look, p), vp, d)
                bt4.find_update(mt, hash4(look, p), vp, d)
            if d.lookahead_len >= 256 + p:
                rk.find_update(mt, vp, d)
        elif not (p & MATCH_SKIP_UPDATES_MASK):
            if d.lookahead_len >= 4 + p:
                ht2.find_update(mt, hash2(look, p), vp, d)
                ht3.find_update(mt, hash3(look, p), vp, d)
            if d.lookahead_len >= 256 + p:
                rk.find_update(mt, vp, d)

        mt.copy_into(mt_carry)

        max_len = min(mt.max_len, max_parse_len - p)
        if max_len < MATCH_MIN:
            max_len = 0

        while end_p < max_len + p:
            end_p += 1
            cost[end_p] = _INF
            link[end_p] = _INF

        checked_rep = 0

        if max_len:
            tstep = (max_len - MATCH_MIN) >> 4
            if tstep == 0:
                tstep = 1
            mtd = mt.delta
            tlen = max_len
            while tlen >= MATCH_MIN:
                dlt = mtd[tlen]
                if tlen >= get_match_min(dlt):
                    tp = tlen + p
                    c = base_cost + cost_match(dlt, tlen)
                    if cost[tp] > c:
                        cost[tp] = c
                        cmd[tp] = CMD_DICT
                        link[tp] = p
                        length[tp] = tlen
                        delta[tp] = dlt
                        carried[tp & _RING_MASK] = _rep_add(state_p, dlt)

                    try:
                        rep_idx = state_p.index(dlt)
                    except ValueError:
                        rep_idx = -1
                    if rep_idx >= 0:
                        checked_rep |= 1 << rep_idx
                        c = base_cost + cost_rep(rep_idx, dlt, tlen)
                        if cost[tp] > c:
                            cost[tp] = c
                            cmd[tp] = CMD_REP
                            link[tp] = p
                            length[tp] = tlen
                            delta[tp] = rep_idx
                            carried[tp & _RING_MASK] = _rep_add(state_p, dlt)
                step = tstep if tstep < tlen else tlen
                tlen -= step

        # explicit probes of rep distances the sampled loop didn't cover
        if checked_rep != 15:
            for rep_idx in range(4):
                rdelta = state_p[rep_idx]
                if (checked_rep >> rep_idx) & 1 or rdelta >= vp:
                    continue
                mlen, _ = d.match_length_signed(vp - rdelta, vp, max_parse_len - p, 0)
                mlen = min(mlen, MATCH_MAX)
                if mlen >= get_match_min(rdelta):
                    while end_p < mlen + p:
                        end_p += 1
                        cost[end_p] = _INF
                        link[end_p] = _INF
                    tp = mlen + p
                    c = base_cost + cost_rep(rep_idx, rdelta, mlen)
                    if cost[tp] > c:
                        cost[tp] = c
                        cmd[tp] = CMD_REP
                        link[tp] = p
                        length[tp] = mlen
                        delta[tp] = rep_idx
                        carried[tp & _RING_MASK] = _rep_add(state_p, rdelta)

        p += 1

    # backtrack into forward op order
    ops = []
    cur = p
    while cur != 0:
        prev = link[cur]
        ops.append((cmd[cur], length[cur], delta[cur]))
        cur = prev
    ops.reverse()
    return ops, end_p
