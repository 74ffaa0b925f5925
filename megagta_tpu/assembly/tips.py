"""Tip removal (dead-end path trimming) on the SdBG.

Mirrors assembly_algorithms::RemoveTips/Trim (src/assembly_algorithms.cpp:
76-183): doubling length rounds 2, 4, ... max_tip_len; in each round a node
with zero out-degree (resp. zero in-degree) seeds a backward (resp. forward)
walk of unique-linked nodes up to len-1 steps; the path is a tip if it ends
at a branch (the neighbor's unique-link check fails) or is an isolated path.
All marked nodes then have all their edges deleted.

The reference parallelizes with an atomic mark bitvector; here each round is
a sequential host pass over candidate nodes (the walks are short) — marks
are applied after scanning, matching the reference's mark-then-delete split.
"""

from __future__ import annotations

import numpy as np

from ..graph.sdbg import SdBG

__all__ = ["remove_tips"]


def _trim_round(dbg: SdBG, length: int, removed: np.ndarray) -> int:
    n_tips = 0
    last_rows = np.flatnonzero(dbg.last)
    # pass 1: out-degree-zero nodes, walk backward
    for node in last_rows:
        if removed[node] or not dbg.node_outdegree_zero(node):
            continue
        path = [node]
        cur = int(node)
        is_tip = False
        for _ in range(1, length):
            prev = dbg.unique_prev_node(cur)
            if prev == -1:
                is_tip = dbg.node_indegree_zero(cur)
                break
            elif dbg.unique_next_node(prev) == -1:
                is_tip = True
                break
            else:
                path.append(prev)
                cur = prev
        if is_tip:
            removed[path] = True
            n_tips += 1

    # pass 2: in-degree-zero nodes, walk forward
    for node in last_rows:
        if removed[node] or not dbg.node_indegree_zero(node):
            continue
        path = [node]
        cur = int(node)
        is_tip = False
        for _ in range(1, length):
            nxt = dbg.unique_next_node(cur)
            if nxt == -1:
                is_tip = dbg.node_outdegree_zero(cur)
                break
            elif dbg.unique_prev_node(nxt) == -1:
                is_tip = True
                # (reference keeps walking here without break, :129-131; the
                # loop then terminates via unique-link failure or length)
            else:
                path.append(nxt)
                cur = nxt
        if is_tip:
            removed[path] = True
            n_tips += 1

    for node in np.flatnonzero(removed):
        if dbg.last[node]:
            dbg.delete_all_edges(int(node))
    return n_tips


def remove_tips(dbg: SdBG, max_tip_len: int) -> int:
    removed = np.zeros(dbg.size, bool)
    total = 0
    length = 2
    while length < max_tip_len:
        total += _trim_round(dbg, length, removed)
        length *= 2
    total += _trim_round(dbg, max_tip_len, removed)
    return total
