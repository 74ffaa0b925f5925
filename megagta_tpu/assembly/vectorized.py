"""Vectorized de novo assembly: lockstep tip walks + pointer-doubling
path condensation.

The default engine behind assembly.denovo.assemble. Replaces the per-node
Python walks of tips.py/unitigs.py (kept as the cross-checked oracle) with
whole-array numpy passes over the SdBG row tables:

  * tip removal (assembly_algorithms::RemoveTips/Trim,
    src/assembly_algorithms.cpp:76-183): every candidate dead-end node
    advances ONE hop per lockstep iteration through precomputed
    unique-prev/next node tables; paths are recorded as [cands, len]
    matrices and marked tips are deleted in one vectorized pass. The
    round/mark/delete structure (mark during scan, delete after) matches
    the reference's atomic-bitvector protocol — a walk never observes
    same-round deletions, and no round-N walk can mark another round-N
    candidate's rows (a dead-end node on another walk's path would have
    ended that walk), so lockstep order is equivalent to any sequential
    order.
  * unitig extraction (UnitigGraph::InitFromSdBG streaming mode,
    src/unitig_graph.cpp:208-310): next-simple-path pointers are chased by
    pointer doubling (log2(size) gather rounds), giving every edge its path
    terminal + distance; one lexsort groups path rows start->end; labels,
    depths and flags fall out of segment reductions. Reverse-complement
    twins are deduplicated by the emit-smaller-end rule, which reproduces
    the sequential visited-marking order (ends are visited ascending; an
    emitted path's rc walk always marks its twin's end).
"""

from __future__ import annotations

import numpy as np

from ..constants import dna_to_str
from ..graph.sdbg import SdBG
from .unitigs import Contig

__all__ = ["remove_tips_vec", "extract_contigs_vec"]


class _NodeTables:
    """Per-node (group) aggregates indexed by last-row id; recomputed per
    round (they depend on dbg.invalid)."""

    def __init__(self, dbg: SdBG):
        size = dbg.size
        valid = ~dbg.invalid
        self.last_rows = h = np.flatnonzero(dbg.last)
        gs = dbg.group_start[h]
        cs = np.concatenate([[0], np.cumsum(valid)])
        self.out_deg = (cs[h + 1] - cs[gs]).astype(np.int64)

        # the single valid out-row of out-degree-1 groups: first valid row
        # at or after the group start
        idxv = np.flatnonzero(valid)
        pos = np.searchsorted(idxv, gs)
        if len(idxv):
            first_valid = idxv[np.minimum(pos, len(idxv) - 1)]
        else:
            first_valid = np.full(len(h), -1, np.int64)
        single_out = np.where(
            (self.out_deg == 1) & (pos < len(idxv)), first_valid, -1
        )

        g = dbg.group_ordinal[h]
        pred = dbg.pred[g]  # [H, 4]
        pv = (pred >= 0) & valid[np.maximum(pred, 0)]
        self.in_deg = pv.sum(1)
        first_slot = np.argmax(pv, axis=1)
        single_in = np.where(
            self.in_deg == 1, pred[np.arange(len(h)), first_slot], -1
        )

        # row-indexed node tables (node handle = its group's last row)
        self.uniq_next = np.full(size, -1, np.int64)
        ok = single_out >= 0
        self.uniq_next[h[ok]] = dbg.forward[single_out[ok]]
        self.uniq_prev = np.full(size, -1, np.int64)
        ok = single_in >= 0
        self.uniq_prev[h[ok]] = dbg.group_end[single_in[ok]]
        self.outdeg_zero = np.zeros(size, bool)
        self.outdeg_zero[h] = self.out_deg == 0
        self.indeg_zero = np.zeros(size, bool)
        self.indeg_zero[h] = self.in_deg == 0


def _walk(cand, length, nt, forward: bool):
    """Lockstep dead-end walk; returns (is_tip [C], paths [C, length])."""
    C = len(cand)
    paths = np.full((C, max(length, 1)), -1, np.int64)
    paths[:, 0] = cand
    cur = cand.copy()
    alive = np.ones(C, bool)
    is_tip = np.zeros(C, bool)
    step = nt.uniq_next if forward else nt.uniq_prev
    link_back = nt.uniq_prev if forward else nt.uniq_next
    endcheck = nt.outdeg_zero if forward else nt.indeg_zero
    for t in range(1, length):
        if not alive.any():
            break
        nxt = step[cur]
        c1 = nxt < 0
        is_tip |= alive & c1 & endcheck[cur]
        lb = link_back[np.maximum(nxt, 0)]
        c2 = ~c1 & (lb < 0)
        is_tip |= alive & c2
        cont = alive & ~c1 & ~c2
        if forward:
            # the reference keeps walking after the c2 branch without
            # appending (assembly_algorithms.cpp:129-131) — state no longer
            # changes, so it is equivalent to stopping
            paths[cont, t] = nxt[cont]
        else:
            paths[cont, t] = nxt[cont]
        cur = np.where(cont, nxt, cur)
        alive = cont
    return is_tip, paths


def _apply_marks(is_tip, paths, removed) -> int:
    rows = paths[is_tip]
    rows = rows[rows >= 0]
    removed[rows] = True
    return int(is_tip.sum())


def _delete_removed(dbg: SdBG, removed: np.ndarray) -> None:
    """Vectorized DeleteAllEdges over every removed node (marks are always
    last rows)."""
    rem = np.flatnonzero(removed & dbg.last)
    if not len(rem):
        return
    dbg.invalid |= removed[dbg.group_end]
    pr = dbg.pred[dbg.group_ordinal[rem]].ravel()
    pr = pr[pr >= 0]
    dbg.invalid[pr] = True


def _trim_round_vec(dbg: SdBG, length: int, removed: np.ndarray) -> int:
    nt = _NodeTables(dbg)
    h = nt.last_rows
    n = 0
    # pass 1: out-degree-zero nodes walk backward
    cand = h[(nt.out_deg == 0) & ~removed[h]]
    n += _apply_marks(*_walk(cand, length, nt, forward=False), removed)
    # pass 2: in-degree-zero nodes walk forward (sees pass-1 marks, like the
    # sequential shared `removed` array)
    cand = h[(nt.in_deg == 0) & ~removed[h]]
    n += _apply_marks(*_walk(cand, length, nt, forward=True), removed)
    _delete_removed(dbg, removed)
    return n


def remove_tips_vec(dbg: SdBG, max_tip_len: int) -> int:
    removed = np.zeros(dbg.size, bool)
    total = 0
    length = 2
    while length < max_tip_len:
        total += _trim_round_vec(dbg, length, removed)
        length *= 2
    total += _trim_round_vec(dbg, max_tip_len, removed)
    return total


def extract_contigs_vec(dbg: SdBG, min_contig: int = 0) -> list[Contig]:
    size = dbg.size
    if size == 0:
        return []
    valid = ~dbg.invalid
    idx = np.arange(size, dtype=np.int64)

    # ---- unique next/prev EDGE pointers over all rows ---------------------
    succ = dbg.succ
    sv = (succ >= 0) & valid[np.maximum(succ, 0)]
    out_cnt = sv.sum(1)
    first_slot = np.argmax(sv, axis=1)
    un_edge = np.where(
        valid & (out_cnt == 1), succ[idx, first_slot], -1
    )
    pred = dbg.pred[dbg.group_ordinal]  # [size, 4] incoming rows of own node
    pv = (pred >= 0) & valid[np.maximum(pred, 0)]
    in_cnt = pv.sum(1)
    pf = np.argmax(pv, axis=1)
    up_edge = np.where(valid & (in_cnt == 1), pred[idx, pf], -1)

    next_sp = np.where(
        (un_edge >= 0) & (up_edge[np.maximum(un_edge, 0)] >= 0), un_edge, -1
    )

    # ---- pointer doubling: terminal + distance per row --------------------
    nxt = np.where(next_sp >= 0, next_sp, idx)
    dist = (next_sp >= 0).astype(np.int64)
    for _ in range(max(1, int(np.ceil(np.log2(max(size, 2)))) + 1)):
        dist = dist + dist[nxt]
        nxt = nxt[nxt]
    terminal = nxt
    is_end = valid & (next_sp < 0)
    on_path = valid & is_end[terminal]  # excludes cycles

    rows = idx[on_path]
    order = np.lexsort((-dist[rows], terminal[rows]))
    rows = rows[order]
    term_sorted = terminal[rows]
    bound = np.ones(len(rows), bool)
    if len(rows) > 1:
        bound[1:] = term_sorted[1:] != term_sorted[:-1]
    starts_pos = np.flatnonzero(bound)
    seg_bounds = np.append(starts_pos, len(rows))
    start_rows = rows[starts_pos]  # max-distance row of each path
    end_rows = term_sorted[starts_pos]
    plens = np.diff(seg_bounds)
    csum = np.concatenate([[0], np.cumsum(dbg.mult[rows].astype(np.int64))])
    depths = csum[seg_bounds[1:]] - csum[seg_bounds[:-1]]

    n_paths = len(start_rows)
    if n_paths == 0:
        return []

    # ---- rc twin dedup + palindrome detection -----------------------------
    # edge label of each end row, reverse-complemented, looked up in batch
    end_nodes = dbg.labels_batch(end_rows)  # [P, k]
    out_chars = (dbg.out_label(end_rows) - 1).astype(np.int8)
    edge_lab = np.concatenate([end_nodes, out_chars[:, None]], axis=1)
    rc_lab = (3 - edge_lab)[:, ::-1].astype(np.int8)
    rc_rows = dbg.lookup_edges(rc_lab)
    rc_ok = (rc_rows >= 0) & valid[np.maximum(rc_rows, 0)]
    rc_term = np.where(
        rc_ok & on_path[np.maximum(rc_rows, 0)],
        terminal[np.maximum(rc_rows, 0)],
        -1,
    )
    is_palin = rc_term == end_rows
    # replay the sequential visited-marking order exactly: paths are
    # processed by ascending end row (end_rows is sorted); an emitted path
    # marks its rc twin's end, suppressing the twin. O(#paths) host loop.
    emit = np.zeros(n_paths, bool)
    marked: set = set()
    for p in range(n_paths):
        if int(end_rows[p]) in marked:
            continue
        emit[p] = True
        if rc_term[p] >= 0:
            marked.add(int(rc_term[p]))

    # ---- contig assembly ---------------------------------------------------
    start_labels = dbg.labels_batch(start_rows)  # [P, k]
    path_chars = (dbg.out_label(rows) - 1).astype(np.int8)
    in0 = in_cnt[start_rows] == 0
    outE = out_cnt[end_rows] == 0
    flags = np.where(in0 & outE, 1, 0)

    contigs: list[Contig] = []
    k = dbg.k
    for p in np.flatnonzero(emit):
        chars = np.concatenate(
            [start_labels[p], path_chars[seg_bounds[p] : seg_bounds[p + 1]]]
        )
        label = dna_to_str(chars)
        if is_palin[p]:
            label = label[: (len(label) + k) // 2]
        if len(label) < min_contig:
            continue
        contigs.append(
            Contig(
                label,
                min(65535.0, float(depths[p]) / float(plens[p])),
                int(flags[p]),
            )
        )
    return contigs
