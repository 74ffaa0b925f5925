"""Succinct de Bruijn graph runtime: BOSS arrays + batched navigation.

Content model matches the reference SuccinctDBG (src/succinct_dbg.h:32-247):
rows are BOSS entries sorted by colex(node label); each row in a node's group
is one outgoing edge with W = out-char ($=0, A..T=1..4, flagged 5..8 when an
earlier row in the same (k-1)-suffix block shares the target), `last` marks
group ends, indegree-0 nodes get fictitious "$-prefixed" tip rows carrying
their label, outdegree-0 nodes get a W=$ row.

TPU-first design departure: instead of rank/select popcount scans per query
(src/rank_and_select.h), the structurally static navigation is precomputed at
build time into gather tables:
  forward [size]    target-node last-row per row (reference Forward,
                    src/succinct_dbg.h:155-164)
  succ    [size,4]  row id of the target node's out-edge with char c, or -1
                    (collapses OutgoingEdges' rank/select + group scan,
                    src/succinct_dbg.cpp:78-97, into one gather)
Only the `invalid` mask mutates (SetInvalidEdge), so these tables stay valid
through tip removal / bubble popping; queries mask invalid rows at gather
time. This turns whole-frontier expansion into pure vectorized gathers — the
TPU-idiomatic replacement for pointer-chasing rank/select.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

__all__ = ["SdBG"]


@dataclass
class SdBG:
    k: int  # node k-mer length (kmer_k)
    w: np.ndarray  # [size] uint8, 0..8
    last: np.ndarray  # [size] bool
    is_tip: np.ndarray  # [size] bool (fictitious $-node rows)
    mult: np.ndarray  # [size] int32 edge multiplicity (1 for $/tip rows)
    f: np.ndarray  # [6] int64 partition starts by node last-char
    tip_labels: np.ndarray  # [num_tips, k-1] int8 tip node labels (natural)
    # --- derived navigation (built by finalize) ---
    forward: np.ndarray = None  # [size] int64
    backward: np.ndarray = None  # [size] int64 (first incoming row of group)
    succ: np.ndarray = None  # [size, 4] int64
    group_start: np.ndarray = None  # [size] int64 first row of this row's group
    group_end: np.ndarray = None  # [size] int64 last row (inclusive)
    invalid: np.ndarray = None  # [size] bool, mutable
    is_multi1: np.ndarray = None  # [size] bool
    pred: np.ndarray = None  # [num_groups+1, 4] int64 incoming rows per group
    group_ordinal: np.ndarray = None  # [size] int64 ordinal of enclosing group

    @property
    def size(self) -> int:
        return len(self.w)

    # ------------------------------------------------------------ build-time

    def finalize(self) -> "SdBG":
        """Precompute gather tables from (w, last, is_tip, f)."""
        w = self.w.astype(np.int64)
        size = self.size
        self.invalid = self.is_tip | (w == 0)
        self.is_multi1 = self.mult <= 1

        # group boundaries: a group ends at a row whose (last | is_tip) is set
        boundary = self.last | self.is_tip
        # group_end[x] = smallest y >= x with boundary[y]
        idx = np.arange(size, dtype=np.int64)
        b_idx = np.where(boundary, idx, size)
        self.group_end = np.minimum.accumulate(b_idx[::-1])[::-1]
        # group_start[x] = previous boundary + 1
        p_idx = np.where(boundary, idx, -1)
        prev_boundary = np.maximum.accumulate(np.concatenate([[-1], p_idx[:-1]]))
        self.group_start = prev_boundary + 1

        # forward: rows with W char a (unflagged rank): target is the
        # rank-th last-marked group in partition a.
        out_char = np.where(w == 0, 0, np.where(w > 4, w - 4, w))  # 0..4
        last_pos = np.flatnonzero(self.last)  # positions of last rows, in order
        # cumulative count of last rows before each partition start
        last_cum = np.zeros(size + 1, dtype=np.int64)
        last_cum[1:] = np.cumsum(self.last)
        rank_f = last_cum[np.clip(self.f, 0, size)]  # groups before partition c

        self.forward = np.full(size, -1, dtype=np.int64)
        for c in range(1, 5):
            rows_c = np.flatnonzero(out_char == c)
            if rows_c.size == 0:
                continue
            # rank among unflagged c rows (count in [0, row], inclusive)
            cum_unf = np.cumsum(w == c)
            rank_c = cum_unf[rows_c]  # count of unflagged c in [0, row]
            target_group = rank_f[c] + rank_c - 1
            valid = (target_group >= 0) & (target_group < len(last_pos))
            tg = np.where(valid, target_group, 0)
            self.forward[rows_c] = np.where(valid, last_pos[tg], -1)

        # backward: first incoming row of each group's node =
        # select_W(c, group_index_within_partition). Same value for all rows
        # of a group; computed per last-marked group then broadcast.
        self.backward = np.full(size, -1, dtype=np.int64)
        # BOSS invariant: the i-th last-marked group of partition c pairs
        # with the i-th unflagged c row (reference Backward,
        # src/succinct_dbg.h:166-170).
        for c in range(1, 5):
            groups_c = last_pos[(last_pos >= self.f[c]) & (last_pos < (self.f[c + 1] if c + 1 < 6 else size))]
            rows_wc = np.flatnonzero(w == c)
            n = min(len(groups_c), len(rows_wc))
            # broadcast to whole group range
            for_group_last = groups_c[:n]
            starts = self.group_start[for_group_last]
            # scatter: all rows in [start, last] get backward = rows_wc[i]
            reps = for_group_last - starts + 1
            rows_idx = np.repeat(rows_wc[:n], reps)
            targets = np.concatenate(
                [np.arange(s, e + 1) for s, e in zip(starts, for_group_last)]
            ) if n else np.zeros(0, np.int64)
            self.backward[targets] = rows_idx

        # pred table: incoming rows per group (<= 4 real rows, or 1 tip row),
        # indexed by group ordinal; replaces the reference's IncomingEdges
        # row-scan (src/succinct_dbg.cpp:99-127) with one gather.
        num_groups_total = int(self.last.sum())
        self.pred = np.full((num_groups_total + 1, 4), -1, dtype=np.int64)
        in_rows = np.flatnonzero((w >= 1) & (w <= 8))
        tgt = self.forward[in_rows]
        ok_t = tgt >= 0
        in_rows, tgt = in_rows[ok_t], tgt[ok_t]
        tgt_gid = last_cum[tgt]  # ordinal of target group (tgt is a last row)
        order_t = np.argsort(tgt_gid, kind="stable")
        in_rows, tgt_gid = in_rows[order_t], tgt_gid[order_t]
        slot = np.arange(len(tgt_gid)) - np.searchsorted(tgt_gid, tgt_gid)
        keep4 = slot < 4
        self.pred[tgt_gid[keep4], slot[keep4]] = in_rows[keep4]

        # succ table: per group, rows by out-char; then succ[x] = that of
        # group(forward[x]).
        group_id_of_row = last_cum[idx]  # index among last-marked groups, for
        # rows up to their group's last row this equals the group ordinal
        num_groups = int(self.last.sum())
        group_rows = np.full((num_groups + 1, 4), -1, dtype=np.int64)
        real_rows = np.flatnonzero((out_char >= 1) & (~self.is_tip))
        gid = last_cum[real_rows]  # ordinal of enclosing group
        group_rows[gid, out_char[real_rows] - 1] = real_rows
        fwd_ok = self.forward >= 0
        fwd_gid = np.where(fwd_ok, last_cum[np.clip(self.forward, 0, size - 1)], num_groups)
        self.succ = group_rows[fwd_gid]
        self.group_ordinal = last_cum[idx] if size else np.zeros(0, np.int64)
        return self

    # ------------------------------------------- edge/node-level navigation
    # (the assembly stage's query set; reference src/succinct_dbg.cpp:33-409)

    def _group_rows(self, row: int):
        return range(int(self.group_start[row]), int(self.group_end[row]) + 1)

    def incoming_rows(self, row: int) -> list[int]:
        """Valid incoming edge rows of `row`'s group node."""
        g = int(self.group_ordinal[row])
        return [int(y) for y in self.pred[g] if y >= 0 and not self.invalid[y]]

    def edge_outdegree(self, row: int) -> int:
        """Out-degree of the TARGET node of edge `row` (EdgeOutdegree)."""
        if self.invalid[row]:
            return -1
        return sum(1 for r in self.succ[row] if r >= 0 and not self.invalid[r])

    def edge_indegree(self, row: int) -> int:
        if self.invalid[row]:
            return -1
        return len(self.incoming_rows(row))

    def unique_next_edge(self, row: int) -> int:
        if self.invalid[row]:
            return -1
        outs = [r for r in self.succ[row] if r >= 0 and not self.invalid[r]]
        return int(outs[0]) if len(outs) == 1 else -1

    def unique_prev_edge(self, row: int) -> int:
        if self.invalid[row]:
            return -1
        ins = self.incoming_rows(row)
        return ins[0] if len(ins) == 1 else -1

    def next_simple_path_edge(self, row: int) -> int:
        nxt = self.unique_next_edge(row)
        if nxt != -1 and self.unique_prev_edge(nxt) != -1:
            return nxt
        return -1

    def prev_simple_path_edge(self, row: int) -> int:
        prv = self.unique_prev_edge(row)
        if prv != -1 and self.unique_next_edge(prv) != -1:
            return prv
        return -1

    # node handles are any row of the group
    def node_outdegree_zero(self, row: int) -> bool:
        return not any(
            not self.invalid[r] for r in self._group_rows(row)
        )

    def node_indegree_zero(self, row: int) -> bool:
        return len(self.incoming_rows(row)) == 0

    def unique_next_node(self, row: int) -> int:
        outs = [r for r in self._group_rows(row) if not self.invalid[r]]
        if len(outs) != 1:
            return -1
        return int(self.forward[outs[0]])  # forward lands on a last row

    def unique_prev_node(self, row: int) -> int:
        ins = self.incoming_rows(row)
        if len(ins) != 1:
            return -1
        return int(self.group_end[ins[0]])

    def delete_all_edges(self, row: int) -> None:
        """Invalidate the node's out-rows and all incoming rows
        (DeleteAllEdges, src/succinct_dbg.cpp:342-367)."""
        for r in self._group_rows(row):
            self.invalid[r] = True
        g = int(self.group_ordinal[row])
        for y in self.pred[g]:
            if y >= 0:
                self.invalid[y] = True

    def edge_reverse_complement(self, row: int) -> int:
        """Row of the reverse-complement edge (EdgeReverseComplement)."""
        if self.invalid[row]:
            return -1
        e = self.edge_label(row)
        rc = (3 - e)[::-1].astype(np.int8)
        return self.lookup_edge(rc)

    # ------------------------------------------------------------- queries

    def out_label(self, rows) -> np.ndarray:
        """GetEdgeOutLabel: 1..4 (src/succinct_dbg.h:92-95)."""
        w = self.w[rows].astype(np.int64)
        return np.where(w > 4, w - 4, w)

    def outgoing_edges(self, row: int) -> list[int]:
        """Valid out-rows of the target node of `row` (OutgoingEdges)."""
        if row < 0 or self.invalid[row]:
            return []
        cands = self.succ[row]
        return [int(r) for r in cands[::-1] if r >= 0 and not self.invalid[r]]

    def label(self, row: int) -> np.ndarray:
        """Reconstruct the k-mer label of the node owning `row` (natural
        orientation), reference Label (src/succinct_dbg.cpp:503-528)."""
        seq = np.zeros(self.k, dtype=np.int8)
        x = int(row)
        for i in range(self.k - 1, -1, -1):
            if self.is_tip[x]:
                tip_idx = int(np.count_nonzero(self.is_tip[: x + 1]) - 1)
                lab = self.tip_labels[tip_idx]
                # tip label = fictitious node's real chars n[0..k-2]; the
                # remaining i+1 node chars are its suffix
                seq[: i + 1] = lab[len(lab) - (i + 1) :] if i + 1 <= len(lab) else np.concatenate([np.zeros(i + 1 - len(lab), np.int8), lab])
                break
            x = int(self.backward[x])
            seq[i] = self.out_label(np.array([x]))[0] - 1
        return seq

    def edge_label(self, row: int) -> np.ndarray:
        """(k+1)-mer of the edge at `row` = node label + out-char."""
        node = self.label(row)
        return np.concatenate([node, [self.out_label(np.array([row]))[0] - 1]]).astype(np.int8)

    def lookup_edge(self, seq: np.ndarray) -> int:
        """Row id of edge (k+1)-mer `seq` (codes 0..3), or -1.

        Reference IndexBinarySearchEdge (src/succinct_dbg.cpp:530-549); here a
        direct binary search over colex order via label reconstruction.
        """
        return int(self.lookup_edges(np.asarray(seq, np.int8)[None, :])[0])

    def lookup_node(self, node: np.ndarray) -> int:
        """Last-row id of node k-mer `node` (codes 0..3), or -1."""
        return int(self.lookup_nodes(np.asarray(node, np.int8)[None, :])[0])

    # -------------------------------------------------- batched label lookup
    # (the seed -> edge-id resolution of IndexBinarySearchEdge,
    # src/succinct_dbg.cpp:530-549, vectorized over whole seed batches: the
    # binary searches advance in lockstep, each step reconstructing the mid
    # labels for ALL queries with k gather sweeps)

    @property
    def _last_pos(self) -> np.ndarray:
        lp = getattr(self, "_lp_cache", None)
        if lp is None:
            lp = np.flatnonzero(self.last)
            self._lp_cache = lp
        return lp

    @property
    def _tip_rank(self) -> np.ndarray:
        tr = getattr(self, "_tip_rank_cache", None)
        if tr is None:
            tr = np.cumsum(self.is_tip) - 1
            self._tip_rank_cache = tr
        return tr

    def labels_batch(self, rows: np.ndarray) -> np.ndarray:
        """Vectorized label(): k-mer labels of many rows' nodes, [N, k]."""
        rows = np.asarray(rows, np.int64)
        N = len(rows)
        seq = np.zeros((N, self.k), np.int8)
        x = rows.copy()
        done = np.zeros(N, bool)
        kl = self.tip_labels.shape[1] if self.tip_labels.ndim == 2 else self.k - 1
        for i in range(self.k - 1, -1, -1):
            tip = ~done & self.is_tip[x]
            if tip.any():
                idxs = np.flatnonzero(tip)
                lab = self.tip_labels[self._tip_rank[x[idxs]]]
                m = i + 1  # chars to fill: the label's length-m suffix
                if m <= kl:
                    seq[idxs[:, None], np.arange(m)[None, :]] = lab[:, kl - m :]
                else:  # zero-pad in front (label shorter than the slot)
                    seq[idxs[:, None], (np.arange(kl) + (m - kl))[None, :]] = lab
                done[idxs] = True
            act = np.flatnonzero(~done)
            if not len(act):
                break
            x[act] = self.backward[x[act]]
            seq[act, i] = (self.out_label(x[act]) - 1).astype(np.int8)
        return seq

    def lookup_nodes(self, nodes: np.ndarray) -> np.ndarray:
        """Batched lookup_node: [Q, k] codes -> [Q] last-row ids (-1 miss)."""
        nodes = np.asarray(nodes, np.int8)
        Q = nodes.shape[0]
        res = np.full(Q, -1, np.int64)
        if Q == 0 or self.size == 0:
            return res
        lp = self._last_pos
        c = nodes[:, -1].astype(np.int64) + 1
        lo = self.f[c]
        hi = np.where(c + 1 < 6, self.f[np.minimum(c + 1, 5)], self.size)
        li = np.searchsorted(lp, lo)
        ri = np.searchsorted(lp, hi)
        target = nodes[:, ::-1]  # colex compare = lex of reversed label
        qi = np.arange(Q)
        active = li < ri
        while active.any():
            mid = (li + ri) // 2
            rows = lp[np.where(active, mid, 0)]
            labs = self.labels_batch(rows)[:, ::-1]
            diff = labs != target
            first = np.argmax(diff, axis=1)
            anyd = diff.any(axis=1)
            la = labs[qi, first]
            ta = target[qi, first]
            cmp = np.where(anyd, np.where(la < ta, -1, 1), 0)
            eq = cmp == 0
            tip = self.is_tip[rows]
            found = active & eq & ~tip
            res[found] = rows[found]
            cmp = np.where(eq & tip, -1, cmp)  # tips sort before real nodes
            li = np.where(active & (cmp < 0), mid + 1, li)
            ri = np.where(active & (cmp > 0), mid, ri)
            active = active & ~found & (li < ri)
        return res

    def lookup_edges(self, seqs: np.ndarray) -> np.ndarray:
        """Batched lookup_edge: [Q, k+1] codes -> [Q] edge rows (-1 miss)."""
        seqs = np.asarray(seqs, np.int8)
        Q = seqs.shape[0]
        node_rows = self.lookup_nodes(seqs[:, : self.k])
        res = np.full(Q, -1, np.int64)
        hit = node_rows >= 0
        if not hit.any():
            return res
        safe = np.where(hit, node_rows, 0)
        g0 = self.group_start[safe]
        g1 = self.group_end[safe]
        want = seqs[:, self.k].astype(np.int64) + 1
        # groups are <= 5 rows wide; scan from the group end downward
        # (reference order), first matching W in {want, want+4} wins
        for off in range(5):
            r = g1 - off
            ok = hit & (r >= g0) & (res < 0)
            wv = self.w[np.where(ok, r, 0)].astype(np.int64)
            m = ok & ((wv == want) | (wv - 4 == want))
            res[m] = r[m]
        return res

    def set_invalid(self, rows) -> None:
        self.invalid[rows] = True

    # ---------------------------------------------------------- persistence

    def save(self, prefix: str) -> None:
        np.savez_compressed(
            prefix + ".sdbg.npz",
            w=self.w,
            last=self.last,
            is_tip=self.is_tip,
            mult=self.mult,
            f=self.f,
            tip_labels=self.tip_labels,
        )
        with open(prefix + ".sdbg_info.json", "w") as fh:
            json.dump(
                {
                    "kmer_k": self.k,
                    "size": self.size,
                    "num_tips": int(self.is_tip.sum()),
                    "num_w": [int((self.w == i).sum()) for i in range(9)],
                    "num_last1": int(self.last.sum()),
                },
                fh,
                indent=1,
            )

    @staticmethod
    def load(prefix: str) -> "SdBG":
        with open(prefix + ".sdbg_info.json") as fh:
            info = json.load(fh)
        with np.load(prefix + ".sdbg.npz") as z:
            g = SdBG(
                k=info["kmer_k"],
                w=z["w"],
                last=z["last"],
                is_tip=z["is_tip"],
                mult=z["mult"],
                f=z["f"],
                tip_labels=z["tip_labels"],
            )
        return g.finalize()
