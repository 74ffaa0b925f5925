"""Unitig (maximal simple path) extraction and contig output.

Mirrors UnitigGraph::InitFromSdBG's streaming mode
(src/unitig_graph.cpp:208-310): every valid edge that ends a simple path is
walked back to its start; each path and its reverse-complement twin are
emitted once; the contig string is the start node's k-mer plus the path's
out-chars (VertexToDNAString, src/unitig_graph.cpp:80-112); contigs shorter
than min_contig are dropped; isolated paths (indegree 0 at start, outdegree
0 at end) are flagged. Palindromic paths are folded to half length
(FoldPalindrome, :114-132).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import dna_to_str
from ..graph.sdbg import SdBG

__all__ = ["Contig", "extract_contigs"]

K_ISOLATED = 1


@dataclass
class Contig:
    seq: str
    multi: float
    flag: int = 0

    @property
    def name(self) -> str:
        return f"multi_{self.multi:.4f}_flag_{self.flag}"


def _path_sequence(dbg: SdBG, path: list[int]) -> str:
    node = dbg.label(path[0])
    chars = [int(c) - 1 for c in dbg.out_label(np.asarray(path))]
    return dna_to_str(np.concatenate([node, np.asarray(chars, np.int8)]))


def extract_contigs(dbg: SdBG, min_contig: int = 0) -> list[Contig]:
    visited = np.zeros(dbg.size, bool)
    contigs: list[Contig] = []

    for end_edge in np.flatnonzero(~dbg.invalid):
        end_edge = int(end_edge)
        if visited[end_edge] or dbg.next_simple_path_edge(end_edge) != -1:
            continue
        # walk back to the path start
        path = [end_edge]
        cur = end_edge
        while True:
            prv = dbg.prev_simple_path_edge(cur)
            if prv == -1 or visited[prv]:
                break
            path.append(prv)
            cur = prv
        path.reverse()
        visited[path] = True
        depth = int(dbg.mult[path].sum())

        # mark the rc twin so it is not emitted again
        rc_of_end = dbg.edge_reverse_complement(end_edge)
        is_palindrome = False
        if rc_of_end != -1:
            if rc_of_end in path:
                is_palindrome = True
            rc_cur = rc_of_end
            rc_path = [rc_cur]
            while True:
                nxt = dbg.next_simple_path_edge(rc_cur)
                if nxt == -1 or visited[nxt]:
                    break
                rc_path.append(nxt)
                rc_cur = nxt
            visited[rc_path] = True

        label = _path_sequence(dbg, path)
        if is_palindrome:
            label = label[: (len(label) + dbg.k) // 2]
        if len(label) < min_contig:
            continue
        multi = min(65535.0, depth / len(path))
        flag = 0
        if dbg.edge_indegree(path[0]) == 0 or len(dbg.incoming_rows(path[0])) == 0:
            if dbg.edge_outdegree(path[-1]) == 0:
                flag = K_ISOLATED
        contigs.append(Contig(label, multi, flag))
    return contigs
