"""Bubble popping on the SdBG (multi-branch bounded bubbles).

Mirrors BranchGroup (src/branch_group.cpp:22-141) and
assembly_algorithms::PopBubbles (src/assembly_algorithms.cpp:246-302):
from every valid edge whose target node branches (2..max_branches ways), all
branches are extended breadth-wise up to 2k+4 edges; the group is a bubble
when every branch's last edge coincides at a single convergence node whose
incoming edges all come from within the group. Popping keeps the branch
with the highest multiplicity sum and invalidates the interior edges of the
rest. The reference's lock-retry dance is a parallelism artifact; here the
pops run sequentially with the same mark-set semantics.
"""

from __future__ import annotations

import numpy as np

from ..graph.sdbg import SdBG

__all__ = ["pop_bubbles"]

MAX_BRANCHES = 16


class _BranchGroup:
    def __init__(self, dbg: SdBG, begin: int, max_branches: int, max_length: int):
        self.dbg = dbg
        self.begin = begin
        self.max_branches = max_branches
        self.max_length = max_length
        self.branches: list[list[int]] = []
        self.mults: list[int] = []
        self.end = -1

    def search(self) -> bool:
        dbg = self.dbg
        if dbg.invalid[self.begin]:
            return False
        outd = dbg.edge_outdegree(self.begin)
        if outd <= 1 or outd > self.max_branches:
            return False
        self.branches = [[self.begin]]
        self.mults = [0]
        converged = False

        for j in range(1, self.max_length):
            num = len(self.branches)
            for i in range(num):
                current = self.branches[i][-1]
                outs = dbg.outgoing_edges(current)
                if len(outs) >= 1:
                    self.branches[i].append(outs[0])
                    self.mults[i] += int(dbg.mult[outs[0]])
                    if len(self.branches) + len(outs) - 1 > self.max_branches:
                        return False
                    base_mult = self.mults[i] - int(dbg.mult[outs[0]])
                    for x in range(1, len(outs)):
                        nb = self.branches[i][:-1] + [outs[x]]
                        self.branches.append(nb)
                        self.mults.append(base_mult + int(dbg.mult[outs[x]]))

            # all last edges must be reached from within the group
            for br in self.branches:
                last = br[-1]
                ins = dbg.incoming_rows(last)
                if len(ins) == 1:
                    continue
                for y in ins:
                    if not any(
                        len(b) > j - 1 and b[j - 1] == y for b in self.branches
                    ):
                        return False

            # convergence check
            self.end = self.branches[0][-1]
            if dbg.edge_outdegree(self.end) == 1:
                converged = all(b[-1] == self.end for b in self.branches)
                if converged:
                    break

        return converged and self.begin != self.end

    def pop(self, marked: np.ndarray) -> bool:
        dbg = self.dbg
        best = 0
        best_mult = self.mults[0]
        for i in range(1, len(self.branches)):
            if self.mults[i] >= best_mult:
                best = i
                best_mult = self.mults[i]
        locked = []
        for br in self.branches:
            for j in range(1, len(br) - 1):
                if marked[br[j]]:
                    for r in locked:
                        marked[r] = False
                        dbg.invalid[r] = False
                    return False
                marked[br[j]] = True
                locked.append(br[j])
                dbg.invalid[br[j]] = True
        for j in range(1, len(self.branches[best]) - 1):
            dbg.invalid[self.branches[best][j]] = False
            marked[self.branches[best][j]] = False
        return True


def pop_bubbles(dbg: SdBG, max_branches: int = MAX_BRANCHES) -> int:
    max_bubble_len = dbg.k * 2 + 4
    marked = np.zeros(dbg.size, bool)

    # vectorized candidate screen: a branch group can only start at a valid
    # edge whose TARGET node branches 2..max_branches ways — one whole-array
    # mask replaces the per-edge search() probe over the full row set
    valid = ~dbg.invalid
    sv = (dbg.succ >= 0) & valid[np.maximum(dbg.succ, 0)]
    outd = sv.sum(1)
    candidates = np.flatnonzero(valid & (outd >= 2) & (outd <= max_branches))

    # two-phase protocol like the reference (search pass on the pristine
    # graph, then pop with a re-check on the mutating graph + retry): the
    # re-search before pop is load-bearing — earlier pops can break a
    # candidate's convergence
    found = []
    for e in candidates:
        bg = _BranchGroup(dbg, int(e), max_branches, max_bubble_len)
        if bg.search():
            found.append(int(e))

    num = 0
    retry = []
    for e in found:
        bg = _BranchGroup(dbg, e, max_branches, max_bubble_len)
        if bg.search():
            if bg.pop(marked):
                num += 1
            else:
                retry.append(e)
    for e in retry:
        bg = _BranchGroup(dbg, e, max_branches, max_bubble_len)
        if bg.search() and bg.pop(marked):
            num += 1
    return num
