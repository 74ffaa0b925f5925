"""Bubble popping on the SdBG (multi-branch bounded bubbles).

Mirrors BranchGroup (src/branch_group.cpp:22-141) and
assembly_algorithms::PopBubbles (src/assembly_algorithms.cpp:246-302):
from every valid edge whose target node branches (2..max_branches ways), all
branches are extended breadth-wise up to 2k+4 edges; the group is a bubble
when every branch's last edge coincides at a single convergence node whose
incoming edges all come from within the group. Popping keeps the branch
with the highest multiplicity sum and invalidates the interior edges of the
rest.

Layout (v2 — the reference parallelizes exactly this search, so the default
path is a LOCKSTEP sweep, not a per-candidate walk):
  * `_search_all` advances every candidate's branch group one hop per round
    over [C, MB, T] branch arenas — whole-array gathers into succ/pred plus
    masked scatters for branch splits; per-candidate Python appears nowhere.
  * pops run from the STORED branch arenas in waves: a group whose
    neighborhood (its edges, their successor slots, their lasts'
    predecessors) intersects edges invalidated earlier in the wave is
    deferred and re-searched next wave on the mutated graph — the same
    re-check-before-pop semantics as the reference's lock-retry dance,
    without re-walking untouched groups.
  * `_BranchGroup` (the serial walk) is kept as the oracle; a unit test
    checks the lockstep search reproduces it candidate-for-candidate.
"""

from __future__ import annotations

import numpy as np

from ..graph.sdbg import SdBG

__all__ = ["pop_bubbles"]

MAX_BRANCHES = 16


class _BranchGroup:
    """Serial reference walk (oracle; see module docstring)."""

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


def _search_all(dbg: SdBG, cand: np.ndarray, max_branches: int,
                max_length: int):
    """Lockstep branch-group search for all candidates at once.

    Returns (conv [C] bool, br [C, MB, T] int64 branch arenas (-1 padded),
    blen [C, MB] int32, bmult [C, MB] int64, nbr [C] int32). Semantics are
    _BranchGroup.search() exactly; validated by the oracle test.
    """
    C = len(cand)
    MB, T = max_branches, max_length
    size = dbg.size
    # navigation tables in outgoing_edges order (descending slot: succ is
    # indexed by out-char-1 and outgoing_edges returns cands[::-1])
    valid = ~dbg.invalid
    succ_r = dbg.succ[:, ::-1]
    sv_r = (succ_r >= 0) & valid[np.maximum(succ_r, 0)]
    sv_r &= valid[:, None]  # invalid source rows navigate nowhere
    mult = dbg.mult.astype(np.int64)
    pred = dbg.pred
    gord = dbg.group_ordinal

    br = np.full((C, MB, T), -1, np.int64)
    br[:, 0, 0] = cand
    blen = np.zeros((C, MB), np.int32)
    blen[:, 0] = 1
    bmult = np.zeros((C, MB), np.int64)
    nbr = np.ones(C, np.int32)
    alive = np.ones(C, bool)
    conv = np.zeros(C, bool)
    bidx = np.arange(MB)[None, :]

    for j in range(1, T):
        if not alive.any():
            break
        a = np.flatnonzero(alive)
        have = bidx < nbr[a, None]  # [A, MB]
        lasts = np.take_along_axis(
            br[a], np.maximum(blen[a] - 1, 0)[:, :, None], axis=2
        )[:, :, 0]
        lasts = np.where(have, lasts, 0)
        om = sv_r[lasts] & have[:, :, None]  # [A, MB, 4]
        outn = om.sum(-1).astype(np.int32)
        ext = have & (outn >= 1)

        # branch-count overflow: the serial walk fails the candidate the
        # moment len(branches) + len(outs) - 1 exceeds the cap while
        # processing branch i — i.e. at the prefix count
        extras = np.where(ext, outn - 1, 0)
        pre = np.cumsum(extras, axis=1) - extras  # exclusive prefix
        over = (ext & (nbr[a, None] + pre + outn - 1 > MB)).any(axis=1)

        # extend each branch along its first valid out-slot
        first = np.argmax(om, axis=2)
        fe = succ_r[lasts, first]
        ba = br[a]
        np.put_along_axis(
            ba, blen[a][:, :, None],
            np.where(ext, fe, -1)[:, :, None], axis=2,
        )
        # (put_along_axis writes -1 into the next slot of non-extending
        # branches; harmless — blen doesn't advance, and position blen is
        # either overwritten later or stays past-end padding)
        br[a] = ba
        blen[a] += ext
        bmult[a] += np.where(ext, mult[fe], 0)

        # branch splits: extra valid out-slots spawn copies; new branch
        # (i, x) lands at slot nbr + prefix_extras(i) + (x-1), reproducing
        # the serial append order
        vs = np.argsort(~om, axis=2, kind="stable")  # valid slots first
        new_nbr = nbr[a] + extras.sum(axis=1)
        for x in range(1, 4):
            sm = ext & (outn - 1 >= x)
            if not sm.any():
                continue
            ci, ii = np.nonzero(sm)
            slot = (nbr[a] [ci] + pre[ci, ii] + (x - 1)).astype(np.int64)
            ok = slot < MB  # overflowing candidates die anyway
            ci, ii, slot = ci[ok], ii[ok], slot[ok]
            ee = succ_r[lasts[ci, ii], vs[ci, ii, x]]
            rows = a[ci]
            br[rows, slot] = br[rows, ii]
            br[rows, slot, blen[rows, ii] - 1] = ee
            blen[rows, slot] = blen[rows, ii]
            bmult[rows, slot] = (
                bmult[rows, ii] - mult[fe[ci, ii]] + mult[ee]
            )
        nbr[a] = np.minimum(new_nbr, MB)

        # ins-check: every >1-in-degree last must be reachable from within
        # the group — its valid predecessors must all equal some branch's
        # edge at position j-1 (branches long enough only)
        have2 = bidx < nbr[a, None]
        lasts2 = np.take_along_axis(
            br[a], np.maximum(blen[a] - 1, 0)[:, :, None], axis=2
        )[:, :, 0]
        lasts2 = np.where(have2, lasts2, 0)
        ins = pred[gord[lasts2]]  # [A, MB, 4]
        ins_ok = (ins >= 0) & valid[np.maximum(ins, 0)]
        ind = ins_ok.sum(-1)
        atj = np.where(
            (blen[a] > j - 1) & have2, br[a][:, :, j - 1], -2
        )  # [A, MB]
        member = (ins[:, :, :, None] == atj[:, None, None, :]).any(-1)
        bad_in = (
            have2[:, :, None] & (ind > 1)[:, :, None] & ins_ok & ~member
        ).any((1, 2))

        dead = over | bad_in
        # convergence: branch 0's last has out-degree 1 and all branches
        # coincide there
        end0 = lasts2[:, 0]
        outd_end = sv_r[end0].sum(-1)
        agree = (np.where(have2, lasts2, end0[:, None]) == end0[:, None]).all(1)
        c_now = (outd_end == 1) & agree & ~dead
        conv[a] |= c_now
        alive[a] &= ~(dead | c_now)

    conv &= br[:, 0, 0] != np.take_along_axis(
        br[:, 0], np.maximum(blen[:, 0] - 1, 0)[:, None], axis=1
    )[:, 0]
    return conv, br, blen, bmult, nbr


def _pop_stored(dbg: SdBG, marked: np.ndarray, br_c: np.ndarray,
                blen_c: np.ndarray, bmult_c: np.ndarray, n: int) -> bool:
    """_BranchGroup.pop() from a stored arena row."""
    best = 0
    best_mult = bmult_c[0]
    for i in range(1, n):
        if bmult_c[i] >= best_mult:
            best = i
            best_mult = bmult_c[i]
    locked = []
    for i in range(n):
        for j in range(1, int(blen_c[i]) - 1):
            e = br_c[i, j]
            if marked[e]:
                for r in locked:
                    marked[r] = False
                    dbg.invalid[r] = False
                return False
            marked[e] = True
            locked.append(e)
            dbg.invalid[e] = True
    for j in range(1, int(blen_c[best]) - 1):
        dbg.invalid[br_c[best, j]] = False
        marked[br_c[best, j]] = False
    return True


def _neighborhood(dbg: SdBG, br_c, blen_c, n) -> np.ndarray:
    """Edges whose validity the group's search consulted (conservative):
    the group's edges, all successor slots of its edges, and all
    predecessor rows of its edges' groups."""
    es = [br_c[i, : blen_c[i]] for i in range(n)]
    edges = np.unique(np.concatenate(es)) if es else np.zeros(0, np.int64)
    su = dbg.succ[edges].ravel()
    pr = dbg.pred[dbg.group_ordinal[edges]].ravel()
    allr = np.concatenate([edges, su[su >= 0], pr[pr >= 0]])
    return np.unique(allr)


def pop_bubbles(dbg: SdBG, max_branches: int = MAX_BRANCHES) -> int:
    max_bubble_len = dbg.k * 2 + 4
    marked = np.zeros(dbg.size, bool)

    # vectorized candidate screen: a branch group can only start at a valid
    # edge whose TARGET node branches 2..max_branches ways
    valid = ~dbg.invalid
    sv = (dbg.succ >= 0) & valid[np.maximum(dbg.succ, 0)]
    outd = sv.sum(1)
    queue = np.flatnonzero(valid & (outd >= 2) & (outd <= max_branches))

    num = 0
    waves = 0
    while len(queue) and waves < 64:
        waves += 1
        conv, br, blen, bmult, nbr = _search_all(
            dbg, queue, max_branches, max_bubble_len
        )
        found = np.flatnonzero(conv)
        popped_edges: list[np.ndarray] = []
        retry: list[int] = []
        dirty = np.zeros(dbg.size, bool)
        for c in found:
            n = int(nbr[c])
            if dirty[_neighborhood(dbg, br[c], blen[c], n)].any():
                # an earlier pop this wave touched this group's
                # neighborhood: its stored branches are stale — re-search
                # next wave on the mutated graph (the reference re-walks
                # every group before popping; we re-walk only these)
                retry.append(int(queue[c]))
                continue
            before = dbg.invalid.copy()
            if _pop_stored(dbg, marked, br[c], blen[c], bmult[c], n):
                num += 1
                dirty |= dbg.invalid != before
            else:
                retry.append(int(queue[c]))
        queue = np.asarray(retry, np.int64)
        if not dirty.any():
            # nothing changed this wave; remaining retries cannot succeed
            break
    if len(queue):
        # the 64-wave cap bound (has never fired on any tested workload);
        # surface the drop instead of silently leaving bubbles unpopped
        import logging

        logging.getLogger(__name__).warning(
            "pop_bubbles: wave cap hit with %d convergent candidates "
            "still queued (left unpopped)", len(queue),
        )
    return num
