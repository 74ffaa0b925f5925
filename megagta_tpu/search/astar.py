"""Serial HMM-guided A* graph search — the exact-semantics oracle.

Faithful re-implementation of the reference search core
(src/hmm_graph_search.h, src/node_enumerator.h, src/a_star_node.h) used as
the correctness oracle for the batched TPU wavefront search
(search/wavefront.py) and for contig-equality tests:

  * weighted A* (w = 2) with fval = int(SCALE * (score + 2 * h))
    (node_enumerator.h:173)
  * priority order: max fval, then min state_no, then state m > d > i
    (a_star_node.h:34-83)
  * per-step enumeration walks 3 graph hops (one codon), emits match +
    insert nodes per non-stop codon and one delete node
    (node_enumerator.h:65-246)
  * pruning: open only if (length < 5 or negative_count <= prune_len) and
    real_score > 0 (hmm_graph_search.h:292-310)
  * intermediate-goal tracking by (real_score + exit_prob[length]) / log 2,
    exit_prob[l] = 2 * log(2 / (l + 2)) (hmm_graph_search.h:48-51, 262-277)
  * term-node cross-seed memoization constraining re-expansion
    (hmm_graph_search.h:211-234, node_enumerator.h:146,178)
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass

import numpy as np

from ..constants import AA_STOP, CODON_TABLE, RC_CODON_TABLE, str_to_dna
from ..graph.sdbg import SdBG
from ..hmm.profile import DD, DM, IM, II, MD, MI, MM, NEG_INF, PROTEIN, ProfileHMM
from ..seeds.translate import translate_codes

SCALE = 10000
HWEIGHT = 2.0
LOG2 = math.log(2)

EXIT_PROB = np.array([math.log(2.0 / (i + 2)) * 2 for i in range(3000)])

_STATE_RANK = {"m": 3, "d": 2, "i": 1}

_INT_MIN = -(2**31)
_INT_MAX = 2**31 - 1


def _fval(x: float) -> int:
    """(int) cast with x86 semantics: out-of-range/non-finite -> INT_MIN
    (the reference's UB cast in node_enumerator.h:173 lands on 0x80000000)."""
    if not math.isfinite(x) or x < _INT_MIN or x > _INT_MAX:
        return _INT_MIN
    return int(x)


@dataclass
class AStarNode:
    parent: "AStarNode | None"
    state_no: int
    state: str  # 'm' | 'i' | 'd'
    node_id: int = -1
    score: float = 0.0
    real_score: float = 0.0
    max_score: float = 0.0
    fval: int = 0
    length: int = 0
    negative_count: int = 0
    indels: int = 0
    nucl_emission: int = 0
    emission: int = -1  # aa code
    partial: int = 0

    @property
    def identity(self):
        return (self.node_id, self.state, self.state_no)

    def priority_key(self):
        # heapq is a min-heap: invert fval and state rank
        return (-self.fval, self.state_no, -_STATE_RANK[self.state])

    def beats(self, other: "AStarNode") -> bool:
        """True when `other < self` per the reference comparator."""
        return other.priority_key() > self.priority_key()


@dataclass
class SearchStats:
    opened: int = 0
    popped: int = 0
    repeated: int = 0
    replaced: int = 0
    pruned: int = 0


class NodeEnumerator:
    """Per-HMM successor generation (reference NodeEnumerator)."""

    def __init__(self, hmm: ProfileHMM, heuristic: np.ndarray, low_cov_penalty: float):
        self.hmm = hmm
        self.h = heuristic  # [3, L+1] (m, i, d)
        self.low_cov_penalty = -math.log(low_cov_penalty)

    def enumerate(
        self,
        curr: AStarNode,
        forward: bool,
        dbg: SdBG,
        child: AStarNode | None = None,
    ) -> list[AStarNode]:
        hmm = self.hmm
        next_state = curr.state_no + 1
        if curr.state == "m":
            match_trans = hmm.trans[curr.state_no, MM]
            ins_trans = hmm.trans[curr.state_no, MI]
            del_trans = hmm.trans[curr.state_no, MD]
        elif curr.state == "d":
            match_trans = hmm.trans[curr.state_no, DM]
            ins_trans = NEG_INF
            del_trans = hmm.trans[curr.state_no, DD]
        else:
            match_trans = hmm.trans[curr.state_no, IM]
            ins_trans = hmm.trans[curr.state_no, II]
            del_trans = NEG_INF

        mme = hmm.mme[next_state] if hmm.normalized else 0.0
        ret: list[AStarNode] = []
        if curr.node_id == -1:
            return ret

        codon_tbl = CODON_TABLE if forward else RC_CODON_TABLE

        # 3-hop codon expansion (node_enumerator.h:98-128); row order matches
        # the reference's descending scan of each node group.
        w = dbg.w
        lvl1 = dbg.outgoing_edges(curr.node_id)
        for y1 in lvl1:
            c1 = (w[y1] - 4 if w[y1] > 4 else w[y1]) - 1
            lvl2 = dbg.outgoing_edges(y1)
            for y2 in lvl2:
                c2 = (w[y2] - 4 if w[y2] > 4 else w[y2]) - 1
                lvl3 = dbg.outgoing_edges(y2)
                for y3 in lvl3:
                    c3 = (w[y3] - 4 if w[y3] > 4 else w[y3]) - 1
                    aa = int(codon_tbl[c1, c2, c3])
                    if aa == AA_STOP:
                        continue
                    if child is not None and child.node_id != y3:
                        continue
                    all_multi1 = bool(
                        dbg.is_multi1[y1] and dbg.is_multi1[y2] and dbg.is_multi1[y3]
                    )
                    low_cov = self.low_cov_penalty if all_multi1 else 0.0
                    ne = (c1 << 6) | (c2 << 3) | c3

                    # ---- match node
                    m = AStarNode(curr, next_state, "m", node_id=y3)
                    m.real_score = curr.real_score + (
                        match_trans + hmm.msc[next_state, aa]
                    ) - low_cov
                    if m.real_score >= curr.max_score:
                        m.max_score = m.real_score
                        m.negative_count = 0
                    else:
                        m.max_score = curr.max_score
                        m.negative_count = curr.negative_count + 1
                    m.nucl_emission = ne
                    m.emission = aa
                    m.length = curr.length + 1
                    m.score = curr.score + (
                        match_trans + hmm.msc[next_state, aa]
                    ) - low_cov - mme
                    m.fval = _fval(SCALE * (m.score + HWEIGHT * self.h[0, next_state]))
                    m.indels = curr.indels
                    ret.append(m)
                    if child is not None and child.identity == m.identity:
                        return ret

                    # ---- insert node
                    if curr.state != "d":
                        isc = hmm.isc[next_state, aa]
                        ins = AStarNode(curr, curr.state_no, "i", node_id=y3)
                        ins.real_score = curr.real_score + (ins_trans + isc) - low_cov
                        ins.max_score = curr.max_score
                        ins.negative_count = curr.negative_count + 1
                        ins.nucl_emission = ne
                        ins.emission = aa
                        ins.length = curr.length + 1
                        ins.score = curr.score + (ins_trans + isc) - low_cov
                        ins.fval = _fval(
                            SCALE * (ins.score + HWEIGHT * self.h[1, curr.state_no])
                        )
                        ins.indels = curr.indels + 1
                        ret.append(ins)
                        if child is not None and child.identity == ins.identity:
                            return ret

        # ---- delete node
        if curr.state != "i":
            d = AStarNode(curr, next_state, "d", node_id=curr.node_id)
            d.real_score = curr.real_score + del_trans
            d.max_score = curr.max_score
            d.negative_count = curr.negative_count + 1
            d.nucl_emission = (4 << 6) | (4 << 3) | 4
            d.emission = -1
            d.length = curr.length
            d.score = curr.score + del_trans - mme
            d.fval = _fval(SCALE * (d.score + HWEIGHT * self.h[2, next_state]))
            d.indels = curr.indels + 1
            ret.append(d)

        return ret


class HMMGraphSearch:
    """Per-seed bidirectional search (reference HMMGraphSearch)."""

    def __init__(self, prune_len: int = 20):
        self.prune_len = prune_len
        self.stats = SearchStats()

    # -- scoring of the seed word (hmm_graph_search.h:112-130)
    @staticmethod
    def score_start(hmm: ProfileHMM, aa_codes, start_state: int):
        score = 0.0
        real = 0.0
        for i in range(1, len(aa_codes) + 1):
            m = hmm.msc[start_state + i, int(aa_codes[i - 1])]
            t = hmm.trans[start_state + i - 1, MM]
            real += m + t
            score += m + t - hmm.max_match_emission(start_state + i)
        return score, real

    def start_node(
        self, hmm: ProfileHMM, start_state: int, framed_word: str, forward: bool, dbg: SdBG
    ) -> AStarNode:
        codes = str_to_dna(framed_word)
        if hmm.alphabet == PROTEIN:
            aa = translate_codes(codes)
            if not forward:
                aa = aa[::-1]
            n_res = len(framed_word) // 3
        else:
            aa = codes
            n_res = len(framed_word)
        node = AStarNode(None, start_state + n_res, "m")
        node.length = n_res
        node.score, node.real_score = self.score_start(hmm, aa, start_state)
        node.fval = 0
        lookup = codes if forward else (3 - codes)[::-1]
        node.node_id = int(dbg.lookup_edge(lookup))
        return node

    def astar(
        self,
        hmm: ProfileHMM,
        start: AStarNode,
        dbg: SdBG,
        forward: bool,
        enumerator: NodeEnumerator,
        term_nodes: dict,
    ) -> AStarNode | None:
        """Returns the goal node, or None when no start expansion exists."""
        L = hmm.model_length
        if start.state_no >= L:
            return start

        open_heap: list[tuple] = []
        closed: set = set()
        open_hash: dict = {}
        counter = 0  # heap FIFO tie-break (C++ pq order is unspecified here)

        def push(node: AStarNode):
            nonlocal counter
            heapq.heappush(open_heap, (node.priority_key(), counter, node))
            counter += 1

        cached = term_nodes.get(start.identity)
        for nxt in enumerator.enumerate(start, forward, dbg, cached):
            push(nxt)
            self.stats.opened += 1
        if not open_heap:
            return None

        inter_goal = start

        def exit_val(n: AStarNode) -> float:
            l = min(n.length, len(EXIT_PROB) - 1)
            return (n.real_score + EXIT_PROB[l]) / LOG2

        while open_heap:
            _, _, curr = heapq.heappop(open_heap)
            self.stats.popped += 1
            if curr.identity in closed:
                continue

            if curr.state_no >= L:
                curr.partial = 0
                if exit_val(curr) > exit_val(inter_goal):
                    inter_goal = curr
                return self._highest_score_node(inter_goal)

            closed.add(curr.identity)
            if exit_val(curr) > exit_val(inter_goal):
                inter_goal = curr

            cached = term_nodes.get(curr.identity)
            for nxt in enumerator.enumerate(curr, forward, dbg, cached):
                open_node = False
                if self.prune_len > 0:
                    if (
                        nxt.length < 5 or nxt.negative_count <= self.prune_len
                    ) and nxt.real_score > 0.0:
                        got = open_hash.get(nxt.identity)
                        if got is not None:
                            self.stats.repeated += 1
                            if nxt.beats(got):
                                self.stats.replaced += 1
                                open_node = True
                        else:
                            open_node = True
                    else:
                        self.stats.pruned += 1
                else:
                    got = open_hash.get(nxt.identity)
                    if got is not None:
                        self.stats.repeated += 1
                        if nxt.beats(got):
                            self.stats.replaced += 1
                            open_node = True
                    else:
                        open_node = True
                if open_node:
                    open_hash[nxt.identity] = nxt
                    self.stats.opened += 1
                    push(nxt)

        inter_goal.partial = 1
        return self._highest_score_node(inter_goal)

    @staticmethod
    def _highest_score_node(inter_goal: AStarNode) -> AStarNode:
        goal = inter_goal
        node = inter_goal
        while node.parent is not None:
            node = node.parent
            if node.real_score > goal.real_score:
                goal = node
        return goal

    @staticmethod
    def traceback(goal: AStarNode, term_nodes: dict) -> str:
        """Emit codon nucleotides root->goal, caching path edges
        (partialResultFromGoal, hmm_graph_search.h:83-109)."""
        parts: list[str] = []
        node = goal
        while node.parent is not None:
            if node.state != "d":
                ne = node.nucl_emission
                tri = "".join(
                    "acgt-"[(ne >> (3 * i)) & 7] for i in (2, 1, 0)
                )
                parts.append(tri)
            term_nodes[node.parent.identity] = node
            node = node.parent
        return "".join(reversed(parts))


def search_seed(
    seed_nucl: str,
    start_state: int,
    fwd_hmm: ProfileHMM,
    rev_hmm: ProfileHMM,
    fwd_enum: NodeEnumerator,
    rev_enum: NodeEnumerator,
    dbg: SdBG,
    searcher: HMMGraphSearch,
    term_nodes: dict,
    term_nodes_rev: dict,
) -> str:
    """Bidirectional search for one seed; returns the contig nucleotides
    (left_rc + seed + right), reference search() (hmm_graph_search.h:60-81)."""
    divisor = 3 if fwd_hmm.alphabet == PROTEIN else 1

    start_f = searcher.start_node(fwd_hmm, start_state, seed_nucl, True, dbg)
    goal_f = searcher.astar(fwd_hmm, start_f, dbg, True, fwd_enum, term_nodes)
    right = searcher.traceback(goal_f, term_nodes) if goal_f else ""

    l_start = rev_hmm.model_length - start_state - len(seed_nucl) // divisor
    start_r = searcher.start_node(rev_hmm, l_start, seed_nucl, False, dbg)
    goal_r = searcher.astar(rev_hmm, start_r, dbg, False, rev_enum, term_nodes_rev)
    left = searcher.traceback(goal_r, term_nodes_rev) if goal_r else ""

    # reverse-complement the left extension (RevComp keeps lowercase)
    comp = {"a": "t", "c": "g", "g": "c", "t": "a", "-": "-"}
    left_rc = "".join(comp[c] for c in reversed(left))
    return left_rc + seed_nucl.lower() + right
