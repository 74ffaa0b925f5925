"""A* heuristic: best-possible remaining score to model end.

The reference computes, for every (state_kind, state_no), a GREEDY forward
walk to the model end choosing max(match_step, delete_step) at each position
(insert is disabled by a forced -inf; src/most_probable_path.h:48-118). The
greedy choice at position i depends only on (previous state kind, i), so the
whole table is a 3-state backward recurrence — computed here as one
vectorized sweep instead of the reference's O(L^2) per-state walks.

h[kind, v] (kind 0='m', 1='i', 2='d') equals the reference's
computeHeuristicCost(kind, v) exactly, including the tie-break: delete is
taken only when strictly greater than match (reference :102-114).
"""

from __future__ import annotations

import numpy as np

from .profile import DD, DM, IM, MD, MM, NEG_INF, ProfileHMM

__all__ = ["heuristic_table"]


def heuristic_table(hmm: ProfileHMM) -> np.ndarray:
    """Returns h [3, L+1] float64; h[:, L] = 0."""
    L = hmm.model_length
    # best_match[i] = max_j msc(i, j); best at i=0 is -inf (unused)
    best_match = hmm.mme.copy() if hmm.normalized else np.max(hmm.msc, axis=1)
    mme = hmm.mme if hmm.normalized else np.zeros(L + 1)

    h = np.zeros((3, L + 2), dtype=np.float64)
    # g[kind, i] = greedy cost accumulated from step i..L given pre-state kind
    # step at position i uses transitions out of state i-1.
    for i in range(L, 0, -1):
        t = hmm.trans[i - 1]
        # per pre-state-kind (m, i, d) step values
        match_step = np.array([t[MM], t[IM], t[DM]]) + best_match[i] - mme[i]
        del_step = np.array([t[MD], NEG_INF, t[DD]]) - mme[i]
        take_del = del_step > match_step
        step = np.where(take_del, del_step, match_step)
        # next pre-state kind: 'd' (index 2) if delete taken else 'm' (0)
        nxt = np.where(take_del, h[2, i + 1], h[0, i + 1])
        h[:, i] = step + nxt
    return h[:, 1:]  # h[kind, v] = cost from v (table shifted: entry v uses steps v+1..L)
