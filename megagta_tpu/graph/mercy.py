"""Mercy k-mer rescue for min_count > 1 (the reference's stage-1 path).

Re-derivation of the two-stage mercy pipeline (candidate emission in
s1_lv2_output_, src/cx1_read2sdbg_s1.cpp:671-830; rescue in
s2_read_mercy_prepare, src/cx1_read2sdbg_s2.cpp:106-250) in read
coordinates. For every read window (k+1)-mer e at position p (left k-mer at
p, right k-mer at p+1):

  * count(e) = double-stranded occurrence count; e solid iff >= threshold.
  * solid windows mark is_solid[p]; when the left k-mer lacks any
    solid incoming edge -> no_in[p]; right k-mer lacks solid outgoing ->
    no_out[p+1]. "Has incoming/outgoing" uses the reference's read-adjacency
    proxy counts (occurrences that have a preceding/following character in
    their read, which is what count_prev_head/count_tail_next tally).
  * non-solid windows flag flanking k-mers that have a solid edge on one
    side (candidates with flag 0 -> has_solid, or no_in/no_out as above).
  * per read: a gap between a no_out k-mer and a later no_in k-mer with no
    solid k-mer in between gets its windows rescued (marked solid).

Returns the per-window solid mask consumed by graph/builder.py.
"""

from __future__ import annotations

import numpy as np

from ..io.read_lib import ReadPackage
from ..ops.dna import pack_kmers, revcomp, sliding_windows

__all__ = ["solid_windows_with_mercy"]


def _counts_for(keys_sorted, query_keys):
    """Occurrence count per query row against sorted key rows."""
    W = keys_sorted.shape[1]
    lo = np.zeros(len(query_keys), np.int64)
    hi = np.full(len(query_keys), len(keys_sorted), np.int64)
    # lexicographic searchsorted over multiword keys
    lo = _lexsearch(keys_sorted, query_keys, "left")
    hi = _lexsearch(keys_sorted, query_keys, "right")
    return hi - lo


def _lexsearch(sorted_keys, queries, side):
    """searchsorted for [N, W] uint64 rows (W <= 2 fast path)."""
    W = sorted_keys.shape[1]
    if W == 1:
        return np.searchsorted(sorted_keys[:, 0], queries[:, 0], side=side)
    # pack pairs of uint64 into one sort via structured dtype view
    s = np.ascontiguousarray(sorted_keys)
    q = np.ascontiguousarray(queries)
    dt = np.dtype([(f"w{i}", np.uint64) for i in range(W)])
    sv = s.view(dt).ravel()
    qv = q.view(dt).ravel()
    return np.searchsorted(sv, qv, side=side)


def solid_windows_with_mercy(
    package: ReadPackage, k: int, threshold: int, num_assist: int = 0
) -> np.ndarray:
    win, read_id, offs = sliding_windows(package.flat, package.starts, k + 1)
    n_win = len(win)
    if n_win == 0:
        return np.zeros(0, bool)
    lens = package.lengths
    num_short = package.num_reads - num_assist

    rc = revcomp(win, axis=1)
    is_palin = (win == rc).all(axis=1)

    def sorted_keys(mat):
        keys = pack_kmers(mat, k + 1)
        order = np.lexsort(tuple(keys[:, j] for j in range(keys.shape[1] - 1, -1, -1)))
        return keys[order]

    all_occ = sorted_keys(np.concatenate([win, rc[~is_palin]], axis=0))
    win_keys = pack_kmers(win, k + 1)
    cnt = _counts_for(all_occ, win_keys)
    solid = cnt >= threshold

    # assist windows are always solid and never judged (s1 :760, s2 :276)
    if num_assist:
        solid = solid | (read_id >= num_short)

    if threshold <= 1:
        return np.ones(n_win, bool)

    # ---- adjacency-proxy counts -----------------------------------------
    # occurrence has a following char (fwd) / preceding char (fwd):
    has_next = offs + k + 1 < lens[read_id]
    has_prev = offs > 0
    # strand-1 occurrence of rc(window): following in rc orientation is the
    # read's preceding char and vice versa
    nonend = np.concatenate([win[has_next], rc[~is_palin & has_prev]], axis=0)
    nonstart = np.concatenate([win[has_prev], rc[~is_palin & has_next]], axis=0)
    nonend_sorted = sorted_keys(nonend) if len(nonend) else np.zeros((0, win_keys.shape[1]), np.uint64)
    nonstart_sorted = sorted_keys(nonstart) if len(nonstart) else np.zeros((0, win_keys.shape[1]), np.uint64)

    # per window position p: left k-mer at p needs "has solid incoming" =
    # exists x with proxy-count(x + kmer) >= t; right k-mer needs outgoing.
    # Build per-k-mer-offset flags by querying the 4 possible extensions.
    km_win, km_read, km_off = sliding_windows(package.flat, package.starts, k)

    ext_left = np.zeros((len(km_win), 4, k + 1), np.int8)
    ext_left[:, :, 1:] = km_win[:, None, :]
    ext_left[:, :, 0] = np.arange(4, dtype=np.int8)[None, :]
    ext_right = np.zeros((len(km_win), 4, k + 1), np.int8)
    ext_right[:, :, :-1] = km_win[:, None, :]
    ext_right[:, :, -1] = np.arange(4, dtype=np.int8)[None, :]

    def proxy_count(sorted_occ, mats):
        flat = mats.reshape(-1, k + 1)
        keys = pack_kmers(flat, k + 1)
        return _counts_for(sorted_occ, keys).reshape(mats.shape[0], 4)

    in_cnt = proxy_count(nonend_sorted, ext_left)
    out_cnt = proxy_count(nonstart_sorted, ext_right)
    full_in_cnt = proxy_count(all_occ, ext_left)
    full_out_cnt = proxy_count(all_occ, ext_right)
    kmer_has_in = (in_cnt >= threshold).any(axis=1)
    kmer_has_out = (out_cnt >= threshold).any(axis=1)
    kmer_solid_out = (full_out_cnt >= threshold).any(axis=1)  # l_has_out
    kmer_solid_in = (full_in_cnt >= threshold).any(axis=1)  # r_has_in

    # ---- per-k-mer flags (global scatter-OR) -----------------------------
    # In the reference's per-position loop every window writes flags at its
    # left k-mer (offset p) and right k-mer (p+1) from precomputed inputs
    # only — no flag is read back — so the whole pass is a scatter-OR over
    # k-mer indices (s2 :150-208 semantics).
    win_base = np.concatenate([[0], np.cumsum(np.maximum(lens - k, 0))])
    km_base = np.concatenate([[0], np.cumsum(np.maximum(lens - k + 1, 0))])

    total_k = len(km_win)
    no_in = np.zeros(total_k, bool)
    no_out = np.zeros(total_k, bool)
    has_solid = np.zeros(total_k, bool)

    short_w = read_id < num_short
    lk = km_base[read_id] + offs  # global k-mer index left of each window
    rk = lk + 1
    ws = solid & short_w
    nsw = (~solid) & short_w
    h_in_l = kmer_has_in[lk]
    h_out_r = kmer_has_out[rk]

    def mark(arrs, mask, idx):
        sel = idx[mask]
        for a in arrs:
            a[sel] = True

    # solid windows
    mark((no_in, has_solid), ws & ~h_in_l, lk)
    mark((no_out, has_solid), ws & ~h_out_r, rk)
    # non-solid windows: left k-mer judged by (solid out-edge?, proxy in?)
    s_out_l = kmer_solid_out[lk]
    mark((has_solid,), nsw & s_out_l, lk)
    mark((no_in,), nsw & s_out_l & ~h_in_l, lk)
    mark((no_out, has_solid), nsw & ~s_out_l & h_in_l, lk)
    # non-solid windows: right k-mer judged by (solid in-edge?, proxy out?)
    s_in_r = kmer_solid_in[rk]
    mark((has_solid,), nsw & s_in_r, rk)
    mark((no_out,), nsw & s_in_r & ~h_out_r, rk)
    mark((no_in, has_solid), nsw & ~s_in_r & h_out_r, rk)

    # solid windows flank their k-mers (s2 :210-214)
    hs = has_solid
    hs[lk[ws]] = True
    hs[rk[ws]] = True

    # ---- gap rescue as a segmented last-event scan -----------------------
    # State after position i: last_no_out = i if no_out[i] (set wins over
    # the hs reset at the same i), -1 if hs[i], else carried. Equivalent to
    # "index of the last event <= i, if that event was a no_out". A rescue
    # fires at i when no_in[i] and the carried state is valid; it marks the
    # window range [state, i) — accumulated as interval coverage.
    gi = np.arange(total_k, dtype=np.int64)
    seg_start = km_base[km_read]
    event = no_out | hs
    last_event = np.maximum.accumulate(np.where(event, gi, -1))
    j = np.where(last_event >= seg_start, last_event, -1)  # clip to own read
    state = np.where((j >= 0) & no_out[np.maximum(j, 0)], j, -1)
    s_prev = np.empty(total_k, np.int64)
    if total_k:
        s_prev[0] = -1
        s_prev[1:] = state[:-1]
        s_prev[gi == seg_start] = -1

    res = no_in & (s_prev >= 0) & (km_read < num_short)
    mercy_solid = solid.copy()
    if res.any():
        r_ids = km_read[res]
        off = win_base[r_ids] - km_base[r_ids]
        w_start = s_prev[res] + off
        w_end = gi[res] + off
        d = np.zeros(n_win + 1, np.int64)
        np.add.at(d, w_start, 1)
        np.add.at(d, w_end, -1)
        mercy_solid |= np.cumsum(d[:-1]) > 0
    return mercy_solid
