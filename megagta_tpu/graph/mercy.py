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

Memory model (v2, the reference's RAM-budgeted lv1/lv2 structure,
src/cx1.h:125-202): pass A streams read batches to build the three global
sorted occurrence-key tables (16 B per window — never the 45 B/window char
matrices); pass B streams batches again, materializing each batch's window
chars and 4-way extension queries only transiently and scattering per-k-mer
flags into global bool arrays; the gap rescue runs once, globally, over
bools. Peak RAM = key tables + one batch's transients.

Returns the per-window solid mask consumed by graph/builder.py and (for
device/sharded engines) graph/device_builder.py.
"""

from __future__ import annotations

import numpy as np

from ..io.read_lib import ReadPackage
from ..ops.dna import pack_kmers, revcomp, sliding_windows

__all__ = ["solid_windows_with_mercy"]


def _counts_for(keys_sorted, query_keys):
    """Occurrence count per query row against sorted key rows."""
    lo = _lexsearch(keys_sorted, query_keys, "left")
    hi = _lexsearch(keys_sorted, query_keys, "right")
    return hi - lo


def _lexsearch(sorted_keys, queries, side):
    """searchsorted for [N, W] uint64 rows (W <= 2 fast path)."""
    W = sorted_keys.shape[1]
    if W == 1:
        return np.searchsorted(sorted_keys[:, 0], queries[:, 0], side=side)
    s = np.ascontiguousarray(sorted_keys)
    q = np.ascontiguousarray(queries)
    dt = np.dtype([(f"w{i}", np.uint64) for i in range(W)])
    sv = s.view(dt).ravel()
    qv = q.view(dt).ravel()
    return np.searchsorted(sv, qv, side=side)


def _sort_rows(keys):
    order = np.lexsort(
        tuple(keys[:, j] for j in range(keys.shape[1] - 1, -1, -1))
    )
    return keys[order]


def solid_windows_with_mercy(
    package: ReadPackage,
    k: int,
    threshold: int,
    num_assist: int = 0,
    batch_reads: int | None = None,
) -> np.ndarray:
    lens = package.lengths
    R = package.num_reads
    num_short = R - num_assist
    nwin = np.maximum(lens - k, 0)
    win_base = np.concatenate([[0], np.cumsum(nwin)])
    n_win = int(win_base[-1])
    if n_win == 0:
        return np.zeros(0, bool)
    if threshold <= 1:
        return np.ones(n_win, bool)
    nkm = np.maximum(lens - k + 1, 0)
    km_base = np.concatenate([[0], np.cumsum(nkm)])
    total_k = int(km_base[-1])
    B = batch_reads or R

    # ---- pass A: global sorted occurrence tables, batch-streamed ---------
    occ_parts, nonend_parts, nonstart_parts = [], [], []
    for lo in range(0, R, B):
        hi = min(lo + B, R)
        sub = package.read_slice(lo, hi)
        win, rid, offs = sliding_windows(sub.flat, sub.starts, k + 1)
        if not len(win):
            continue
        rc = revcomp(win, axis=1)
        is_palin = (win == rc).all(axis=1)
        occ_parts.append(
            pack_kmers(np.concatenate([win, rc[~is_palin]], axis=0), k + 1)
        )
        has_next = offs + k + 1 < lens[lo + rid]
        has_prev = offs > 0
        ne = np.concatenate(
            [win[has_next], rc[~is_palin & has_prev]], axis=0
        )
        ns = np.concatenate(
            [win[has_prev], rc[~is_palin & has_next]], axis=0
        )
        if len(ne):
            nonend_parts.append(pack_kmers(ne, k + 1))
        if len(ns):
            nonstart_parts.append(pack_kmers(ns, k + 1))

    Wd = occ_parts[0].shape[1]
    cat = lambda ps: (  # noqa: E731
        np.concatenate(ps) if ps else np.zeros((0, Wd), np.uint64)
    )
    all_occ = _sort_rows(cat(occ_parts))
    nonend_sorted = _sort_rows(cat(nonend_parts))
    nonstart_sorted = _sort_rows(cat(nonstart_parts))
    del occ_parts, nonend_parts, nonstart_parts

    # ---- pass B: per-batch solidity + per-k-mer flag scatter -------------
    solid = np.zeros(n_win, bool)
    no_in = np.zeros(total_k, bool)
    no_out = np.zeros(total_k, bool)
    has_solid = np.zeros(total_k, bool)

    def mark(arrs, mask, idx):
        sel = idx[mask]
        for a in arrs:
            a[sel] = True

    for lo in range(0, R, B):
        hi = min(lo + B, R)
        sub = package.read_slice(lo, hi)
        win, rid, offs = sliding_windows(sub.flat, sub.starts, k + 1)
        if not len(win):
            continue
        gread = lo + rid
        gw = win_base[gread] + offs  # global window index
        cnt = _counts_for(all_occ, pack_kmers(win, k + 1))
        bsolid = cnt >= threshold
        if num_assist:
            bsolid = bsolid | (gread >= num_short)
        solid[gw] = bsolid

        # per-k-mer 4-way extension proxy/full counts for this batch
        km_win, km_rid, _ = sliding_windows(sub.flat, sub.starts, k)
        ext_left = np.zeros((len(km_win), 4, k + 1), np.int8)
        ext_left[:, :, 1:] = km_win[:, None, :]
        ext_left[:, :, 0] = np.arange(4, dtype=np.int8)[None, :]
        ext_right = np.zeros((len(km_win), 4, k + 1), np.int8)
        ext_right[:, :, :-1] = km_win[:, None, :]
        ext_right[:, :, -1] = np.arange(4, dtype=np.int8)[None, :]

        def pcount(sorted_occ, mats):
            keys = pack_kmers(mats.reshape(-1, k + 1), k + 1)
            return _counts_for(sorted_occ, keys).reshape(-1, 4)

        kmer_has_in = (pcount(nonend_sorted, ext_left) >= threshold).any(1)
        kmer_has_out = (pcount(nonstart_sorted, ext_right) >= threshold).any(1)
        kmer_solid_out = (pcount(all_occ, ext_right) >= threshold).any(1)
        kmer_solid_in = (pcount(all_occ, ext_left) >= threshold).any(1)
        del ext_left, ext_right

        # batch-local k-mer index of each window's left/right k-mer, and
        # the corresponding global indices for the flag scatters
        km_base_l = np.concatenate([[0], np.cumsum(nkm[lo:hi])])
        lk_l = km_base_l[rid] + offs
        lk = km_base[gread] + offs  # global left k-mer index
        rk = lk + 1
        short_w = gread < num_short
        ws = bsolid & short_w
        nsw = (~bsolid) & short_w
        h_in_l = kmer_has_in[lk_l]
        h_out_r = kmer_has_out[lk_l + 1]

        # solid windows
        mark((no_in, has_solid), ws & ~h_in_l, lk)
        mark((no_out, has_solid), ws & ~h_out_r, rk)
        # non-solid windows: left k-mer judged by (solid out-edge?, proxy in?)
        s_out_l = kmer_solid_out[lk_l]
        mark((has_solid,), nsw & s_out_l, lk)
        mark((no_in,), nsw & s_out_l & ~h_in_l, lk)
        mark((no_out, has_solid), nsw & ~s_out_l & h_in_l, lk)
        # non-solid windows: right k-mer judged by (solid in-edge?, proxy out?)
        s_in_r = kmer_solid_in[lk_l + 1]
        mark((has_solid,), nsw & s_in_r, rk)
        mark((no_out,), nsw & s_in_r & ~h_out_r, rk)
        mark((no_in, has_solid), nsw & ~s_in_r & h_out_r, rk)
        # solid windows flank their k-mers (s2 :210-214)
        has_solid[lk[ws]] = True
        has_solid[rk[ws]] = True

    # ---- gap rescue as a segmented last-event scan -----------------------
    # State after position i: last_no_out = i if no_out[i] (set wins over
    # the hs reset at the same i), -1 if hs[i], else carried. A rescue
    # fires at i when no_in[i] and the carried state is valid; it marks the
    # window range [state, i) — accumulated as interval coverage.
    km_read = np.repeat(np.arange(R), nkm)
    gi = np.arange(total_k, dtype=np.int64)
    seg_start = km_base[km_read]
    event = no_out | has_solid
    last_event = np.maximum.accumulate(np.where(event, gi, -1))
    j = np.where(last_event >= seg_start, last_event, -1)
    state = np.where((j >= 0) & no_out[np.maximum(j, 0)], j, -1)
    s_prev = np.empty(total_k, np.int64)
    if total_k:
        s_prev[0] = -1
        s_prev[1:] = state[:-1]
        s_prev[gi == seg_start] = -1

    res = no_in & (s_prev >= 0) & (km_read < num_short)
    mercy_solid = solid
    if res.any():
        r_ids = km_read[res]
        off = win_base[r_ids] - km_base[r_ids]
        w_start = s_prev[res] + off
        w_end = gi[res] + off
        d = np.zeros(n_win + 1, np.int64)
        np.add.at(d, w_start, 1)
        np.add.at(d, w_end, -1)
        mercy_solid = mercy_solid | (np.cumsum(d[:-1]) > 0)
    return mercy_solid
