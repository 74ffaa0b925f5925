"""SdBG construction: reads -> sorted BOSS rows -> SdBG arrays.

Whole-array re-design of the reference's CX1 two-stage bucketed substring
sort (src/cx1.h:443, src/cx1_read2sdbg_s2.cpp): instead of 65536-bucket
multi-pass radix sorting of per-occurrence substrings, we
  1. extract every (k+1)-mer window of every read (+ reverse complements,
     palindromes once) as packed integers           [s2_lv0/lv1 equivalent]
  2. sort + run-length-encode to distinct edges with multiplicities
     (the reference's per-(S,a,b)-run collapse, s2 output_ :742-835)
  3. derive the BOSS row set directly from the distinct-edge relation:
       solid rows   : one per edge, in colex(source node) order
       $-out rows   : nodes with outdegree 0 (left-$ emission + has_solid_a
                      dedup, s2 :536-544, :814-820)
       tip rows     : nodes with indegree 0 (right-$ emission + has_solid_b
                      dedup, s2 :556-564, :804-812)
  4. one global lexsort on (reverse(node)|$, out-char) 3-bit keys replaces
     the bucket pipeline; W flags, last bits and f[] fall out of run ids.

The sort itself is delegated to sort_rows() so the same construction can run
with numpy (host) or jax.lax.sort (device, sharded by key prefix).

Semantics preserved from the reference:
  * an edge's multiplicity counts occurrences on both strands (canonical
    double emission, s2_lv0_calc_bucket_size :276-299)
  * with min_count == 1 every window is solid (kmin_1pass path,
    build_graph.cpp via megagta.py:274-276)
  * min_count > 1 keeps edges with count >= min_count; mercy k-mers
    (read-rescue) are handled in mercy.py and OR-ed into the solid set.
"""

from __future__ import annotations

import numpy as np

from ..io.read_lib import ReadPackage
from ..ops.dna import pack_kmers, revcomp, sliding_windows
from .sdbg import SdBG

__all__ = ["build_sdbg", "edges_from_reads"]


def _argsort_rows(keys: np.ndarray) -> np.ndarray:
    """Lexicographic argsort of [N, W] uint64 rows; native radix sort when
    available (megagta_tpu/native/radix_sort.cpp), numpy lexsort otherwise."""
    if len(keys) >= (1 << 16):
        from ..native import radix_argsort

        perm = radix_argsort(keys)
        if perm is not None:
            return perm
    return np.lexsort(tuple(keys[:, j] for j in range(keys.shape[1] - 1, -1, -1)))


def _pack3(chars: np.ndarray) -> np.ndarray:
    """Pack [N, L] small-int chars (0..7) into [N, ceil(L/21)] uint64 keys,
    big-endian by char so tuple order == lexicographic char order."""
    n, L = chars.shape
    W = (L + 20) // 21
    out = np.zeros((n, W), dtype=np.uint64)
    c = chars.astype(np.uint64)
    for j in range(L):
        w, r = divmod(j, 21)
        out[:, w] |= c[:, j] << np.uint64(3 * (20 - r))
    return out


def edges_from_reads(
    package: ReadPackage,
    k: int,
    min_count: int = 1,
    solid_mask: np.ndarray | None = None,
    num_assist: int = 0,
):
    """Distinct (k+1)-mer edges with multiplicities.

    Args:
      solid_mask: optional [num_windows_total] bool (per fwd window) marking
        solid windows (mercy); when None and min_count == 1, all windows are
        solid. Assist reads (the trailing `num_assist` reads) are always
        solid (reference: s2 :276 `read_id >= num_short_reads`).
    Returns:
      (edges [Ne, k+1] int8 codes, mult [Ne] int32)
    """
    win, read_id, _ = sliding_windows(package.flat, package.starts, k + 1)
    if solid_mask is not None:
        keep = solid_mask.copy()
        if num_assist:
            keep |= read_id >= (package.num_reads - num_assist)
        win = win[keep]
    rc = revcomp(win, axis=1)
    is_palin = (win == rc).all(axis=1)
    both = np.concatenate([win, rc[~is_palin]], axis=0)

    packed = pack_kmers(both, k + 1)
    order = _argsort_rows(packed)
    sp = packed[order]
    new_run = np.ones(len(sp), dtype=bool)
    if len(sp) > 1:
        new_run[1:] = (sp[1:] != sp[:-1]).any(axis=1)
    run_starts = np.flatnonzero(new_run)
    mult = np.diff(np.append(run_starts, len(sp))).astype(np.int32)
    edges = both[order[run_starts]]
    if min_count > 1 and solid_mask is None:
        keep = mult >= min_count
        edges, mult = edges[keep], mult[keep]
    return edges, mult


def _merge_runs(acc, acc_m, new, new_m):
    """Merge two sorted distinct (keys [N, W] uint64, mult) relations."""
    allk = np.concatenate([acc, new])
    allm = np.concatenate([acc_m, new_m]).astype(np.int64)
    order = _argsort_rows(allk)
    sk = allk[order]
    sm = allm[order]
    new_run = np.ones(len(sk), bool)
    if len(sk) > 1:
        new_run[1:] = (sk[1:] != sk[:-1]).any(axis=1)
    starts = np.flatnonzero(new_run)
    mult = np.add.reduceat(sm, starts) if len(starts) else sm[:0]
    return sk[new_run], mult


def edges_from_reads_streaming(
    package: ReadPackage,
    k: int,
    min_count: int = 1,
    batch_reads: int = 4_000_000,
    engine: str = "host",
    solid_mask: np.ndarray | None = None,
    num_assist: int = 0,
):
    """RAM-bounded counting: reads stream through window extraction in
    batches (the reference's 4M-read ingestion batches + RAM-budgeted CX1
    passes, src/read_lib_functions-inl.h:178-179, cx1.h:125-202); per-batch
    distinct-edge runs are merged into a running sorted relation, so peak
    memory is one batch's occurrence multiset + the distinct set — never
    the whole dataset's windows. engine="device" counts each batch on the
    accelerator (graph/device_builder phase 1)."""
    acc_k = None
    acc_m = None
    win_base = None
    if solid_mask is not None:
        nwin = np.maximum(package.lengths - k, 0)
        win_base = np.concatenate([[0], np.cumsum(nwin)])
    for lo in range(0, package.num_reads, batch_reads):
        hi = min(lo + batch_reads, package.num_reads)
        sub = package.read_slice(lo, hi)
        sub_mask = None
        sub_assist = 0
        if solid_mask is not None:
            sub_mask = solid_mask[win_base[lo] : win_base[hi]]
            n_short = package.num_reads - num_assist
            sub_assist = max(0, hi - max(lo, n_short))
        if engine == "device":
            import jax.numpy as jnp

            from .device_builder import _padded_window_mask, _phase1

            padded, lens = sub.padded()
            wm = None
            if sub_mask is not None:
                wm = jnp.asarray(
                    _padded_window_mask(
                        sub, k + 1, padded.shape[1] - k, sub_mask, sub_assist
                    )
                )
            from ..ops.kmer_device import pack_reads_host

            keys, mult_d, n_edges_d = _phase1(
                jnp.asarray(pack_reads_host(padded)), jnp.asarray(lens),
                k + 1, 1, wm, prepacked=True,
            )
            n = int(n_edges_d)
            kk = np.asarray(keys[:n])  # [n, 3] uint32 big-endian 96-bit
            bm = np.asarray(mult_d[:n]).astype(np.int64)
            # 3x32 -> uint64 word keys (same big-endian char order)
            from ..ops.dna import kmer_words

            bk = np.zeros((n, 2), np.uint64)
            bk[:, 0] = (kk[:, 0].astype(np.uint64) << np.uint64(32)) | kk[
                :, 1
            ].astype(np.uint64)
            bk[:, 1] = kk[:, 2].astype(np.uint64) << np.uint64(32)
            bk = bk[:, : kmer_words(k + 1)]
        else:
            edges, bm = edges_from_reads(
                sub, k, 1, solid_mask=sub_mask, num_assist=sub_assist
            )
            bk = pack_kmers(edges, k + 1)
        if acc_k is None:
            acc_k, acc_m = bk, bm
        else:
            acc_k, acc_m = _merge_runs(acc_k, acc_m, bk, bm)
    if acc_k is None:
        return np.zeros((0, k + 1), np.int8), np.zeros(0, np.int32)
    if min_count > 1 and solid_mask is None:
        # a solid mask already encodes solidity (edges_from_reads:103)
        keep = acc_m >= min_count
        acc_k, acc_m = acc_k[keep], acc_m[keep]
    from ..ops.dna import unpack_kmers

    return unpack_kmers(acc_k, k + 1), acc_m.astype(np.int32)


def build_sdbg(
    package: ReadPackage,
    k: int,
    min_count: int = 1,
    solid_mask: np.ndarray | None = None,
    num_assist: int = 0,
    batch_reads: int | None = None,
) -> SdBG:
    if batch_reads and solid_mask is None and num_assist == 0:
        edges, mult = edges_from_reads_streaming(
            package, k, min_count, batch_reads
        )
    else:
        edges, mult = edges_from_reads(
            package, k, min_count, solid_mask, num_assist
        )
    return sdbg_from_edges(edges, mult, k)


def sdbg_from_edges(edges: np.ndarray, mult: np.ndarray, k: int) -> SdBG:
    """Build BOSS arrays from the distinct-edge relation."""
    ne = len(edges)
    if ne == 0:
        return SdBG(
            k=k,
            w=np.zeros(0, np.uint8),
            last=np.zeros(0, bool),
            is_tip=np.zeros(0, bool),
            mult=np.zeros(0, np.int32),
            f=np.zeros(6, np.int64),
            tip_labels=np.zeros((0, k - 1), np.int8),
        ).finalize()

    u = edges[:, :k]  # source nodes
    v = edges[:, 1:]  # target nodes
    u_keys = pack_kmers(u, k)
    v_keys = pack_kmers(v, k)

    # node set + degrees
    all_keys = np.concatenate([u_keys, v_keys], axis=0)
    nodes_sorted, node_index = _unique_rows(all_keys)
    out_deg = np.zeros(len(nodes_sorted), np.int64)
    in_deg = np.zeros(len(nodes_sorted), np.int64)
    np.add.at(out_deg, node_index[:ne], 1)
    np.add.at(in_deg, node_index[ne:], 1)

    from ..ops.dna import unpack_kmers

    node_codes = unpack_kmers(nodes_sorted, k)

    # ---- assemble row candidates ----------------------------------------
    # chars in 3-bit space: $=0, A..T = 1..4 (colex order with $ first)
    def colex_key(node_chars: np.ndarray, dollar_first: bool = False):
        """[N, k] codes -> [N, k] 3-bit chars, stored orientation
        (reverse of natural; fictitious $-nodes put $ in the last slot)."""
        rev = node_chars[:, ::-1] + 1
        return rev.astype(np.int8)

    # solid rows: group = u, within-group char = e[k]
    solid_group = colex_key(u)
    solid_rowpart = edges[:, k].astype(np.int8)  # 0..3

    # $-out rows: nodes with outdeg 0
    zero_out = node_codes[out_deg == 0]
    dollar_group = colex_key(zero_out)
    dollar_rowpart = np.full(len(zero_out), 4, np.int8)  # sorts after 0..3

    # tip rows: nodes with indeg 0; fictitious group = reverse(n[:k-1]) + $
    zero_in = node_codes[in_deg == 0]
    tip_group = np.zeros((len(zero_in), k), np.int8)
    tip_group[:, : k - 1] = zero_in[:, k - 2::-1] + 1
    tip_group[:, k - 1] = 0  # $
    tip_rowpart = np.zeros(len(zero_in), np.int8)

    groups = np.concatenate([solid_group, dollar_group, tip_group], axis=0)
    rowparts = np.concatenate([solid_rowpart, dollar_rowpart, tip_rowpart])
    n_solid, n_dollar, n_tip = len(solid_group), len(dollar_group), len(tip_group)

    # W out-char per row (1..4 for solid & tip, 0 for $-out)
    w_char = np.concatenate(
        [
            edges[:, k].astype(np.int64) + 1,
            np.zeros(n_dollar, np.int64),
            zero_in[:, k - 1].astype(np.int64) + 1,
        ]
    )
    row_mult = np.concatenate(
        [mult.astype(np.int32), np.ones(n_dollar, np.int32), np.ones(n_tip, np.int32)]
    )
    row_is_tip = np.concatenate(
        [np.zeros(n_solid, bool), np.zeros(n_dollar, bool), np.ones(n_tip, bool)]
    )
    # tip label payload index (into zero_in)
    tip_payload = np.full(len(groups), -1, np.int64)
    tip_payload[n_solid + n_dollar :] = np.arange(n_tip)

    # ---- global sort ------------------------------------------------------
    key_words = _pack3(np.concatenate([groups, rowparts[:, None]], axis=1))
    order = _argsort_rows(key_words)
    groups = groups[order]
    w_char = w_char[order]
    row_mult = row_mult[order]
    row_is_tip = row_is_tip[order]
    tip_payload = tip_payload[order]

    size = len(groups)
    # group boundaries: full k-char group label change
    gkeys = _pack3(groups)
    diff = np.ones(size, bool)
    if size > 1:
        diff[1:] = (gkeys[1:] != gkeys[:-1]).any(axis=1)
    # last = 1 on final row of each REAL group (is_tip rows excluded)
    next_diff = np.append(diff[1:], True)
    last = next_diff & ~row_is_tip

    # S-group boundaries: first k-1 group chars change (reference outputed_b
    # scope, s2 output_ :749-763)
    skeys = _pack3(groups[:, : k - 1])
    sdiff = np.ones(size, bool)
    if size > 1:
        sdiff[1:] = (skeys[1:] != skeys[:-1]).any(axis=1)
    s_id = np.cumsum(sdiff) - 1

    # W flag: +4 when the same out-char b (1..4) appeared earlier in the same
    # S-group (rows with w_char == 0 never flagged)
    w = w_char.copy()
    for b in range(1, 5):
        isb = w_char == b
        # first occurrence of b within each s-group
        seen_before = np.zeros(size, bool)
        if size:
            idx_b = np.flatnonzero(isb)
            if idx_b.size:
                first_in_group = np.ones(idx_b.size, bool)
                first_in_group[1:] = s_id[idx_b[1:]] != s_id[idx_b[:-1]]
                seen_before[idx_b[~first_in_group]] = True
        w[seen_before] = b + 4

    # f partitions by stored first char (node's last natural char + 1)
    first_char = groups[:, 0].astype(np.int64)  # 1..4 always (k >= 2)
    f = np.zeros(6, np.int64)
    for c in range(1, 6):
        f[c] = np.searchsorted(first_char, c)
    # (first_char is sorted ascending since it is the primary sort key)

    tip_rows = np.flatnonzero(row_is_tip)
    tip_labels = (
        zero_in[tip_payload[tip_rows], : k - 1].astype(np.int8)
        if tip_rows.size
        else np.zeros((0, k - 1), np.int8)
    )

    return SdBG(
        k=k,
        w=w.astype(np.uint8),
        last=last,
        is_tip=row_is_tip,
        mult=row_mult,
        f=f,
        tip_labels=tip_labels,
    ).finalize()


def _unique_rows(keys: np.ndarray):
    """Sorted-unique over [N, W] uint64 rows; returns (unique, inverse)."""
    order = _argsort_rows(keys)
    sk = keys[order]
    new_run = np.ones(len(sk), bool)
    if len(sk) > 1:
        new_run[1:] = (sk[1:] != sk[:-1]).any(axis=1)
    run_id = np.cumsum(new_run) - 1
    inverse = np.empty(len(keys), np.int64)
    inverse[order] = run_id
    return sk[new_run], inverse
