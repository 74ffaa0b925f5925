"""Post-assembly processing (L8): dereplication, identity clustering,
chimera screening, nearest-reference matching.

In-process equivalent of the reference's external post_proc.sh toolchain
(bin/post_proc.sh: RDPTools Clustering derep / dmatrix / cluster /
rep-seqs, UCHIME chimera removal, optional FrameBot nearest-match), emitting
the same per-gene directory layout so downstream consumers find the files
they expect:

    <gene>/proc_prot_merged_rmdup.fasta      dereplicated proteins
    <gene>/cluster/proc_prot_rep_seqs.fasta  cluster representatives (aa)
    <gene>/cluster/proc_nucl_rep_seqs.fasta  matching nucleotide contigs
    <gene>/cluster/results.uchime.txt        chimera screen report
    <gene>/cluster/proc_final_nucl.fasta     final contigs (nucl)
    <gene>/cluster/proc_final_prot.fasta     final contigs (aa)
    <gene>/proc_framebot.txt                 nearest reference + identity

Algorithms (self-contained; the Java/UCHIME externals are replaced by
equivalent-in-spirit vectorized routines):
  * derep: exact-duplicate and exact-substring removal (Clustering.jar
    derep + ReadSeq rm-dupseq -d).
  * clustering: complete-linkage at `dist_cutoff` protein distance over a
    banded-alignment identity matrix (Clustering.jar dmatrix -c/cluster;
    the banded distance mirrors the reference's own contig-similarity
    check, src/unitig_graph.cpp:152-202), representatives = longest member.
  * chimera screen: split-half nearest-reference test (UCHIME-style
    parents): flagged when each half matches a DIFFERENT reference by a
    margin while the full-length match is worse than both halves.
  * nearest match: per final contig, the closest reference alignment row
    (FrameBot's reporting role) with percent identity.
"""

from __future__ import annotations

import os

import numpy as np

from ..io.fastx import read_fastx, write_fasta

__all__ = ["post_process_gene", "identity", "cluster_sequences"]


_INF = 99999999


def identity(a: str, b: str, min_similar: float = 0.5) -> float:
    """Banded edit-distance identity in [0, 1] with the reference's own
    GetSimilarity semantics (src/unitig_graph.cpp:152-202): band =
    max(n, m) * (1 - min_similar); 0.0 when the band cannot contain an
    alignment; otherwise 1 - edits / max(n, m)."""
    if not a or not b:
        return 0.0
    if a == b:
        return 1.0
    enc = [
        np.frombuffer(a.upper().encode(), np.uint8),
        np.frombuffer(b.upper().encode(), np.uint8),
    ]
    d = banded_identity_batch(
        enc, np.array([[0, 1]]), min_similar
    )
    return float(d[0])


def banded_identity_batch(
    enc: list, pairs: np.ndarray, min_similar: float,
    threshold_only: bool = False,
) -> np.ndarray:
    """GetSimilarity for many pairs at once, vectorized ACROSS pairs.

    enc: list of uint8-encoded sequences; pairs: [P, 2] index pairs.
    Returns [P] identities. The banded Levenshtein rows run as [P, W]
    numpy ops (W = 2*Kmax+1); the within-row left-move dependency
    dp[j] <= dp[j-1]+1 closes via a prefix-min of (dp[d] - d) + d, so a
    row is O(1) numpy passes instead of a Python scan per cell."""
    P = len(pairs)
    if P == 0:
        return np.zeros(0, np.float64)
    lens = np.array([len(s) for s in enc], np.int64)
    na = lens[pairs[:, 0]]
    nb = lens[pairs[:, 1]]
    mx = np.maximum(na, nb)
    K = (mx * (1.0 - min_similar)).astype(np.int64)  # (int) truncation
    feasible = (np.abs(na - nb) <= K) & (K >= 1)
    out = np.zeros(P, np.float64)
    if not feasible.any():
        return out
    sel = np.flatnonzero(feasible)
    na, nb, K = na[sel], nb[sel], K[sel]
    Pn = len(sel)
    Kmax = int(K.max())
    W = 2 * Kmax + 1
    n_max = int(na.max())

    # pad the a/b sides into dense int32 blocks
    amat = np.zeros((Pn, n_max), np.int32)
    bmat = np.zeros((Pn, int(nb.max())), np.int32)
    for r, p in enumerate(sel):
        amat[r, : na[r]] = enc[pairs[p, 0]]
        bmat[r, : nb[r]] = enc[pairs[p, 1]]

    dcol = np.arange(W, dtype=np.int32)[None, :]  # band column index
    off = dcol - Kmax  # j - i
    in_band = np.abs(off) <= K[:, None]  # per-pair band mask

    # row 0: dp[IDX(j, 0)] = j for 0 <= j <= K
    dp = np.where(in_band & (off >= 0), off, _INF).astype(np.int32)
    final_d = ((nb - na) + Kmax).astype(np.int64)
    outs = sel.copy()  # output slot of each still-active pair
    mxs = mx[sel]

    i = 1
    while dp.shape[0] and i <= n_max:
        Pa = dp.shape[0]
        j = off + i  # [Pa, W] the j coordinate of each band cell
        valid = in_band & (j >= 1) & (j <= nb[:, None])
        bj = bmat[np.arange(Pa)[:, None], np.clip(j - 1, 0, bmat.shape[1] - 1)]
        subc = (amat[:, i - 1][:, None] != bj).astype(np.int32)
        diag = dp + subc  # dp[(i-1)][IDX(j-1, i-1)] is the SAME band column
        up = np.concatenate(
            [dp[:, 1:], np.full((Pa, 1), _INF, np.int32)], axis=1
        ) + 1  # dp[(i-1)][IDX(j, i-1)] = previous row, column d+1
        base = np.minimum(diag, up)
        # j == 0 boundary: dp[IDX(0, i)] = i while i <= K
        bnd = (j == 0) & (i <= K[:, None]) & in_band
        base = np.where(bnd, i, base)
        base = np.where(valid | bnd, base, _INF)
        # left move: closure dp[d] = min_{d'<=d}(base[d'] + (d - d'))
        t = np.minimum.accumulate(base - dcol, axis=1)
        dp = np.minimum(base, t + dcol)
        dp = np.minimum(dp, _INF)

        hit = na == i
        if hit.any():
            r = dp[hit, final_d[hit]]
            okh = r < _INF
            out[outs[hit][okh]] = 1.0 - r[okh] / mxs[hit][okh]
        # compaction: pairs past their own na are done; with
        # threshold_only (the clustering predicate — only "identity >=
        # min_similar?" matters) also prune pairs whose banded row-min
        # already exceeds K: the row-min is non-decreasing in i, so they
        # can never come back under the threshold. Most cross-family
        # pairs die within ~K rows, collapsing the all-pairs cost.
        if (i & 7) == 0 or hit.any():
            live = na > i
            if threshold_only:
                live &= dp.min(axis=1) <= K
            if not live.all():
                dp, na, nb, K, in_band = (
                    dp[live], na[live], nb[live], K[live], in_band[live]
                )
                amat, bmat = amat[live], bmat[live]
                final_d, outs, mxs = final_d[live], outs[live], mxs[live]
        i += 1
    return out


def _derep(records: list) -> list:
    """Exact-duplicate + exact-substring dereplication, longest first."""
    order = sorted(records, key=lambda r: (-len(r.seq), r.name))
    kept: list = []
    for r in order:
        s = r.seq.upper()
        if any(s in k.seq.upper() for k in kept):
            continue
        kept.append(r)
    return kept


def cluster_sequences(
    seqs: list[str], dist_cutoff: float = 0.01
) -> list[list[int]]:
    """Complete-linkage clustering at distance <= dist_cutoff (identity >=
    1 - cutoff); returns clusters as index lists (first = representative =
    longest member)."""
    n = len(seqs)
    if n == 0:
        return []
    thr = 1.0 - dist_cutoff
    # banded identity at min_similar=thr: pairs below the threshold come
    # back 0 (band exceeded), pairs above are exact — precisely the
    # linkage predicate. Pairwise matrix built in vectorized batches.
    enc = [np.frombuffer(s.upper().encode(), np.uint8) for s in seqs]
    lens = np.array([len(s) for s in enc], np.int64)
    ii, jj = np.triu_indices(n, k=1)
    K = (np.maximum(lens[ii], lens[jj]) * dist_cutoff).astype(np.int64)
    keep = np.abs(lens[ii] - lens[jj]) <= K
    ii, jj = ii[keep], jj[keep]
    dist_ok = np.zeros((n, n), bool)
    np.fill_diagonal(dist_ok, True)
    CH = 1 << 17
    for s in range(0, len(ii), CH):
        pp = np.stack([ii[s : s + CH], jj[s : s + CH]], axis=1)
        ids = banded_identity_batch(enc, pp, thr, threshold_only=True)
        ok = ids >= thr
        dist_ok[pp[ok, 0], pp[ok, 1]] = True
        dist_ok[pp[ok, 1], pp[ok, 0]] = True
    clusters: list[list[int]] = []
    order = sorted(range(n), key=lambda i: -len(seqs[i]))
    assigned = np.full(n, -1)
    for i in order:
        placed = False
        for ci, members in enumerate(clusters):
            if all(dist_ok[i, m] for m in members):  # complete linkage
                members.append(i)
                assigned[i] = ci
                placed = True
                break
        if not placed:
            assigned[i] = len(clusters)
            clusters.append([i])
    return clusters


def _nearest_reference(seq: str, refs: list[tuple[str, str]]):
    best_name, best_id = "", 0.0
    for name, ref in refs:
        v = identity(seq, ref)
        if v > best_id:
            best_name, best_id = name, v
    return best_name, best_id


def _chimera_screen(seqs: list, refs: list[tuple[str, str]], margin=0.05):
    """Split-half parent test: flag when the halves' best references
    differ and each half beats the full-length identity by `margin`."""
    flags = []
    for r in seqs:
        s = r.seq.upper()
        if len(s) < 40 or len(refs) < 2:
            flags.append(False)
            continue
        half = len(s) // 2
        # halves compare against proportional reference halves: the banded
        # identity normalizes by max(n, m), so a half against a full-length
        # reference would be length-penalized into meaninglessness
        frac = half / len(s)
        cut = lambda ref: max(1, int(round(len(ref) * frac)))  # noqa: E731
        refs_l = [(n_, ref[: cut(ref)]) for n_, ref in refs]
        refs_r = [(n_, ref[cut(ref) :]) for n_, ref in refs]
        n_full, i_full = _nearest_reference(s, refs)
        n_a, i_a = _nearest_reference(s[:half], refs_l)
        n_b, i_b = _nearest_reference(s[half:], refs_r)
        flags.append(
            n_a != n_b
            and i_a >= i_full + margin
            and i_b >= i_full + margin
        )
    return flags


def post_process_gene(
    gene_dir: str,
    ref_aligned: list[tuple[str, str]] | None = None,
    dist_cutoff: float = 0.01,
    prefix: str = "proc",
) -> dict:
    """Run the full L8 stage for one gene directory containing
    nucl_merged.fasta / prot_merged.fasta; returns summary counts."""
    nucl = {r.name: r for r in read_fastx(os.path.join(gene_dir, "nucl_merged.fasta"))}
    prot = list(read_fastx(os.path.join(gene_dir, "prot_merged.fasta")))
    refs = [
        (n, s.upper().replace("-", "").replace(".", ""))
        for n, s in (ref_aligned or [])
    ]

    rmdup = _derep(prot)
    write_fasta(
        os.path.join(gene_dir, f"{prefix}_prot_merged_rmdup.fasta"),
        [(r.name, r.seq) for r in rmdup],
    )

    cdir = os.path.join(gene_dir, "cluster")
    os.makedirs(cdir, exist_ok=True)
    clusters = cluster_sequences([r.seq.upper() for r in rmdup], dist_cutoff)
    reps = [rmdup[c[0]] for c in clusters]
    write_fasta(
        os.path.join(cdir, f"{prefix}_prot_rep_seqs.fasta"),
        [(r.name, r.seq) for r in reps],
    )
    nucl_reps = [nucl[r.name] for r in reps if r.name in nucl]
    write_fasta(
        os.path.join(cdir, f"{prefix}_nucl_rep_seqs.fasta"),
        [(r.name, r.seq) for r in nucl_reps],
    )

    flags = _chimera_screen(reps, refs)
    with open(os.path.join(cdir, "results.uchime.txt"), "w") as f:
        for r, fl in zip(reps, flags):
            f.write(f"{r.name}\t{'Y' if fl else 'N'}\n")
    final = [r for r, fl in zip(reps, flags) if not fl]
    final_names = {r.name for r in final}
    write_fasta(
        os.path.join(cdir, f"{prefix}_final_prot.fasta"),
        [(r.name, r.seq) for r in final],
    )
    write_fasta(
        os.path.join(cdir, f"{prefix}_final_nucl.fasta"),
        [(r.name, r.seq) for r in nucl_reps if r.name in final_names],
    )

    with open(os.path.join(gene_dir, f"{prefix}_framebot.txt"), "w") as f:
        for r in final:
            name, ident = _nearest_reference(r.seq.upper(), refs)
            f.write(f"{r.name}\t{name}\t{ident:.4f}\n")

    return {
        "input": len(prot),
        "rmdup": len(rmdup),
        "clusters": len(clusters),
        "chimeras": int(sum(flags)),
        "final": len(final),
    }
