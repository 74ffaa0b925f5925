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


def identity(a: str, b: str) -> float:
    """Alignment identity in [0, 1]: longest-common-subsequence matches
    over the shorter sequence's length.

    Row-vectorized LCS: per row, the diagonal candidate is prev[j-1] +
    match, the up move is prev[j], and the left move (which never adds
    score) collapses into one running max — so each row is three numpy
    passes over the other sequence. Plays the role of the reference
    toolchain's aligned-column identity (RDPTools dmatrix) and echoes the
    reference's own banded contig-similarity idea
    (src/unitig_graph.cpp:152-202)."""
    if not a or not b:
        return 0.0
    if a == b:
        return 1.0
    if len(a) > len(b):
        a, b = b, a
    av = np.frombuffer(a.encode(), np.uint8)
    bv = np.frombuffer(b.encode(), np.uint8)
    n, m = len(av), len(bv)
    prev = np.zeros(m + 1, np.int32)
    for i in range(n):
        cand = np.maximum(prev[1:], prev[:-1] + (av[i] == bv))
        prev = np.maximum.accumulate(np.concatenate(([prev[0]], cand)))
    return float(prev[-1]) / n


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
    dist_ok = np.zeros((n, n), bool)
    for i in range(n):
        dist_ok[i, i] = True
        for j in range(i + 1, n):
            ok = identity(seqs[i], seqs[j]) >= thr
            dist_ok[i, j] = dist_ok[j, i] = ok
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
        n_full, i_full = _nearest_reference(s, refs)
        n_a, i_a = _nearest_reference(s[:half], refs)
        n_b, i_b = _nearest_reference(s[half:], refs)
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
