"""Gene model resource construction (profile HMMs from alignments).

The reference pipeline consumes externally-built HMMER files
(for_enone.hmm / rev_enone.hmm, produced by bin/prepare_gene_ref.sh with
hmmbuild on the forward and the column-reversed alignment). This module is a
self-contained miniature hmmbuild: maximum-likelihood counts with Laplace
pseudocounts, emitted in HMMER3/b text format so both this framework and the
reference C++ parser read identical tables. Used for synthesizing test gene
resources and for users without HMMER installed.
"""

from __future__ import annotations

import os

import numpy as np

from ..constants import AA_ALPHABET
from ..hmm.parser import write_hmm
from ..io.fastx import write_fasta

__all__ = ["build_hmm_tables", "build_gene_resource"]

_AA_IDX = {c: i for i, c in enumerate(AA_ALPHABET)}


def build_hmm_tables(
    aligned: list[str],
    emission_pseudo: float = 1.0,
    trans_pseudo: float = 0.1,
):
    """Count-based profile HMM tables from an aligned set of sequences.

    Columns with residues in >= 50% of rows are match columns (hmmbuild's
    fast rule); lowercase/'.' columns are always insert columns.
    Returns (match_probs [L+1, 20], insert_probs [L+1, 20],
    trans_probs [L+1, 7], compo [20], match_cols).
    """
    width = len(aligned[0])
    n = len(aligned)
    is_insert_col = np.zeros(width, bool)
    residue_frac = np.zeros(width)
    for j in range(width):
        col = [s[j] for s in aligned]
        if any(c.islower() or c == "." for c in col):
            is_insert_col[j] = True
        residue_frac[j] = sum(c.isupper() for c in col) / n
    match_cols = [
        j for j in range(width) if not is_insert_col[j] and residue_frac[j] >= 0.5
    ]
    L = len(match_cols)
    A = 20

    m_counts = np.full((L + 1, A), emission_pseudo, np.float64)
    t_counts = np.full((L + 1, 7), trans_pseudo, np.float64)

    col_state = {c: k + 1 for k, c in enumerate(match_cols)}
    for s in aligned:
        # per-row state path over model states 0..L
        prev_kind = "m"  # state 0 acts as a match (begin) state
        prev_state = 0
        j = 0
        path = []  # (kind, model_state)
        for j in range(width):
            ch = s[j]
            if j in col_state:
                k = col_state[j]
                if ch.isupper() and ch in _AA_IDX:
                    m_counts[k, _AA_IDX[ch]] += 1
                    path.append(("m", k))
                else:
                    path.append(("d", k))
            else:
                if ch.isalpha():
                    path.append(("i", prev_state if not path else path[-1][1]))
        # transition counts
        kind_prev, state_prev = "m", 0
        for kind, k in path:
            col = {
                ("m", "m"): 0, ("m", "i"): 1, ("m", "d"): 2,
                ("i", "m"): 3, ("i", "i"): 4,
                ("d", "m"): 5, ("d", "d"): 6,
            }.get((kind_prev, kind))
            if col is not None:
                t_counts[state_prev if kind_prev != "i" else state_prev, col] += 1
            kind_prev = kind
            state_prev = k if kind != "i" else state_prev
        # exit transition to end treated as M->M out of state L
        if state_prev == L:
            t_counts[L, 0] += 1

    match_probs = m_counts / m_counts.sum(axis=1, keepdims=True)
    match_probs[0] = 0.0
    compo = m_counts[1:].sum(axis=0)
    compo = compo / compo.sum()
    insert_probs = np.tile(compo, (L + 1, 1))

    trans_probs = np.zeros((L + 1, 7))
    mm = t_counts[:, 0:3].sum(axis=1)
    trans_probs[:, 0:3] = t_counts[:, 0:3] / mm[:, None]
    im = t_counts[:, 3:5].sum(axis=1)
    trans_probs[:, 3:5] = t_counts[:, 3:5] / im[:, None]
    dm = t_counts[:, 5:7].sum(axis=1)
    trans_probs[:, 5:7] = t_counts[:, 5:7] / dm[:, None]
    # final state cannot delete/insert further in this simple model
    trans_probs[L, 2] = 0.0
    trans_probs[L, 0:2] /= trans_probs[L, 0:2].sum()
    trans_probs[L, 5] = 1.0
    trans_probs[L, 6] = 0.0
    return match_probs, insert_probs, trans_probs, compo, match_cols


def build_gene_resource(name: str, aligned_records, out_dir: str) -> dict:
    """Write {for,rev}_enone.hmm + ref_aligned.faa for a gene.

    aligned_records: [(seq_name, aligned_aa_string)]; the reverse HMM is
    built from the column-reversed alignment, mirroring
    bin/prepare_gene_ref.sh's hmmbuild invocation on the reversed alignment.
    """
    os.makedirs(out_dir, exist_ok=True)
    seqs = [seq for _, seq in aligned_records]
    paths = {
        "forward_hmm": os.path.join(out_dir, f"{name}_for_enone.hmm"),
        "reverse_hmm": os.path.join(out_dir, f"{name}_rev_enone.hmm"),
        "ref_aligned": os.path.join(out_dir, f"{name}_ref_aligned.faa"),
    }
    mp, ip, tp, compo, _ = build_hmm_tables(seqs)
    write_hmm(paths["forward_hmm"], name, mp, ip, tp, compo, AA_ALPHABET)
    mp_r, ip_r, tp_r, compo_r, _ = build_hmm_tables([s[::-1] for s in seqs])
    write_hmm(paths["reverse_hmm"], name, mp_r, ip_r, tp_r, compo_r, AA_ALPHABET)
    write_fasta(paths["ref_aligned"], aligned_records)
    return paths
