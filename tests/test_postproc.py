"""L8 post-processing: dereplication, clustering, chimera screen, nearest
reference — the in-process equivalent of bin/post_proc.sh."""

import os

import numpy as np
import pytest

from megagta_tpu.io.fastx import read_fastx, write_fasta
from megagta_tpu.pipeline.postproc import (
    cluster_sequences,
    identity,
    post_process_gene,
)


def test_identity_basic():
    assert identity("MKV", "MKV") == 1.0
    assert identity("", "MKV") == 0.0
    assert identity("MKVA", "MKV") == pytest.approx(1.0)  # substring
    assert identity("MKVLL", "MKALL") == pytest.approx(4 / 5)
    # indel tolerance: one insertion
    assert identity("MKVLLQ", "MKVLLAQ") == pytest.approx(1.0)
    assert identity("AAAA", "CCCC") == 0.0


def test_cluster_complete_linkage():
    seqs = ["MKVLLQSTR" * 10, "MKVLLQSTR" * 10, "WWWHHHCCC" * 10]
    seqs[1] = seqs[1][:-1] + "A"  # one substitution: within 99%
    cl = cluster_sequences(seqs, dist_cutoff=0.05)
    assert sorted(sorted(c) for c in cl) == [[0, 1], [2]]
    cl = cluster_sequences(seqs, dist_cutoff=0.0)
    assert len(cl) == 3


def _write_gene_dir(tmp_path, nucl_prot_pairs):
    gdir = str(tmp_path / "geneX")
    os.makedirs(gdir, exist_ok=True)
    write_fasta(
        os.path.join(gdir, "nucl_merged.fasta"),
        [(n, s) for n, s, _ in nucl_prot_pairs],
    )
    write_fasta(
        os.path.join(gdir, "prot_merged.fasta"),
        [(n, p) for n, _, p in nucl_prot_pairs],
    )
    return gdir


def test_post_process_gene_layout(tmp_path):
    rng = np.random.default_rng(0)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    base = "".join(rng.choice(list(aas), 120))
    other = "".join(rng.choice(list(aas), 120))
    mut = base[:60] + "W" + base[61:]
    pairs = [
        ("c0", "atg" * 120, base),
        ("c1", "atg" * 120, base),          # exact duplicate -> dereplicated
        ("c2", "ccg" * 120, mut),           # 1 sub -> same 99% cluster
        ("c3", "ggt" * 120, other),         # distinct cluster
        ("c4", "ttt" * 40, base[:40]),      # substring -> dereplicated
    ]
    gdir = _write_gene_dir(tmp_path, pairs)
    refs = [("ref_base", base), ("ref_other", other)]
    stats = post_process_gene(gdir, refs, dist_cutoff=0.05)
    assert stats["input"] == 5
    assert stats["rmdup"] == 3  # c1 (dup) and c4 (substring) removed
    assert stats["clusters"] == 2
    assert stats["final"] == 2

    for rel in (
        "proc_prot_merged_rmdup.fasta",
        "cluster/proc_prot_rep_seqs.fasta",
        "cluster/proc_nucl_rep_seqs.fasta",
        "cluster/proc_final_nucl.fasta",
        "cluster/proc_final_prot.fasta",
        "cluster/results.uchime.txt",
        "proc_framebot.txt",
    ):
        assert os.path.exists(os.path.join(gdir, rel)), rel

    reps = list(read_fastx(os.path.join(gdir, "cluster/proc_final_prot.fasta")))
    assert {r.seq for r in reps} == {base, other}
    fb = dict(
        line.split("\t")[:2]
        for line in open(os.path.join(gdir, "proc_framebot.txt"))
    )
    assert fb[reps[0].name] in ("ref_base", "ref_other")


def test_chimera_flagged(tmp_path):
    rng = np.random.default_rng(1)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    a = "".join(rng.choice(list(aas), 100))
    b = "".join(rng.choice(list(aas), 100))
    chim = a[:50] + b[50:]
    pairs = [
        ("pa", "aaa" * 100, a),
        ("pb", "ccc" * 100, b),
        ("px", "ggg" * 100, chim),
    ]
    gdir = _write_gene_dir(tmp_path, pairs)
    stats = post_process_gene(
        gdir, [("ra", a), ("rb", b)], dist_cutoff=0.01
    )
    assert stats["chimeras"] == 1
    flagged = {
        line.split("\t")[0]: line.split("\t")[1].strip()
        for line in open(os.path.join(gdir, "cluster/results.uchime.txt"))
    }
    assert flagged["px"] == "Y" and flagged["pa"] == "N"
