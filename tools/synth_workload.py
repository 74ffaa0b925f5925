"""Deterministic synthetic benchmark workload: an rplB-like gene family
embedded in a random metagenome background (the reference ships no test
data — share/RDPTools is an empty submodule — so the baseline workload is
self-generated; BASELINE.md)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from megagta_tpu.constants import AA_ALPHABET, dna_to_str
from megagta_tpu.io.fastx import write_fasta
from megagta_tpu.models.build import build_gene_resource
from synthetic import mutate_peptide, random_peptide, reverse_translate


def make_workload(
    out_dir: str,
    seed: int = 1234,
    gene_aa_len: int = 300,
    n_variants: int = 5,
    background_bp: int = 20000,
    read_len: int = 100,
    gene_step: int = 2,
    bg_step: int = 4,
    divergence: float = 0.03,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    peptide = random_peptide(rng, gene_aa_len)
    variants_aa = [peptide] + [
        mutate_peptide(rng, peptide, divergence) for _ in range(n_variants - 1)
    ]
    genes = [reverse_translate(rng, p) for p in variants_aa]
    background = dna_to_str(
        rng.integers(0, 4, size=background_bp).astype(np.int8)
    )

    reads = []
    for g in genes:
        reads += [g[i : i + read_len] for i in range(0, len(g) - read_len + 1, gene_step)]
    reads += [
        background[i : i + read_len]
        for i in range(0, len(background) - read_len + 1, bg_step)
    ]
    order = rng.permutation(len(reads))
    reads = [reads[i] for i in order]

    reads_fa = os.path.join(out_dir, "reads.fa")
    write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(reads)])

    aligned = [(f"v{i}", p) for i, p in enumerate(variants_aa)] + [
        (f"x{i}", mutate_peptide(rng, peptide, 0.08)) for i in range(3)
    ]
    paths = build_gene_resource("rplB_like", aligned, out_dir)
    return {
        "reads_fa": reads_fa,
        "gene_name": "rplB_like",
        "genes": genes,
        "peptide": peptide,
        **paths,
    }


def make_workload_production(out_dir: str) -> dict:
    """~10x the baseline workload: 20 gene variants at 5% divergence over a
    100 kb background — ~46k reads, ~250k graph rows, ~15k seeds. The scale
    at which accelerator dispatch amortizes (BASELINE.md round-2 notes);
    the reference C++ baseline is measured live on the same inputs."""
    return make_workload(
        out_dir,
        seed=777,
        gene_aa_len=300,
        n_variants=20,
        background_bp=100_000,
        gene_step=1,
        bg_step=4,
        divergence=0.05,
    )


if __name__ == "__main__":
    info = make_workload(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mgta_workload")
    print(info["reads_fa"])
