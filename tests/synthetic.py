"""Synthetic gene scenario generator shared by seed/search/pipeline tests."""

import numpy as np

from megagta_tpu.constants import AA_ALPHABET, CODON_TABLE, dna_to_str

# codons per amino acid (code space)
_AA_CODONS = {}
for i0 in range(4):
    for i1 in range(4):
        for i2 in range(4):
            _AA_CODONS.setdefault(int(CODON_TABLE[i0, i1, i2]), []).append(
                (i0, i1, i2)
            )


def random_peptide(rng, length):
    return "".join(AA_ALPHABET[i] for i in rng.integers(0, 20, size=length))


def reverse_translate(rng, peptide):
    codes = []
    for ch in peptide:
        aa = AA_ALPHABET.index(ch)
        options = _AA_CODONS[aa]
        codes.extend(options[rng.integers(0, len(options))])
    return dna_to_str(np.array(codes, np.int8))


def mutate_peptide(rng, peptide, rate=0.05):
    out = list(peptide)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = AA_ALPHABET[rng.integers(0, 20)]
    return "".join(out)


def make_scenario(seed=0, gene_aa_len=80, read_len=60, read_step=3, n_variants=4):
    """Returns dict with peptide, gene DNA, aligned reference rows, reads."""
    rng = np.random.default_rng(seed)
    peptide = random_peptide(rng, gene_aa_len)
    gene = reverse_translate(rng, peptide)
    aligned = [("ref0", peptide)] + [
        (f"ref{i}", mutate_peptide(rng, peptide)) for i in range(1, n_variants)
    ]
    reads = [
        gene[i : i + read_len]
        for i in range(0, len(gene) - read_len + 1, read_step)
    ]
    # make sure the tail is covered
    if (len(gene) - read_len) % read_step:
        reads.append(gene[-read_len:])
    return {
        "peptide": peptide,
        "gene": gene,
        "aligned": aligned,
        "reads": reads,
    }
