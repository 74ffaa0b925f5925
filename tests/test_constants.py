import numpy as np

from megagta_tpu.constants import (
    AA_CHARS,
    CODON_TABLE,
    RC_CODON_TABLE,
    dna_to_str,
    str_to_dna,
)

# spot values transcribed from the reference tables (src/codon.h:5-209)
REF_CODON = {
    "AAA": "K", "AAC": "N", "AGA": "R", "ATG": "M", "CAT": "H",
    "CGG": "R", "GAC": "D", "GGG": "G", "TAA": "*", "TGA": "*",
    "TGG": "W", "TTA": "L", "TCG": "S", "GTT": "V", "TAC": "Y",
}
REF_RC_CODON = {
    "AAA": "F", "AAC": "V", "ACG": "R", "ATG": "H", "CAT": "M",
    "CTA": "*", "GGT": "T", "TCA": "*", "TTA": "*", "TTT": "K",
    "CCA": "W", "GTA": "Y", "TGC": "A", "AGT": "T", "GAG": "L",
}


def codes(s):
    return [int(c) for c in str_to_dna(s)]


def test_codon_table_matches_reference():
    for tri, aa in REF_CODON.items():
        c = codes(tri)
        assert AA_CHARS[CODON_TABLE[c[0], c[1], c[2]]] == aa, tri


def test_rc_codon_table_matches_reference():
    for tri, aa in REF_RC_CODON.items():
        c = codes(tri)
        assert AA_CHARS[RC_CODON_TABLE[c[0], c[1], c[2]]] == aa, tri


def test_rc_codon_is_rc_of_codon():
    for i in range(4):
        for j in range(4):
            for k in range(4):
                assert RC_CODON_TABLE[i, j, k] == CODON_TABLE[3 - k, 3 - j, 3 - i]


def test_dna_roundtrip():
    s = "ACGTTGCA"
    assert dna_to_str(str_to_dna(s)) == s
    assert dna_to_str(str_to_dna(s), lower=True) == s.lower()
