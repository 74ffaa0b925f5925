"""Alphabet and genetic-code constants, generated programmatically.

Conventions (natural orientation unless noted):
  * DNA bases are coded A=0, C=1, G=2, T=3 ("code" space).
  * The SdBG W column uses $=0, A..T=1..4, flagged A-..T- = 5..8
    (reference: src/succinct_dbg.h:35-43).
  * Amino acids use the HMMER order "ACDEFGHIKLMNPQRSTVWY" (indices 0..19);
    20 = stop '*', 21 = unknown 'X'.
  * Codon tables are indexed [c0][c1][c2] with bases in code space, matching
    the reference tables (src/codon.h:5-209) but generated from the standard
    genetic code rather than transcribed.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- DNA alphabet

DNA_BASES = "ACGT"
BASE_CODE = {c: i for i, c in enumerate(DNA_BASES)}

# char -> 0..3 code; N maps to G (=2) to mirror the reference search driver's
# dna_map "ACGTN" -> 1,2,3,4,3 (src/hmm_graph_search.h:53-57, 1-based W codes);
# for read ingestion N is handled separately (reads are split on N runs,
# reference: src/sequence_manager.cpp:87-107).
DNA_CHAR_TO_CODE = np.full(256, -1, dtype=np.int8)
for _i, _c in enumerate(DNA_BASES):
    DNA_CHAR_TO_CODE[ord(_c)] = _i
    DNA_CHAR_TO_CODE[ord(_c.lower())] = _i
DNA_CHAR_TO_CODE[ord("N")] = 2
DNA_CHAR_TO_CODE[ord("n")] = 2

CODE_TO_CHAR = np.frombuffer(b"ACGT", dtype=np.uint8)
CODE_TO_CHAR_LOWER = np.frombuffer(b"acgt", dtype=np.uint8)

# ---------------------------------------------------------------- amino acids

AA_ALPHABET = "ACDEFGHIKLMNPQRSTVWY"  # HMMER amino ordering
AA_STOP = 20   # '*'
AA_UNKNOWN = 21  # 'X'
AA_CHARS = AA_ALPHABET + "*X"
AA_CODE = {c: i for i, c in enumerate(AA_ALPHABET)}

AA_CHAR_TO_CODE = np.full(256, AA_UNKNOWN, dtype=np.int8)
for _i, _c in enumerate(AA_ALPHABET):
    AA_CHAR_TO_CODE[ord(_c)] = _i
    AA_CHAR_TO_CODE[ord(_c.lower())] = _i
AA_CHAR_TO_CODE[ord("*")] = AA_STOP

# ------------------------------------------------------------------- codons

# Standard genetic code, written per second-base column of the classic table;
# equivalent content to the reference's hand-written table (src/codon.h:5-106).
_GENETIC_CODE = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


def _build_codon_tables():
    """codon[c0,c1,c2] -> aa code; rc_codon[c0,c1,c2] = aa of rc'd codon.

    rc_codon matches the reference (src/codon.h:108-209): the amino acid of
    the reverse complement of the codon (read 5'->3' on the other strand).
    """
    codon = np.zeros((4, 4, 4), dtype=np.int8)
    rc_codon = np.zeros((4, 4, 4), dtype=np.int8)
    for i0 in range(4):
        for i1 in range(4):
            for i2 in range(4):
                tri = DNA_BASES[i0] + DNA_BASES[i1] + DNA_BASES[i2]
                aa = _GENETIC_CODE[tri]
                codon[i0, i1, i2] = AA_CODE.get(aa, AA_STOP)
                rc_tri = DNA_BASES[3 - i2] + DNA_BASES[3 - i1] + DNA_BASES[3 - i0]
                rc_codon[i0, i1, i2] = AA_CODE.get(_GENETIC_CODE[rc_tri], AA_STOP)
    return codon, rc_codon


CODON_TABLE, RC_CODON_TABLE = _build_codon_tables()

# Flat [64] views indexed by c0*16 + c1*4 + c2.
CODON_TABLE_FLAT = CODON_TABLE.reshape(64).copy()
RC_CODON_TABLE_FLAT = RC_CODON_TABLE.reshape(64).copy()

# ------------------------------------------------------------------ SdBG W

W_DOLLAR = 0           # $ edge label
W_ALPHABET_SIZE = 9    # $, A..T, A-..T-


def aa_to_str(codes) -> str:
    return "".join(AA_CHARS[c] for c in np.asarray(codes).ravel())


def dna_to_str(codes, lower: bool = False) -> str:
    tbl = CODE_TO_CHAR_LOWER if lower else CODE_TO_CHAR
    return bytes(tbl[np.asarray(codes, dtype=np.int64).ravel()]).decode()


def str_to_dna(s: str) -> np.ndarray:
    codes = DNA_CHAR_TO_CODE[np.frombuffer(s.encode(), dtype=np.uint8)]
    if (codes < 0).any():
        bad = set(s) - set("ACGTNacgtn")
        raise ValueError(f"non-DNA characters in sequence: {bad!r}")
    return codes.astype(np.int8)


def str_to_aa(s: str) -> np.ndarray:
    return AA_CHAR_TO_CODE[np.frombuffer(s.encode(), dtype=np.uint8)].copy()
