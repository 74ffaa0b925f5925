"""Small sequence tools (reference subcommands readstat / filterbylen /
translate; src/read_stat.cpp, src/filter_by_len.cpp, src/translate.cpp)."""

from __future__ import annotations

from ..assembly.denovo import contig_stats
from ..constants import AA_CHARS, str_to_dna
from ..io.fastx import read_fastx, write_fasta
from ..seeds.translate import translate_codes

__all__ = ["filter_by_len", "translate_fasta", "read_stat"]


def filter_by_len(in_path: str, out_path: str, min_len: int) -> dict:
    """Keep records >= min_len; returns length stats
    (src/filter_by_len.cpp:34-60)."""
    kept = []
    for rec in read_fastx(in_path):
        if len(rec.seq) >= min_len:
            kept.append((rec.name, rec.seq))
    write_fasta(out_path, kept)
    return contig_stats([len(s) for _, s in kept])


def translate_fasta(in_path: str, out_path: str) -> int:
    """Frame-0 translation to lowercase aa (src/translate.cpp:14-33)."""
    out = []
    for rec in read_fastx(in_path):
        aa = translate_codes(str_to_dna(rec.seq))
        out.append((rec.name, "".join(AA_CHARS[c] for c in aa).lower()))
    write_fasta(out_path, out)
    return len(out)


def read_stat(paths: list[str]) -> dict:
    lengths = []
    bases = 0
    for p in paths:
        for rec in read_fastx(p):
            lengths.append(len(rec.seq))
            bases += len(rec.seq)
    stats = contig_stats(lengths)
    stats["bases"] = bases
    return stats
