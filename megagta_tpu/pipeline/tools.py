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


def graph_check(prefix: str, fasta: str) -> list[tuple[str, int, int, int]]:
    """Every (k+1)-window of every sequence must be a graph edge — the
    construction oracle of the reference's false_positive_checker
    (src/false_positive_checker.cpp:16-61). Returns the missing windows as
    (name, pos, seq_len, distance-to-nearer-end) tuples; empty = clean.

    The reference probes one window at a time with IndexBinarySearchEdge;
    here all windows of a sequence go through one batched lookup_edges."""
    import numpy as np

    from ..constants import str_to_dna
    from ..graph.sdbg import SdBG
    from ..io.fastx import read_fastx

    dbg = SdBG.load(prefix)
    k1 = dbg.k + 1
    misses: list[tuple[str, int, int, int]] = []
    for rec in read_fastx(fasta):
        codes = str_to_dna(rec.seq)
        n = len(codes)
        # same window range as the reference (i + k + 1 < len)
        n_win = max(0, n - k1)
        if not n_win:
            continue
        win = np.lib.stride_tricks.sliding_window_view(codes, k1)[:n_win]
        rows = dbg.lookup_edges(win)
        for i in np.flatnonzero(rows < 0):
            i = int(i)
            misses.append((rec.name, i, n, min(i, n - dbg.k - i)))
    return misses
