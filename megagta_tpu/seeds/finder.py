"""Seed finding: match translated read k-mers against reference-alignment
protein k-mers, yielding (nucl 3k-mer, prot k-mer, model position) seeds.

Mirrors `findstart` (src/fast_kmer_filter.cpp:49-222):
  * the reference k-mer set is built with model-column tracking
    (ProtKmerGenerator model_only mode, src/prot_kmer_generator.h:57-141)
  * every read and previous-k contig is scanned on both strands x 3 frames
  * matches are deduplicated by nucleotide k-mer; the reference then
    random_shuffles (src/fast_kmer_filter.cpp:183) — order only affects
    contig numbering, so we keep deterministic sorted order instead.

The query scan is vectorized: all aa windows of all frames are packed into
two uint64 keys and matched against the (sorted) reference key array with
searchsorted — a sort-merge join instead of a hash probe.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import AA_CHARS, aa_to_str, dna_to_str
from ..io.read_lib import ReadPackage
from ..ops.dna import revcomp
from .translate import translate_codes

__all__ = ["ref_kmer_set", "find_seeds", "Seed", "model_kmers"]


@dataclass(frozen=True)
class Seed:
    nucl: str  # 3k-mer nucleotide window (uppercase)
    prot: str  # k-mer amino acids
    model_pos: int  # 1-based model column reported by the generator


def model_kmers(aligned_seq: str, k: int):
    """Protein k-mers of one reference-alignment row with model positions.

    Exact replica of ProtKmerGenerator(seq, k, model_only=true)
    (src/prot_kmer_generator.h:57-141): lowercase (insert columns) reset the
    window without advancing the model position; '-' and 'X' advance the
    model position and reset; '.' is skipped entirely; emitted position is
    (position-after-kmer - k), 1-based.
    """
    pos = 1
    klen = 0
    buf: list[str] = []
    out = []
    for ch in aligned_seq:
        if ch.islower() or ch == "-" or ch == "X":
            if ch in ("-", "X"):
                pos += 1
            klen = 0
            buf.clear()
            continue
        if ch == "." or ch == "*" or ch not in AA_CHARS[:20]:
            continue
        buf.append(ch)
        pos += 1
        klen += 1
        if klen >= k:
            out.append(("".join(buf[-k:]), pos - k))
            klen = k - 1
    return out


def ref_kmer_set(aligned_faa_records, k: int) -> dict[str, int]:
    """kmer string -> model position; first insertion wins (HashSetST insert
    keeps the existing entry, src/fast_kmer_filter.cpp:85-93)."""
    table: dict[str, int] = {}
    for _, seq in aligned_faa_records:
        for kmer, pos in model_kmers(seq, k):
            table.setdefault(kmer, pos)
    return table


def _aa_window_keys(aa: np.ndarray, k: int):
    """Pack all k-length aa windows into (hi, lo) uint64 keys (5 bits/char)."""
    n = len(aa) - k + 1
    if n <= 0:
        return np.zeros((0, 2), np.uint64), np.zeros(0, np.int64)
    win = np.lib.stride_tricks.sliding_window_view(aa, k).astype(np.uint64)
    half = k // 2
    hi = np.zeros(n, np.uint64)
    lo = np.zeros(n, np.uint64)
    for j in range(half):
        hi = (hi << np.uint64(5)) | win[:, j]
    for j in range(half, k):
        lo = (lo << np.uint64(5)) | win[:, j]
    valid = (win < 20).all(axis=1)  # windows containing '*' or 'X' never match
    return np.stack([hi, lo], axis=1), np.flatnonzero(valid)


def _pack_aa_str(s: str, k: int):
    from ..constants import str_to_aa

    aa = str_to_aa(s).astype(np.uint64)
    half = k // 2
    hi = np.uint64(0)
    lo = np.uint64(0)
    for j in range(half):
        hi = (hi << np.uint64(5)) | aa[j]
    for j in range(half, k):
        lo = (lo << np.uint64(5)) | aa[j]
    return hi, lo


def find_seeds(
    package: ReadPackage,
    ref_set: dict[str, int],
    kmer_size: int,
    extra_packages: list[ReadPackage] = (),
) -> list[Seed]:
    """Scan reads (+ optional previous-k contig packages), both strands,
    3 frames each, and return deduplicated seeds sorted by nucl k-mer."""
    k = kmer_size // 3
    ref_kmers = sorted(ref_set)
    ref_keys = np.array([_pack_aa_str(s, k) for s in ref_kmers], np.uint64).reshape(-1, 2) if ref_kmers else np.zeros((0, 2), np.uint64)
    ref_pos = np.array([ref_set[s] for s in ref_kmers], np.int64)

    found: dict[str, Seed] = {}

    def scan_codes(codes: np.ndarray):
        if len(codes) < kmer_size:
            return
        for strand_codes in (codes, revcomp(codes)):
            for frame in range(3):
                aa = translate_codes(strand_codes[frame:])
                keys, valid = _aa_window_keys(aa, k)
                if valid.size == 0:
                    continue
                kv = keys[valid]
                if len(ref_keys) == 0:
                    continue
                # sort-merge join against ref keys (sorted by (hi, lo))
                i0 = np.searchsorted(ref_keys[:, 0], kv[:, 0], side="left")
                for j in range(len(kv)):
                    i = int(i0[j])
                    hit = -1
                    while i < len(ref_keys) and ref_keys[i, 0] == kv[j, 0]:
                        if ref_keys[i, 1] == kv[j, 1]:
                            hit = i
                            break
                        i += 1
                    if hit >= 0:
                        aa_start = int(valid[j])  # window start, aa coords
                        nucl_pos = aa_start * 3 + frame
                        nucl = dna_to_str(strand_codes[nucl_pos : nucl_pos + kmer_size])
                        prot = aa_to_str(aa[aa_start : aa_start + k])
                        if nucl not in found:
                            found[nucl] = Seed(nucl, prot, int(ref_pos[hit]))

    for i in range(package.num_reads):
        scan_codes(package.read(i))
    for pkg in extra_packages:
        for i in range(pkg.num_reads):
            scan_codes(pkg.read(i))

    return [found[n] for n in sorted(found)]


def write_seed_file(path: str, seeds: list[Seed]) -> None:
    """Reference starting-kmer TSV: col 3 = nucl, col 7 = model pos
    (src/fast_kmer_filter.cpp:187)."""
    with open(path, "w") as f:
        for s in seeds:
            f.write(
                f"dump_gene_name\tdump_seq_name\tdump\t{s.nucl}\ttrue\t1\t{s.prot}\t{s.model_pos}\n"
            )


def read_seed_file(path: str):
    """Parse starting-kmer TSV -> [(nucl lowercase, start_state 0-based)]
    (reference: src/search.cpp:149-158)."""
    out = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 8:
                out.append((toks[3].lower(), int(toks[7]) - 1))
    return out
