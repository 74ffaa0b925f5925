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

from ..constants import AA_CHARS, CODON_TABLE_FLAT, aa_to_str, dna_to_str
from ..io.read_lib import ReadPackage

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


def _pack_aa_str(s: str, k: int):
    from ..constants import str_to_aa

    aa = str_to_aa(s).astype(np.int64)
    half = k // 2
    hi = 0
    lo = 0
    for j in range(half):
        hi = (hi << 5) | int(aa[j])
    for j in range(half, k):
        lo = (lo << 5) | int(aa[j])
    return hi, lo


def _arena_rc(flat: np.ndarray, starts: np.ndarray):
    """Reverse-complement of a concatenated arena as one contiguous flip.

    Flipping the whole arena reverse-complements every read AND reverses
    the read order; seed scanning is order-independent, so only the
    boundary offsets need remapping."""
    n = int(starts[-1])
    return (3 - flat[::-1]).astype(flat.dtype), (n - starts)[::-1].copy()


_PREFILTER_BITS = 22


def _scan_arena(flat, starts, k, ref, found):
    """One pass over a concatenated strand arena: every nucleotide position
    is a candidate 3k-window start (all 3 frames at once), packed into two
    5-bit/aa int64 keys and joined against the sorted reference keys.

    Replaces the reference's per-read, per-frame hash-probe loop
    (src/fast_kmer_filter.cpp:195-217) with whole-arena array ops. The hi
    half-key is computed for every position and screened through a dense
    bit table of reference hi-prefixes; the lo half-key and the exact
    sort-merge join run only on survivors.
    """
    ref_hi, ref_lo, ref_pos, max_run, table, shift = ref
    span = 3 * k
    N = len(flat)
    if N < span or len(ref_hi) == 0:
        return
    c = flat.astype(np.int16)
    aa = CODON_TABLE_FLAT[c[:-2] * 16 + c[1:-1] * 4 + c[2:]]  # int8 aa codes
    M = N - span + 1
    lengths = np.diff(starts)
    rid = np.repeat(np.arange(len(lengths), dtype=np.int32), lengths)
    half = k // 2
    # int64 keys (uint64 shifts are ~30x slower in numpy): hi holds
    # half*5 <= 35 bits, lo (k-half)*5 <= 40 bits — both fit signed 64.
    hi = np.zeros(M, np.int64)
    valid = rid[:M] == rid[span - 1 :]  # window fully inside one read
    for j in range(k):
        w8 = aa[3 * j : 3 * j + M]
        valid &= w8 < 20  # '*'/'X' windows never match
        if j < half:
            np.multiply(hi, 32, out=hi)
            np.add(hi, w8, out=hi)
    valid &= table[hi >> shift]
    q = np.flatnonzero(valid)
    if q.size == 0:
        return
    qhi = hi[q]
    qlo = np.zeros(q.size, np.int64)
    for j in range(half, k):
        np.multiply(qlo, 32, out=qlo)
        np.add(qlo, aa[q + 3 * j], out=qlo)
    a = np.searchsorted(ref_hi, qhi, side="left")
    b = np.searchsorted(ref_hi, qhi, side="right")
    hit = np.full(q.size, -1, np.int64)
    last = len(ref_lo) - 1
    for t in range(max_run):  # bounded by the largest hi-key run (tiny)
        idx = a + t
        ok = (idx < b) & (ref_lo[np.minimum(idx, last)] == qlo) & (hit < 0)
        hit = np.where(ok, idx, hit)
    for p, h in zip(q[hit >= 0], hit[hit >= 0]):
        nucl = dna_to_str(flat[p : p + span])
        if nucl not in found:
            prot = aa_to_str(aa[p : p + span : 3][:k])
            found[nucl] = Seed(nucl, prot, int(ref_pos[h]))


def find_seeds(
    package: ReadPackage,
    ref_set: dict[str, int],
    kmer_size: int,
    extra_packages: list[ReadPackage] = (),
    chunk_bases: int = 1 << 23,
) -> list[Seed]:
    """Scan reads (+ optional previous-k contig packages), both strands,
    3 frames each, and return deduplicated seeds sorted by nucl k-mer.

    Memory is bounded: arenas are processed in read-aligned chunks of at
    most ~chunk_bases bases (mirroring the reference's 4M-read batching,
    src/read_lib_functions-inl.h:178-179)."""
    k = kmer_size // 3
    ref_kmers = sorted(ref_set)
    half = k // 2
    shift = max(0, 5 * half - _PREFILTER_BITS)
    if ref_kmers:
        keys = np.array([_pack_aa_str(s, k) for s in ref_kmers], np.int64)
        keys = keys.reshape(-1, 2)
        order = np.lexsort((keys[:, 1], keys[:, 0]))
        ref_hi, ref_lo = (
            np.ascontiguousarray(keys[order, 0]),
            np.ascontiguousarray(keys[order, 1]),
        )
        ref_pos = np.array([ref_set[s] for s in ref_kmers], np.int64)[order]
        max_run = int(np.unique(ref_hi, return_counts=True)[1].max())
    else:
        ref_hi = ref_lo = np.zeros(0, np.int64)
        ref_pos = np.zeros(0, np.int64)
        max_run = 0
    table = np.zeros(1 << max(1, 5 * half - shift), bool)
    table[ref_hi >> shift] = True
    ref = (ref_hi, ref_lo, ref_pos, max_run, table, shift)

    found: dict[str, Seed] = {}

    def scan_package(pkg: ReadPackage):
        starts = pkg.starts
        r0 = 0
        while r0 < pkg.num_reads:
            r1 = int(
                np.searchsorted(starts, starts[r0] + chunk_bases, side="left")
            )
            r1 = min(max(r1, r0 + 1), pkg.num_reads)
            sub = starts[r0 : r1 + 1] - starts[r0]
            flat = pkg.flat[starts[r0] : starts[r1]]
            _scan_arena(flat, sub, k, ref, found)
            rc_flat, rc_starts = _arena_rc(flat, sub)
            _scan_arena(rc_flat, rc_starts, k, ref, found)
            r0 = r1

    scan_package(package)
    for pkg in extra_packages:
        scan_package(pkg)

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
