"""Vectorized DNA code-space primitives (host numpy; device variants in jnp).

Replaces the reference's scalar 2-bit k-mer machinery (src/kmer.h,
src/megahit_kmer.h:130-174, src/bit_operation.h) with array ops over whole
batches of sequences/windows at once.

Code space: A=0 C=1 G=2 T=3 (int8). Reverse complement = 3 - code, reversed.
Packed k-mers: chars packed big-endian (first char in the most significant
bits of word 0) so lexicographic string order == numeric order of the word
tuple, matching the reference's sort-key convention
(src/packed_reads.h:44-107 packs first char highest).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "revcomp",
    "sliding_windows",
    "pack_kmers",
    "unpack_kmers",
    "kmer_words",
]


def revcomp(codes: np.ndarray, axis: int = -1) -> np.ndarray:
    """Reverse complement along `axis` for code-space arrays."""
    return np.flip(3 - codes, axis=axis)


def sliding_windows(flat_codes: np.ndarray, starts: np.ndarray, window: int):
    """All length-`window` windows of each read in a concatenated code array.

    Args:
      flat_codes: [total_len] int8 concatenated read codes.
      starts: [num_reads + 1] int64 read boundary offsets.
    Returns:
      (windows [M, window] int8, read_id [M] int32, offset_in_read [M] int32)
      with M = sum(max(0, len_i - window + 1)).
    """
    flat_codes = np.ascontiguousarray(flat_codes, dtype=np.int8)
    lens = np.diff(starts)
    n_win = np.maximum(lens - window + 1, 0).astype(np.int64)
    total = int(n_win.sum())
    if total == 0:
        return (
            np.zeros((0, window), np.int8),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
        )
    read_id = np.repeat(np.arange(len(lens), dtype=np.int32), n_win)
    # offset within read: ramp per read
    cum = np.concatenate([[0], np.cumsum(n_win)])
    offs = (np.arange(total, dtype=np.int64) - cum[read_id]).astype(np.int32)
    flat_pos = starts[read_id] + offs
    view = np.lib.stride_tricks.sliding_window_view(flat_codes, window)
    return view[flat_pos], read_id, offs


def kmer_words(k: int) -> int:
    """Number of uint64 words to hold k 2-bit chars."""
    return (k + 31) // 32


def pack_kmers(codes: np.ndarray, k: int | None = None) -> np.ndarray:
    """Pack [N, k] code arrays into [N, W] uint64, big-endian by char.

    Word 0 holds chars 0..31 with char 0 in bits 62-63. Unused low bits are
    zero, so numeric (word0, word1, ...) order == lexicographic char order.
    """
    codes = np.asarray(codes)
    if codes.ndim == 1:
        codes = codes[None]
    n, L = codes.shape
    k = L if k is None else k
    W = kmer_words(k)
    out = np.zeros((n, W), dtype=np.uint64)
    c = codes.astype(np.uint64)
    for j in range(k):
        w, r = divmod(j, 32)
        out[:, w] |= c[:, j] << np.uint64(62 - 2 * r)
    return out


def unpack_kmers(packed: np.ndarray, k: int) -> np.ndarray:
    """Inverse of pack_kmers: [N, W] uint64 -> [N, k] int8."""
    packed = np.asarray(packed, dtype=np.uint64)
    if packed.ndim == 1:
        packed = packed[None]
    n = packed.shape[0]
    out = np.zeros((n, k), dtype=np.int8)
    for j in range(k):
        w, r = divmod(j, 32)
        out[:, j] = ((packed[:, w] >> np.uint64(62 - 2 * r)) & np.uint64(3)).astype(
            np.int8
        )
    return out
