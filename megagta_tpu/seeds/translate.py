"""Vectorized DNA -> amino-acid translation (3- and 6-frame).

Replaces the reference's per-codon object translation (sequence/AASequence.C
translate, used by src/fast_kmer_filter.cpp:195-217) with one gather into the
codon table per frame.
"""

from __future__ import annotations

import numpy as np

from ..constants import CODON_TABLE_FLAT

__all__ = ["translate_codes", "translate_frames"]


def translate_codes(codes: np.ndarray) -> np.ndarray:
    """[N] DNA codes -> [N//3] aa codes (frame 0)."""
    n = (len(codes) // 3) * 3
    c = codes[:n].reshape(-1, 3).astype(np.int64)
    return CODON_TABLE_FLAT[c[:, 0] * 16 + c[:, 1] * 4 + c[:, 2]]


def translate_frames(codes: np.ndarray) -> list[np.ndarray]:
    """Three forward-frame translations of a code sequence."""
    return [translate_codes(codes[i:]) for i in range(3)]
