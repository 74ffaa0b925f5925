"""Profile HMM tables as dense numpy arrays.

Array-ized equivalent of the reference ProfileHMM (src/profile_hmm.h:11-100):
  msc   [L+1, A]  match emission log-odds (row 0 = -inf, unused)
  isc   [L+1, A]  insert emission scores (all 0 in normalized mode,
                  except row L = -inf; src/hmmer3b_parser.h:145-147,170-172)
  trans [L+1, 7]  transition log-probs, columns ordered MM MI MD IM II DM DD
  mme   [L+1]     max match emission per state (normalization subtractand)

State convention: transitions out of state k live in row k (tsc(k, t)).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NUCLEOTIDE = "nucleotide"
PROTEIN = "protein"

# transition column indices (reference enum TSC, src/profile_hmm.h:25)
MM, MI, MD, IM, II, DM, DD = range(7)

NEG_INF = -np.inf


@dataclass
class ProfileHMM:
    name: str
    alphabet: str  # NUCLEOTIDE or PROTEIN
    alphabet_chars: str  # e.g. "ACDEFGHIKLMNPQRSTVWY"
    msc: np.ndarray  # [L+1, A] float64
    isc: np.ndarray  # [L+1, A] float64
    trans: np.ndarray  # [L+1, 7] float64
    compo: np.ndarray  # [A] float64 background probabilities
    normalized: bool = True
    version: str = "HMMER3/b"
    alpha_mapping: np.ndarray = field(default=None)  # [128] int8 char -> index
    mme: np.ndarray = field(default=None)  # [L+1]

    def __post_init__(self):
        if self.alpha_mapping is None:
            m = np.full(128, -1, dtype=np.int8)
            for i, c in enumerate(self.alphabet_chars):
                m[ord(c.upper())] = i
                m[ord(c.lower())] = i
            self.alpha_mapping = m
        if self.mme is None:
            with np.errstate(invalid="ignore"):
                mme = np.max(self.msc, axis=1)
            mme[0] = NEG_INF  # msc row 0 is never set (reference parser)
            self.mme = mme

    @property
    def model_length(self) -> int:
        return self.msc.shape[0] - 1

    @property
    def alphabet_length(self) -> int:
        return self.msc.shape[1]

    def max_match_emission(self, k) -> np.ndarray:
        """getMaxMatchEmission: 0 when not normalized (src/profile_hmm.h:47-54)."""
        if self.normalized:
            return self.mme[k]
        return np.zeros_like(np.asarray(k, dtype=np.float64))

    def aa_index(self, ch: str) -> int:
        return int(self.alpha_mapping[ord(ch)])

    def msc_char(self, k: int, ch: str) -> float:
        return float(self.msc[k, self.aa_index(ch)])

    def tsc(self, k, t) -> np.ndarray:
        return self.trans[k, t]
