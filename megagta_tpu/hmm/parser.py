"""HMMER3 text-format parser.

Reproduces the reference parser's exact numeric semantics
(src/hmmer3b_parser.h:19-202):
  * COMPO probabilities: p = exp(-value).
  * Match scores (normalized mode): msc = log(exp(-value) / compo[j]);
    "*" -> p = 0 -> -inf.
  * Insert scores (normalized mode): 0 everywhere, except row L = -inf
    (the reference loop at :170-172 leaves only the final state at -inf).
  * Transitions: tsc = log(exp(-value)); "*" -> -inf.
The exp/log round-trip is kept (not simplified to -value) to match the
reference's float64 results bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

from .profile import NEG_INF, NUCLEOTIDE, PROTEIN, ProfileHMM

__all__ = ["parse_hmm", "parse_hmm_text", "write_hmm"]


def parse_hmm(path: str, normalized: bool = True) -> ProfileHMM:
    with open(path) as f:
        return parse_hmm_text(f.read(), normalized=normalized)


def _prob(tok: str) -> float:
    return 0.0 if tok == "*" else math.exp(-float(tok))


def parse_hmm_text(text: str, normalized: bool = True) -> ProfileHMM:
    lines = iter(text.splitlines())
    version = next(lines).split()[0]
    name = ""
    model_length = 0
    alphabet = PROTEIN
    alphabet_chars = ""
    for line in lines:
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "NAME":
            name = toks[1]
        elif toks[0] == "LENG":
            model_length = int(toks[1])
        elif toks[0] == "ALPH":
            alphabet = PROTEIN if toks[1] == "amino" else NUCLEOTIDE
        elif toks[0] == "HMM":
            alphabet_chars = "".join(toks[1:])
            break
    if not alphabet_chars:
        raise ValueError("no HMM alphabet header found")
    A = len(alphabet_chars)
    L = model_length

    next(lines)  # transition label line (m->m m->i ...)

    msc = np.zeros((L + 1, A), dtype=np.float64)
    isc = np.zeros((L + 1, A), dtype=np.float64)
    trans = np.zeros((L + 1, 7), dtype=np.float64)
    mme = np.full(L + 1, NEG_INF, dtype=np.float64)

    compo_line = next(lines).split()
    compo = np.zeros(A, dtype=np.float64)
    if compo_line and compo_line[0] == "COMPO":
        for j in range(A):
            compo[j] = _prob(compo_line[1 + j])
        insert_line = next(lines).split()
    else:
        # no COMPO line: the line we just read is state 0's insert line
        insert_line = compo_line

    def fill_insert(k: int, toks: list[str]):
        for j in range(A):
            p = _prob(toks[j])
            isc[k, j] = 0.0 if normalized else (math.log(p) if p > 0 else NEG_INF)

    def fill_trans(k: int, toks: list[str]):
        for t in range(7):
            p = _prob(toks[t])
            trans[k, t] = math.log(p) if p > 0 else NEG_INF

    fill_insert(0, insert_line)
    fill_trans(0, next(lines).split())

    with np.errstate(divide="ignore"):
        for k in range(1, L + 1):
            mtoks = next(lines).split()[1:]  # leading state number
            for j in range(A):
                p = _prob(mtoks[j])
                if normalized:
                    v = math.log(p / compo[j]) if p > 0 else NEG_INF
                else:
                    v = math.log(p) if p > 0 else NEG_INF
                msc[k, j] = v
                if v > mme[k]:
                    mme[k] = v
            fill_insert(k, next(lines).split())
            fill_trans(k, next(lines).split())

    if normalized:
        isc[L, :] = NEG_INF  # src/hmmer3b_parser.h:170-172

    return ProfileHMM(
        name=name,
        alphabet=alphabet,
        alphabet_chars=alphabet_chars,
        msc=msc,
        isc=isc,
        trans=trans,
        compo=compo,
        normalized=normalized,
        version=version,
        mme=mme,
    )


def write_hmm(path: str, name: str, match_probs: np.ndarray,
              insert_probs: np.ndarray, trans_probs: np.ndarray,
              compo: np.ndarray, alphabet_chars: str,
              alphabet: str = "amino") -> None:
    """Serialize probability tables as an HMMER3/b text file.

    Inputs are plain probabilities; written as negated natural logs per the
    HMMER3 format ("*" for zero). match_probs/insert_probs: [L+1, A]
    (row 0 of match is ignored), trans_probs: [L+1, 7] (MM MI MD IM II DM DD).
    """
    L = match_probs.shape[0] - 1
    A = len(alphabet_chars)

    def fmt(p: float) -> str:
        return "*" if p <= 0 else f"{-math.log(p):.5f}"

    with open(path, "w") as f:
        f.write("HMMER3/b [megagta-tpu]\n")
        f.write(f"NAME  {name}\n")
        f.write(f"LENG  {L}\n")
        f.write(f"ALPH  {alphabet}\n")
        f.write("HMM          " + "        ".join(alphabet_chars) + "\n")
        f.write("            m->m     m->i     m->d     i->m     i->i     d->m     d->d\n")
        f.write("  COMPO   " + " ".join(fmt(p) for p in compo) + "\n")
        f.write("          " + " ".join(fmt(p) for p in insert_probs[0]) + "\n")
        f.write("          " + " ".join(fmt(p) for p in trans_probs[0]) + "\n")
        for k in range(1, L + 1):
            f.write(f"  {k:6d} " + " ".join(fmt(p) for p in match_probs[k]) + "\n")
            f.write("          " + " ".join(fmt(p) for p in insert_probs[k]) + "\n")
            f.write("          " + " ".join(fmt(p) for p in trans_probs[k]) + "\n")
        f.write("//\n")
