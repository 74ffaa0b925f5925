"""Vectorized de novo engine == sequential per-node oracle.

The sequential engine (tips.py / unitigs.py) is itself oracle-tested
against the C++ reference (test_reference_oracle.py); these tests pin the
default vectorized engine (lockstep walks + pointer doubling) to it on
graphs with tips, bubbles, palindromic contigs and noise."""

import numpy as np
import pytest

from megagta_tpu.assembly.denovo import assemble
from megagta_tpu.constants import dna_to_str
from megagta_tpu.graph.builder import build_sdbg
from tests.test_graph import make_package


def _genome(seed, n):
    rng = np.random.default_rng(seed)
    return dna_to_str(rng.integers(0, 4, n).astype(np.int8))


def _noisy_reads(genome, rlen, step, err_rate, seed):
    rng = np.random.default_rng(seed)
    reads = []
    for i in range(0, len(genome) - rlen + 1, step):
        r = list(genome[i : i + rlen])
        if rng.random() < err_rate:
            r[int(rng.integers(0, rlen))] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))
    return reads


def _run_both(reads, k, **kw):
    a, _ = assemble(build_sdbg(make_package(reads), k), engine="vectorized", **kw)
    b, _ = assemble(build_sdbg(make_package(reads), k), engine="sequential", **kw)
    fa = sorted((c.seq, round(c.multi, 4), c.flag) for c in a)
    fb = sorted((c.seq, round(c.multi, 4), c.flag) for c in b)
    assert fa == fb
    return fa


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_engines_agree_noisy(seed):
    g = _genome(seed, 700)
    reads = _noisy_reads(g, 60, 2, 0.35, seed + 100)
    out = _run_both(reads, 29, max_tip_len=30, min_contig=0)
    assert out  # non-trivial graph


def test_engines_agree_clean_and_palindrome():
    g = _genome(9, 400)
    # append a reverse-complement arm to force palindromic path folding
    rc = g[::-1].translate(str.maketrans("ACGT", "TGCA"))
    seq = g + rc
    reads = [seq[i : i + 61] for i in range(0, len(seq) - 60, 1)]
    _run_both(reads, 30, max_tip_len=30)


def test_engines_agree_two_components():
    g1, g2 = _genome(4, 300), _genome(5, 300)
    reads = [g1[i : i + 55] for i in range(0, 246, 3)] + [
        g2[i : i + 55] for i in range(0, 246, 3)
    ]
    out = _run_both(reads, 29, max_tip_len=20)
    assert len(out) >= 2
