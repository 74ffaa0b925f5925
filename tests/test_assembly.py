"""De novo assembly stage: tips, bubbles, unitig contigs."""

import numpy as np
import pytest

from megagta_tpu.assembly.bubbles import pop_bubbles
from megagta_tpu.assembly.denovo import assemble, contig_stats
from megagta_tpu.assembly.tips import remove_tips
from megagta_tpu.assembly.unitigs import extract_contigs
from megagta_tpu.constants import dna_to_str, str_to_dna
from megagta_tpu.graph.builder import build_sdbg
from megagta_tpu.ops.dna import revcomp
from tests.synthetic import make_scenario
from tests.test_graph import make_package


def canon(seq: str) -> str:
    rc = dna_to_str(revcomp(str_to_dna(seq)))
    return min(seq, rc)


K = 15


def build(reads):
    return build_sdbg(make_package(reads), K)


def tile(seq, rl=40, step=3):
    return [seq[i : i + rl] for i in range(0, len(seq) - rl + 1, step)] + [
        seq[-rl:]
    ]


@pytest.fixture
def genome():
    rng = np.random.default_rng(9)
    return dna_to_str(rng.integers(0, 4, 200).astype(np.int8))


def test_clean_genome_single_contig(genome):
    dbg = build(tile(genome))
    contigs, stats = assemble(dbg, max_tip_len=30)
    assert stats["count"] == 1
    assert canon(contigs[0].seq) == canon(genome)


def test_tip_removed(genome):
    # spur: a read that diverges mid-genome and dead-ends
    spur = genome[50 : 50 + 30] + "A" * 0
    spur = genome[50:80] + ("C" if genome[80] != "C" else "G") + genome[81:90]
    reads = tile(genome) + [spur]
    dbg = build(reads)
    n = remove_tips(dbg, max_tip_len=60)
    assert n > 0
    contigs = extract_contigs(dbg)
    best = max(contigs, key=lambda c: len(c.seq))
    assert canon(best.seq) == canon(genome)


def test_bubble_popped(genome):
    # SNP variant creates a bubble of length ~k
    pos = 100
    alt = genome[:pos] + ("A" if genome[pos] != "A" else "T") + genome[pos + 1 :]
    # main path has higher multiplicity (more reads)
    reads = tile(genome) + tile(genome) + tile(alt, step=12)
    dbg = build(reads)
    n = pop_bubbles(dbg)
    assert n > 0
    contigs = extract_contigs(dbg)
    best = max(contigs, key=lambda c: len(c.seq))
    assert canon(best.seq) == canon(genome)


def test_contig_stats():
    s = contig_stats([100, 200, 300])
    assert s["count"] == 3
    assert s["total"] == 600
    assert s["max"] == 300
    assert s["n50"] == 300
