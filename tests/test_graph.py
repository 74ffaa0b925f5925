"""SdBG construction correctness against brute-force oracles."""

import numpy as np
import pytest

from megagta_tpu.graph.builder import build_sdbg, edges_from_reads
from megagta_tpu.io.read_lib import ReadPackage
from megagta_tpu.constants import dna_to_str, str_to_dna
from megagta_tpu.ops.dna import revcomp


def make_package(seqs):
    codes = [str_to_dna(s) for s in seqs]
    starts = np.zeros(len(codes) + 1, np.int64)
    starts[1:] = np.cumsum([len(c) for c in codes])
    flat = np.concatenate(codes) if codes else np.zeros(0, np.int8)
    return ReadPackage(flat, starts)


def brute_edge_set(seqs, k):
    """Distinct (k+1)-mers of reads + reverse complements, with counts."""
    counts = {}
    for s in seqs:
        for i in range(len(s) - k):
            e = s[i : i + k + 1]
            rc = dna_to_str(revcomp(str_to_dna(e)))
            counts[e] = counts.get(e, 0) + 1
            if rc != e:
                counts[rc] = counts.get(rc, 0) + 1
    return counts


@pytest.fixture(scope="module")
def small_case():
    rng = np.random.default_rng(42)
    genome = dna_to_str(rng.integers(0, 4, size=300).astype(np.int8))
    k = 15
    reads = [genome[i : i + 60] for i in range(0, 240, 7)]
    # a branch: mutate one read's middle
    mut = list(reads[5])
    mut[30] = "A" if mut[30] != "A" else "C"
    reads.append("".join(mut))
    pkg = make_package(reads)
    dbg = build_sdbg(pkg, k)
    return reads, k, dbg


def test_edge_counts_match_bruteforce(small_case):
    # brute_edge_set counts are double-stranded (occurrences of e plus
    # occurrences of rc(e)), matching the builder's canonical double emission
    reads, k, dbg = small_case
    counts = brute_edge_set(reads, k)
    edges, mult = edges_from_reads(make_package(reads), k)
    got = {dna_to_str(e): int(m) for e, m in zip(edges, mult)}
    assert got == counts


def test_every_edge_is_findable(small_case):
    reads, k, dbg = small_case
    counts = brute_edge_set(reads, k)
    for e in counts:
        codes = str_to_dna(e)
        row = dbg.lookup_edge(codes)
        assert row >= 0, f"edge {e} not found"
        assert dna_to_str(dbg.edge_label(row)) == e
        assert dbg.mult[row] == counts[e]


def test_outgoing_edges_match_bruteforce(small_case):
    reads, k, dbg = small_case
    counts = brute_edge_set(reads, k)
    edge_set = set(counts)
    for e in sorted(edge_set):
        row = dbg.lookup_edge(str_to_dna(e))
        target_node = e[1:]
        expected = sorted(
            target_node + c for c in "ACGT" if (target_node + c) in edge_set
        )
        out_rows = dbg.outgoing_edges(row)
        got = sorted(dna_to_str(dbg.edge_label(r)) for r in out_rows)
        assert got == expected, f"out-edges of {e}"


def test_w_flag_rank_invariant(small_case):
    _, _, dbg = small_case
    # BOSS invariant: # unflagged W=c rows == # last-marked groups whose node
    # ends with char c (partition c)
    w = dbg.w.astype(int)
    last_pos = np.flatnonzero(dbg.last)
    for c in range(1, 5):
        unflagged = int((w == c).sum())
        lo, hi = dbg.f[c], (dbg.f[c + 1] if c + 1 < 6 else dbg.size)
        groups_c = int(((last_pos >= lo) & (last_pos < hi)).sum())
        assert unflagged == groups_c


def test_forward_backward_roundtrip(small_case):
    _, _, dbg = small_case
    w = dbg.w.astype(int)
    for row in np.flatnonzero((w >= 1) & (w <= 8))[:500]:
        fwd = dbg.forward[row]
        assert fwd >= 0
        assert dbg.last[fwd]
        # Backward of the target group must return an unflagged row whose
        # forward is the same group
        back = dbg.backward[fwd]
        assert back >= 0
        assert dbg.forward[back] == fwd


def test_dollar_rows_only_for_zero_outdegree(small_case):
    reads, k, dbg = small_case
    counts = brute_edge_set(reads, k)
    edge_set = set(counts)
    nodes = set(e[:k] for e in edge_set) | set(e[1:] for e in edge_set)
    n_zero_out = sum(
        1 for n in nodes if not any((n + c) in edge_set for c in "ACGT")
    )
    n_zero_in = sum(
        1 for n in nodes if not any((c + n) in edge_set for c in "ACGT")
    )
    assert int((dbg.w == 0).sum()) == n_zero_out
    assert int(dbg.is_tip.sum()) == n_zero_in


def test_save_load_roundtrip(tmp_path, small_case):
    _, _, dbg = small_case
    prefix = str(tmp_path / "g")
    dbg.save(prefix)
    from megagta_tpu.graph.sdbg import SdBG

    g2 = SdBG.load(prefix)
    assert g2.k == dbg.k
    assert (g2.w == dbg.w).all()
    assert (g2.last == dbg.last).all()
    assert (g2.forward == dbg.forward).all()
    assert (g2.succ == dbg.succ).all()


def test_streaming_build_matches_whole():
    """RAM-bounded batched counting == whole-dataset build, bit-for-bit,
    for both engines and with min_count filtering applied post-merge."""
    import numpy as np

    from megagta_tpu.graph.builder import (
        build_sdbg,
        edges_from_reads,
        edges_from_reads_streaming,
    )
    from tests.synthetic import make_scenario

    sc = make_scenario(seed=51, gene_aa_len=60, read_len=70, read_step=2)
    reads = sc["reads"] + sc["reads"][::3]
    pkg = make_package(reads)
    k = 29
    we, wm = edges_from_reads(pkg, k)
    for engine in ("host", "device"):
        se, sm = edges_from_reads_streaming(
            pkg, k, batch_reads=17, engine=engine
        )
        np.testing.assert_array_equal(we, se)
        np.testing.assert_array_equal(wm, sm)
    # min_count applied after the merge (a k-mer split across batches must
    # still count globally)
    we2, wm2 = edges_from_reads(pkg, k, min_count=2)
    se2, sm2 = edges_from_reads_streaming(pkg, k, 2, batch_reads=13)
    np.testing.assert_array_equal(we2, se2)
    np.testing.assert_array_equal(wm2, sm2)
    # end-to-end graph equality through build_sdbg(batch_reads=...)
    a = build_sdbg(pkg, k)
    b = build_sdbg(pkg, k, batch_reads=23)
    np.testing.assert_array_equal(a.w, b.w)
    np.testing.assert_array_equal(a.mult, b.mult)
