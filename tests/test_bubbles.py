"""Lockstep bubble search == serial _BranchGroup oracle.

pop_bubbles' default path is the whole-array `_search_all` sweep (VERDICT r3
ask #7); these tests pin it to the serial walk candidate-for-candidate on
noisy graphs, and check the wave-pop protocol leaves the graph in the same
state as the serial two-phase pop."""

import numpy as np
import pytest

from megagta_tpu.assembly.bubbles import (
    MAX_BRANCHES,
    _BranchGroup,
    _search_all,
    pop_bubbles,
)
from megagta_tpu.graph.builder import build_sdbg
from tests.test_graph import make_package
from tests.test_vectorized_assembly import _genome, _noisy_reads


def _graph(seed, err=0.15, n=400, k=15):
    """Two-haplotype fixture: SNP variants create real bubbles, read noise
    creates tips and non-converging branch groups."""
    rng = np.random.default_rng(seed)
    g = _genome(seed, n)
    alt = list(g)
    for p in rng.integers(k + 10, n - k - 10, 3):
        alt[int(p)] = "ACGT"[(("ACGT".index(alt[int(p)])) + 1) % 4]
    reads = _noisy_reads(g, 40, 2, err, seed + 100)
    reads += _noisy_reads(g, 40, 2, err, seed + 300)
    reads += _noisy_reads("".join(alt), 40, 5, err, seed + 200)
    return build_sdbg(make_package(reads), k)


def test_lockstep_search_matches_serial():
    n_conv = 0
    n_cand = 0
    for seed in (1, 2, 3, 7):
        dbg = _graph(seed)
        max_len = dbg.k * 2 + 4
        valid = ~dbg.invalid
        sv = (dbg.succ >= 0) & valid[np.maximum(dbg.succ, 0)]
        outd = sv.sum(1)
        cand = np.flatnonzero(valid & (outd >= 2) & (outd <= MAX_BRANCHES))
        n_cand += len(cand)

        conv, br, blen, bmult, nbr = _search_all(
            dbg, cand, MAX_BRANCHES, max_len
        )
        for c, e in enumerate(cand):
            bg = _BranchGroup(dbg, int(e), MAX_BRANCHES, max_len)
            want = bg.search()
            assert bool(conv[c]) == want, f"candidate {e}: conv mismatch"
            if not want:
                continue
            n_conv += 1
            assert int(nbr[c]) == len(bg.branches)
            for i, (sb, sm) in enumerate(zip(bg.branches, bg.mults)):
                got = br[c, i, : blen[c, i]].tolist()
                assert got == sb, f"candidate {e} branch {i}"
                assert int(bmult[c, i]) == sm
    assert n_cand > 50, "fixtures have too few branch candidates"
    assert n_conv, "fixtures converged no bubbles"


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 11])
def test_wave_pop_matches_serial_two_phase(seed):
    dbg_a = _graph(seed)
    dbg_b = _graph(seed)
    max_len = dbg_b.k * 2 + 4

    # serial two-phase protocol (the pre-v2 default path)
    marked = np.zeros(dbg_b.size, bool)
    valid = ~dbg_b.invalid
    sv = (dbg_b.succ >= 0) & valid[np.maximum(dbg_b.succ, 0)]
    outd = sv.sum(1)
    cands = np.flatnonzero(valid & (outd >= 2) & (outd <= MAX_BRANCHES))
    found = [
        int(e)
        for e in cands
        if _BranchGroup(dbg_b, int(e), MAX_BRANCHES, max_len).search()
    ]
    num_b = 0
    retry = []
    for e in found:
        bg = _BranchGroup(dbg_b, e, MAX_BRANCHES, max_len)
        if bg.search():
            if bg.pop(marked):
                num_b += 1
            else:
                retry.append(e)
    for e in retry:
        bg = _BranchGroup(dbg_b, e, MAX_BRANCHES, max_len)
        if bg.search() and bg.pop(marked):
            num_b += 1

    num_a = pop_bubbles(dbg_a)
    assert num_a == num_b
    np.testing.assert_array_equal(dbg_a.invalid, dbg_b.invalid)
