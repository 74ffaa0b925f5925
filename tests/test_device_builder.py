"""Device SdBG construction == host oracle, full-array.

VERDICT round-2 ask: wire the device counting path into graph construction
and prove w/last/f/mult/tip_labels equality against the host builder
(which is itself oracle-tested against the C++ reference in
tests/test_reference_oracle.py)."""

import numpy as np
import pytest

from megagta_tpu.graph.builder import build_sdbg
from megagta_tpu.graph.device_builder import build_sdbg_device
from tests.synthetic import make_scenario
from tests.test_graph import make_package


def assert_sdbg_equal(a, b):
    assert a.size == b.size
    np.testing.assert_array_equal(a.w, b.w)
    np.testing.assert_array_equal(a.last, b.last)
    np.testing.assert_array_equal(a.is_tip, b.is_tip)
    np.testing.assert_array_equal(a.mult, b.mult)
    np.testing.assert_array_equal(a.f, b.f)
    np.testing.assert_array_equal(a.tip_labels, b.tip_labels)
    # derived navigation must agree too (it is a pure function of the rows,
    # but catching a divergence here localizes bugs faster)
    np.testing.assert_array_equal(a.succ, b.succ)
    np.testing.assert_array_equal(a.forward, b.forward)


@pytest.mark.parametrize("k", [29, 35, 44])
def test_device_build_matches_host(k):
    sc = make_scenario(seed=31, gene_aa_len=70, read_len=75, read_step=3)
    pkg = make_package(sc["reads"])
    host = build_sdbg(pkg, k)
    dev = build_sdbg_device(pkg, k)
    assert_sdbg_equal(host, dev)


def test_device_build_min_count(k=29):
    # duplicate reads so min_count=2 keeps a nontrivial edge subset
    sc = make_scenario(seed=7, gene_aa_len=50, read_len=60, read_step=2)
    reads = sc["reads"] + sc["reads"][::3] + ["ACGTACGTAAACCCGGGTTTACGTACGTAT"]
    pkg = make_package(reads)
    host = build_sdbg(pkg, k, min_count=2)
    dev = build_sdbg_device(pkg, k, min_count=2)
    assert_sdbg_equal(host, dev)


def test_device_build_tiny_and_uneven(k=29):
    # uneven read lengths incl. reads shorter than k+1 (zero windows)
    rng = np.random.default_rng(5)
    base = "".join(rng.choice(list("ACGT"), 200))
    reads = [base[i : i + 30 + (i % 41)] for i in range(0, 160, 7)]
    pkg = make_package(reads)
    host = build_sdbg(pkg, k)
    dev = build_sdbg_device(pkg, k)
    assert_sdbg_equal(host, dev)
