"""Cross-implementation oracle: our framework vs the built C++ reference.

Runs both pipelines on the same synthetic gene workload and compares
  * SdBG shape (row count, tip count) against the reference .sdbg_info
  * the seed set (set-wise; the reference random_shuffles its seed order)
  * raw contigs (set-wise per gene; single-threaded reference run)
Skipped when the reference binary has not been built (.ref_build).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import ref_oracle

from megagta_tpu.graph.builder import build_sdbg
from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm
from megagta_tpu.io.fastx import read_fastx, write_fasta
from megagta_tpu.io.read_lib import ReadPackage
from megagta_tpu.models.build import build_gene_resource
from megagta_tpu.search.astar import HMMGraphSearch, NodeEnumerator, search_seed
from megagta_tpu.seeds.finder import find_seeds, read_seed_file, ref_kmer_set
from tests.synthetic import make_scenario
from tests.test_graph import make_package

pytestmark = pytest.mark.skipif(
    not ref_oracle.available(), reason="C++ reference binary not built"
)

K = 30


@pytest.fixture(scope="module")
def both_runs(tmp_path_factory):
    d = tmp_path_factory.mktemp("oracle")
    sc = make_scenario(seed=17, gene_aa_len=80, read_len=70, read_step=4)
    reads_fa = str(d / "reads.fa")
    write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(sc["reads"])])
    paths = build_gene_resource("tg", sc["aligned"], str(d))

    ref = ref_oracle.run_reference_pipeline(
        str(d / "ref"), reads_fa, "tg",
        paths["forward_hmm"], paths["reverse_hmm"], paths["ref_aligned"],
        K=K, threads=1,
    )
    return d, sc, paths, ref


def test_graph_shape_matches(both_runs):
    d, sc, paths, ref = both_runs
    info = ref_oracle.parse_sdbg_info(ref["sdbg_info"])
    dbg = build_sdbg(make_package(sc["reads"]), K - 1)
    assert dbg.k == info["k"]
    assert dbg.size == info["total_size"]
    assert int(dbg.is_tip.sum()) == info["num_tips"]


def test_seed_set_matches(both_runs):
    d, sc, paths, ref = both_runs
    ref_seeds = set()
    with open(ref["seeds"]) as f:
        for line in f:
            toks = line.split()
            ref_seeds.add((toks[3].upper(), int(toks[7])))
    refs = ref_kmer_set(sc["aligned"], K // 3)
    ours = find_seeds(make_package(sc["reads"]), refs, K)
    our_seeds = {(s.nucl.upper(), s.model_pos) for s in ours}
    assert our_seeds == ref_seeds


def test_contigs_match(both_runs):
    d, sc, paths, ref = both_runs
    ref_contigs = sorted(r.seq for r in read_fastx(ref["contigs"]))
    assert ref_contigs, "reference produced no contigs"

    dbg = build_sdbg(make_package(sc["reads"]), K - 1)
    fwd = parse_hmm(paths["forward_hmm"])
    rev = parse_hmm(paths["reverse_hmm"])
    fe = NodeEnumerator(fwd, heuristic_table(fwd), 0.5)
    re_ = NodeEnumerator(rev, heuristic_table(rev), 0.5)
    searcher = HMMGraphSearch(20)
    term, term_rev = {}, {}
    seeds = read_seed_file(ref["seeds"])  # identical seed list + order
    ours = sorted(
        search_seed(n, s, fwd, rev, fe, re_, dbg, searcher, term, term_rev)
        for n, s in seeds
    )
    assert ours == ref_contigs
