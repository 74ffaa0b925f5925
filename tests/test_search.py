"""End-to-end: synthetic gene -> graph -> seeds -> A* search -> contig."""

import numpy as np
import pytest

from megagta_tpu.constants import dna_to_str, str_to_dna
from megagta_tpu.graph.builder import build_sdbg
from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm
from megagta_tpu.models.build import build_gene_resource
from megagta_tpu.ops.dna import revcomp
from megagta_tpu.search.astar import HMMGraphSearch, NodeEnumerator, search_seed
from megagta_tpu.seeds.finder import find_seeds, ref_kmer_set
from tests.synthetic import make_scenario
from tests.test_graph import make_package


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    sc = make_scenario(seed=3, gene_aa_len=80, read_len=60, read_step=3)
    out = tmp_path_factory.mktemp("generes")
    paths = build_gene_resource("tgene", sc["aligned"], str(out))
    sc["paths"] = paths
    K = 30  # k_list entry; graph k = K - 1
    sc["K"] = K
    sc["dbg"] = build_sdbg(make_package(sc["reads"]), K - 1)
    ref = ref_kmer_set(sc["aligned"], K // 3)
    sc["seeds"] = find_seeds(make_package(sc["reads"]), ref, K)
    return sc


def test_seed_lookup_in_graph(scenario):
    dbg = scenario["dbg"]
    found = 0
    for s in scenario["seeds"]:
        row = dbg.lookup_edge(str_to_dna(s.nucl))
        if row >= 0:
            found += 1
            assert dna_to_str(dbg.edge_label(row)) == s.nucl
    assert found == len(scenario["seeds"])  # exact reads: all seeds in graph


def test_search_recovers_gene(scenario):
    sc = scenario
    dbg = sc["dbg"]
    fwd = parse_hmm(sc["paths"]["forward_hmm"])
    rev = parse_hmm(sc["paths"]["reverse_hmm"])
    fwd_enum = NodeEnumerator(fwd, heuristic_table(fwd), 0.5)
    rev_enum = NodeEnumerator(rev, heuristic_table(rev), 0.5)
    searcher = HMMGraphSearch(prune_len=20)
    term, term_rev = {}, {}

    gene = sc["gene"]
    gene_rc = dna_to_str(revcomp(str_to_dna(gene)))
    contigs = []
    for s in sc["seeds"][:20]:
        contig = search_seed(
            s.nucl.lower(),
            s.model_pos - 1,
            fwd,
            rev,
            fwd_enum,
            rev_enum,
            dbg,
            searcher,
            term,
            term_rev,
        )
        contigs.append(contig)
        up = contig.upper()
        assert up in gene or up in gene_rc, (
            f"contig not a gene substring: {contig[:60]}..."
        )

    # the best contig should recover (nearly) the whole gene
    best = max(len(c) for c in contigs)
    assert best >= len(gene) - 2 * sc["K"], (best, len(gene))


def test_search_stats_counted(scenario):
    sc = scenario
    fwd = parse_hmm(sc["paths"]["forward_hmm"])
    rev = parse_hmm(sc["paths"]["reverse_hmm"])
    fwd_enum = NodeEnumerator(fwd, heuristic_table(fwd), 0.5)
    rev_enum = NodeEnumerator(rev, heuristic_table(rev), 0.5)
    searcher = HMMGraphSearch(prune_len=20)
    s = sc["seeds"][0]
    search_seed(
        s.nucl.lower(), s.model_pos - 1, fwd, rev, fwd_enum, rev_enum,
        sc["dbg"], searcher, {}, {},
    )
    assert searcher.stats.opened > 0
    assert searcher.stats.popped > 0
