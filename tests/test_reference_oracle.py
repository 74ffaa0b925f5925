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


def test_denovo_contigs_match(both_runs, tmp_path):
    """Intermediate-k de novo assembly vs the reference denovo subcommand
    (canonical contig sets; both run on the same graph content)."""
    d, sc, paths, ref = both_runs
    ref_contigs_fa = ref_oracle.run_reference_denovo(
        str(tmp_path), ref["prefix"], max_tip_len=30, min_contig=31
    )
    from megagta_tpu.assembly.denovo import assemble
    from megagta_tpu.constants import dna_to_str, str_to_dna
    from megagta_tpu.io.fastx import read_fastx
    from megagta_tpu.ops.dna import revcomp

    def canon(s):
        s = s.upper()
        rc = dna_to_str(revcomp(str_to_dna(s)))
        return min(s, rc)

    ref_set = sorted(canon(r.seq) for r in read_fastx(ref_contigs_fa))
    dbg = build_sdbg(make_package(sc["reads"]), K - 1)
    contigs, _ = assemble(dbg, max_tip_len=30, min_contig=31)
    ours = sorted(canon(c.seq) for c in contigs)
    assert ours == ref_set


def test_denovo_contigs_match_noisy(tmp_path):
    """De novo oracle on error-containing reads (tips + bubbles exercised)."""
    rng = np.random.default_rng(31)
    from megagta_tpu.constants import dna_to_str
    from megagta_tpu.io.fastx import write_fasta

    genome = dna_to_str(rng.integers(0, 4, 800).astype(np.int8))
    reads = []
    for i in range(0, len(genome) - 60 + 1, 2):
        r = list(genome[i : i + 60])
        if rng.random() < 0.3:  # one substitution error in 30% of reads
            p = int(rng.integers(0, 60))
            r[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))
    reads_fa = str(tmp_path / "noisy.fa")
    write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(reads)])

    # reference: buildlib + buildgraph + denovo
    lib = str(tmp_path / "reads.lib")
    with open(lib, "w") as f:
        f.write(f"{reads_fa}\nse {reads_fa}\n")
    ref_oracle._run(["buildlib", lib, lib])
    prefix = str(tmp_path / "23")
    ref_oracle._run(
        ["buildgraph", "-k", 23, "-m", 1, "--host_mem", 2_000_000_000,
         "--mem_flag", 1, "--gpu_mem", 0, "--output_prefix", prefix,
         "--num_cpu_threads", 2, "--num_output_threads", 1,
         "--read_lib_file", lib]
    )
    ref_fa = ref_oracle.run_reference_denovo(
        str(tmp_path), prefix, max_tip_len=46, min_contig=24
    )
    from megagta_tpu.assembly.denovo import assemble
    from megagta_tpu.constants import dna_to_str as d2s, str_to_dna
    from megagta_tpu.io.fastx import read_fastx
    from megagta_tpu.ops.dna import revcomp

    def canon(s):
        s = s.upper()
        return min(s, d2s(revcomp(str_to_dna(s))))

    ref_set = sorted(canon(r.seq) for r in read_fastx(ref_fa))
    dbg = build_sdbg(make_package(reads), 23)
    contigs, _ = assemble(dbg, max_tip_len=46, min_contig=24)
    ours = sorted(canon(c.seq) for c in contigs)
    # the reference's own denovo output varies with its thread count on
    # overlapping bubbles (t=1 vs t=2 differ by 2 contigs on this input);
    # require equality within that nondeterminism envelope
    assert len(ours) == len(ref_set)
    sym_diff = set(ours) ^ set(ref_set)
    assert len(sym_diff) <= 4, f"too many contig differences: {len(sym_diff)}"


def test_mercy_graph_matches(tmp_path):
    """min_count=2 with mercy rescue vs the reference buildgraph --need_mercy
    (graph shape from .sdbg_info)."""
    rng = np.random.default_rng(41)
    from megagta_tpu.constants import dna_to_str
    from megagta_tpu.io.fastx import write_fasta

    genome = dna_to_str(rng.integers(0, 4, 3000).astype(np.int8))
    # mixed coverage: dense tiling plus a sparse region (mercy candidates)
    reads = [genome[i : i + 80] for i in range(0, len(genome) - 80 + 1, 2)]
    reads += [genome[i : i + 80] for i in range(500, 1500, 11)]
    reads_fa = str(tmp_path / "m.fa")
    write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    lib = str(tmp_path / "reads.lib")
    with open(lib, "w") as f:
        f.write(f"{reads_fa}\nse {reads_fa}\n")
    ref_oracle._run(["buildlib", lib, lib])
    prefix = str(tmp_path / "21")
    ref_oracle._run(
        ["buildgraph", "-k", 21, "-m", 2, "--host_mem", 2_000_000_000,
         "--mem_flag", 1, "--gpu_mem", 0, "--output_prefix", prefix,
         "--num_cpu_threads", 2, "--num_output_threads", 1,
         "--read_lib_file", lib, "--need_mercy"]
    )
    info = ref_oracle.parse_sdbg_info(prefix + ".sdbg_info")
    assert info["total_size"] > 0

    from megagta_tpu.graph.mercy import solid_windows_with_mercy

    pkg = make_package(reads)
    solid = solid_windows_with_mercy(pkg, 21, 2)
    dbg = build_sdbg(pkg, 21, min_count=2, solid_mask=solid)
    assert dbg.k == info["k"]
    assert dbg.size == info["total_size"], (dbg.size, info["total_size"])
    assert int(dbg.is_tip.sum()) == info["num_tips"]


def test_graph_content_matches(both_runs):
    """Full row-content equality vs the reference .sdbg item stream
    (W, last, tip flags, multiplicities, decoded tip labels) — not just the
    .sdbg_info shape counters."""
    d, sc, paths, ref = both_runs
    items = ref_oracle.parse_sdbg_items(ref["prefix"])
    dbg = build_sdbg(make_package(sc["reads"]), K - 1)
    assert items["k"] == dbg.k
    np.testing.assert_array_equal(dbg.w, items["w"])
    np.testing.assert_array_equal(dbg.last, items["last"])
    np.testing.assert_array_equal(dbg.is_tip, items["is_tip"])
    np.testing.assert_array_equal(
        np.minimum(dbg.mult, 65535), items["mult"]
    )
    labels = ref_oracle.tip_words_to_labels(items["tip_words"], items["k"])
    np.testing.assert_array_equal(dbg.tip_labels, labels)


def test_bench_workload_k44_graph_and_contigs(tmp_path):
    """The production bench workload (k=44, synthetic rplB-like family):
    graph content equality via the item stream AND contig equality via the
    wavefront searcher — previously only exercised at k=30."""
    from synth_workload import make_workload

    import jax.numpy as jnp

    from megagta_tpu.io.fastx import parse_fastx_bytes
    from megagta_tpu.search.runner import BatchSearcher
    from megagta_tpu.search.wavefront import WavefrontConfig

    KB = 45
    info = make_workload(str(tmp_path / "wl"))
    flat, starts, _ = parse_fastx_bytes(info["reads_fa"])
    pkg = ReadPackage(flat, starts)
    ref = ref_oracle.run_reference_pipeline(
        str(tmp_path / "ref"), info["reads_fa"], info["gene_name"],
        info["forward_hmm"], info["reverse_hmm"], info["ref_aligned"],
        K=KB, threads=1,
    )
    dbg = build_sdbg(pkg, KB - 1)
    items = ref_oracle.parse_sdbg_items(ref["prefix"])
    np.testing.assert_array_equal(dbg.w, items["w"])
    np.testing.assert_array_equal(dbg.last, items["last"])
    np.testing.assert_array_equal(
        np.minimum(dbg.mult, 65535), items["mult"]
    )
    np.testing.assert_array_equal(
        dbg.tip_labels,
        ref_oracle.tip_words_to_labels(items["tip_words"], items["k"]),
    )

    # PER-SEED contig equality on a seed subsample (full 5720-seed equality
    # at prod scale is bench.py's gate; 150 seeds keep this test CPU-sized).
    # Ref contig i maps to seed i via its `_contig_{2i}_contig_{2i+1}`
    # header (search.cpp:80); run with the cache ON and OFF so a
    # cache-composition bug cannot hide behind set membership.
    import re as re_mod

    n_seeds = 150
    by_idx = {}
    for r in read_fastx(ref["contigs"]):
        m = re_mod.search(r"_contig_(\d+)_contig_\d+$", r.name)
        by_idx[int(m.group(1)) // 2] = r.seq.upper()
    fwd = parse_hmm(info["forward_hmm"])
    rev = parse_hmm(info["reverse_hmm"])
    seeds = read_seed_file(ref["seeds"])[:n_seeds]
    want = [by_idx[i] for i in range(n_seeds)]
    for use_cache in (True, False):
        bs = BatchSearcher(
            dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
            WavefrontConfig(pool_size=1 << 12, max_steps=1 << 11,
                            expand_width=8, use_cache=use_cache),
            dtype=jnp.float64, chunk=64,
        )
        ours = [c.upper() for c in bs.search(seeds)]
        assert ours == want, (
            f"use_cache={use_cache}: "
            f"{sum(a != b for a, b in zip(ours, want))}/{n_seeds} differ"
        )
