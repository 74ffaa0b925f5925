"""Wavefront (batched, jitted) search vs the serial oracle — contig equality.

Run in float64 (JAX x64) so the only remaining differences are tie-breaks
the C++ reference itself leaves unspecified.
"""

import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from megagta_tpu.graph.builder import build_sdbg
from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm
from megagta_tpu.models.build import build_gene_resource
from megagta_tpu.search.astar import HMMGraphSearch, NodeEnumerator, search_seed
from megagta_tpu.search.runner import BatchSearcher
from megagta_tpu.search.wavefront import WavefrontConfig
from megagta_tpu.seeds.finder import find_seeds, ref_kmer_set
from tests.synthetic import make_scenario
from tests.test_graph import make_package


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    sc = make_scenario(seed=7, gene_aa_len=70, read_len=60, read_step=5)
    out = tmp_path_factory.mktemp("wf")
    paths = build_gene_resource("wfg", sc["aligned"], str(out))
    K = 30
    dbg = build_sdbg(make_package(sc["reads"]), K - 1)
    ref = ref_kmer_set(sc["aligned"], K // 3)
    seeds = find_seeds(make_package(sc["reads"]), ref, K)
    fwd = parse_hmm(paths["forward_hmm"])
    rev = parse_hmm(paths["reverse_hmm"])
    return sc, dbg, seeds, fwd, rev


def oracle_contigs(dbg, seeds, fwd, rev, n):
    fe = NodeEnumerator(fwd, heuristic_table(fwd), 0.5)
    re_ = NodeEnumerator(rev, heuristic_table(rev), 0.5)
    searcher = HMMGraphSearch(20)
    out = []
    for s in seeds[:n]:
        # fresh term caches per seed: the wavefront has no cross-seed cache
        out.append(
            search_seed(
                s.nucl.lower(), s.model_pos - 1, fwd, rev, fe, re_, dbg,
                searcher, {}, {},
            )
        )
    return out


def test_wavefront_matches_oracle(setup):
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)

    bs = BatchSearcher(
        dbg,
        fwd,
        rev,
        heuristic_table(fwd),
        heuristic_table(rev),
        WavefrontConfig(pool_size=1 << 13, max_steps=1 << 11),
        dtype=jnp.float64,
        chunk=16,
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert bs.last_stats["overflow"] == 0
    assert bs.last_stats["expansions"] > 0

    mismatches = [
        (i, e, g) for i, (e, g) in enumerate(zip(expected, got)) if e != g
    ]
    assert not mismatches, (
        f"{len(mismatches)}/{n} contigs differ; first: "
        f"oracle={mismatches[0][1][:80]} wavefront={mismatches[0][2][:80]}"
    )


def test_wavefront_gene_recovery(setup):
    sc, dbg, seeds, fwd, rev = setup
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(pool_size=1 << 13, max_steps=1 << 11),
        dtype=jnp.float64,
        chunk=16,
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:12]])
    gene = sc["gene"]
    assert any(len(c) >= len(gene) - 60 for c in got)
    for c in got:
        assert c.upper() in gene.upper()  # clean tiled reads: exact recovery


def test_wavefront_wide_matches_oracle(setup):
    """expand_width > 1 explores a superset; on this scenario the results
    should still match the serial oracle exactly."""
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(pool_size=1 << 13, max_steps=1 << 10, expand_width=8),
        dtype=jnp.float64,
        chunk=16,
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert got == expected


def test_wavefront_cand_cap_matches_oracle(setup):
    """Candidate compression (turbo): top-cand_cap by fval per step — on
    this scenario the cap is loose enough to be lossless, so the results
    still equal the serial oracle and no overflow is flagged."""
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(
            pool_size=1 << 13, max_steps=1 << 10, expand_width=8,
            cand_cap=192,
        ),
        dtype=jnp.float64,
        chunk=16,
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert bs.last_stats["overflow"] == 0
    assert got == expected


def test_wavefront_sharded_over_mesh(setup):
    """Seed axis sharded over the 8-device CPU mesh: same results."""
    import jax
    from megagta_tpu.parallel.mesh import make_mesh

    sc, dbg, seeds, fwd, rev = setup
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(8)
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(pool_size=1 << 12, max_steps=1 << 10, expand_width=4),
        dtype=jnp.float64,
        chunk=16,
        mesh=mesh,
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert got == expected


def test_wavefront_path_cache(setup):
    """Cross-seed path cache (turbo): same contigs on the clean scenario,
    with hits actually occurring on later chunks."""
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(
            pool_size=1 << 12, max_steps=1 << 10, expand_width=4,
            use_cache=True,
        ),
        dtype=jnp.float64,
        chunk=4,  # several chunks so the cache takes effect
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert bs.last_stats["cache_hits"] > 0
    assert got == expected


def test_wavefront_pallas_selection(setup):
    """Fused Pallas select+kill AND expand kernels (interpret mode on CPU):
    same contigs as the serial oracle."""
    sc, dbg, seeds, fwd, rev = setup
    n = 6
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(
            pool_size=1 << 12, max_steps=1 << 10,
            use_pallas=True, use_pallas_expand=True,
        ),
        dtype=jnp.float64,
        chunk=8,
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert got == expected


def test_wavefront_raw_tables_match_hop_tables(setup):
    """The memory-fallback raw 3-gather kernel equals the hop-table kernel."""
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    outs = []
    for hops in (True, False):
        bs = BatchSearcher(
            dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
            WavefrontConfig(
                pool_size=1 << 13, max_steps=1 << 11, precompute_hops=hops
            ),
            dtype=jnp.float64,
            chunk=16,
        )
        outs.append(bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]]))
    assert outs[0] == outs[1]


def test_wavefront_unequal_hmm_lengths(setup, tmp_path):
    """Real gene resources build fwd/rev HMMs with independent hmmbuild runs
    (bin/prepare_gene_ref.sh), so the models can disagree by a column. The
    searcher must fall back to direction-homogeneous runs and still match
    the serial oracle (which always runs the directions separately)."""
    from megagta_tpu.models.build import build_hmm_tables, write_hmm
    from megagta_tpu.constants import AA_ALPHABET

    sc, dbg, seeds, fwd, rev = setup
    # reverse alignment with one extra all-residue column -> one extra
    # match state at the start of the reverse model
    rev_rows = [s[::-1] + "A" for s in sc["aligned_seqs"]] if isinstance(
        sc.get("aligned_seqs"), list
    ) else [s[::-1] + "A" for _, s in sc["aligned"]]
    mp, ip, tp, compo, _ = build_hmm_tables(rev_rows)
    p = tmp_path / "rev2.hmm"
    write_hmm(str(p), "wfg_rev2", mp, ip, tp, compo, AA_ALPHABET)
    rev2 = parse_hmm(str(p))
    assert rev2.model_length == fwd.model_length + 1

    n = min(8, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev2, n)
    bs = BatchSearcher(
        dbg, fwd, rev2, heuristic_table(fwd), heuristic_table(rev2),
        WavefrontConfig(pool_size=1 << 13, max_steps=1 << 11),
        dtype=jnp.float64,
        chunk=16,
    )
    assert not bs.merged
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert got == expected


def test_wavefront_refill_matches_oracle(setup):
    """Seed refill (continuous batching): rows < items, finished rows load
    the next queued seed mid-run. Results must equal the serial oracle."""
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(pool_size=1 << 12, max_steps=1 << 10, expand_width=4),
        dtype=jnp.float64,
        chunk=16,          # 32 items
        refill_rows=16,    # over 16 resident rows -> at least one refill
    )
    assert bs.cfg_main.rows == 16 and bs.cfg_main.item_cap == bs.defer_steps
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert bs.last_stats["overflow"] == 0
    assert got == expected


def test_wavefront_refill_with_cache_matches_oracle(setup):
    """Refill + cross-seed path cache + candidate compression (the
    production configuration): still oracle-equal."""
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(
            pool_size=1 << 12, max_steps=1 << 10, expand_width=4,
            cand_cap=96, use_cache=True,
        ),
        dtype=jnp.float64,
        chunk=4,           # several chunks so the cache takes effect
        refill_rows=16,    # wait: 2*chunk = 8 <= 16 -> clamped to Q, legacy
    )
    bs.refill_rows = 16
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert got == expected


def test_wavefront_refill_tight_rows(setup):
    """Many items through few rows (heavy refill traffic) with a small
    per-item cap that forces deferrals into the escalation ladder."""
    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    expected = oracle_contigs(dbg, seeds, fwd, rev, n)
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(pool_size=1 << 12, max_steps=1 << 10, expand_width=2),
        dtype=jnp.float64,
        chunk=n,           # all items in ONE chunk over 16 rows
        refill_rows=16,
        defer_steps=48,    # small residence budget -> deferrals happen
    )
    got = bs.search([(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]])
    assert got == expected


def test_wavefront_two_tier_fallback(setup, monkeypatch):
    """The two-tier chain transfer's full-width FALLBACK (more long rows
    than NLONG slots — the cold-chunk case) must reproduce the default
    path's results exactly. Tiny tier knobs force the fallback on CPU."""
    import megagta_tpu.search.runner as runner_mod

    sc, dbg, seeds, fwd, rev = setup
    n = min(12, len(seeds))
    sl = [(s.nucl.lower(), s.model_pos - 1) for s in seeds[:n]]
    import jax.numpy as jnp2

    def run():
        bs = BatchSearcher(
            dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
            WavefrontConfig(
                pool_size=1 << 12, max_steps=1 << 10, expand_width=4,
            ),
            dtype=jnp2.float32,  # the two-tier path is f32-only
            chunk=16,
        )
        return bs.search(sl)

    expected = run()
    monkeypatch.setattr(runner_mod, "_TIER_SHORT", 1)
    monkeypatch.setattr(runner_mod, "_tier_nlong", lambda S: 2)
    got = run()
    assert got == expected
