"""Production-scale metagenome benchmark (VERDICT r4 ask #2).

A deterministic >=10M-read workload (BASELINE.json config #3: "large
metagenome read set, sharded k-mer counting"): a 10.5 Mb random background
tiled at step 1 plus an rplB-like 20-variant gene family, ~10.6M reads,
~21M-row k=44 graph. Exercises the paths that only exist for this scale:

  * RAM-bounded STREAMING counting (builder.edges_from_reads_streaming,
    forced via batch_reads; reference lv1 pass structure, cx1.h:125-202)
  * the RAW-TABLE search kernel (precompute_hops=False — the hop-table
    fallback for graphs too big for 8W B/row, wavefront.py)
  * memory budgeting + maxrss accounting on both sides

Reference (C++ MegaGTA, this box's core count) is run LIVE on the same
input when .ref_build exists; per-seed contig equality is gated on a
deterministic sample of the reference's own seed list.

Writes BIGBENCH.json at the repo root. Stages cache under
.bench_cache/metagenome/ so re-runs only pay what changed.
"""

from __future__ import annotations

import hashlib
import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [
    REPO, os.path.join(REPO, "tools"), os.path.join(REPO, "tests"),
]

import numpy as np

K = 45  # graph k = 44, matching the production bench
CACHE = os.path.join(REPO, ".bench_cache", "metagenome")
N_SAMPLE = int(os.environ.get("BIG_SAMPLE", 2000))
BATCH_READS = int(os.environ.get("BIG_BATCH_READS", 2_000_000))


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def make_workload() -> dict:
    """>=10M deterministic reads: a 5.25 Mb background tiled at step 1 in
    TWO passes (~10.3M reads, ~200x coverage) + 20 gene variants tiled at
    step 1. Sized so the device phase-2 BOSS sort (5E family rows x 11
    operands at E = pow2 distinct edges) stays inside one chip's HBM —
    ~10.5M distinct (k+1)-mers -> E=16M -> ~3.5 GB of sort operands."""
    from megagta_tpu.constants import dna_to_str
    from megagta_tpu.models.build import build_gene_resource
    from synthetic import mutate_peptide, random_peptide, reverse_translate

    os.makedirs(CACHE, exist_ok=True)
    meta_p = os.path.join(CACHE, "meta.json")
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            return json.load(f)
    rng = np.random.default_rng(4242)
    peptide = random_peptide(rng, 300)
    variants_aa = [peptide] + [
        mutate_peptide(rng, peptide, 0.05) for _ in range(19)
    ]
    genes = [reverse_translate(rng, p) for p in variants_aa]
    bg_codes = rng.integers(0, 4, size=5_250_000).astype(np.int8)
    background = dna_to_str(bg_codes)
    read_len = 100

    t0 = time.time()
    chunks = []
    rid = 0
    for g in genes:
        for i in range(0, len(g) - read_len + 1, 1):
            chunks.append(f">g{rid}\n{g[i : i + read_len]}\n")
            rid += 1
    # bulk background tiling, two passes (pure coverage, no new k-mers)
    n_bg = len(background) - read_len + 1
    for p in range(2):
        for lo in range(0, n_bg, 1_000_000):
            hi = min(lo + 1_000_000, n_bg)
            part = [
                f">b{p}_{j}\n{background[j : j + read_len]}\n"
                for j in range(lo, hi)
            ]
            chunks.append("".join(part))
    reads_fa = os.path.join(CACHE, "reads.fa")
    with open(reads_fa, "w") as f:
        f.write("".join(chunks))
    n_reads = rid + 2 * n_bg

    aligned = [(f"v{i}", p) for i, p in enumerate(variants_aa)] + [
        (f"x{i}", mutate_peptide(rng, peptide, 0.08)) for i in range(3)
    ]
    paths = build_gene_resource("rplB_like", aligned, CACHE)
    meta = {
        "reads_fa": reads_fa,
        "gene_name": "rplB_like",
        "n_reads": n_reads,
        "gen_wall_s": round(time.time() - t0, 1),
        **{k: v for k, v in paths.items()},
    }
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    return meta


def load_package(meta):
    from megagta_tpu.io.fastx import parse_fastx_bytes
    from megagta_tpu.io.read_lib import ReadPackage

    t0 = time.time()
    flat, starts, _ = parse_fastx_bytes(meta["reads_fa"])
    pkg = ReadPackage(flat, starts)
    return pkg, round(time.time() - t0, 1)


def build_graph(meta, pkg, out: dict):
    """Streaming build (cached): device engine by default at this scale
    (the host builder is the small-scale oracle; at 10M reads its python
    BOSS derivation is not the production path). BIG_HOST_BUILD=1 forces
    the host engine."""
    from megagta_tpu.graph.sdbg import SdBG

    prefix = os.path.join(CACHE, "graph", str(K - 1))
    os.makedirs(os.path.dirname(prefix), exist_ok=True)
    if not os.path.exists(prefix + ".sdbg.npz"):
        t0 = time.time()
        if os.environ.get("BIG_HOST_BUILD", "0") == "1":
            from megagta_tpu.graph.builder import build_sdbg

            dbg = build_sdbg(pkg, K - 1, batch_reads=BATCH_READS)
            out["host_buildgraph_s"] = round(time.time() - t0, 1)
        else:
            # device streaming build with the counted distinct-edge
            # relation cached between runs (phase 1 is ~8 min of tunnel
            # streaming; a phase-2 retry should not repay it)
            import jax.numpy as jnp

            from megagta_tpu.graph.builder import (
                edges_from_reads_streaming,
            )
            from megagta_tpu.graph.device_builder import (
                _phase2, _round_up_pow2, sdbg_from_phase2,
            )
            from megagta_tpu.ops.dna import pack_kmers

            edges_p = prefix + ".edges.npz"
            if os.path.exists(edges_p):
                z = np.load(edges_p)
                edges, mult_np = z["edges"], z["mult"]
            else:
                edges, mult_np = edges_from_reads_streaming(
                    pkg, K - 1, 1, BATCH_READS, engine="device"
                )
                np.savez(edges_p, edges=edges, mult=mult_np)
                out["count_stream_s"] = round(time.time() - t0, 1)
            n_edges = len(edges)
            t1 = time.time()
            E = _round_up_pow2(max(n_edges, 1))
            words = pack_kmers(edges, K)
            ek = np.full((E, 3), np.uint32(0xFFFFFFFF), np.uint32)
            ek[:n_edges, 0] = (words[:, 0] >> np.uint64(32)).astype(
                np.uint32
            )
            ek[:n_edges, 1] = (
                words[:, 0] & np.uint64(0xFFFFFFFF)
            ).astype(np.uint32)
            ek[:n_edges, 2] = (
                (words[:, 1] >> np.uint64(32)).astype(np.uint32)
                if words.shape[1] > 1
                else 0
            )
            ms = np.zeros(E, np.int32)
            ms[:n_edges] = mult_np
            res = _phase2(
                jnp.asarray(ek), jnp.asarray(ms),
                jnp.int32(n_edges), K - 1,
            )
            dbg = sdbg_from_phase2(res, K - 1)
            out["phase2_s"] = round(time.time() - t1, 1)
            out["device_buildgraph_cold_s"] = round(time.time() - t0, 1)
        out["build_maxrss_gb"] = rss_gb()
        dbg.save(prefix)
    dbg = SdBG.load(prefix)
    out["graph_rows"] = int(dbg.size)
    return dbg


def device_build(meta, pkg, dbg, out: dict):
    """WARM streaming device-engine build (the cold build happens in
    build_graph), content-checked against the cached graph. batch_reads
    keeps every stage RAM/HBM-bounded — a whole-array pass at 10M reads
    would materialize a ~14 GB occurrence multiset."""
    import jax

    from megagta_tpu.graph.device_builder import build_sdbg_device

    t0 = time.time()
    dev = build_sdbg_device(pkg, K - 1, batch_reads=BATCH_READS)
    out["device_buildgraph_s"] = round(time.time() - t0, 1)
    out["device_buildgraph_equal"] = bool(
        dev.size == dbg.size
        and (dev.w == dbg.w).all()
        and (dev.mult == dbg.mult).all()
    )
    out["device"] = str(jax.devices()[0])


def find_seed_list(meta, pkg, out: dict):
    from megagta_tpu.io.fastx import read_fastx
    from megagta_tpu.seeds.finder import find_seeds, ref_kmer_set

    seeds_p = os.path.join(CACHE, "seeds.json")
    if os.path.exists(seeds_p):
        with open(seeds_p) as f:
            return [tuple(s) for s in json.load(f)]
    records = [(r.name, r.seq) for r in read_fastx(meta["ref_aligned"])]
    refs = ref_kmer_set(records, K // 3)
    t0 = time.time()
    found = find_seeds(pkg, refs, K)
    out["findstart_s"] = round(time.time() - t0, 1)
    out["findstart_maxrss_gb"] = rss_gb()
    seeds = [(s.nucl.lower(), s.model_pos - 1) for s in found]
    with open(seeds_p, "w") as f:
        json.dump(seeds, f)
    return seeds


def run_reference(meta, out: dict):
    import ref_oracle

    if not ref_oracle.available():
        return None
    ref_dir = os.path.join(CACHE, "ref")
    res = ref_oracle.run_reference_pipeline(
        ref_dir, meta["reads_fa"], meta["gene_name"],
        meta["forward_hmm"], meta["reverse_hmm"], meta["ref_aligned"],
        K=K, threads=os.cpu_count() or 1,
    )
    out["ref_buildgraph_s"] = round(res["timings"]["buildgraph"], 2)
    out["ref_search_wall_s"] = round(res["timings"]["search"], 2)
    out["ref_threads"] = os.cpu_count() or 1
    return ref_dir


def ref_seed_contigs(ref_dir, gene):
    import re

    from megagta_tpu.io.fastx import read_fastx

    seeds_p = os.path.join(ref_dir, f"{K - 1}_{gene}_starting_kmers.txt")
    contigs_p = os.path.join(ref_dir, f"{K - 1}_raw_contigs_{gene}.fasta")
    seeds = []
    with open(seeds_p) as f:
        for line in f:
            t = line.split()
            if len(t) >= 8:
                seeds.append((t[3].lower(), int(t[7]) - 1))
    contigs = [None] * len(seeds)
    for r in read_fastx(contigs_p):
        m = re.search(r"_contig_(\d+)_contig_\d+$", r.name)
        if m:
            contigs[int(m.group(1)) // 2] = r.seq.upper()
    return seeds, contigs


def run_search(dbg, meta, seeds, out: dict, ref_contigs=None):
    import jax
    import jax.numpy as jnp

    from megagta_tpu.hmm.heuristic import heuristic_table
    from megagta_tpu.hmm.parser import parse_hmm
    from megagta_tpu.search.runner import BatchSearcher
    from megagta_tpu.search.wavefront import WavefrontConfig

    fwd = parse_hmm(meta["forward_hmm"])
    rev = parse_hmm(meta["reverse_hmm"])
    on_tpu = jax.default_backend() == "tpu"

    def make_bs(hops):
        return BatchSearcher(
            dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
            WavefrontConfig(
                pool_size=1 << 12, max_steps=1 << 11,
                expand_width=int(os.environ.get("BENCH_B", 16)),
                cand_cap=int(os.environ.get("BENCH_CAND", 128)),
                use_cache=True,
                use_pallas=on_tpu, use_pallas_expand=False,
                precompute_hops=hops,
            ),
            dtype=jnp.float32,
            chunk=512,
        )

    # deterministic sample of the seed list
    rng = np.random.default_rng(99)
    idx = np.sort(rng.choice(len(seeds), min(N_SAMPLE, len(seeds)), False))
    sample = [seeds[i] for i in idx]
    bs = make_bs(None)  # auto: path tables (graph fits the byte budget)
    bs.warmup(sample)
    t0 = time.time()
    contigs = bs.search(sample)
    wall = time.time() - t0
    out["search_wall_s"] = round(wall, 2)
    out["search_seeds"] = len(sample)
    out["seeds_total"] = len(seeds)
    out["seeds_per_s"] = round(len(sample) / wall, 1)
    out["expansions"] = bs.last_stats["expansions"]
    out["steps"] = bs.last_stats["steps"]
    out["overflow"] = bs.last_stats["overflow"]
    out["search_maxrss_gb"] = rss_gb()
    out["contig_digest"] = hashlib.sha256(
        "\n".join(contigs).encode()
    ).hexdigest()[:16]
    # raw-table memory-fallback kernel, exercised at scale on a subset
    # (per-step gathers serialize -> it exists for graphs whose path
    # tables exceed the HBM budget, not for speed)
    raw_n = int(os.environ.get("BIG_RAW_SEEDS", 100))
    bs_raw = make_bs(False)
    bs_raw.warmup(sample[:4])
    t0 = time.time()
    raw_contigs = bs_raw.search(sample[:raw_n])
    out["raw_tables_search_s"] = round(time.time() - t0, 2)
    out["raw_tables_seeds"] = raw_n
    out["raw_tables_equal"] = raw_contigs == contigs[:raw_n]
    return dict(zip(sample, contigs))


def main():
    from megagta_tpu.utils.jaxconfig import setup_jax

    setup_jax()
    out = {"config": "large metagenome (BASELINE.json #3)"}
    meta = make_workload()
    out["n_reads"] = meta["n_reads"]
    out["batch_reads"] = BATCH_READS
    pkg, parse_s = load_package(meta)
    out["parse_reads_s"] = parse_s
    out["parse_maxrss_gb"] = rss_gb()
    dbg = build_graph(meta, pkg, out)
    if os.environ.get("BIG_DEVICE_BUILD", "1") == "1":
        device_build(meta, pkg, dbg, out)
    seeds = find_seed_list(meta, pkg, out)
    del pkg
    # our (TPU) stages first; the CPU-only reference run comes after, and
    # the equality gate matches contigs BY SEED (nucl, model_pos) so the
    # two pipelines' seed orders need not coincide
    got = run_search(dbg, meta, seeds, out)
    with open(os.path.join(REPO, "BIGBENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    if os.environ.get("BIG_REFERENCE", "1") == "1":
        ref_dir = run_reference(meta, out)
        if ref_dir is not None:
            ref_seeds, ref_contigs = ref_seed_contigs(
                ref_dir, meta["gene_name"]
            )
            out["seed_sets_equal"] = set(ref_seeds) == set(seeds)
            ref_map = dict(zip(ref_seeds, ref_contigs))
            mism = [
                s[0][:24]
                for s, c in got.items()
                if ref_map.get(s) is not None and c.upper() != ref_map[s]
            ]
            out["contig_equal"] = not mism
            out["contig_mismatches"] = len(mism)
    with open(os.path.join(REPO, "BIGBENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
