"""Benchmark: HMM-guided search throughput on deterministic synthetic
rplB-like workloads (BASELINE.md: search wall-clock + seeds/s/chip).
Prints ONE JSON line.

Headline = the PRODUCTION-scale workload (~15k seeds, ~250k-row graph —
the scale where accelerator dispatch amortizes; VERDICT round-2 ask #1);
the original small workload is reported in the detail line. vs_baseline =
reference C++ search wall-clock / our search wall-clock on the identical
workload + seed list (>1 means faster than the reference), with the
reference measured LIVE at this machine's core count when the .ref_build
binary exists (tools/build_ref.sh builds it on demand).
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

K = 45  # production k-list tail (megagta.py:89); graph k = 44
CACHE = os.path.join(REPO, ".bench_cache")
MEASURED = os.path.join(REPO, "BASELINE_MEASURED.json")


def build_inputs(profile: str):
    from synth_workload import make_workload, make_workload_production

    from megagta_tpu.graph.builder import build_sdbg
    from megagta_tpu.graph.sdbg import SdBG
    from megagta_tpu.io.fastx import parse_fastx_bytes, read_fastx
    from megagta_tpu.io.read_lib import ReadPackage
    from megagta_tpu.seeds.finder import find_seeds, ref_kmer_set

    sub = os.path.join(CACHE, profile) if profile != "small" else CACHE
    os.makedirs(sub, exist_ok=True)
    wl_dir = os.path.join(sub, "workload")
    meta_p = os.path.join(sub, "meta.json")
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)
    else:
        gen = make_workload_production if profile == "prod" else make_workload
        info = gen(wl_dir)
        meta = {k: v for k, v in info.items() if isinstance(v, str)}
        with open(meta_p, "w") as f:
            json.dump(meta, f)

    prefix = os.path.join(sub, "graph", str(K - 1))
    os.makedirs(os.path.dirname(prefix), exist_ok=True)
    if not os.path.exists(prefix + ".sdbg.npz"):
        flat, starts, _ = parse_fastx_bytes(meta["reads_fa"])
        pkg = ReadPackage(flat, starts)
        dbg = build_sdbg(pkg, K - 1)
        dbg.save(prefix)
    dbg = SdBG.load(prefix)

    seeds_p = os.path.join(sub, "seeds.json")
    if os.path.exists(seeds_p):
        with open(seeds_p) as f:
            seeds = [tuple(s) for s in json.load(f)]
    else:
        flat, starts, _ = parse_fastx_bytes(meta["reads_fa"])
        pkg = ReadPackage(flat, starts)
        records = [(r.name, r.seq) for r in read_fastx(meta["ref_aligned"])]
        refs = ref_kmer_set(records, K // 3)
        found = find_seeds(pkg, refs, K)
        seeds = [(s.nucl.lower(), s.model_pos - 1) for s in found]
        with open(seeds_p, "w") as f:
            json.dump(seeds, f)
    return meta, dbg, seeds


def ref_artifacts(profile: str, meta):
    """Reference per-seed golden outputs, if the reference pipeline already
    ran on this workload: (seed list in the reference's order, contig per
    seed index). Contig headers are `{gene}_contig_{2i}_contig_{2i+1}`
    (search.cpp:80, one line per starting kmer i)."""
    import re

    from megagta_tpu.io.fastx import read_fastx

    sub = os.path.join(CACHE, profile) if profile != "small" else CACHE
    k = K - 1
    gene = meta["gene_name"]
    seeds_p = os.path.join(sub, "ref", f"{k}_{gene}_starting_kmers.txt")
    contigs_p = os.path.join(sub, "ref", f"{k}_raw_contigs_{gene}.fasta")
    if not (os.path.exists(seeds_p) and os.path.exists(contigs_p)):
        return None
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


def gate_contigs(ours: list, ref_contigs: list) -> dict:
    """Per-seed equality vs the reference run (VERDICT r3 ask #2): every
    contig must match the reference's for the same starting kmer."""
    mism = [
        i
        for i, (a, b) in enumerate(zip(ours, ref_contigs))
        if b is not None and a.upper() != b
    ]
    return {"contig_equal": not mism, "contig_mismatches": len(mism),
            "mismatch_idx": mism[:20]}


def measure_ours(meta, dbg, seeds, chunk=None):
    chunk = chunk or int(os.environ.get("BENCH_CHUNK", 512))
    import jax
    import jax.numpy as jnp

    from megagta_tpu.hmm.heuristic import heuristic_table
    from megagta_tpu.hmm.parser import parse_hmm
    from megagta_tpu.search.runner import BatchSearcher
    from megagta_tpu.search.wavefront import WavefrontConfig

    fwd = parse_hmm(meta["forward_hmm"])
    rev = parse_hmm(meta["reverse_hmm"])
    on_tpu = jax.default_backend() == "tpu"

    pool = int(os.environ.get("BENCH_POOL", 1 << 12))
    thresh = int(os.environ.get("BENCH_THRESH", 0))
    bwidth = int(os.environ.get("BENCH_B", 16))
    # seed refill (continuous batching): resident rows streaming the
    # 2*chunk item queue; 0 = legacy one-row-per-item chunks (measured
    # FASTER on this workload: the punt-and-rerun scheduling skips
    # exploration that refill's full residence budgets pay; BASELINE.md
    # round-5 notes)
    refill = int(os.environ.get("BENCH_REFILL", 0))

    def make_bs():
        bs = BatchSearcher(
            dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
            WavefrontConfig(
                pool_size=pool,
                max_steps=1 << 11,
                expand_width=bwidth,
                cand_cap=int(os.environ.get("BENCH_CAND", 128)),
                use_cache=True,  # the reference's own term-node memo
                # (hmm_graph_search.h:211-234) is what makes it fast;
                # our deterministic equivalent is measured the same way
                use_pallas=on_tpu,
                # r5 ablation: at B=16 the fused expand kernel is 0.4
                # ms/step SLOWER than XLA's fusion of the same math
                use_pallas_expand=(
                    on_tpu
                    and os.environ.get("BENCH_EXPAND_PALLAS", "0") == "1"
                ),
            ),
            dtype=jnp.float32,
            chunk=chunk,
            refill_rows=refill,
            defer_steps=int(os.environ.get("BENCH_CAP", 256)),
        )
        if thresh:
            bs.main_thresh = thresh
        return bs

    # warm-up / compile (all three ladder shapes; warmup restores cache
    # state so the timed run below starts cold)
    bs = make_bs()
    bs.warmup(seeds)
    t0 = time.perf_counter()
    contigs = bs.search(seeds)
    wall = time.perf_counter() - t0
    return {
        "search_wall_s": wall,
        "steps": bs.last_stats["steps"],
        "expansions": bs.last_stats["expansions"],
        "seeds": len(seeds),
        "seeds_per_s": len(seeds) / wall,
        "contig_bases": sum(len(c) for c in contigs),
        "contig_digest": hashlib.sha256(
            "\n".join(contigs).encode()
        ).hexdigest()[:16],
        "overflow": bs.last_stats["overflow"],
        "cache_hits": bs.last_stats.get("cache_hits", 0),
        "walls": bs.last_stats.get("walls", {}),
        "t_get": round(bs.last_stats.get("t_get", 0.0), 3),
        "t_host": round(bs.last_stats.get("t_host", 0.0), 3),
        "deferred": bs.last_stats.get("deferred", 0),
        "stragglers": bs.last_stats.get("stragglers", 0),
        "escalated": bs.last_stats.get("escalated", 0),
        "device": str(jax.devices()[0]),
        "_contigs": contigs,
    }


def measure_buildgraph(meta, dbg):
    """TPU buildgraph wall-clock (VERDICT r3 ask #3): device-resident SdBG
    construction, warm-cache timing, content-checked against the cached
    host build."""
    import time

    from megagta_tpu.graph.device_builder import build_sdbg_device
    from megagta_tpu.io.fastx import parse_fastx_bytes
    from megagta_tpu.io.read_lib import ReadPackage

    flat, starts, _ = parse_fastx_bytes(meta["reads_fa"])
    pkg = ReadPackage(flat, starts)
    walls = []
    dev = None
    for _ in range(2):  # first run pays compilation; report the warm run
        t0 = time.perf_counter()
        dev = build_sdbg_device(pkg, K - 1)
        walls.append(time.perf_counter() - t0)
    equal = (
        dev.size == dbg.size
        and (dev.w == dbg.w).all()
        and (dev.last == dbg.last).all()
        and (dev.mult == dbg.mult).all()
    )
    return {
        "our_buildgraph_s": round(min(walls), 4),
        "our_buildgraph_cold_s": round(walls[0], 4),
        "buildgraph_equal": bool(equal),
    }


def measure_reference(meta, profile: str):
    import ref_oracle

    key = f"ref_{profile}"
    if not ref_oracle.available():
        if os.path.exists(MEASURED):
            with open(MEASURED) as f:
                return json.load(f).get(key)
        return None
    sub = os.path.join(CACHE, profile) if profile != "small" else CACHE
    res = ref_oracle.run_reference_pipeline(
        os.path.join(sub, "ref"),
        meta["reads_fa"], meta["gene_name"],
        meta["forward_hmm"], meta["reverse_hmm"], meta["ref_aligned"],
        K=K, threads=os.cpu_count() or 1,
    )
    out = {
        "ref_search_wall_s": res["timings"]["search"],
        "ref_buildgraph_s": res["timings"]["buildgraph"],
        "ref_threads": os.cpu_count() or 1,
    }
    rec = {}
    if os.path.exists(MEASURED):
        with open(MEASURED) as f:
            rec = json.load(f)
    rec[key] = out
    with open(MEASURED, "w") as f:
        json.dump(rec, f, indent=1)
    return out


def main():
    from megagta_tpu.utils.jaxconfig import setup_jax

    setup_jax()
    detail = {}

    meta, dbg, seeds = build_inputs("prod")
    ra = ref_artifacts("prod", meta)
    if ra is not None:
        ref_seeds, ref_contigs = ra
        assert set(seeds) == set(ref_seeds), "seed finder diverged from ref"
        seeds = ref_seeds  # the reference's order, for per-seed comparison
    ours = measure_ours(meta, dbg, seeds)
    ref = measure_reference(meta, "prod")
    vs = (
        ref["ref_search_wall_s"] / ours["search_wall_s"]
        if ref and ref.get("ref_search_wall_s")
        else 0.0
    )
    detail["prod"] = {**ours, **(ref or {}), "graph_rows": dbg.size}
    detail["prod"].update(measure_buildgraph(meta, dbg))
    our_contigs = ours.pop("_contigs")
    detail["prod"].pop("_contigs", None)
    if ra is not None:
        gate = gate_contigs(our_contigs, ref_contigs)
        detail["prod"].update(gate)
        if not gate["contig_equal"]:
            print(
                f"# CONTIG GATE FAILED: {gate['contig_mismatches']} of "
                f"{len(ref_contigs)} prod contigs differ from the reference "
                f"(first idx: {gate['mismatch_idx']})",
                file=sys.stderr,
            )

    meta_s, dbg_s, seeds_s = build_inputs("small")
    ours_s = measure_ours(meta_s, dbg_s, seeds_s)
    ours_s.pop("_contigs", None)
    ref_s = measure_reference(meta_s, "small")
    detail["small"] = {**ours_s, **(ref_s or {}), "graph_rows": dbg_s.size}
    if ref_s and ref_s.get("ref_search_wall_s"):
        detail["small"]["vs_baseline"] = round(
            ref_s["ref_search_wall_s"] / ours_s["search_wall_s"], 3
        )

    result = {
        "metric": "search_seeds_per_s",
        "value": round(ours["seeds_per_s"], 1),
        "unit": "seeds/s/chip",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(result))
    print("# " + json.dumps(detail), file=sys.stderr)


if __name__ == "__main__":
    main()
