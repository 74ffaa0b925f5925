"""Harness that drives the C++ reference binary (built in .ref_build) on a
workload, mirroring the stage invocations of src/megagta.py, to produce
golden outputs and baseline timings for oracle tests and bench.py.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, ".ref_build", "src", "megagta")
REF_SRC = "/root/reference/src"


def available() -> bool:
    """True when the reference binary exists; builds it on first call when
    the reference source tree is present (tools/build_ref.sh, ~1 min)."""
    if os.path.exists(REF_BIN):
        return True
    if not os.path.isdir(REF_SRC):
        return False
    try:
        subprocess.run(
            [os.path.join(REPO, "tools", "build_ref.sh")],
            check=True, capture_output=True, timeout=1200,
        )
    except (subprocess.SubprocessError, OSError) as e:
        sys.stderr.write(f"reference build failed: {e}\n")
        return False
    return os.path.exists(REF_BIN)


def _run(args, stdout=None, timeout=3600):
    t0 = time.perf_counter()
    out = open(stdout, "w") if stdout else subprocess.DEVNULL
    try:
        res = subprocess.run(
            [REF_BIN] + [str(a) for a in args],
            stdout=out,
            stderr=subprocess.PIPE,
            timeout=timeout,
        )
    finally:
        if stdout:
            out.close()
    dt = time.perf_counter() - t0
    if res.returncode != 0:
        raise RuntimeError(
            f"reference {args[0]} failed rc={res.returncode}:\n"
            + res.stderr.decode()[-2000:]
        )
    return dt, res.stderr.decode()


def run_reference_pipeline(
    work: str,
    reads_fa: str,
    gene_name: str,
    fwd_hmm: str,
    rev_hmm: str,
    ref_aligned: str,
    K: int = 30,
    min_count: int = 1,
    prune_len: int = 20,
    low_cov_penalty: float = 0.5,
    threads: int = 1,
) -> dict:
    """Single-k reference run: buildlib -> buildgraph -> findstart -> search.

    K is the k-list entry; the graph runs at K-1 (megagta.py:815-816).
    Returns file paths + per-stage timings.
    """
    os.makedirs(work, exist_ok=True)
    k = K - 1
    lib = os.path.join(work, "reads.lib")
    with open(lib, "w") as f:
        f.write(f"{reads_fa}\nse {reads_fa}\n")

    timings = {}
    timings["buildlib"], _ = _run(["buildlib", lib, lib])

    prefix = os.path.join(work, f"{k}")
    timings["buildgraph"], _ = _run(
        [
            "buildgraph", "-k", k, "-m", min_count,
            "--host_mem", 4_000_000_000, "--mem_flag", 1, "--gpu_mem", 0,
            "--output_prefix", prefix, "--num_cpu_threads", max(2, threads),
            "--num_output_threads", 1,
            "--read_lib_file", lib,
        ]
    )

    seeds_txt = f"{prefix}_{gene_name}_starting_kmers.txt"
    timings["findstart"], _ = _run(
        ["findstart", ref_aligned, lib + ".bin", K, threads], stdout=seeds_txt
    )

    gene_list = os.path.join(work, "gene_list.txt")
    with open(gene_list, "w") as f:
        f.write(f"{gene_name} {fwd_hmm} {rev_hmm}\n")
    timings["search"], search_log = _run(
        ["search", prefix, gene_list, prefix, prefix, prune_len,
         low_cov_penalty, threads]
    )

    return {
        "prefix": prefix,
        "seeds": seeds_txt,
        "contigs": f"{prefix}_raw_contigs_{gene_name}.fasta",
        "sdbg_info": f"{prefix}.sdbg_info",
        "timings": timings,
        "search_log": search_log,
    }


def parse_sdbg_info(path: str) -> dict:
    """Parse the reference .sdbg_info header (sdbg_multi_io.h:161-181)."""
    out = {}
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) == 2 and toks[0] in (
                "k", "words_per_tip_label", "num_buckets", "num_threads",
                "total_size", "num_tips", "large_multi",
            ):
                out[toks[0]] = int(toks[1])
    return out


def run_reference_denovo(
    work: str,
    sdbg_prefix: str,
    max_tip_len: int = 30,
    min_contig: int = 0,
    min_standalone: int = 400,
) -> str:
    """Run the reference `denovo` on an already-built graph; returns the
    contigs path (megagta.py:588-601 stage invocation)."""
    out_prefix = os.path.join(work, "denovo")
    args = [
        "denovo", "-s", sdbg_prefix, "-o", out_prefix, "-t", 2,
        "--min_standalone", min_standalone, "--max_tip_len", max_tip_len,
        "--min_contig", min_contig,
    ]
    _run(args)
    return out_prefix + ".contigs.fa"
