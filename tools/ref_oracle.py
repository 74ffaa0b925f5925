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
    """Parse the reference .sdbg_info header + per-bucket table
    (sdbg_multi_io.h:161-181): bucket lines are
    `bucket thread_id starting_offset num_items num_tips num_large_mul`."""
    out = {"buckets": []}
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) == 2 and toks[0] in (
                "k", "words_per_tip_label", "num_buckets", "num_threads",
                "total_size", "num_tips", "large_multi",
            ):
                out[toks[0]] = int(toks[1])
            elif len(toks) == 6:
                b, tid, off, n, _nt, _nl = map(int, toks)
                if tid >= 0 and n > 0:
                    out["buckets"].append((b, tid, off, n))
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


def parse_sdbg_items(prefix: str) -> dict:
    """Parse the reference's .sdbg.{tid} item stream into row arrays.

    Format (sdbg_multi_io.h:83-112, SdbgWriter::write): per row one uint16
    `w | last<<4 | tip<<5 | min(mult,255)<<8`; multiplicities > 254 append
    the full uint16; tip rows append words_per_tip_label uint32 label words
    (2-bit chars, big-endian within each word). Rows are grouped by bucket;
    the .sdbg_info bucket table maps bucket -> (thread file, byte offset,
    item count), and ascending-bucket traversal yields global row order.
    """
    import struct

    info = parse_sdbg_info(prefix + ".sdbg_info")
    wptl = info["words_per_tip_label"]
    buckets = info["buckets"]
    data = {}
    for tid in range(info["num_threads"]):
        with open(f"{prefix}.sdbg.{tid}", "rb") as f:
            data[tid] = f.read()
    w, last, tip, mult = [], [], [], []
    tip_words = []
    for bucket, tid, off, n_items in buckets:
        if n_items == 0:
            continue
        buf = data[tid]
        pos = off
        for _ in range(n_items):
            (item,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            m = item >> 8
            if m == 255:
                (m,) = struct.unpack_from("<H", buf, pos)
                pos += 2
            is_tip = (item >> 5) & 1
            w.append(item & 0xF)
            last.append((item >> 4) & 1)
            tip.append(is_tip)
            mult.append(m)
            if is_tip:
                tip_words.append(struct.unpack_from(f"<{wptl}I", buf, pos))
                pos += 4 * wptl
    import numpy as np

    return {
        "w": np.array(w, np.uint8),
        "last": np.array(last, bool),
        "is_tip": np.array(tip, bool),
        "mult": np.array(mult, np.int32),
        "tip_words": np.array(tip_words, np.uint32).reshape(-1, wptl),
        "k": info["k"],
    }


def tip_words_to_labels(tip_words, k: int):
    """Decode tip label words to (k-1)-char code arrays (natural order).

    succinct_dbg.cpp Label(): char j of the word stream fills seq[i - j]
    (2-bit big-endian within each uint32)."""
    import numpy as np

    n = len(tip_words)
    out = np.zeros((n, k - 1), np.int8)
    for j in range(k - 1):
        wword = tip_words[:, j // 16]
        shift = (16 - 1 - (j % 16)) * 2
        out[:, k - 2 - j] = (wword >> shift) & 3
    return out
