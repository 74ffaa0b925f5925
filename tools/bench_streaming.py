"""Streaming-counting scale benchmark: >= 10M synthetic reads through the
RAM-bounded batched pipeline (VERDICT round-2 ask #7).

Generates reads from a random genome at high coverage, streams them through
edges_from_reads_streaming (host or device engine), and reports wall time,
peak RSS and distinct-edge count.

    python tools/bench_streaming.py [n_reads=10_000_000] [engine=device]
"""

import os
import resource
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from megagta_tpu.graph.builder import edges_from_reads_streaming  # noqa: E402
from megagta_tpu.io.read_lib import ReadPackage  # noqa: E402
from megagta_tpu.utils.jaxconfig import setup_jax  # noqa: E402


def make_reads(n_reads: int, read_len: int = 100, genome_mb: float = 2.0):
    rng = np.random.default_rng(7)
    G = int(genome_mb * 1_000_000)
    genome = rng.integers(0, 4, G, dtype=np.int8)
    pos = rng.integers(0, G - read_len, n_reads)
    flat = np.empty(n_reads * read_len, np.int8)
    view = flat.reshape(n_reads, read_len)
    # batched gather keeps generation RAM at one slice
    B = 1_000_000
    win = np.lib.stride_tricks.sliding_window_view(genome, read_len)
    for lo in range(0, n_reads, B):
        view[lo : lo + B] = win[pos[lo : lo + B]]
    starts = np.arange(n_reads + 1, dtype=np.int64) * read_len
    return ReadPackage(flat, starts)


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    engine = sys.argv[2] if len(sys.argv) > 2 else "device"
    k = 44
    setup_jax()
    t0 = time.perf_counter()
    pkg = make_reads(n_reads)
    t_gen = time.perf_counter() - t0
    print(f"generated {n_reads} reads in {t_gen:.1f}s", flush=True)

    t0 = time.perf_counter()
    edges, mult = edges_from_reads_streaming(
        pkg, k, batch_reads=1_000_000, engine=engine
    )
    wall = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    occ = 2 * n_reads * (100 - k)
    print(
        f"engine={engine} reads={n_reads} wall={wall:.1f}s "
        f"occurrences={occ/1e6:.0f}M ({occ/wall/1e6:.1f}M/s) "
        f"distinct_edges={len(edges)} total_mult={int(mult.sum())} "
        f"peak_rss={rss:.1f}GB"
    )


if __name__ == "__main__":
    main()
