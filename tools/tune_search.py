"""Parameter sweep for the wavefront searcher on the bench workload.

Usage: python tools/tune_search.py CHUNK B [POOL_LOG2] [CACHE(0/1)] [CAP]
Prints wall, expansions/s and a contig-set digest for equality checking.
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402


def main():
    chunk = int(sys.argv[1])
    B = int(sys.argv[2])
    pool_log2 = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    use_cache = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    cap = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    import jax.numpy as jnp

    from megagta_tpu.hmm.heuristic import heuristic_table
    from megagta_tpu.hmm.parser import parse_hmm
    from megagta_tpu.search.runner import BatchSearcher
    from megagta_tpu.search.wavefront import WavefrontConfig
    from megagta_tpu.utils.jaxconfig import setup_jax

    setup_jax()
    meta, dbg, seeds = bench.build_inputs("small")
    fwd = parse_hmm(meta["forward_hmm"])
    rev = parse_hmm(meta["reverse_hmm"])
    bs = BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(
            max_steps=1 << 11,
            expand_width=B,
            use_cache=use_cache,
            cand_cap=cap,
            use_pallas=bool(int(os.environ.get("PALLAS", "0"))),
            use_pallas_expand=bool(int(os.environ.get("PEXP", "0"))),
            pool_size=1 << pool_log2,
        ),
        dtype=jnp.float32,
        chunk=chunk,
    )
    # compile both shapes (full chunk + the cache warm-chunk)
    bs.search(seeds[: min(chunk + 1, len(seeds))])
    if bs.cache_f is not None:
        bs.cache_f = type(bs.cache_f)()
        bs.cache_r = type(bs.cache_r)()
        bs._dev_cache = None
    t0 = time.perf_counter()
    contigs = bs.search(seeds)
    wall = time.perf_counter() - t0
    digest = hashlib.sha256(
        "\n".join(sorted(set(contigs))).encode()
    ).hexdigest()[:16]
    print(json.dumps({
        "chunk": chunk, "B": B, "pool": 1 << pool_log2, "cache": use_cache,
        "wall_s": round(wall, 3),
        "steps": bs.last_stats["steps"],
        "expansions": bs.last_stats["expansions"],
        "exp_per_s": round(bs.last_stats["expansions"] / wall, 1),
        "overflow": bs.last_stats["overflow"],
        "cache_hits": bs.last_stats.get("cache_hits", 0),
        "contig_bases": sum(len(c) for c in contigs),
        "digest": digest,
    }))


if __name__ == "__main__":
    main()
