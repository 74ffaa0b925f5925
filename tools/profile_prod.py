"""cProfile the prod-profile bench search to split host vs device time."""
import cProfile
import io
import json
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]

from megagta_tpu.utils.jaxconfig import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
import bench

meta, dbg, seeds = bench.build_inputs("prod")
print(f"seeds={len(seeds)} rows={dbg.size}", file=sys.stderr)

from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm
from megagta_tpu.search.runner import BatchSearcher
from megagta_tpu.search.wavefront import WavefrontConfig

fwd = parse_hmm(meta["forward_hmm"])
rev = parse_hmm(meta["reverse_hmm"])
on_tpu = jax.default_backend() == "tpu"


def make_bs(chunk=512):
    return BatchSearcher(
        dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
        WavefrontConfig(
            pool_size=1 << 12, max_steps=1 << 11, expand_width=8,
            use_cache=True, use_pallas=on_tpu, use_pallas_expand=on_tpu,
        ),
        dtype=jnp.float32, chunk=chunk,
    )


bs = make_bs()
bs.search(seeds[: bs.chunk + 1])  # warm-up/compile
bs = make_bs()
pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
contigs = bs.search(seeds)
pr.disable()
wall = time.perf_counter() - t0
print(json.dumps({"wall": wall, **bs.last_stats}), file=sys.stderr)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(40)
print(s.getvalue())
