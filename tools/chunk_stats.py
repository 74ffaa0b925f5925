"""Per-chunk step/wall breakdown of the prod search (straggler analysis)."""
import json
import os
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
            pool_size=int(os.environ.get("BENCH_POOL", 1 << 12)),
            max_steps=1 << 11,
            expand_width=int(os.environ.get("BENCH_B", 16)),
            use_cache=True, use_pallas=on_tpu, use_pallas_expand=on_tpu,
        ),
        dtype=jnp.float32, chunk=chunk,
    )


bs = make_bs()
bs.warmup(seeds)  # compile all ladder shapes; cache state restored

orig_d = bs._dispatch_chunk
orig_f = bs._finish_chunk
log = []


def timed_d(seed_chunk, cfg=None, step_limit=None, width=None, act_thresh=0):
    t0 = time.perf_counter()
    ctx = orig_d(seed_chunk, cfg, step_limit, width, act_thresh)
    ctx["_n"] = len(seed_chunk)
    ctx["_pool"] = (cfg or bs.config).pool_size
    ctx["_thresh"] = act_thresh
    ctx["_t_disp"] = time.perf_counter() - t0
    return ctx


def timed_f(ctx):
    s0 = dict(bs.last_stats)
    t0 = time.perf_counter()
    out = orig_f(ctx)
    dt = time.perf_counter() - t0
    log.append({
        "n": ctx["_n"],
        "thresh": ctx["_thresh"],
        "pool": ctx["_pool"],
        "steps": bs.last_stats["steps"] - s0.get("steps", 0),
        "exp": bs.last_stats["expansions"] - s0.get("expansions", 0),
        "disp": round(ctx["_t_disp"], 3),
        "finish": round(dt, 3),
        "active_left": int(out[1].sum()),
        "ovf": int(out[2].sum()),
    })
    return out


bs._dispatch_chunk = timed_d
bs._finish_chunk = timed_f
t0 = time.perf_counter()
bs.search(seeds)
wall = time.perf_counter() - t0
for e in log:
    print(json.dumps(e))
print(json.dumps({"total_wall": wall, **bs.last_stats}))
