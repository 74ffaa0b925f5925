"""Marginal per-step cost: run the wavefront kernel at several max_steps and
fit the slope (separates per-call tunnel RTT from true per-step cost).

Usage: python tools/slope.py [S] [B] [POOL_LOG2] [STEPS...]
"""
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]
import numpy as np
from megagta_tpu.utils.jaxconfig import setup_jax
setup_jax()
import jax, jax.numpy as jnp

from megagta_tpu.graph.sdbg import SdBG
from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm
from megagta_tpu.search.runner import _make_start
from megagta_tpu.search.wavefront import (
    WavefrontConfig, DeviceGraph, DeviceHMM, wavefront_search_merged,
)

S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
PL = int(sys.argv[3]) if len(sys.argv) > 3 else 12
CAP = int(os.environ.get("CAP", "0"))
PALLAS = bool(int(os.environ.get("PALLAS", "0")))
STEPS = [int(x) for x in sys.argv[4:]] or [64, 512]

CACHE = os.path.join(REPO, ".bench_cache")
meta = json.load(open(os.path.join(CACHE, "meta.json")))
dbg = SdBG.load(os.path.join(CACHE, "graph", "44"))
seeds = [tuple(s) for s in json.load(open(os.path.join(CACHE, "seeds.json")))]
fwd = parse_hmm(meta["forward_hmm"])

graph = DeviceGraph.from_sdbg(dbg)
hmm1 = DeviceHMM.from_profile(fwd, heuristic_table(fwd), jnp.float32)
hmmd = DeviceHMM.stack(hmm1, hmm1)
dirs = jnp.zeros((S,), jnp.int32)
si = np.zeros((S, 8), np.int32); sf = np.zeros((S, 3), np.float64)
si[:, 0] = -1
for i in range(S):
    n, ss = seeds[i % len(seeds)]
    si[i], sf[i] = _make_start(fwd, ss, n, True, dbg)

pts = []
for ms in STEPS:
    cfg = WavefrontConfig(pool_size=1 << PL, max_steps=ms, expand_width=B, cand_cap=CAP, use_pallas=PALLAS, use_pallas_expand=bool(int(os.environ.get('PEXP','0'))))
    t0 = time.perf_counter()
    res = wavefront_search_merged(graph, hmmd, dirs, jnp.asarray(si), jnp.asarray(sf, jnp.float32), cfg, fwd.model_length)
    jax.block_until_ready(res); compile_t = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        res = wavefront_search_merged(graph, hmmd, dirs, jnp.asarray(si), jnp.asarray(sf, jnp.float32), cfg, fwd.model_length)
        jax.block_until_ready(res)
        best = min(best, time.perf_counter() - t0)
    steps = int(res["steps"])
    pts.append((steps, best))
    print(f"S={S} B={B} P=2^{PL} max_steps={ms} steps={steps} compile={compile_t:.1f}s best_run={best*1000:.1f}ms", flush=True)

if len(pts) >= 2:
    (s0, t0), (s1, t1) = pts[0], pts[-1]
    if s1 != s0:
        slope = (t1 - t0) / (s1 - s0)
        print(f"marginal per-step = {slope*1000:.3f} ms; intercept ~= {1000*(t0 - slope*s0):.1f} ms")
