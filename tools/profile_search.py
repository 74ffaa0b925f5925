"""Micro-profile of the wavefront kernel: ms/step vs expand_width."""
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
from megagta_tpu.search.runner import BatchSearcher, _make_start
from megagta_tpu.search.wavefront import WavefrontConfig, DeviceGraph, DeviceHMM, wavefront_search_merged

CACHE = os.path.join(REPO, ".bench_cache")
meta = json.load(open(os.path.join(CACHE, "meta.json")))
dbg = SdBG.load(os.path.join(CACHE, "graph", "44"))
seeds = [tuple(s) for s in json.load(open(os.path.join(CACHE, "seeds.json")))][:128]
fwd = parse_hmm(meta["forward_hmm"])

graph = DeviceGraph.from_sdbg(dbg)
hmm1 = DeviceHMM.from_profile(fwd, heuristic_table(fwd), jnp.float32)
hmmd = DeviceHMM.stack(hmm1, hmm1)
import jax.numpy as _jnp
dirs = _jnp.zeros((128,), _jnp.int32)
si = np.zeros((128, 8), np.int32); sf = np.zeros((128, 3), np.float64)
si[:, 0] = -1
for i, (n, ss) in enumerate(seeds):
    si[i], sf[i] = _make_start(fwd, ss, n, True, dbg)

for B in (1, 8, 32):
    for max_steps in (64,):
        cfg = WavefrontConfig(pool_size=1 << 14, max_steps=max_steps, expand_width=B)
        t0 = time.perf_counter()
        res = wavefront_search_merged(graph, hmmd, dirs, jnp.asarray(si), jnp.asarray(sf, jnp.float32), cfg, fwd.model_length)
        jax.block_until_ready(res["steps"]); compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = wavefront_search_merged(graph, hmmd, dirs, jnp.asarray(si), jnp.asarray(sf, jnp.float32), cfg, fwd.model_length)
        jax.block_until_ready(res["steps"]); run_t = time.perf_counter() - t0
        steps = int(res["steps"]); exp = int(res["expansions"])
        print(f"B={B:3d} steps={steps} compile={compile_t:.1f}s run={run_t:.2f}s ms/step={1000*run_t/max(steps,1):.2f} exp/s={exp/run_t:,.0f}")
