"""Op-level profile of the wavefront step loop via jax.profiler + xprof.

Usage: python tools/xprof_step.py [S] [B] [STEPS]
"""
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]

import numpy as np

from megagta_tpu.utils.jaxconfig import setup_jax

setup_jax()
import jax
import jax.numpy as jnp

from megagta_tpu.graph.sdbg import SdBG
from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm
from megagta_tpu.search.runner import _make_start
from megagta_tpu.search.wavefront import (
    DeviceGraph, DeviceHMM, WavefrontConfig, wavefront_search_merged,
)

S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 256

CACHE = os.path.join(REPO, ".bench_cache", "prod")
meta = json.load(open(os.path.join(CACHE, "meta.json")))
dbg = SdBG.load(os.path.join(CACHE, "graph", "44"))
seeds = [tuple(s) for s in json.load(open(os.path.join(CACHE, "seeds.json")))]
fwd = parse_hmm(meta["forward_hmm"])

graph = DeviceGraph.from_sdbg(dbg)
hmm1 = DeviceHMM.from_profile(fwd, heuristic_table(fwd), jnp.float32)
hmmd = DeviceHMM.stack(hmm1, hmm1)
dirs = jnp.zeros((S,), jnp.int32)
si = np.zeros((S, 8), np.int32)
sf = np.zeros((S, 3), np.float64)
si[:, 0] = -1
for i in range(S):
    n, ss = seeds[i % len(seeds)]
    si[i], sf[i] = _make_start(fwd, ss, n, True, dbg)

on_tpu = jax.default_backend() == "tpu"
cfg = WavefrontConfig(
    pool_size=1 << 12, max_steps=STEPS, expand_width=B,
    use_cache=True, use_pallas=on_tpu, use_pallas_expand=on_tpu,
)
tab = jnp.full((2 << 19, 16), -1, jnp.int32)
args = (graph, hmmd, dirs, jnp.asarray(si), jnp.asarray(sf, jnp.float32),
        cfg, fwd.model_length, tab)
res = wavefront_search_merged(*args)
jax.block_until_ready(res)

logdir = "/tmp/xprof_step"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    t0 = time.perf_counter()
    res = wavefront_search_merged(*args)
    jax.block_until_ready(res)
    wall = time.perf_counter() - t0
print(f"wall {wall:.3f}s for {int(res['steps'])} steps "
      f"= {1000*wall/max(1,int(res['steps'])):.3f} ms/step", file=sys.stderr)

# ---- parse HLO op stats from the xplane (xprof gviz JSON)
xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
from xprof.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(xs, "hlo_stats", {})
s = data.decode() if isinstance(data, bytes) else data
tbl = json.loads(s)
cols = [c["id"] for c in tbl["cols"]]
rows = [
    dict(zip(cols, [c["v"] if isinstance(c, dict) else c for c in r["c"]]))
    for r in tbl["rows"]
]
key = "total_self_time" if "total_self_time" in cols else "total_time"
rows.sort(key=lambda r: -float(r.get(key) or 0))
tot = sum(float(r.get(key) or 0) for r in rows)
print(f"total device self time: {tot/1e6:.3f} s")
for r in rows[:25]:
    t = float(r.get(key) or 0)
    print(
        f"{t/1e3:8.2f}ms {100*t/tot:5.1f}% "
        f"x{int(float(r.get('occurrences') or 0)):5d} "
        f"{str(r.get('hlo_op_name'))[:30]:30s} "
        f"{str(r.get('hlo_op_expression'))[:110]}"
    )
