"""1 -> N virtual-device EP scaling curve at small-bench scale (VERDICT r4
ask #4): the seed axis sharded over an N-device CPU mesh through the
production BatchSearcher(mesh=...) path. Virtual devices share the host's
physical cores, so the curve measures SPMD partition overhead (and XLA's
per-shard work division), not hardware speedup; results must stay equal
across N. Appends to SCALING.json under "ep_curve"."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import bench
from megagta_tpu.hmm.heuristic import heuristic_table
from megagta_tpu.hmm.parser import parse_hmm
from megagta_tpu.parallel.mesh import make_mesh
from megagta_tpu.search.runner import BatchSearcher
from megagta_tpu.search.wavefront import WavefrontConfig


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    meta, dbg, seeds = bench.build_inputs("small")
    seeds = seeds[:n_seeds]
    fwd = parse_hmm(meta["forward_hmm"])
    rev = parse_hmm(meta["reverse_hmm"])
    curve = []
    base = None
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n) if n > 1 else None
        bs = BatchSearcher(
            dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
            WavefrontConfig(
                pool_size=1 << 12, max_steps=1 << 11, expand_width=8,
                use_cache=True,
            ),
            dtype=jnp.float32, chunk=128, mesh=mesh,
        )
        bs.warmup(seeds)
        t0 = time.perf_counter()
        contigs = bs.search(seeds)
        wall = time.perf_counter() - t0
        if base is None:
            base = contigs
        curve.append(
            {
                "devices": n,
                "wall_s": round(wall, 2),
                "seeds_per_s": round(n_seeds / wall, 1),
                "equal": contigs == base,
            }
        )
        print(json.dumps(curve[-1]), flush=True)
    path = os.path.join(REPO, "SCALING.json")
    rec = {}
    if os.path.exists(path):
        with open(path) as f:
            rec = json.load(f)
    rec["ep_curve"] = {
        "workload": f"small bench, {n_seeds} seeds, 8 virtual CPU devices",
        "note": "virtual devices share 2 physical cores: this measures "
        "SPMD partition overhead + correctness, not hardware speedup",
        "points": curve,
    }
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
