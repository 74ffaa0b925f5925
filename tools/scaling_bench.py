"""Measured scaling efficiency: search seeds/s at 1 vs 2 worker processes
(VERDICT r3 ask #5 / BASELINE driver metric "≥70% scaling 1 chip → N
workers").

Method: the small bench workload (1430 seeds, k=44 graph) is searched by
the PRODUCTION multihost path (jax.distributed over localhost, per-host
seed slices, shard-file merge). Each worker is pinned to one physical core
(taskset) so a worker models one accelerator: the 1-worker wall uses one
core, the 2-worker wall runs both halves genuinely in parallel on two
cores. efficiency = wall_1 / (n_workers * wall_n). Writes SCALING.json.

Usage: python tools/scaling_bench.py [n_seeds]
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 512

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_BODY = textwrap.dedent(
    """
    import os, sys, time, json
    sys.path[:0] = [os.environ["MEGAGTA_REPO"],
                    os.path.join(os.environ["MEGAGTA_REPO"], "tools")]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    nproc = int(os.environ["SCALE_NPROC"])
    pid = int(os.environ["SCALE_PID"])
    if nproc > 1:
        jax.distributed.initialize(
            os.environ["SCALE_COORD"], num_processes=nproc, process_id=pid
        )
    import jax.numpy as jnp
    import bench
    from megagta_tpu.hmm.heuristic import heuristic_table
    from megagta_tpu.hmm.parser import parse_hmm
    from megagta_tpu.parallel.dist import host_read_slice
    from megagta_tpu.search.runner import BatchSearcher
    from megagta_tpu.search.wavefront import WavefrontConfig

    meta, dbg, seeds = bench.build_inputs(os.environ.get("SCALE_PROFILE", "small"))
    seeds = seeds[: int(os.environ["SCALE_NSEEDS"])]
    fwd = parse_hmm(meta["forward_hmm"])
    rev = parse_hmm(meta["reverse_hmm"])
    if nproc > 1:
        lo, hi = host_read_slice(len(seeds))
        my = seeds[lo:hi]
    else:
        my = seeds

    def make_bs():
        return BatchSearcher(
            dbg, fwd, rev, heuristic_table(fwd), heuristic_table(rev),
            WavefrontConfig(pool_size=1 << 12, max_steps=1 << 11,
                            expand_width=8,
                            use_cache=os.environ.get("SCALE_NO_CACHE") != "1"),
            dtype=jnp.float32, chunk=128,
        )

    bs = make_bs()
    bs.warmup(my)
    if nproc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("warm")
    t0 = time.perf_counter()
    # production multihost path: phased search with cross-process cache
    # syncs (the shared-memory term-memo equivalent; runner.sync_caches).
    # SCALE_PHASES=0 runs plain per-host searches (no sync).
    phases = int(os.environ.get("SCALE_PHASES", "2"))
    if nproc > 1 and phases > 1:
        contigs = bs.search_phased(my, phases=phases)
    else:
        contigs = bs.search(my)
    if nproc > 1:
        multihost_utils.sync_global_devices("done")
    wall = time.perf_counter() - t0
    if pid == 0:
        with open(os.environ["SCALE_OUT"], "w") as f:
            json.dump({"wall": wall, "n": len(my)}, f)
    """
)


def run_config(nproc: int, n_seeds: int) -> float:
    port = _free_port()
    out = f"/tmp/scale_{nproc}.json"
    if os.path.exists(out):
        os.remove(out)
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(
            MEGAGTA_REPO=REPO,
            SCALE_NPROC=str(nproc),
            SCALE_PID=str(pid),
            SCALE_COORD=f"127.0.0.1:{port}",
            SCALE_OUT=out,
            SCALE_NSEEDS=str(n_seeds),
            JAX_PLATFORMS="cpu",
        )
        # one physical core per worker = one accelerator's compute
        cmd = ["taskset", "-c", str(pid % os.cpu_count()),
               sys.executable, "-c", _BODY]
        procs.append(subprocess.Popen(cmd, env=env))
    for p in procs:
        rc = p.wait(timeout=3600)
        assert rc == 0, f"worker failed rc={rc}"
    with open(out) as f:
        return json.load(f)["wall"]


def main():
    w1 = run_config(1, N_SEEDS)
    w2 = run_config(2, N_SEEDS)
    eff = w1 / (2 * w2)
    res = {
        "workload": f"{os.environ.get('SCALE_PROFILE', 'small')} bench, "
                    f"{N_SEEDS} seeds, k=44 graph",
        "method": "jax.distributed 2-process CPU, 1 core per worker "
                  "(taskset), production multihost seed-sharding path",
        "wall_1worker_s": round(w1, 3),
        "wall_2worker_s": round(w2, 3),
        "seeds_per_s_1w": round(N_SEEDS / w1, 1),
        "seeds_per_s_2w": round(N_SEEDS / w2, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.7,
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
