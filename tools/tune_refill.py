"""Sweep (chunk, refill_rows, item_cap) on the prod bench workload (real
TPU) and print wall/steps per config plus the contig digest so equality
with the reference run is visible at a glance."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]

import bench  # noqa: E402


def main():
    profile = os.environ.get("TUNE_PROFILE", "prod")
    meta, dbg, seeds = bench.build_inputs(profile)
    ra = bench.ref_artifacts(profile, meta)
    if ra is not None:
        seeds = ra[0]
    configs = json.loads(
        os.environ.get(
            "TUNE_CONFIGS",
            '[[512, 512, 256], [1024, 1024, 256]]',
        )
    )
    for chunk, refill, cap in configs:
        os.environ["BENCH_REFILL"] = str(refill)
        os.environ["BENCH_CAP"] = str(cap)
        t0 = time.perf_counter()
        res = bench.measure_ours(meta, dbg, seeds, chunk=chunk)
        res.pop("_contigs", None)
        res["config"] = {"chunk": chunk, "refill": refill, "cap": cap}
        res["total_with_warmup_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
