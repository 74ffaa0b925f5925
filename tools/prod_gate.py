"""Fast iteration on the prod bench: timed search + per-seed contig gate
against the cached reference artifacts (no reference re-run).

Usage: python tools/prod_gate.py [chunk]
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tools")]

import bench

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 512

meta, dbg, seeds = bench.build_inputs("prod")
ra = bench.ref_artifacts("prod", meta)
assert ra is not None, "run the reference pipeline first (bench.py does)"
ref_seeds, ref_contigs = ra
assert set(seeds) == set(ref_seeds)

if os.environ.get("HARVEST_GOAL_ONLY"):
    from megagta_tpu.search import runner

    _orig_post = runner.BatchSearcher.__post_init__

    def _post(self):
        _orig_post(self)
        self.harvest_partials = False

    runner.BatchSearcher.__post_init__ = _post
if os.environ.get("OUR_ORDER"):
    dup = len(ref_seeds) - len(set(ref_seeds))
    ref_map = {}
    for s, c in zip(ref_seeds, ref_contigs):
        ref_map.setdefault(s, set()).add(c)
    if dup:
        print(f"# {dup} duplicate seeds; ambiguous ref contigs: "
              f"{sum(1 for v in ref_map.values() if len(v) > 1)}")
    ref_seeds = seeds
    ref_contigs = [
        next(iter(ref_map[s])) if len(ref_map[s]) == 1 else None
        for s in seeds
    ]
ours = bench.measure_ours(meta, dbg, ref_seeds, chunk=chunk)
contigs = ours.pop("_contigs")
gate = bench.gate_contigs(contigs, ref_contigs)
print(json.dumps({**ours, **gate, "chunk": chunk}, default=str))
dump = os.environ.get("DUMP_MISMATCH")
if dump:
    with open(dump, "w") as f:
        for i, (a, b) in enumerate(zip(contigs, ref_contigs)):
            if b is not None and a.upper() != b:
                json.dump(
                    {"i": i, "seed": ref_seeds[i], "ours": a.upper(),
                     "ref": b},
                    f,
                )
                f.write("\n")
