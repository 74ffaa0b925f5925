"""Two-process jax.distributed pipeline test (CPU backend).

Drives parallel/dist.py through its production caller (pipeline.driver):
two OS processes initialize jax.distributed over localhost, the search
stage shards seeds per host (host_read_slice) and process 0 merges the
shard files; the merged raw contigs must equal a single-process run's.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

from tests.synthetic import make_scenario

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys, time
    sys.path.insert(0, os.environ["MEGAGTA_REPO"])
    os.environ["JAX_PLATFORMS"] = "cpu"
    # this environment's TPU plugin ignores the env var; jax.config wins
    import jax
    jax.config.update("jax_platforms", "cpu")
    from megagta_tpu.pipeline.driver import Options, Pipeline
    opt = Options(
        out_dir=os.environ["OUT_DIR"],
        k_list=[30],
        reads=[os.environ["READS_FA"]],
        gene_list=os.environ["GENE_LIST"],
        use_wavefront=True,
        pool_size=1 << 10,
        max_steps=1 << 9,
        expand_width=4,
        chunk=16,
        min_contig_len=30,
    )
    p = Pipeline(opt)
    assert p.multihost, "jax.distributed did not initialize"
    laps = p.run()
    if p.p0:
        import json
        with open(os.path.join(os.environ["OUT_DIR"], "laps.json"), "w") as f:
            json.dump(laps, f)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scenario_files(tmp_path):
    from megagta_tpu.io.fastx import write_fasta
    from megagta_tpu.models.build import build_gene_resource

    sc = make_scenario(seed=13, gene_aa_len=40, read_len=61, read_step=4)
    reads_fa = str(tmp_path / "reads.fa")
    write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(sc["reads"])])
    res = build_gene_resource("geneA", sc["aligned"], str(tmp_path / "genes"))
    gene_list = str(tmp_path / "genes.txt")
    with open(gene_list, "w") as f:
        f.write(
            f"geneA {res['forward_hmm']} {res['reverse_hmm']}"
            f" {res['ref_aligned']}\n"
        )
    return sc, reads_fa, gene_list


def _contig_set(path):
    from megagta_tpu.io.fastx import read_fastx

    return sorted(r.seq for r in read_fastx(path))


def test_two_process_pipeline(tmp_path):
    sc, reads_fa, gene_list = _scenario_files(tmp_path)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)

    # single-process baseline (same worker, no coordinator)
    env0 = {
        **os.environ,
        "MEGAGTA_REPO": REPO,
        "READS_FA": reads_fa,
        "GENE_LIST": gene_list,
        "OUT_DIR": str(tmp_path / "single"),
        "JAX_PLATFORMS": "cpu",
        "JAX_NUM_PROCESSES": "1",
    }
    env0.pop("JAX_COORDINATOR_ADDRESS", None)
    single = subprocess.run(
        [sys.executable, "-c", WORKER.replace(
            "assert p.multihost", "assert not p.multihost  #"
        )],
        env=env0, capture_output=True, text=True, timeout=900,
    )
    assert single.returncode == 0, single.stderr[-2000:]

    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **env0,
            "OUT_DIR": str(tmp_path / "dist"),
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-2000:]

    raw = "k29/29_raw_contigs_geneA.fasta"
    got = _contig_set(str(tmp_path / "dist" / raw))
    want = _contig_set(str(tmp_path / "single" / raw))
    assert got == want and got
    # the driver records per-stage walls; surface the dist search time so a
    # real multi-host run has a comparable scaling number
    laps = json.loads((tmp_path / "dist" / "laps.json").read_text())
    assert any(k.startswith("search_") for k in laps)
