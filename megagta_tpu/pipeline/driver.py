"""End-to-end multi-k pipeline driver.

Mirrors the reference Python driver (src/megagta.py:777-831): build the read
library, then for each k in k_list (each decremented by one, :815-816) build
the SdBG (with the previous k's contigs as always-solid assist sequences),
de-novo assemble intermediate k's, and at the final k find seeds per gene
and run the HMM-guided search, then filter + translate the raw contigs.

Checkpointing matches the reference's step counter (tmp/cp.txt + opts
replay, src/megagta.py:316-385): every stage bumps a monotone counter and is
skipped in --continue mode when <= the last completed step.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..assembly.denovo import assemble
from ..graph.builder import build_sdbg
from ..graph.sdbg import SdBG
from ..hmm.heuristic import heuristic_table
from ..hmm.parser import parse_hmm
from ..io.fastx import parse_fastx_bytes, write_fasta
from ..io.read_lib import ReadPackage, build_read_lib, load_read_lib
from ..seeds.finder import find_seeds, read_seed_file, ref_kmer_set, write_seed_file
from ..utils.logging import StageTimer, log, report_rusage
from .tools import filter_by_len, translate_fasta

__all__ = ["Options", "Pipeline"]


@dataclass
class Options:
    """Defaults mirror src/megagta.py:87-117."""

    out_dir: str = "./megagta_tpu_out"
    k_list: list = field(default_factory=lambda: [30, 36, 45])
    min_count: int = 1
    prune_len: int = 20
    low_cov_penalty: float = 0.5
    max_tip_len: int = 150
    min_contig_len: int = 450
    min_standalone: int = 400
    no_mercy: bool = False
    gene_list: str = ""
    reads: list = field(default_factory=list)  # se fastx paths
    pe1: list = field(default_factory=list)
    pe2: list = field(default_factory=list)
    continue_mode: bool = False
    use_wavefront: bool = True
    pool_size: int = 1 << 13
    max_steps: int = 1 << 13
    expand_width: int = 16  # B=16 measured fastest on v5e at prod
    # scale (r4: 6.8 s vs 9.3 s at B=8; B=4 and B=32 both much worse)
    # candidate compression: keep the top-cand_cap candidates per step
    # (typical valid counts are ~5 per expansion, so 128 is lossless in
    # practice; drops are detected and escalate through the ladder).
    # r5: 5.9 -> 5.3 s on the prod bench
    cand_cap: int = 128
    use_cache: bool = True
    float64: bool = False
    # None = auto: fused Pallas step kernels on TPU backends, plain XLA
    # elsewhere (the kernels run everywhere via interpret mode, but only
    # pay off on real hardware)
    use_pallas: bool | None = None
    # 0 = auto: sized to device memory (utils/budget.auto_search_chunk,
    # the reference's mem_flag auto-sizing, megagta.py:300)
    chunk: int = 0  # seeds per device batch
    # auto = device-resident construction on accelerator backends when the
    # build is mercy/assist-free (device_builder.py), host numpy otherwise
    build_engine: str = "auto"  # auto | host | device
    # L8 clustering distance (bin/post_proc.sh -c; 0.01 = 99% aa identity)
    dist_cutoff: float = 0.01
    # streaming-counting batch (reference 4M-read ingestion batches,
    # src/read_lib_functions-inl.h:178-179); datasets at or under one
    # batch take the whole-array path. 0 = auto: sized to available host
    # RAM (utils/budget.auto_batch_reads, reference cx1.h:125-148)
    batch_reads: int = 0

    def validate(self):
        if not self.k_list:
            raise ValueError("k list should not be empty")
        if self.k_list[-1] % 3 != 0:
            raise ValueError("The last k must be a multiple of 3")
        if any(k < 15 or k > 127 for k in self.k_list):
            raise ValueError("All k's should be in range [15, 127]")
        if self.min_count <= 0:
            raise ValueError("min_count must be greater than 0")
        if self.min_count == 1:
            self.no_mercy = True
        if not self.gene_list:
            raise ValueError("--gene-list could not be empty")
        if self.prune_len <= 0:
            raise ValueError("prune length should be >= 1")
        if not (0 <= self.low_cov_penalty <= 1):
            raise ValueError("low coverage penalty should be within [0, 1]")
        if len(self.pe1) != len(self.pe2):
            raise ValueError("Number of paired-end files not match")
        if not (self.reads or self.pe1):
            raise ValueError("No input files")


class Pipeline:
    def __init__(self, opt: Options):
        from ..parallel.dist import init_distributed
        from ..utils.jaxconfig import setup_jax

        setup_jax()
        self.multihost = init_distributed()
        import jax

        self.p0 = jax.process_index() == 0
        opt.validate()
        self.opt = opt
        self.tmp_dir = os.path.join(opt.out_dir, "tmp")
        os.makedirs(self.tmp_dir, exist_ok=True)
        self.cp = 0
        self.last_cp = -1
        self.timer = StageTimer()
        if opt.continue_mode:
            self._load_checkpoint()
        elif self.p0:
            self._write_opts()
        self.gene_info = self._parse_gene_list()

    def _sync(self, tag: str):
        """Cross-host barrier (no-op single-process): stages that write
        shared files must complete on process 0 before others read them."""
        if self.multihost:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    # ---------------------------------------------------------- checkpoints

    def _cp_path(self):
        return os.path.join(self.tmp_dir, "cp.txt")

    def _write_opts(self):
        with open(os.path.join(self.tmp_dir, "opts.json"), "w") as f:
            json.dump(
                {k: v for k, v in self.opt.__dict__.items() if k != "continue_mode"},
                f,
                indent=1,
            )
        if os.path.exists(self._cp_path()):
            os.remove(self._cp_path())

    def _load_checkpoint(self):
        opts_path = os.path.join(self.tmp_dir, "opts.json")
        if os.path.exists(opts_path):
            with open(opts_path) as f:
                saved = json.load(f)
            for k, v in saved.items():
                setattr(self.opt, k, v)
        if os.path.exists(self._cp_path()):
            with open(self._cp_path()) as f:
                lines = [ln for ln in f if ln.strip()]
            self.last_cp = len(lines) - 1

    def _step(self) -> bool:
        """True when this stage must run (not yet checkpointed)."""
        return (not self.opt.continue_mode) or (self.cp > self.last_cp)

    def _mark(self):
        if self.p0:
            with open(self._cp_path(), "a") as f:
                f.write(f"{self.cp}\tdone\n")
        self.cp += 1

    # ------------------------------------------------------------- helpers

    def _parse_gene_list(self) -> dict:
        genes = {}
        with open(self.opt.gene_list) as f:
            for line in f:
                toks = line.split()
                if len(toks) >= 4:
                    genes[toks[0]] = {
                        "forward_hmm": toks[1],
                        "reverse_hmm": toks[2],
                        "ref_aligned": toks[3],
                    }
        return genes

    def _auto_chunk(self, dbg, n_seeds: int) -> int:
        """Search batch width sized to device memory (the reference's
        mem_flag auto-sizing role for the search stage)."""
        from ..utils.budget import auto_search_chunk

        c = auto_search_chunk(
            self.opt.pool_size, min(256, self.opt.max_steps),
            self.opt.expand_width, dbg.size, 4, n_seeds,
        )
        log(f"auto chunk = {c} ({n_seeds} seeds)")
        return c

    def _batch_reads(self, pkg) -> int:
        """Streaming-count batch: explicit flag, or auto-sized to host
        RAM (reference lv1 sizing, cx1.h:125-148)."""
        if self.opt.batch_reads:
            return self.opt.batch_reads
        from ..utils.budget import auto_batch_reads

        mean = int(pkg.starts[-1]) / max(pkg.num_reads, 1)
        return auto_batch_reads(pkg.num_reads, mean)

    def graph_prefix(self, k: int) -> str:
        d = os.path.join(self.opt.out_dir, f"k{k}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, str(k))

    def contig_file(self, k: int) -> str:
        return self.graph_prefix(k) + ".contigs.fa"

    # -------------------------------------------------------------- stages

    def build_lib(self) -> str:
        lib_path = os.path.join(self.tmp_dir, "reads.lib")
        if self._step() and self.p0:
            with open(lib_path, "w") as f:
                for i in range(len(self.opt.pe1)):
                    f.write(f"{self.opt.pe1[i]},{self.opt.pe2[i]}\n")
                    f.write(f"pe {self.opt.pe1[i]} {self.opt.pe2[i]}\n")
                for r in self.opt.reads:
                    f.write(f"{r}\nse {r}\n")
            with self.timer.stage("buildlib"):
                build_read_lib(lib_path, lib_path)
            report_rusage("buildlib")
        self._sync("buildlib")
        self._mark()
        return lib_path

    def _build_engine(self, mercy: bool, num_assist: int) -> str:
        eng = self.opt.build_engine
        if eng == "host":
            return "host"
        # mercy builds run on the device AND sharded engines (the solid
        # mask streams on the host; counting/BOSS on device — the sharded
        # engine ships the mask as a third sharded input)
        if eng in ("device", "sharded"):
            return eng
        import jax

        # auto: keyspace-sharded counting across every device (the
        # reference's parallel CX1 bucket pipeline, src/cx1.h:204-303);
        # under multihost the mesh is GLOBAL — each host streams its read
        # slice and the prefix all_to_all crosses hosts. Single-device
        # builds use the plain device engine.
        if jax.default_backend() == "cpu":
            return "host"
        n = jax.device_count() if self.multihost else jax.local_device_count()
        if n > 1 and (n & (n - 1)) == 0:
            return "sharded"
        return "device"

    def build_graph(self, k: int, assist_file: str | None, lib_path: str) -> str:
        prefix = self.graph_prefix(k)
        mercy = self.opt.min_count > 1 and not self.opt.no_mercy
        if self._step() and self.multihost and self._build_engine(
            mercy, 0
        ) == "sharded":
            self._build_graph_multihost(k, assist_file, lib_path, mercy, prefix)
        elif self._step() and self.p0:
            pkg = load_read_lib(lib_path)
            num_assist = 0
            if assist_file and os.path.exists(assist_file):
                flat, starts, _ = parse_fastx_bytes(assist_file)
                assist = ReadPackage(flat, starts)
                num_assist = assist.num_reads
                pkg = ReadPackage.concat([pkg, assist])
            engine = self._build_engine(mercy, num_assist)
            with self.timer.stage(f"buildgraph_k{k}"):
                if mercy:
                    from ..graph.mercy import solid_windows_with_mercy

                    br = self._batch_reads(pkg)
                    solid = solid_windows_with_mercy(
                        pkg, k, self.opt.min_count, num_assist,
                        batch_reads=br if pkg.num_reads > br else None,
                    )
                    if engine == "sharded":
                        from ..parallel.mesh import make_mesh
                        from ..parallel.sharded_build import build_sdbg_sharded

                        dbg = build_sdbg_sharded(
                            make_mesh(axis="keys"), pkg, k,
                            self.opt.min_count, solid_mask=solid,
                            num_assist=num_assist,
                        )
                    elif engine == "device":
                        from ..graph.device_builder import build_sdbg_device

                        dbg = build_sdbg_device(
                            pkg, k, self.opt.min_count, batch_reads=br,
                            solid_mask=solid, num_assist=num_assist,
                        )
                    else:
                        dbg = build_sdbg(
                            pkg, k, self.opt.min_count, solid_mask=solid,
                            num_assist=num_assist,
                        )
                elif engine == "sharded":
                    from ..parallel.mesh import make_mesh
                    from ..parallel.sharded_build import build_sdbg_sharded

                    dbg = build_sdbg_sharded(
                        make_mesh(axis="keys"), pkg, k, self.opt.min_count
                    )
                elif engine == "device":
                    from ..graph.device_builder import build_sdbg_device

                    dbg = build_sdbg_device(
                        pkg, k, self.opt.min_count,
                        batch_reads=self._batch_reads(pkg),
                    )
                else:
                    br = self._batch_reads(pkg)
                    dbg = build_sdbg(
                        pkg, k, self.opt.min_count, num_assist=num_assist,
                        batch_reads=(
                            br
                            if pkg.num_reads > br and num_assist == 0
                            else None
                        ),
                    )
                dbg.save(prefix)
                _write_counting_histogram(dbg, prefix + ".counting")
            log(f"k={k}: SdBG with {dbg.size} rows saved to {prefix} ({engine})")
            report_rusage(f"buildgraph k{k}")
        self._sync(f"buildgraph_{k}")
        self._mark()
        return prefix

    def _build_graph_multihost(
        self, k: int, assist_file: str | None, lib_path: str,
        mercy: bool, prefix: str,
    ):
        """Cross-host distributed SdBG construction (no process-0 funnel):
        every process streams its HOST SLICE of the read lib into the
        global-mesh keyspace-sharded counter; the prefix all_to_all routes
        occurrences over ICI/DCN and the per-device distinct-edge shards
        are allgathered, so all hosts hold the identical graph — the mesh
        equivalent of the reference's parallel bucket partition
        (cx1.h:204-303) with the file merge replaced by a collective.
        Process 0 writes the graph files. The mercy mask still needs
        GLOBAL window counts, so its derivation is a replicated host pass
        over the full read set (cx1_read2sdbg_s2.cpp:106-250 semantics)."""
        from ..parallel.dist import global_mesh, host_read_slice
        from ..parallel.sharded_build import build_sdbg_sharded

        pkg = load_read_lib(lib_path)
        assist = None
        if assist_file and os.path.exists(assist_file):
            flat, starts, _ = parse_fastx_bytes(assist_file)
            assist = ReadPackage(flat, starts)
        n_assist = assist.num_reads if assist else 0
        solid_full = None
        if mercy:
            from ..graph.mercy import solid_windows_with_mercy

            full = ReadPackage.concat([pkg, assist]) if assist else pkg
            br = self._batch_reads(full)
            solid_full = solid_windows_with_mercy(
                full, k, self.opt.min_count, n_assist,
                batch_reads=br if full.num_reads > br else None,
            )
        lo, hi = host_read_slice(pkg.num_reads)
        my = pkg.read_slice(lo, hi)
        my_assist = 0
        if assist is not None and self.p0:
            # assist contigs are counted exactly once, on process 0's slice
            my = ReadPackage.concat([my, assist])
            my_assist = n_assist
        my_solid = None
        if solid_full is not None:
            nwin = np.maximum(pkg.lengths - k, 0)
            base = np.concatenate([[0], np.cumsum(nwin)])
            my_solid = solid_full[base[lo] : base[hi]]
            if my_assist:
                # assist windows are always-solid; the padded-mask builder
                # overwrites these rows, the values here are placeholders
                aw = int(np.maximum(assist.lengths - k, 0).sum())
                my_solid = np.concatenate([my_solid, np.zeros(aw, bool)])
        with self.timer.stage(f"buildgraph_k{k}"):
            dbg = build_sdbg_sharded(
                global_mesh(), my, k, self.opt.min_count,
                solid_mask=my_solid, num_assist=my_assist,
            )
            if self.p0:
                dbg.save(prefix)
                _write_counting_histogram(dbg, prefix + ".counting")
        log(
            f"k={k}: SdBG with {dbg.size} rows saved to {prefix} "
            f"(sharded-global, {jax_process_info()})"
        )
        report_rusage(f"buildgraph k{k}")

    def denovo(self, k: int, min_contig: int):
        if self._step() and self.p0:
            dbg = SdBG.load(self.graph_prefix(k))
            with self.timer.stage(f"denovo_k{k}"):
                contigs, stats = assemble(
                    dbg,
                    max_tip_len=self.opt.max_tip_len,
                    min_contig=min_contig,
                )
            write_fasta(
                self.contig_file(k),
                [(f"contig_{i}_{c.name}", c.seq) for i, c in enumerate(contigs)],
            )
            # `<contigs>.info` sidecar: "count total_bases" (reference
            # out_contig_info, src/assembler.cpp:150-162)
            with open(self.contig_file(k) + ".info", "w") as f:
                f.write(f"{stats['count']} {stats['total']}\n")
            log(f"k={k}: {stats['count']} contigs, N50 {stats['n50']}")
            report_rusage(f"denovo k{k}")
        self._sync(f"denovo_{k}")
        self._mark()

    def find_seed(self, k: int, gene: str, lib_path: str, prev_contigs: str | None):
        seed_file = f"{self.graph_prefix(k)}_{gene}_starting_kmers.txt"
        if self._step() and self.p0:
            pkg = load_read_lib(lib_path)
            records = [
                (r.name, r.seq)
                for r in _fastx_records(self.gene_info[gene]["ref_aligned"])
            ]
            refs = ref_kmer_set(records, (k + 1) // 3)
            extra = []
            if prev_contigs and os.path.exists(prev_contigs):
                flat, starts, _ = parse_fastx_bytes(prev_contigs)
                extra.append(ReadPackage(flat, starts))
            with self.timer.stage(f"findstart_{gene}"):
                seeds = find_seeds(pkg, refs, k + 1, extra)
            write_seed_file(seed_file, seeds)
            log(f"{gene}: {len(seeds)} starting kmers")
            report_rusage(f"findstart {gene}")
        self._sync(f"findstart_{gene}")
        self._mark()
        return seed_file

    def search(self, k: int, gene: str, seed_file: str) -> str:
        out_file = f"{self.graph_prefix(k)}_raw_contigs_{gene}.fasta"
        if self._step():
            import jax
            import jax.numpy as jnp

            dbg = SdBG.load(self.graph_prefix(k))
            info = self.gene_info[gene]
            fwd = parse_hmm(info["forward_hmm"])
            rev = parse_hmm(info["reverse_hmm"])
            seeds = read_seed_file(seed_file)
            # multi-host EP sharding: each host searches a contiguous seed
            # slice (SURVEY.md 2.10: per-seed searches are embarrassingly
            # parallel); process 0 merges the shard files afterwards
            if self.multihost:
                from ..parallel.dist import host_read_slice

                lo, hi = host_read_slice(len(seeds))
                my_seeds = seeds[lo:hi]
            else:
                my_seeds = seeds
            with self.timer.stage(f"search_{gene}"):
                if self.opt.use_wavefront:
                    from ..search.runner import BatchSearcher
                    from ..search.wavefront import WavefrontConfig

                    on_tpu = jax.default_backend() == "tpu"
                    use_pallas = (
                        self.opt.use_pallas
                        if self.opt.use_pallas is not None
                        else on_tpu
                    )
                    # seed-axis mesh: global on a single host, per-host
                    # local devices under multihost (each process searches
                    # its seed slice across ALL its local devices)
                    mesh = None
                    if jax.local_device_count() > 1:
                        from ..parallel.mesh import make_mesh

                        mesh = make_mesh(
                            axis="seeds", local=self.multihost
                        )
                    bs = BatchSearcher(
                        dbg, fwd, rev,
                        heuristic_table(fwd), heuristic_table(rev),
                        WavefrontConfig(
                            pool_size=self.opt.pool_size,
                            max_steps=self.opt.max_steps,
                            prune_len=self.opt.prune_len,
                            low_cov_penalty=self.opt.low_cov_penalty,
                            expand_width=self.opt.expand_width,
                            cand_cap=self.opt.cand_cap,
                            use_cache=self.opt.use_cache,
                            use_pallas=use_pallas,
                            # r5 ablation: the fused expand kernel is
                            # slower than XLA's fusion at B=16
                            use_pallas_expand=False,
                        ),
                        dtype=jnp.float64 if self.opt.float64 else jnp.float32,
                        chunk=self.opt.chunk or self._auto_chunk(
                            dbg, len(my_seeds)
                        ),
                        mesh=mesh,
                    )
                    if self.multihost:
                        # phased search + cross-process path-cache syncs:
                        # the shared-memory term-memo equivalent
                        # (runner.sync_caches; fixed collective count)
                        contigs = bs.search_phased(my_seeds)
                    else:
                        contigs = bs.search(my_seeds)
                    log(f"{gene}: wavefront stats {bs.last_stats}")
                else:
                    from ..search.astar import (
                        HMMGraphSearch,
                        NodeEnumerator,
                        search_seed,
                    )

                    fe = NodeEnumerator(fwd, heuristic_table(fwd), self.opt.low_cov_penalty)
                    re_ = NodeEnumerator(rev, heuristic_table(rev), self.opt.low_cov_penalty)
                    searcher = HMMGraphSearch(self.opt.prune_len)
                    term, term_rev = {}, {}
                    contigs = [
                        search_seed(n, s, fwd, rev, fe, re_, dbg, searcher, term, term_rev)
                        for n, s in my_seeds
                    ]
            if self.multihost:
                shard = f"{out_file}.shard{jax.process_index()}"
                write_fasta(
                    shard,
                    [
                        (f"{gene}_shard_{jax.process_index()}_{i}", c)
                        for i, c in enumerate(contigs)
                    ],
                )
                self._sync(f"search_{gene}")
                if self.p0:
                    merged = []
                    for p in range(jax.process_count()):
                        merged.extend(
                            r.seq for r in _fastx_records(f"{out_file}.shard{p}")
                        )
                    write_fasta(
                        out_file,
                        [
                            (f"{gene}_contig_{2 * i}_contig_{2 * i + 1}", c)
                            for i, c in enumerate(merged)
                        ],
                    )
                self._sync(f"search_merge_{gene}")
            else:
                write_fasta(
                    out_file,
                    [
                        (f"{gene}_contig_{2 * i}_contig_{2 * i + 1}", c)
                        for i, c in enumerate(contigs)
                    ],
                )
            log(f"{gene}: {len(contigs)} raw contigs")
            report_rusage(f"search {gene}")
        self._mark()
        return out_file

    def post_process(self, k: int):
        post_dir = os.path.join(self.opt.out_dir, "contigs")
        for gene in self.gene_info:
            gdir = os.path.join(post_dir, gene)
            os.makedirs(gdir, exist_ok=True)
            raw = f"{self.graph_prefix(k)}_raw_contigs_{gene}.fasta"
            nucl = os.path.join(gdir, "nucl_merged.fasta")
            prot = os.path.join(gdir, "prot_merged.fasta")
            if self._step() and self.p0:
                stats = filter_by_len(raw, nucl, self.opt.min_contig_len)
                log(f"{gene}: filtered {stats['count']} contigs, N50 {stats['n50']}")
            self._mark()
            if self._step() and self.p0:
                translate_fasta(nucl, prot)
            self._mark()
            # L8: dereplication, clustering, chimera screen, nearest-ref
            # (the in-process equivalent of bin/post_proc.sh)
            if self._step() and self.p0:
                from .postproc import post_process_gene

                refs = [
                    (r.name, r.seq)
                    for r in _fastx_records(
                        self.gene_info[gene]["ref_aligned"]
                    )
                ]
                with self.timer.stage(f"postproc_{gene}"):
                    stats = post_process_gene(
                        gdir, refs, self.opt.dist_cutoff
                    )
                log(f"{gene}: post-proc {stats}")
            self._sync(f"post_{gene}")
            self._mark()

    # ----------------------------------------------------------------- run

    def run(self):
        lib_path = self.build_lib()
        k_list = [k - 1 for k in self.opt.k_list]  # megagta.py:815-816
        for i, k in enumerate(k_list):
            assist = self.contig_file(k_list[i - 1]) if i > 0 else None
            self.build_graph(k, assist, lib_path)
            if i != len(k_list) - 1:
                # min_contig for intermediate contigs = next decremented k + 1
                self.denovo(k, k_list[i + 1] + 1)
            else:
                prev = self.contig_file(k_list[i - 1]) if i > 0 else None
                for gene in self.gene_info:
                    seed_file = self.find_seed(k, gene, lib_path, prev)
                    self.search(k, gene, seed_file)
                self.post_process(k)
        log(f"ALL DONE. Time elapsed: {self.timer.elapsed():.2f}s")
        return self.timer.laps


def jax_process_info() -> str:
    import jax

    return f"process {jax.process_index()}/{jax.process_count()}"


def _write_counting_histogram(dbg, path: str) -> None:
    """Edge-multiplicity histogram file (one 'multiplicity count' line per
    bin; reference .counting, src/cx1_read2sdbg_s1.cpp:923-930)."""
    import numpy as np

    mult = dbg.mult[(dbg.w >= 1) & ~dbg.is_tip]
    if len(mult):
        binc = np.bincount(np.minimum(mult, 65535))
        with open(path, "w") as f:
            for m in range(1, len(binc)):
                if binc[m]:
                    f.write(f"{m} {int(binc[m])}\n")
    else:
        open(path, "w").close()


def _fastx_records(path: str):
    from ..io.fastx import read_fastx

    return list(read_fastx(path))
