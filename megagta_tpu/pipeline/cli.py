"""Command-line interface, mirroring the reference driver's surface
(src/megagta.py usage block) plus the standalone subcommands of
src/megagta.cpp:18-31 (readstat / filterbylen / translate / buildlib).
"""

from __future__ import annotations

import argparse
import sys

from .. import __version__


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="megagta-tpu",
        description="TPU-native gene-targeted metagenome assembler",
    )
    p.add_argument("-v", "--version", action="version", version=f"megagta-tpu {__version__}")
    sub = p.add_subparsers(dest="cmd")

    main = sub.add_parser("assemble", help="run the full pipeline (default)")
    _add_main_args(main)
    _add_main_args(p)  # also accept top-level invocation without subcommand

    fb = sub.add_parser("filterbylen", help="filter FASTA records by length")
    fb.add_argument("min_len", type=int)
    fb.add_argument("input")
    fb.add_argument("output")

    tr = sub.add_parser("translate", help="translate nucleotide FASTA to aa")
    tr.add_argument("input")
    tr.add_argument("output")

    rs = sub.add_parser("readstat", help="sequence file statistics")
    rs.add_argument("files", nargs="+")

    bl = sub.add_parser("buildlib", help="build a binary read library")
    bl.add_argument("manifest")
    bl.add_argument("out_prefix")

    br = sub.add_parser(
        "buildref",
        help="build gene resources (fwd/rev HMM + ref alignment) from an "
        "aligned FASTA — the built-in counterpart of prepare_gene_ref.sh",
    )
    br.add_argument("name")
    br.add_argument("aligned_faa")
    br.add_argument("out_dir")

    gs = sub.add_parser(
        "graphstat",
        help="inspect a built SdBG (stats; optionally a k-mer's neighborhood"
        " — the reference's path_viewer/graph_example debug role)",
    )
    gs.add_argument("prefix", help="graph prefix (as passed to the builder)")
    gs.add_argument("kmer", nargs="?", help="(k+1)-mer to look up")

    gc = sub.add_parser(
        "graphcheck",
        help="verify every (k+1)-window of known sequences exists in a "
        "built graph (the reference's false_positive_checker oracle)",
    )
    gc.add_argument("prefix", help="graph prefix (as passed to the builder)")
    gc.add_argument("fasta", help="sequences to check")
    return p


def _add_main_args(p: argparse.ArgumentParser):
    p.add_argument("-r", "--reads", action="append", default=[], help="single-end reads (fasta/fastq, .gz ok); repeatable")
    p.add_argument("-1", dest="pe1", action="append", default=[], help="PE reads file 1")
    p.add_argument("-2", dest="pe2", action="append", default=[], help="PE reads file 2")
    p.add_argument("-g", "--gene-list", default="", help="gene list: name fwd.hmm rev.hmm ref_aligned.faa per line")
    p.add_argument("-o", "--out-dir", default="./megagta_tpu_out")
    p.add_argument("--k-list", default="30,36,45", help="comma-separated kmer sizes (last %% 3 == 0)")
    p.add_argument("--min-count", type=int, default=1)
    p.add_argument("--prune-len", type=int, default=20)
    p.add_argument("--low-cov-penalty", type=float, default=0.5)
    p.add_argument("--max-tip-len", type=int, default=150)
    p.add_argument("--min-contig-len", type=int, default=450)
    p.add_argument("--no-mercy", action="store_true")
    p.add_argument("--continue", dest="continue_mode", action="store_true")
    p.add_argument("--serial-search", action="store_true", help="use the serial oracle searcher instead of the TPU wavefront")
    p.add_argument("--float64", action="store_true", help="float64 search scores (exact reference numerics)")
    p.add_argument("--pool-size", type=int, default=1 << 13)
    p.add_argument("--max-steps", type=int, default=1 << 13)
    p.add_argument("--expand-width", type=int, default=16,
                   help="frontier nodes expanded per seed per step (1 = exact serial semantics)")
    p.add_argument("--cand-cap", type=int, default=128,
                   help="candidate compression: keep top-N new candidates per step (0 = all)")
    p.add_argument("--chunk", type=int, default=0,
                   help="seeds per device batch (0 = auto-size to device memory)")
    p.add_argument("--build-engine",
                   choices=["auto", "host", "device", "sharded"],
                   default="auto", help="SdBG construction engine (auto = "
                   "device-resident on accelerator backends)")
    p.add_argument("--dist-cutoff", type=float, default=0.01,
                   help="post-processing cluster distance (0.01 = 99%% aa identity)")
    p.add_argument("--no-pallas", action="store_true",
                   help="disable the fused Pallas step kernels (on by default on TPU)")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cmd = getattr(args, "cmd", None)

    if cmd == "filterbylen":
        from .tools import filter_by_len

        stats = filter_by_len(args.input, args.output, args.min_len)
        print(
            f"{stats['count']} contigs, total {stats['total']} bp, "
            f"N50 {stats['n50']} bp",
            file=sys.stderr,
        )
        return 0
    if cmd == "translate":
        from .tools import translate_fasta

        n = translate_fasta(args.input, args.output)
        print(f"translated {n} records", file=sys.stderr)
        return 0
    if cmd == "readstat":
        from .tools import read_stat

        print(read_stat(args.files))
        return 0
    if cmd == "graphstat":
        from ..graph.sdbg import SdBG
        from ..constants import dna_to_str, str_to_dna

        g = SdBG.load(args.prefix)
        print(
            f"k={g.k} rows={g.size} nodes={int(g.last.sum())} "
            f"tips={int(g.is_tip.sum())} valid={int((~g.invalid).sum())}"
        )
        wc = [int((g.w == i).sum()) for i in range(9)]
        print("W counts ($ A C G T A- C- G- T-):", " ".join(map(str, wc)))
        if args.kmer:
            row = g.lookup_edge(str_to_dna(args.kmer))
            if row < 0:
                print(f"{args.kmer}: not found")
                return 1
            print(f"row {row}: mult={int(g.mult[row])} valid={not bool(g.invalid[row])}")
            outs = g.outgoing_edges(row)
            print("out edges:", [(int(r), dna_to_str(g.edge_label(r))) for r in outs])
            ins = g.incoming_rows(row)
            print("in rows:", [(int(r), dna_to_str(g.edge_label(r))) for r in ins])
        return 0
    if cmd == "graphcheck":
        from .tools import graph_check

        misses = graph_check(args.prefix, args.fasta)
        for name, pos, slen, dist in misses:
            print(f"{name} {pos} {slen} {dist}")
        print(
            f"graphcheck: {len(misses)} missing windows", file=sys.stderr
        )
        return 0 if not misses else 1
    if cmd == "buildref":
        from ..io.fastx import read_fastx
        from ..models.build import build_gene_resource

        records = [(r.name, r.seq) for r in read_fastx(args.aligned_faa)]
        paths = build_gene_resource(args.name, records, args.out_dir)
        line = f"{args.name} {paths['forward_hmm']} {paths['reverse_hmm']} {paths['ref_aligned']}"
        print(line)
        return 0
    if cmd == "buildlib":
        from ..io.read_lib import build_read_lib

        pkg = build_read_lib(args.manifest, args.out_prefix)
        print(f"{pkg.num_reads} reads, {pkg.num_bases} bases", file=sys.stderr)
        return 0

    # full pipeline
    from .driver import Options, Pipeline

    opt = Options(
        out_dir=args.out_dir,
        k_list=[int(x) for x in args.k_list.split(",")],
        min_count=args.min_count,
        prune_len=args.prune_len,
        low_cov_penalty=args.low_cov_penalty,
        max_tip_len=args.max_tip_len,
        min_contig_len=args.min_contig_len,
        no_mercy=args.no_mercy,
        gene_list=args.gene_list,
        reads=args.reads,
        pe1=args.pe1,
        pe2=args.pe2,
        continue_mode=args.continue_mode,
        use_wavefront=not args.serial_search,
        pool_size=args.pool_size,
        max_steps=args.max_steps,
        expand_width=args.expand_width,
        cand_cap=args.cand_cap,
        float64=args.float64,
        chunk=args.chunk,
        build_engine=args.build_engine,
        use_pallas=False if args.no_pallas else None,
        dist_cutoff=args.dist_cutoff,
    )
    Pipeline(opt).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
