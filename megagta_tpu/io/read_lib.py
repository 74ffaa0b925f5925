"""Packed read arenas and binary read libraries.

TPU-native replacement for the reference's SequencePackage /
read-lib pipeline (src/sequence_package.h:34, src/read_lib_functions-inl.h:119-261):
reads are held as one flat 2-bit-packable code array plus boundary offsets,
persisted as a single .npz ("binary read lib") with a JSON-able manifest of
the source libraries. Paired-end info is retained in the manifest only (the
assembler treats all reads as single, matching findstart/buildgraph usage,
reference: src/fast_kmer_filter.cpp:110).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from .fastx import parse_fastx_bytes

__all__ = ["ReadPackage", "build_read_lib", "load_read_lib", "parse_lib_manifest"]


@dataclass
class ReadPackage:
    """Concatenated reads in code space (A=0..T=3) with boundaries."""

    flat: np.ndarray  # [total_bases] int8
    starts: np.ndarray  # [num_reads + 1] int64

    @property
    def num_reads(self) -> int:
        return len(self.starts) - 1

    @property
    def num_bases(self) -> int:
        return int(self.starts[-1])

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.starts)

    @property
    def max_length(self) -> int:
        return int(self.lengths.max()) if self.num_reads else 0

    def read(self, i: int) -> np.ndarray:
        return self.flat[self.starts[i] : self.starts[i + 1]]

    def read_slice(self, lo: int, hi: int) -> "ReadPackage":
        """Zero-copy view of reads [lo, hi) (streaming batch windows)."""
        s = self.starts[lo : hi + 1]
        return ReadPackage(self.flat[s[0] : s[-1]], s - s[0])

    def padded(self, pad_to: int | None = None, fill: int = 0):
        """Dense [num_reads, L] int8 matrix + lengths, for device pipelines."""
        L = pad_to or self.max_length
        out = np.full((self.num_reads, L), fill, dtype=np.int8)
        lens = self.lengths
        mask = np.arange(L)[None, :] < lens[:, None]
        out[mask] = self.flat
        return out, lens.astype(np.int32)

    @staticmethod
    def concat(packages: list["ReadPackage"]) -> "ReadPackage":
        flats = [p.flat for p in packages]
        sizes = [p.starts[-1] for p in packages]
        starts_list = [packages[0].starts]
        off = sizes[0]
        for p in packages[1:]:
            starts_list.append(p.starts[1:] + off)
            off += p.starts[-1]
        return ReadPackage(np.concatenate(flats), np.concatenate(starts_list))


def parse_lib_manifest(path: str) -> list[dict]:
    """Parse a reference-style read-lib manifest.

    Format per library: a comment line (original paths), then
    "pe <f1> <f2>" | "interleaved <f>" | "se <f>"
    (reference: src/megagta.py:395-434, src/read_lib_functions-inl.h:119-160).
    """
    libs = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i < len(lines):
        desc = lines[i]
        spec = lines[i + 1].split()
        kind = spec[0]
        if kind not in ("pe", "interleaved", "se"):
            raise ValueError(f"bad lib spec line: {lines[i + 1]!r}")
        libs.append({"description": desc, "type": kind, "files": spec[1:]})
        i += 2
    return libs


def build_read_lib(manifest_path: str, out_prefix: str) -> ReadPackage:
    """Read all libraries, pack, and persist as {out_prefix}.npz + .lib_info."""
    libs = parse_lib_manifest(manifest_path)
    packages = []
    lib_meta = []
    for lib in libs:
        flats, starts_list = [], []
        for fp in lib["files"]:
            flat, starts, _ = parse_fastx_bytes(fp)
            flats.append(flat)
            starts_list.append(starts)
        if lib["type"] == "pe" and len(lib["files"]) == 2:
            # interleave pairs to mirror reference read ordering
            a = ReadPackage(flats[0], starts_list[0])
            b = ReadPackage(flats[1], starts_list[1])
            n = min(a.num_reads, b.num_reads)
            seqs = []
            for i in range(n):
                seqs.append(a.read(i))
                seqs.append(b.read(i))
            starts = np.zeros(2 * n + 1, np.int64)
            starts[1:] = np.cumsum([len(s) for s in seqs])
            flat = np.concatenate(seqs) if seqs else np.zeros(0, np.int8)
            pkg = ReadPackage(flat, starts)
        else:
            pkg = ReadPackage.concat(
                [ReadPackage(f, s) for f, s in zip(flats, starts_list)]
            ) if len(flats) > 1 else ReadPackage(flats[0], starts_list[0])
        lib_meta.append(
            {
                "type": lib["type"],
                "description": lib["description"],
                "num_reads": pkg.num_reads,
                "num_bases": pkg.num_bases,
                "max_length": pkg.max_length,
            }
        )
        packages.append(pkg)
    package = ReadPackage.concat(packages) if len(packages) > 1 else packages[0]
    np.savez_compressed(
        out_prefix + ".npz", flat=package.flat, starts=package.starts
    )
    with open(out_prefix + ".lib_info", "w") as f:
        json.dump(
            {
                "libs": lib_meta,
                "num_reads": package.num_reads,
                "num_bases": package.num_bases,
                "max_length": package.max_length,
            },
            f,
            indent=1,
        )
    return package


def load_read_lib(prefix: str) -> ReadPackage:
    path = prefix + ".npz" if not prefix.endswith(".npz") else prefix
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with np.load(path) as z:
        return ReadPackage(z["flat"], z["starts"])
