"""FASTA/FASTQ ingestion (plain or gzip), batch-oriented.

Replaces the reference's kseq.h/SequenceManager streaming readers
(src/kseq.h, src/sequence_manager.cpp:109-213) with a whole-file (or
chunked) parse into numpy arrays, which is the natural unit for feeding a
device pipeline. N-handling mirrors the reference's trimN
(src/sequence_manager.cpp:87-107): each read keeps only its first N-free run.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..constants import DNA_CHAR_TO_CODE

__all__ = ["FastxRecord", "read_fastx", "parse_fastx_bytes", "write_fasta"]


@dataclass
class FastxRecord:
    name: str
    seq: str
    qual: str | None = None


def _open(path: str):
    if path == "-":
        return io.BytesIO(os.sys.stdin.buffer.read())
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Yield records from a FASTA or FASTQ file (auto-detected, gz ok)."""
    with _open(path) as f:
        first = f.read(1)
        if not first:
            return
        if first == b">":
            header = f.readline().decode().strip()
            cur_name = header.split()[0] if header else ""
            seq_parts: list[str] = []
            for raw in f:
                line = raw.strip()
                if line.startswith(b">"):
                    yield FastxRecord(cur_name, "".join(seq_parts))
                    cur_name = line[1:].decode().split()[0] if len(line) > 1 else ""
                    seq_parts = []
                elif line:
                    seq_parts.append(line.decode())
            yield FastxRecord(cur_name, "".join(seq_parts))
        elif first == b"@":
            header = f.readline().decode()
            while True:
                name = header.split()[0] if header.strip() else ""
                seq = f.readline().strip().decode()
                f.readline()  # +
                qual = f.readline().strip().decode()
                yield FastxRecord(name, seq, qual)
                nxt = f.readline()
                if not nxt:
                    return
                header = nxt[1:].decode()
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def parse_fastx_bytes(path: str, trim_n: bool = True, names_needed: bool = False):
    """Parse a fastx file into (flat_codes int8, starts int64, names list).

    Applies trimN semantics: each read keeps its first N-free run. Uses the
    native C++ parser (megagta_tpu/native) when available and names are not
    requested.
    """
    if trim_n and not names_needed and path != "-":
        from ..native import parse_fastx_native

        res = parse_fastx_native(path)
        if res is not None:
            return res[0], res[1], []
    seqs: list[np.ndarray] = []
    names: list[str] = []
    for rec in read_fastx(path):
        b = np.frombuffer(rec.seq.encode(), dtype=np.uint8)
        codes = DNA_CHAR_TO_CODE[b]
        if trim_n:
            is_n = (b == ord("N")) | (b == ord("n")) | (codes < 0)
            nz = np.flatnonzero(~is_n)
            if nz.size == 0:
                codes = codes[:0]
            else:
                b0 = nz[0]
                ns_after = np.flatnonzero(is_n[b0:])
                e0 = b0 + (ns_after[0] if ns_after.size else len(b) - b0)
                codes = codes[b0:e0]
        names.append(rec.name)
        seqs.append(codes.astype(np.int8))
    starts = np.zeros(len(seqs) + 1, dtype=np.int64)
    if seqs:
        starts[1:] = np.cumsum([len(s) for s in seqs])
        flat = np.concatenate(seqs) if starts[-1] else np.zeros(0, np.int8)
    else:
        flat = np.zeros(0, np.int8)
    return flat, starts, names


def write_fasta(path: str, records, width: int = 0) -> None:
    """Write (name, seq) pairs as FASTA. width=0 writes one line per seq."""
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            if width:
                for i in range(0, len(seq), width):
                    f.write(seq[i : i + width] + "\n")
            else:
                f.write(seq + "\n")
