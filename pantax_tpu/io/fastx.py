"""FASTA/FASTQ readers and writers (gzip-transparent).

Host-side I/O layer. Sequences are returned as Python ``bytes`` (uppercased);
2-bit/int8 encoding for the device happens in :mod:`pantax_tpu.graph.encode`.

Parity: the reference uses needletail for FASTA/FASTQ parsing
(/root/reference/pantax/src/fastixe.rs:70-94 uppercases and renames records);
uppercasing is applied here at parse time.
"""
from __future__ import annotations

import gzip
import io
import os
from typing import Iterable, Iterator, Tuple

Record = Tuple[str, bytes]


def _open_text(path: str | os.PathLike) -> io.BufferedReader:
    path = os.fspath(path)
    f = open(path, "rb")
    magic = f.peek(2)[:2] if hasattr(f, "peek") else f.read(2)
    if magic == b"\x1f\x8b":
        f.close()
        return gzip.open(path, "rb")  # type: ignore[return-value]
    f.seek(0)
    return f


def iter_fastx(path: str | os.PathLike) -> Iterator[Record]:
    """Yield (name, seq) from a FASTA or FASTQ file, plain or gzipped.

    The record name is the first whitespace-delimited token after '>'/'@'.
    Sequences are uppercased bytes.
    """
    with _open_text(path) as f:
        first = f.read(1)
        if not first:
            return
        if first == b">":
            yield from _iter_fasta(f)
        elif first == b"@":
            yield from _iter_fastq(f)
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def _iter_fasta(f) -> Iterator[Record]:
    # We already consumed the first '>'
    name = None
    chunks: list[bytes] = []
    for raw in f:
        line = raw.rstrip()
        if name is None:
            name = line.split()[0].decode() if line else ""
            continue
        if line.startswith(b">"):
            yield name, b"".join(chunks).upper()
            name = line[1:].split()[0].decode() if len(line) > 1 else ""
            chunks = []
        else:
            chunks.append(line)
    if name is not None:
        yield name, b"".join(chunks).upper()


def _iter_fastq(f) -> Iterator[Record]:
    # We already consumed the first '@'
    line = f.readline().rstrip()
    while True:
        name = line.split()[0].decode()
        seq = f.readline().rstrip()
        f.readline()  # '+'
        f.readline()  # quals
        yield name, seq.upper()
        header = f.readline()
        if not header:
            return
        line = header.rstrip()[1:]


def read_fasta(path: str | os.PathLike) -> list[Record]:
    return list(iter_fastx(path))


def read_fastq(path: str | os.PathLike) -> list[Record]:
    return list(iter_fastx(path))


def write_fasta(path: str | os.PathLike, records: Iterable[Record], width: int = 80) -> None:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wb") as f:
        for name, seq in records:
            f.write(b">" + name.encode() + b"\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + b"\n")


def pansn_name(genome_name: str, contig: str, haplotype: int = 0) -> str:
    """PanSN sample#haplotype#contig naming used when merging genomes.

    Parity: reference prefixes records with '<genome>#0#'
    (/root/reference/pantax/src/fastixe.rs:70-94).
    """
    return f"{genome_name}#{haplotype}#{contig}"


def stream_fastx_buffers(
    path: str | os.PathLike, chunk_bytes: int = 64 << 20
) -> Iterator[bytes]:
    """Yield decompressed FASTA/FASTQ byte buffers, each ending on a record
    boundary, reading at most ~chunk_bytes at a time — bounded-memory input
    for multi-GB read files (the whole-file path caps near RAM size).

    FASTQ chunks cut after the last complete 4-line record; FASTA chunks cut
    before the last '\\n>' header."""
    import numpy as np

    with _open_text(path) as f:
        first = f.read(1)
        if not first:
            return
        fastq = first == b"@"
        buf = first
        while True:
            data = f.read(chunk_bytes)
            buf += data
            if not data:
                if buf.strip():
                    yield buf
                return
            if fastq:
                arr = np.frombuffer(buf, dtype=np.uint8)
                nl = np.flatnonzero(arr == 10)
                k = (len(nl) // 4) * 4
                cut = int(nl[k - 1]) + 1 if k else 0
            else:
                p = buf.rfind(b"\n>")
                cut = p + 1 if p >= 0 else 0
            if cut <= 0:
                continue  # record longer than the chunk: read more
            yield buf[:cut]
            buf = buf[cut:]
