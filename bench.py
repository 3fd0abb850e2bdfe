#!/usr/bin/env python
"""Benchmark: short-read alignment throughput per chip on the reference's own
example workload (21,300 real 150bp reads from /root/reference/example/ngs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference pipeline's aligner (vg giraffe) sustains on the order
of 250 reads/s/core for short reads on CPU; BASELINE.md's target is >= 10x the
CPU pipeline per v5e chip, so vs_baseline = (reads/s/chip) / 2500.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pantax_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from pantax_tpu.align.aligner import Aligner
from pantax_tpu.align.encode import encode_seq
from pantax_tpu.align.index import build_align_index
from pantax_tpu.db.construct import DatabasePaths, build_database
from pantax_tpu.io.fastx import iter_fastx

EXAMPLE_INFO = "/root/reference/example/example_genomes_info.txt"
EXAMPLE_BASE = "/root/reference/example/ngs"
EXAMPLE_READS = "/root/reference/example/ngs/short_reads.fq.gz"
BENCH_DB = os.environ.get("PANTAX_TPU_BENCH_DB", "/tmp/pantax_tpu_bench_db")
BATCH = int(os.environ.get("PANTAX_TPU_BENCH_BATCH", 16384))
BASELINE_READS_PER_S = 2500.0  # 10x a ~250 reads/s/core CPU graph aligner


def main() -> None:
    db = (
        DatabasePaths(__import__("pathlib").Path(BENCH_DB))
        if os.path.exists(os.path.join(BENCH_DB, "species_range.txt"))
        else build_database(EXAMPLE_INFO, BENCH_DB, base_dir=EXAMPLE_BASE)
    )
    index = build_align_index(db)
    aligner = Aligner(index)

    reads = [seq for _, seq in iter_fastx(EXAMPLE_READS)]
    L = 160
    codes_all = np.full((len(reads), L), 4, dtype=np.int8)
    lens_all = np.zeros(len(reads), dtype=np.int64)
    for i, s in enumerate(reads):
        codes_all[i, : min(len(s), L)] = encode_seq(s)[:L]
        lens_all[i] = min(len(s), L)

    # tile up to an exact number of batches
    n_batches = 4
    total = BATCH * n_batches
    reps = (total + len(reads) - 1) // len(reads)
    codes = np.tile(codes_all, (reps, 1))[:total]
    lens = np.tile(lens_all, reps)[:total]

    # warmup / compile
    aligner.align_codes(codes[:BATCH], lens[:BATCH])

    t0 = time.time()
    aligned = 0
    for b in range(n_batches):
        res = aligner.align_codes(
            codes[b * BATCH : (b + 1) * BATCH], lens[b * BATCH : (b + 1) * BATCH]
        )
        aligned += int(res.aligned.sum())
    dt = time.time() - t0
    rate = total / dt

    print(
        json.dumps(
            {
                "metric": "ngs_reads_aligned_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "reads/s",
                "vs_baseline": round(rate / BASELINE_READS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
