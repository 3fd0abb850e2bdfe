#!/usr/bin/env python
"""A/B: long-read group-buffer wire vs per-batch codes upload, same window.

Usage: python tools/buf_wire_ab.py [n_reads] [batch]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pantax_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from pantax_tpu.align.index import build_align_index
from pantax_tpu.align.long_read import (
    LONG_READ_PRESETS, LONG_READ_SEED_STRIDE, align_long_reads,
)
from pantax_tpu.align.aligner import Aligner
from pantax_tpu.benchmarks import scale_db, simulate_long_reads
from pantax_tpu.config import AlignConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384


def run(label, reads, aligner, chunk, stride):
    t0 = time.time()
    out = align_long_reads(aligner, reads, chunk=chunk, batch_size=B,
                           seed_stride=stride, as_arrays=True)
    dt = time.time() - t0
    n_al = int((out.mapq > 0).sum())
    print(f"{label}: {dt:6.1f}s  {len(reads)/dt:7.0f} reads/s  "
          f"aligned {n_al}/{len(reads)}")
    return out


def main() -> None:
    db = scale_db("/tmp/pantax_tpu_scale")
    index = build_align_index(db)
    aligner = Aligner(index, cfg=AlignConfig.for_read_type("long"))
    chunk = LONG_READ_PRESETS["hifi"]
    stride = LONG_READ_SEED_STRIDE["hifi"]
    reads, _hap = simulate_long_reads(index, N, 8192, seed=9)

    # warm both graph families
    os.environ["PANTAX_TPU_READ_BUFFER"] = "1"
    align_long_reads(aligner, reads[:B // 4], chunk=chunk, batch_size=B,
                     seed_stride=stride, as_arrays=True)
    os.environ["PANTAX_TPU_READ_BUFFER"] = "0"
    align_long_reads(aligner, reads[:B // 4], chunk=chunk, batch_size=B,
                     seed_stride=stride, as_arrays=True)
    print("warm done")

    for rep in range(2):
        os.environ["PANTAX_TPU_READ_BUFFER"] = "1"
        a = run("buffer", reads, aligner, chunk, stride)
        os.environ["PANTAX_TPU_READ_BUFFER"] = "0"
        b = run("codes ", reads, aligner, chunk, stride)
        assert list(a.mapq) == list(b.mapq), "wire mismatch"


if __name__ == "__main__":
    main()
