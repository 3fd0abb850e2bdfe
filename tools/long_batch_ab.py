#!/usr/bin/env python
"""A/B: long-read chunk-alignment batch size.

The long align loop is device-compute-bound at [8192, 512] (~243 ms/batch,
pipeline depth 4 hides the dispatch RPC).  The DP scan's per-step overhead
is amortized over the batch rows, so a larger batch may cut wall time at
the cost of a fresh (expensive) compile of the [B, 512] graphs.

Usage: python tools/long_batch_ab.py [n_reads] [batch ...]
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
BATCHES = [int(x) for x in sys.argv[2:]] or [8192, 16384]


def main() -> None:
    db = scale_db("/tmp/pantax_tpu_scale")
    index = build_align_index(db)
    aligner = Aligner(index, cfg=AlignConfig.for_read_type("long"))
    chunk = LONG_READ_PRESETS["hifi"]
    stride = LONG_READ_SEED_STRIDE["hifi"]
    reads, _hap = simulate_long_reads(index, N, 8192, seed=9)

    for B in BATCHES:
        t0 = time.time()
        warm = align_long_reads(aligner, reads[: B // 4], chunk=chunk,
                                batch_size=B, seed_stride=stride,
                                as_arrays=True)
        print(f"batch {B:6d}: warm/compile {time.time()-t0:7.1f}s")
        t0 = time.time()
        out = align_long_reads(aligner, reads, chunk=chunk, batch_size=B,
                               seed_stride=stride, as_arrays=True)
        dt = time.time() - t0
        print(f"batch {B:6d}: {N} reads in {dt:6.1f}s = {N/dt:7.0f} reads/s"
              f" ({N*8192/dt/1e6:6.1f} Mb/s), aligned {len(out.read_ids)}")


if __name__ == "__main__":
    main()
