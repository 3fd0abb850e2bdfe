#!/usr/bin/env python
"""Microbenchmark: plain query vs fused align+classify+coverage step.

Times, per batch on the chosen database: (a) upload only, (b) the packed
query (_query_batch_packed) including its one-row download, (c) the fused
step with donated accumulators and no per-read download, and (d) the fused
per-read download at finish granularity.  Isolates what the fused pipeline
adds over plain alignment — at 102 strains the e2e gap was ~370ms/batch.

axon's block_until_ready does not block; timings transfer one element.

Usage: python tools/fused_split.py [batch] [scale_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pantax_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax.numpy as jnp

from pantax_tpu.align.aligner import Aligner, _query_batch_packed, pack_codes
from pantax_tpu.align.index import build_align_index
from pantax_tpu.benchmarks import scale_db, simulate_read_batch
from pantax_tpu.db.construct import load_database
from pantax_tpu.ops.fused import FusedPipeline, build_fused_tables

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
SCALE_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pantax_tpu_scale2"


def sync(x) -> None:
    np.asarray(x)[:1] if hasattr(x, "shape") else x


def timeit(fn, n=6):
    fn()  # warm
    marks = []
    for _ in range(n):
        t0 = time.time()
        fn()
        marks.append(time.time() - t0)
    return sorted(marks)[len(marks) // 2]


def main() -> None:
    db = load_database(os.path.join(SCALE_DIR, "db"))
    index = build_align_index(db)
    al = Aligner(index)
    tables = build_fused_tables(db, index)
    codes, lens, _ = simulate_read_batch(index, BATCH, 150, 0.01)

    def upload():
        p = al._shard_reads(pack_codes(codes))
        l = al._shard_reads(lens.astype(np.int32))
        np.asarray(p[:1, :1]); np.asarray(l[:1])

    def query():
        out = _query_batch_packed(
            al.text_d, al.run_table_d, al.seed_pos_d, al.bucket_lo_d,
            al.tstart_d, al.tnode_d, al._shard_reads(pack_codes(codes)),
            al._shard_reads(lens.astype(np.int32)), al._static(),
        )
        np.asarray(out[:1, :1])

    pipe = FusedPipeline(al, tables, BATCH)

    def fused_feed():
        pipe.feed(codes, lens)
        np.asarray(pipe.acc_b[:1])

    def per_read_download():
        outs = pipe._per_read[-1][3]
        for a in outs:
            np.asarray(a[:1])
        cat = jnp.concatenate([pipe._per_read[-1][3][0],
                               pipe._per_read[-2][3][0]])
        np.asarray(cat)

    print(f"batch {BATCH} on {SCALE_DIR}")
    print(f"upload only        : {timeit(upload)*1e3:8.1f} ms")
    print(f"query packed       : {timeit(query)*1e3:8.1f} ms")
    print(f"fused feed (donate): {timeit(fused_feed)*1e3:8.1f} ms")
    print(f"  (accumulated {len(pipe._per_read)} batches)")


if __name__ == "__main__":
    main()
