#!/usr/bin/env python
"""A/B: banded-DP scan unroll factor, timed on the window+DP stage.

Usage: python tools/dp_ab.py [batch] [unroll ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pantax_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from pantax_tpu.align import aligner as A
from pantax_tpu.align.aligner import Aligner, pack_codes
from pantax_tpu.align.index import build_align_index
from pantax_tpu.benchmarks import scale_db, simulate_read_batch

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
UNROLLS = [int(x) for x in sys.argv[2:]] or [4, 8]


def main() -> None:
    db = scale_db(os.environ.get("PANTAX_TPU_SCALE_DIR", "/tmp/pantax_tpu_scale"))
    index = build_align_index(db)
    al = Aligner(index)
    codes, lens, _ = simulate_read_batch(index, BATCH, 150, 0.01)
    packed = al._shard_reads(pack_codes(codes))
    lens_d = al._shard_reads(lens.astype(np.int32))
    cfg = al._static()
    TABLES = (al.text_d, al.run_table_d, al.seed_pos_d, al.bucket_lo_d,
              al.tstart_d, al.tnode_d)

    def make_full_cand(u):
        # fresh function object per unroll: jax.jit caches tracings by the
        # callable's identity, so re-jitting the same function would silently
        # reuse the first unroll's graph
        def full_cand(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                      tstart_d, tnode_d, packed, lens_d):
            codes_fwd = A._unpack_codes_j(packed)
            codes_rev = A._rev_codes_j(codes_fwd, lens_d)
            out = A._all_candidates(
                text_d, run_table_d, seed_pos_d, bucket_lo_d,
                tstart_d, tnode_d, codes_fwd, codes_rev, lens_d, cfg,
            )
            return sum(o.sum().astype(jnp.int32) for o in out[:4])
        return full_cand

    for u in UNROLLS:
        A._DP_UNROLL = u
        fn = jax.jit(make_full_cand(u))
        t0 = time.time()
        r = fn(*TABLES, packed, lens_d)
        chk = int(np.asarray(r))
        print(f"unroll={u:3d} compile+run {time.time()-t0:7.1f}s", flush=True)
        ts = []
        for _ in range(8):
            t0 = time.time()
            r = fn(*TABLES, packed, lens_d)
            np.asarray(r)
            ts.append(time.time() - t0)
        print(f"unroll={u:3d} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms  checksum={chk}",
              flush=True)


if __name__ == "__main__":
    main()
