#!/usr/bin/env python
"""Stage split of the long-read buffer-wire flow at bench scale.

Times put_read_group (host pack + buffer upload) separately from the full
align_long_reads call, twice, so compile effects show up as run-1/run-2
deltas.  Usage: python tools/long_flow_split.py [n_reads]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pantax_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from pantax_tpu.align.index import build_align_index
from pantax_tpu.align.long_read import align_long_reads
from pantax_tpu.align.aligner import Aligner, encode_seq
from pantax_tpu.benchmarks import scale_db, simulate_long_reads
from pantax_tpu.config import AlignConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

db = scale_db("/tmp/pantax_tpu_scale")
index = build_align_index(db)
aligner = Aligner(index, cfg=AlignConfig.for_read_type("long"))
reads, _hap = simulate_long_reads(index, N, 8192, seed=9)

enc = [encode_seq(s) for _, s in reads]
t0 = time.time(); grp = aligner.put_read_group(enc, 512)
# force materialization of the upload
np.asarray(grp["buf_d"][:1, :1])
t_put = time.time() - t0
rows = grp["buf_d"].shape[0]
print(f"put_read_group: {t_put:6.1f}s  buf [{rows}, {grp['buf_d'].shape[1]}]"
      f" = {rows * grp['buf_d'].shape[1] / 1e6:.0f} MB")

for rep in (1, 2):
    t0 = time.time()
    out = align_long_reads(aligner, reads, chunk=512, batch_size=16384,
                           seed_stride=2, as_arrays=True)
    dt = time.time() - t0
    print(f"run {rep}: {dt:6.1f}s  {N/dt:7.0f} reads/s  "
          f"aligned {len(out.read_ids)}/{N}")
