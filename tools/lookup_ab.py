#!/usr/bin/env python
"""A/B microbenchmark: CHD displacement-hash vs bucketed-bisection seed
lookup on the scale DB.

Times the hash+select+lookup prefix under each plan (same process, same
window) and checks the hit masks agree.

Usage: python tools/lookup_ab.py [batch]
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
from pantax_tpu.align.aligner import (
    Aligner,
    build_bucket_table,
    build_seed_lookup,
    pack_codes,
)
from pantax_tpu.align.index import build_align_index
from pantax_tpu.benchmarks import scale_db, simulate_read_batch

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 65536


def main() -> None:
    db = scale_db(os.environ.get("PANTAX_TPU_SCALE_DIR", "/tmp/pantax_tpu_scale"))
    index = build_align_index(db)
    t0 = time.time()
    al = Aligner(index)
    print(f"Aligner init (incl. CHD build): {time.time() - t0:.1f}s  "
          f"plan={al.lookup_steps}")
    codes, lens, _ = simulate_read_batch(index, BATCH, 150, 0.01)
    packed = al._shard_reads(pack_codes(codes))
    lens_d = al._shard_reads(lens.astype(np.int32))
    cfg = al._static()
    (k, density_bits, _mb, plan, s_max, hits, top_k, pad, match,
     mismatch, gap) = cfg[:11]

    # bisect tables built the fallback way
    seed_keys, seed_pos = index.seed_keys, index.seed_pos
    starts = np.flatnonzero(
        np.concatenate([[True], seed_keys[1:] != seed_keys[:-1]]))
    ends = np.concatenate([starts[1:], [len(seed_keys)]])
    run_table = np.stack([
        seed_keys[starts].astype(np.uint32).view(np.int32),
        starts.astype(np.int32), (ends - starts).astype(np.int32)], axis=1)
    bits, lo = build_bucket_table(seed_keys[starts])
    occ = int(np.diff(lo).max())
    steps = int(np.ceil(np.log2(occ + 1)))
    print(f"batch={BATCH} occ_max={occ} bisect_steps={steps}")

    def lookup_prefix(bucket_bits, steps_v):
        def f(table_d, pos_d, aux_d, packed, lens_d):
            codes_fwd = A._unpack_codes_j(packed)
            hashes, valid = A._kmer_hashes_j(codes_fwd, k)
            sp, sh, sv = A._select_seeds(hashes, valid, density_bits, s_max)
            hp, hv = A._lookup_hits(
                table_d, pos_d, aux_d, bucket_bits, steps_v, sh, sv, hits,
            )
            return (hp * hv).sum(), hv.sum()
        return jax.jit(f)

    put = jnp.asarray
    variants = [
        ("chd", lookup_prefix(al.bucket_bits, plan),
         (al.run_table_d, al.seed_pos_d, al.bucket_lo_d)),
        ("bisect", lookup_prefix(bits, steps),
         (put(run_table), put(seed_pos.astype(np.int32)), put(lo))),
    ]
    results = {}
    for name, fn, tables in variants:
        r = fn(*tables, packed, lens_d)
        out = int(np.asarray(r[0])), int(np.asarray(r[1]))
        ts = []
        for _ in range(8):
            t0 = time.time()
            r = fn(*tables, packed, lens_d)
            np.asarray(r[0])
            ts.append(time.time() - t0)
        t = sorted(ts)[len(ts) // 2] * 1e3
        results[name] = out
        print(f"{name:8s} {t:8.1f} ms   masked_pos_sum={out[0]} hits={out[1]}")
    print(f"outputs identical: {results['chd'] == results['bisect']}")


if __name__ == "__main__":
    main()
