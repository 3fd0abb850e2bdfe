#!/usr/bin/env python
"""Microbenchmark: per-stage device time of the short-read alignment kernel.

Times nested prefixes of the query pipeline (hash+select -> +lookup -> +vote
-> +window+DP -> full _query_batch) on the scale-benchmark database, so the
difference between consecutive prefixes approximates each stage's cost.
axon's block_until_ready does not block, so each timing transfers one output
element to host (CLAUDE.md gotcha).

Usage: python tools/stage_split.py [batch]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 65536


def main() -> None:
    db = scale_db(os.environ.get("PANTAX_TPU_SCALE_DIR", "/tmp/pantax_tpu_scale"))
    index = build_align_index(db)
    al = Aligner(index)
    codes, lens, _ = simulate_read_batch(index, BATCH, 150, 0.01)
    packed = al._shard_reads(pack_codes(codes))
    lens_d = al._shard_reads(lens.astype(np.int32))
    cfg = al._static()
    (k, density_bits, bucket_bits, steps, s_max, hits, top_k, pad, match,
     mismatch, gap) = cfg[:11]

    TABLES = (al.text_d, al.run_table_d, al.seed_pos_d, al.bucket_lo_d,
              al.tstart_d, al.tnode_d)

    def stage_hash(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                   tstart_d, tnode_d, packed, lens_d):
        codes_fwd = A._unpack_codes_j(packed)
        hashes, valid = A._kmer_hashes_j(codes_fwd, k)
        sp, sh, sv = A._select_seeds(hashes, valid, density_bits, s_max)
        return sp.sum() + sh.sum().astype(jnp.int32)

    def stage_lookup(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                     tstart_d, tnode_d, packed, lens_d):
        codes_fwd = A._unpack_codes_j(packed)
        hashes, valid = A._kmer_hashes_j(codes_fwd, k)
        sp, sh, sv = A._select_seeds(hashes, valid, density_bits, s_max)
        hp, hv = A._lookup_hits(
            run_table_d, seed_pos_d, bucket_lo_d, bucket_bits, steps,
            sh, sv, hits,
        )
        return hp.sum() + hv.sum()

    def stage_vote(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                   tstart_d, tnode_d, packed, lens_d):
        codes_fwd = A._unpack_codes_j(packed)
        hashes, valid = A._kmer_hashes_j(codes_fwd, k)
        sp, sh, sv = A._select_seeds(hashes, valid, density_bits, s_max)
        hp, hv = A._lookup_hits(
            run_table_d, seed_pos_d, bucket_lo_d, bucket_bits, steps,
            sh, sv, hits,
        )
        B = codes_fwd.shape[0]
        p = sp[..., None]
        d_fwd = (hp - p).reshape(B, -1)
        d_rev = (hp - (lens_d[:, None, None] - k - p)).reshape(B, -1)
        hvf = hv.reshape(B, -1)
        cd_f, cv_f = A._vote_diagonals(d_fwd, hvf, band=pad, top_k=top_k)
        cd_r, cv_r = A._vote_diagonals(d_rev, hvf, band=pad, top_k=top_k)
        return cd_f.sum() + cv_f.sum() + cd_r.sum() + cv_r.sum()

    def _to_union(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                  tstart_d, tnode_d, packed, lens_d):
        """Everything up to the strand-union candidate pick (pre-window)."""
        codes_fwd = A._unpack_codes_j(packed)
        codes_rev = A._rev_codes_j(codes_fwd, lens_d)
        (k, density_bits, bucket_bits, steps, s_max, hits, top_k, pad,
         match, mismatch, gap) = cfg[:11]
        B, Lr = codes_fwd.shape
        hashes, valid = A._kmer_hashes_j(codes_fwd, k)
        sp, sh, sv = A._select_seeds(hashes, valid, density_bits, s_max)
        hp, hv = A._lookup_hits(
            run_table_d, seed_pos_d, bucket_lo_d, bucket_bits, steps,
            sh, sv, hits,
        )
        p = sp[..., None]
        d_fwd = (hp - p).reshape(B, -1)
        d_rev = (hp - (lens_d[:, None, None] - k - p)).reshape(B, -1)
        hvf = hv.reshape(B, -1)
        cd_f, cv_f = A._vote_diagonals(d_fwd, hvf, band=pad, top_k=top_k)
        cd_r, cv_r = A._vote_diagonals(d_rev, hvf, band=pad, top_k=top_k)
        K = top_k
        diag_u = jnp.concatenate([cd_f, cd_r], axis=1)
        vote_u = jnp.concatenate([cv_f, cv_r], axis=1)
        cols2k = jnp.arange(2 * K, dtype=jnp.int32)[None, :]
        sel_cols = []
        v = vote_u
        for _ in range(K):
            b = jnp.argmax(v, axis=1).astype(jnp.int32)
            sel_cols.append(b)
            v = jnp.where(cols2k == b[:, None], -1, v)
        sel = jnp.stack(sel_cols, axis=1)
        cand_diag = jnp.take_along_axis(diag_u, sel, axis=1)
        cand_votes = jnp.take_along_axis(vote_u, sel, axis=1)
        strand = (sel >= K).astype(jnp.int8)
        return codes_fwd, codes_rev, cand_diag, cand_votes, strand

    def stage_union(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                    tstart_d, tnode_d, packed, lens_d):
        _, _, cand_diag, cand_votes, strand = _to_union(
            text_d, run_table_d, seed_pos_d, bucket_lo_d, tstart_d,
            tnode_d, packed, lens_d)
        return (cand_diag.sum() + cand_votes.sum()
                + strand.sum(dtype=jnp.int32))

    def stage_window(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                     tstart_d, tnode_d, packed, lens_d):
        codes_fwd, codes_rev, cand_diag, cand_votes, strand = _to_union(
            text_d, run_table_d, seed_pos_d, bucket_lo_d, tstart_d,
            tnode_d, packed, lens_d)
        (k, density_bits, bucket_bits, steps, s_max, hits, top_k, pad,
         match, mismatch, gap) = cfg[:11]
        B, Lr = codes_fwd.shape
        W = Lr + 2 * pad
        n_extra = (W + 255) // 256
        T = (text_d.shape[0] - n_extra) * 256
        w0 = jnp.clip(cand_diag - pad, 0, T - W)
        window = A._extract_windows(text_d, w0.reshape(-1), W)
        return window.sum(dtype=jnp.int32) + cand_votes.sum()

    def stage_full_cand(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                        tstart_d, tnode_d, packed, lens_d):
        codes_fwd = A._unpack_codes_j(packed)
        codes_rev = A._rev_codes_j(codes_fwd, lens_d)
        out = A._all_candidates(
            text_d, run_table_d, seed_pos_d, bucket_lo_d,
            tstart_d, tnode_d, codes_fwd, codes_rev, lens_d, cfg,
        )
        return sum(o.sum().astype(jnp.int32) for o in out[:4])

    def stage_query(text_d, run_table_d, seed_pos_d, bucket_lo_d,
                    tstart_d, tnode_d, packed, lens_d):
        out = A._query_batch(
            text_d, run_table_d, seed_pos_d, bucket_lo_d,
            tstart_d, tnode_d, packed, lens_d, cfg,
        )
        return out[2].sum()

    stages = [
        ("hash+select", jax.jit(stage_hash)),
        ("+seed lookup", jax.jit(stage_lookup)),
        ("+vote", jax.jit(stage_vote)),
        ("+strand union", jax.jit(stage_union)),
        ("+window extract (no DP)", jax.jit(stage_window)),
        ("+window+DP (all cands)", jax.jit(stage_full_cand)),
        ("full _query_batch", jax.jit(stage_query)),
    ]
    prev = 0.0
    print(f"batch={BATCH} Lr={codes.shape[1]}")
    for name, fn in stages:
        r = fn(*TABLES, packed, lens_d)
        np.asarray(r)  # force (compile + run)
        ts = []
        for _ in range(6):
            t0 = time.time()
            r = fn(*TABLES, packed, lens_d)
            np.asarray(r)
            ts.append(time.time() - t0)
        t = sorted(ts)[len(ts) // 2] * 1e3
        print(f"{name:26s} {t:8.1f} ms  (+{t - prev:7.1f} ms)")
        prev = t


if __name__ == "__main__":
    main()
