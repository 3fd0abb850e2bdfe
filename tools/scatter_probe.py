#!/usr/bin/env python
"""Microbenchmark the fused step's primitive costs on the real device.

The fused classify+scatter adds ~74ms/batch over the plain query at scale-1
(tools/fused_split.py).  This probe times each primitive in isolation at the
production shapes so the next lever targets the right op:

  - scatter-add of the bases / diff / trio accumulators (update counts as in
    the current windowed formulation at L_cap, and as in a text-space
    difference formulation at ~12 updates/read)
  - the [B, L] window gathers (tstart/tnode/trio_seg columns)
  - one merged scatter into a single flat accumulator

Usage: python tools/scatter_probe.py [batch] [scale_dir]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
SCALE_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pantax_tpu_scale"


def sync(x):
    np.asarray(jax.device_get(x[:1] if getattr(x, "ndim", 0) else x))


def timeit(fn, n=6):
    fn()
    marks = []
    for _ in range(n):
        t0 = time.time()
        fn()
        marks.append(time.time() - t0)
    return sorted(marks)[len(marks) // 2]


def main() -> None:
    from pantax_tpu.align.index import build_align_index
    from pantax_tpu.db.construct import load_database

    db = load_database(os.path.join(SCALE_DIR, "db"))
    index = build_align_index(db)
    T = index.text_len
    M = len(index.tstart)
    N = 1 << 21          # node-space pad at this scale
    U = 1 << 21
    B = BATCH
    L = 16
    rng = np.random.default_rng(0)
    print(f"text {T} segments {M} batch {B} L_cap {L}")

    ts = jnp.asarray(rng.integers(0, T - 200, B), jnp.int32)
    seg = jnp.asarray(rng.integers(0, M - 8, B), jnp.int32)
    nodes = jnp.asarray(rng.integers(0, N - 1, (B, L)), jnp.int32)
    vals = jnp.ones((B, L), jnp.float32)

    acc_b = jnp.zeros(N, jnp.float32)
    acc_d = jnp.zeros(T + 1, jnp.int32)
    acc_t = jnp.zeros(U, jnp.float32)
    tstart_d = jnp.asarray(index.tstart, jnp.int32)
    tnode_d = jnp.asarray(index.tnode, jnp.int32)

    @jax.jit
    def scat_bases(acc, idx, v):
        return acc.at[idx.reshape(-1)].add(v.reshape(-1), mode="drop")

    @jax.jit
    def scat_diff(acc, lo, hi):
        return acc.at[lo.reshape(-1)].add(1, mode="drop").at[
            hi.reshape(-1)].add(-1, mode="drop")

    @jax.jit
    def scat_trio(acc, idx, v):
        return acc.at[idx[:, : L - 2].reshape(-1)].add(
            v[:, : L - 2].reshape(-1), mode="drop")

    @jax.jit
    def scat_flat12(acc, idx12, v12):
        # text-space formulation: 12 scalar updates/read into one flat acc
        return acc.at[idx12.reshape(-1)].add(v12.reshape(-1), mode="drop")

    @jax.jit
    def win_gather(i0):
        cols = jnp.arange(L + 1, dtype=jnp.int32)
        nxt = jnp.clip(i0[:, None] + cols[None, :], 0, M - 1)
        a = tstart_d[nxt]
        b = tnode_d[nxt[:, :L]]
        return a.sum() + b.sum()

    # windowed formulation costs
    lo = (ts[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]) % T
    hi = (lo + 7) % T
    idx12 = (jnp.tile(ts[:, None], (1, 12)) + jnp.arange(12, dtype=jnp.int32)
             ) % (T + 5 * M)
    v12 = jnp.ones((B, 12), jnp.float32)
    acc_flat = jnp.zeros(T + 5 * M + 16, jnp.float32)
    acc_flat_i = jnp.zeros(T + 5 * M + 16, jnp.int32)

    @jax.jit
    def scat_flat12_int(acc, idx12):
        return acc.at[idx12.reshape(-1)].add(1, mode="drop")

    def run(name, fn, *a):
        out = None

        def go():
            nonlocal out
            out = fn(*a)
            sync(out if not isinstance(out, tuple) else out[0])

        print(f"{name:28s}: {timeit(go)*1e3:8.1f} ms")

    run(f"bases scatter  [{B}x{L}] f32", scat_bases, acc_b, nodes, vals)
    run(f"diff scatter 2x[{B}x{L}] i32", scat_diff, acc_d, lo, hi)
    run(f"trio scatter  [{B}x{L-2}] f32", scat_trio, acc_t, nodes, vals)
    run(f"flat12 scatter [{B}x12] f32", scat_flat12, acc_flat, idx12, v12)
    run(f"flat12 scatter [{B}x12] i32", scat_flat12_int, acc_flat_i, idx12)
    run(f"window gather [{B}x{L+1}]", win_gather, seg)


if __name__ == "__main__":
    main()
