#!/usr/bin/env python
"""Probe: cost of the post-vote candidate prep in _all_candidates
(read replication, window extraction) vs the DP scan itself, at
production shape on the scale DB text.

Usage: python tools/win_probe.py [batch]
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
from pantax_tpu.align.aligner import Aligner
from pantax_tpu.align.index import build_align_index
from pantax_tpu.benchmarks import scale_db

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
K = 2
Lr, PAD = 160, 8
W = Lr + 2 * PAD

db = scale_db(os.environ.get("PANTAX_TPU_SCALE_DIR", "/tmp/pantax_tpu_scale"))
index = build_align_index(db)
al = Aligner(index)
text2d = al.text_d
T = (text2d.shape[0] - 1) * 256

rng = np.random.default_rng(0)
codes_fwd_h = rng.integers(0, 4, size=(B, Lr), dtype=np.int8)
lens_h = np.full(B, 150, dtype=np.int32)
w0_h = rng.integers(0, T - W, size=B * K, dtype=np.int32)
strand_h = rng.integers(0, 2, size=(B, K), dtype=np.int8)

codes_fwd = jnp.asarray(codes_fwd_h)
lens = jnp.asarray(lens_h)
w0 = jnp.asarray(w0_h)
strand = jnp.asarray(strand_h)


def t(name, fn, *args):
    c0 = time.time()
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ct = time.time() - c0
    ts = []
    for _ in range(8):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    print(f"{name:26s} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms  (compile {ct:5.1f}s)",
          flush=True)


def read_rep_fn(codes_fwd, lens, strand):
    codes_rev = A._rev_codes_j(codes_fwd, lens)
    codes_pair = jnp.stack([codes_fwd, codes_rev], axis=1)
    read_rep = jnp.take_along_axis(
        codes_pair, strand.astype(jnp.int32)[:, :, None], axis=1
    ).reshape(B * K, -1)
    return read_rep.astype(jnp.int32).sum()


def windows_fn(text2d, w0):
    return A._extract_windows(text2d, w0, W).astype(jnp.int32).sum()


def windows_plus_transpose(text2d, w0):
    win = A._extract_windows(text2d, w0, W)
    return jax.lax.optimization_barrier(win.T).astype(jnp.int32).sum()


t("read_rep (stack+take)", jax.jit(read_rep_fn), codes_fwd, lens, strand)
t("extract_windows", jax.jit(windows_fn), text2d, w0)
t("extract_windows + win.T", jax.jit(windows_plus_transpose), text2d, w0)


def read_rep_select(codes_fwd, lens, strand):
    codes_rev = A._rev_codes_j(codes_fwd, lens)
    read_rep = jnp.where(
        (strand == 1)[:, :, None], codes_rev[:, None, :], codes_fwd[:, None, :]
    ).reshape(B * K, -1)
    return read_rep.astype(jnp.int32).sum()


t("read_rep (where select)", jax.jit(read_rep_select), codes_fwd, lens, strand)


def rev_only(codes_fwd, lens):
    return A._rev_codes_j(codes_fwd, lens).astype(jnp.int32).sum()


t("rev_codes only", jax.jit(rev_only), codes_fwd, lens)
