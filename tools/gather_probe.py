#!/usr/bin/env python
"""Probe TPU gather costs for candidate seed-lookup layouts.

Times, for ~1.57M lookup indices into a ~4M-run table:
  rowgather   run_table[idx]            [N,3] elementwise row gather (baseline round)
  colgather   keys[idx]                 [N] 1-D gather
  slab1d      keys[s:s+M] per index     vmapped 1-D dynamic_slice (lane slices)
  slab2dT     colsT[:, s:s+M]           [3,D] transposed slab
  slab2d      run_table[s:s+M, :]       [D,3] row slab (the slow one)
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 65536 * 24
D = 4_000_000
M = 8

rng = np.random.default_rng(0)
run_table = jnp.asarray(rng.integers(0, 2**31 - 1, size=(D, 3), dtype=np.int32))
keys = run_table[:, 0]
colsT = jnp.asarray(np.ascontiguousarray(np.asarray(run_table).T))
idx = jnp.asarray(rng.integers(0, D - M, size=N, dtype=np.int32))


def t(name, fn):
    r = fn(idx)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(8):
        t0 = time.time()
        r = fn(idx)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    print(f"{name:10s} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms")


t("rowgather", jax.jit(lambda i: run_table[i].sum()))
t("colgather", jax.jit(lambda i: keys[i].sum()))
t("slab1d", jax.jit(lambda i: jax.vmap(
    lambda s: jax.lax.dynamic_slice(keys, (s,), (M,)))(i).sum()))
t("slab2dT", jax.jit(lambda i: jax.vmap(
    lambda s: jax.lax.dynamic_slice(colsT, (jnp.int32(0), s), (3, M)))(i).sum()))
t("slab2d", jax.jit(lambda i: jax.vmap(
    lambda s: jax.lax.dynamic_slice(run_table, (s, jnp.int32(0)), (M, 3)))(i).sum()))
