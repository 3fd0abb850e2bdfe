#!/usr/bin/env python
"""Probe 2: CHD-style 2-gather lookup chain vs bisect chain; gather cost vs
table size and row width."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 65536 * 24

rng = np.random.default_rng(0)
idxN = jnp.asarray(rng.integers(0, 4_000_000, size=N, dtype=np.int32))
hashes = jnp.asarray(rng.integers(0, 2**31 - 1, size=N, dtype=np.int32)).astype(jnp.uint32)


def t(name, fn, *args):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(8):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    print(f"{name:22s} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms")


def mix(h):
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    return h ^ (h >> 16)


# --- CHD chain: disp gather -> slot row gather (width 3) -> pos gather
m = 1 << 20
T = 1 << 23
disp = jnp.asarray(rng.integers(0, 64, size=m, dtype=np.int32))
table = jnp.asarray(rng.integers(0, 2**31 - 1, size=(T, 3), dtype=np.int32))
pos_arr = jnp.asarray(rng.integers(0, 2**31 - 1, size=8_000_000, dtype=np.int32))


def chd(h):
    b = (h >> jnp.uint32(12)).astype(jnp.int32)  # 20 bits
    d = disp[b]
    slot = (mix(h ^ d.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)) & jnp.uint32(T - 1)).astype(jnp.int32)
    row = table[slot]
    c = jnp.arange(4, dtype=jnp.int32)
    p = pos_arr[jnp.clip(row[:, 1:2] + c, 0, 7_999_999)]
    return p.sum() + row.sum()


t("chd 3-gather chain", jax.jit(chd), hashes)


# --- bisect chain (current): lo, hi, 3 key gathers, row, pos
BL = (1 << 24) + 1
bucket_lo = jnp.asarray(np.sort(rng.integers(0, 4_000_000, size=BL)).astype(np.int32))
rt = jnp.asarray(rng.integers(0, 2**31 - 1, size=(4_000_000, 3), dtype=np.int32))


def bisect(h):
    b = (h >> jnp.uint32(8)).astype(jnp.int32)
    lo = bucket_lo[b]
    hi = bucket_lo[b + 1]
    keys_col = rt[:, 0]
    lo_s, hi_s = lo, hi
    for _ in range(3):
        mid = (lo_s + hi_s) >> 1
        km = keys_col[jnp.clip(mid, 0, 4_000_000 - 1)].astype(jnp.uint32)
        go = (km < h) & (lo_s < hi_s)
        lo_s = jnp.where(go, mid + 1, lo_s)
        hi_s = jnp.where(go, hi_s, jnp.maximum(mid, lo_s))
    row = rt[jnp.clip(lo_s, 0, 4_000_000 - 1)]
    c = jnp.arange(4, dtype=jnp.int32)
    p = pos_arr[jnp.clip(row[:, 1:2] + c, 0, 7_999_999)]
    return p.sum() + row.sum()


t("bisect 7-gather chain", jax.jit(bisect), hashes)


# --- gather cost vs table rows and width
for rows in (1_000_000, 4_000_000, 16_000_000, 64_000_000):
    tab = jnp.asarray(rng.integers(0, 100, size=rows, dtype=np.int32))
    ix = jnp.asarray(rng.integers(0, rows, size=N, dtype=np.int32))
    t(f"1-col gather {rows//1_000_000}M rows", jax.jit(lambda i, tb: tb[i].sum()), ix, tab)
for w in (1, 2, 3, 4, 8, 16):
    tab = jnp.asarray(rng.integers(0, 100, size=(4_000_000, w), dtype=np.int32))
    t(f"row gather width {w}", jax.jit(lambda i, tb: tb[i].sum()), idxN, tab)
