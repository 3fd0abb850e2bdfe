#!/usr/bin/env python
"""Probe: where the banded-DP scan time goes, on synthetic production-shape
inputs (N = B*K = 131072 rows, Lr = 160, band Wb = 16).

Variants:
  full        the production step (diag+up, 4-round prefix-max, out carry)
  no-out      drop the separate `out` carry (state freezes at read_len, so
              the final state IS the answer)
  no-prefix   drop the prefix-max rounds (left/ref-gap moves) entirely
  no-window   replace the per-step window slice with a constant
  band-list   band rows as a tuple of [N] arrays: sublane shifts become
              trace-time list reindexing; window carried as a rolling tuple
              with ONE new [1,N] slice per step
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
Lr, Wb, PAD = 160, 16, 8
MATCH, MISMATCH, GAP = 1, -1, -2
NEG = -(1 << 24)
SH_MATCH = 5
SH_SCORE = 13
BIAS = 1 << 10
D_SCORE = 1 << SH_SCORE
GAP_P = GAP * D_SCORE

rng = np.random.default_rng(0)
W = Lr + 2 * PAD
winT = jnp.asarray(rng.integers(0, 5, size=(W, N), dtype=np.int8))
readT = jnp.asarray(rng.integers(0, 5, size=(Lr, N), dtype=np.int8))
read_len = jnp.asarray(rng.integers(100, Lr + 1, size=N, dtype=np.int32))


def make_full(with_out=True, with_prefix=True, with_window=True):
    def f(winT, readT, read_len):
        neg = jnp.int32(NEG)
        band = jnp.arange(Wb, dtype=jnp.int32)[:, None]
        decay = band * jnp.int32(GAP_P)

        def sub_packed(i):
            if with_window:
                row = jax.lax.dynamic_slice_in_dim(winT, i, Wb, axis=0)
            else:
                row = winT[:Wb]
            x = readT[i][None, :]
            ok = (row == x) & (x < 4) & (row < 4)
            delta = jnp.where(ok, MATCH, MISMATCH).astype(jnp.int32) * D_SCORE
            return delta + (ok.astype(jnp.int32) << SH_MATCH)

        init_cell = (jnp.int32(BIAS) << SH_SCORE) + band
        state = init_cell + sub_packed(0)
        out = jnp.where((read_len[None, :] == 1), state, neg)

        def step(carry, i):
            state, out = carry
            up = jnp.concatenate(
                [state[1:], jnp.full((1, N), neg, jnp.int32)], axis=0)
            v = jnp.maximum(state + sub_packed(i), up + jnp.int32(GAP_P))
            if with_prefix:
                u = v - decay
                for sh in (1, 2, 4, 8):
                    shifted = jnp.concatenate(
                        [jnp.full((sh, N), neg, jnp.int32), u[:-sh]], axis=0)
                    u = jnp.maximum(u, shifted)
                v = u + decay
            live = (i < read_len)[None, :]
            state = jnp.where(live, v, state)
            if with_out:
                out = jnp.where((i == read_len - 1)[None, :], state, out)
            return (state, out), None

        (state, out), _ = jax.lax.scan(
            step, (state, out), jnp.arange(1, Lr, dtype=jnp.int32), unroll=4)
        r = out if with_out else state
        return jnp.max(r, axis=0).sum()
    return f


def band_list(winT, readT, read_len):
    neg32 = jnp.full((N,), NEG, jnp.int32)

    def sub_row(wrow, x):
        ok = (wrow == x) & (x < 4) & (wrow < 4)
        return jnp.where(ok, MATCH, MISMATCH).astype(jnp.int32) * D_SCORE + (
            ok.astype(jnp.int32) << SH_MATCH)

    wrows = tuple(winT[b] for b in range(Wb))
    x0 = readT[0]
    states = tuple(
        (jnp.int32((BIAS << SH_SCORE) + b) + sub_row(wrows[b], x0))
        for b in range(Wb))

    def step(carry, i):
        states, wrows = carry
        x = readT[i]
        new_row = jax.lax.dynamic_slice_in_dim(winT, i + Wb - 1, 1, axis=0)[0]
        wrows = wrows[1:] + (new_row,)
        gp = jnp.int32(GAP_P)
        v = [jnp.maximum(
                states[b] + sub_row(wrows[b], x),
                (states[b + 1] if b + 1 < Wb else neg32) + gp)
             for b in range(Wb)]
        u = [v[b] - jnp.int32(b * GAP_P) for b in range(Wb)]
        for sh in (1, 2, 4, 8):
            u = [jnp.maximum(u[b], u[b - sh]) if b - sh >= 0 else u[b]
                 for b in range(Wb)]
        v = [u[b] + jnp.int32(b * GAP_P) for b in range(Wb)]
        live = i < read_len
        states = tuple(jnp.where(live, v[b], states[b]) for b in range(Wb))
        return (states, wrows), None

    (states, _), _ = jax.lax.scan(
        step, (states, wrows), jnp.arange(1, Lr, dtype=jnp.int32), unroll=4)
    r = states[0]
    for b in range(1, Wb):
        r = jnp.maximum(r, states[b])
    return r.sum()


variants = [
    ("full", make_full()),
    ("no-out", make_full(with_out=False)),
    ("no-prefix", make_full(with_prefix=False)),
    ("no-window", make_full(with_window=False)),
    ("band-list", band_list),
]
for name, f in variants:
    fn = jax.jit(f)
    t0 = time.time()
    r = fn(winT, readT, read_len)
    chk = int(np.asarray(r))
    ct = time.time() - t0
    ts = []
    for _ in range(8):
        t0 = time.time()
        r = fn(winT, readT, read_len)
        np.asarray(r)
        ts.append(time.time() - t0)
    print(f"{name:10s} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms   "
          f"(compile {ct:5.1f}s, chk={chk})", flush=True)
