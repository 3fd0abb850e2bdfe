"""Pallas fused gather+DP kernel vs the XLA reference implementation
(interpret mode on the CPU mesh)."""
import numpy as np
import pytest

import jax.numpy as jnp

from pantax_tpu.align.aligner import _banded_extend
from pantax_tpu.ops.extend_pallas import banded_extend_pallas

PAD, MATCH, MIS, GAP = 8, 1, -1, -2


def _case(rng, N=64, Lr=96, T=8192):
    text = rng.integers(0, 4, size=T).astype(np.int8)
    text = np.concatenate([text, np.full(1024, 4, dtype=np.int8)])
    w0 = rng.integers(0, T - (Lr + 2 * PAD) - 1, size=N).astype(np.int32)
    reads = np.empty((N, Lr), dtype=np.int8)
    lens = rng.integers(Lr // 2, Lr + 1, size=N).astype(np.int32)
    for i in range(N):
        # window-derived read with noise and small indels
        start = w0[i] + PAD + rng.integers(-4, 5)
        seg = text[start : start + Lr].copy()
        m = rng.random(Lr) < 0.05
        seg[m] = rng.integers(0, 4, size=int(m.sum()))
        reads[i] = seg[:Lr]
        reads[i, lens[i]:] = 4
    return text, w0, reads, lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_xla_dp(seed):
    rng = np.random.default_rng(seed)
    text, w0, reads, lens = _case(rng)
    W = reads.shape[1] + 2 * PAD
    windows = np.stack([text[s : s + W] for s in w0])
    ref = _banded_extend(
        jnp.asarray(windows), jnp.asarray(reads), jnp.asarray(lens),
        PAD, MATCH, MIS, GAP,
    )
    out = banded_extend_pallas(
        jnp.asarray(text), jnp.asarray(w0), jnp.asarray(reads),
        jnp.asarray(lens), PAD, MATCH, MIS, GAP, block=32, interpret=True,
    )
    for r, o, name in zip(ref, out, ["score", "start", "end", "matches"]):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o), err_msg=name)
