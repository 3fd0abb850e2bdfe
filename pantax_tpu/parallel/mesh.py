"""Multi-chip execution: device mesh + the sharded profiling step.

The reference is single-host (SURVEY.md §2.4 — rayon loops only).  Here the
scale-out story is jax.sharding: a 2-D mesh ("reads", "graph") where

  - the read batch is data-parallel over the "reads" axis,
  - the dense per-node coverage vector is sharded over the "graph" axis, so
    the cross-shard coverage merge lowers to a reduce-scatter over ICI,
  - the alignment index (text, seed table, projection arrays) is replicated,
  - the PAO solve runs on the replicated coverage (tiny x-dimension).

One jitted step = align batch -> node coverage -> ADMM PAO iterations; XLA
inserts every collective from the sharding annotations.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.aligner import _query_batch
from ..ops.coverage import interval_node_coverage


def make_mesh(n_devices: int | None = None, graph_axis: int = 1) -> Mesh:
    """Mesh over the first n devices with axes ("reads", "graph")."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    g = graph_axis if n % graph_axis == 0 else 1
    arr = np.array(devices[:n]).reshape(n // g, g)
    return Mesh(arr, ("reads", "graph"))


def profile_step(
    text2d, seed_table, bucket_lo, tstart, tnode, tlen,
    codes_fwd, codes_rev, read_len, A, ub,
    cfg_static, num_nodes: int, max_span: int, admm_iters: int,
):
    """Full profiling step: align -> coverage -> PAO (pure function, shardable)."""
    ts, te, score, matches, mapq, strand, aligned = _query_batch(
        text2d, seed_table, bucket_lo, tstart, tnode,
        codes_fwd, codes_rev, read_len, cfg_static,
    )
    coverage = interval_node_coverage(
        tstart, tnode, tlen, ts, te, aligned, num_nodes, max_span
    )
    node_len = jax.ops.segment_sum(
        tlen.astype(jnp.float32), tnode - 1, num_segments=num_nodes
    )
    occ = jax.ops.segment_sum(
        jnp.ones_like(tlen, jnp.float32), tnode - 1, num_segments=num_nodes
    )
    depth = coverage / jnp.maximum(node_len / jnp.maximum(occ, 1.0), 1.0)

    # box-constrained L1 regression via ADMM (see profile/pao.py)
    n, p = A.shape
    AtA = A.T @ A + jnp.eye(p, dtype=A.dtype)
    L = jnp.linalg.cholesky(AtA)
    b = depth[:n]
    rho = jnp.float32(1.0)
    thresh = 1.0 / (jnp.maximum(n, 1) * rho)

    def admm(carry, _):
        x, z, w, uz, uw = carry
        rhs = A.T @ (b + z - uz) + (w - uw)
        x = jax.scipy.linalg.cho_solve((L, True), rhs)
        Ax = A @ x
        z_new = Ax - b + uz
        z = jnp.sign(z_new) * jnp.maximum(jnp.abs(z_new) - thresh, 0.0)
        w = jnp.clip(x + uw, 0.0, ub)
        uz = uz + Ax - b - z
        uw = uw + x - w
        return (x, z, w, uz, uw), None

    x0 = jnp.zeros(p, dtype=A.dtype)
    z0 = jnp.zeros(n, dtype=A.dtype)
    (x, *_), _ = jax.lax.scan(admm, (x0, z0, x0, z0, x0), None, length=admm_iters)
    return x, coverage, mapq, aligned


class ShardedProfiler:
    """jit-compiled profile_step over a mesh with real shardings."""

    def __init__(self, mesh: Mesh, cfg_static, num_nodes: int,
                 max_span: int = 16, admm_iters: int = 50):
        self.mesh = mesh
        repl = NamedSharding(mesh, P())
        reads_sh = NamedSharding(mesh, P("reads"))
        graph_sh = NamedSharding(mesh, P("graph"))
        self.fn = jax.jit(
            partial(
                profile_step,
                cfg_static=cfg_static,
                num_nodes=num_nodes,
                max_span=max_span,
                admm_iters=admm_iters,
            ),
            in_shardings=(
                repl, repl, repl, repl, repl, repl,  # index arrays
                reads_sh, reads_sh, reads_sh,        # read batch
                repl, repl,                          # A, ub
            ),
            out_shardings=(repl, graph_sh, reads_sh, reads_sh),
        )

    def __call__(self, *args):
        return self.fn(*args)
