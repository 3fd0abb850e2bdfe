"""Multi-chip execution: device mesh + the full-parity sharded profiling step.

The reference is single-host (SURVEY.md §2.4 — rayon loops only; the natural
shard axis is reads/species, profile.rs:3297).  Here the scale-out story is
jax.sharding over a ("reads",) mesh:

  - the read batch (codes, lengths, and the packed node paths) is
    data-parallel over the "reads" axis,
  - the alignment index (text, seed table, projection arrays) and the graph
    coverage tables are replicated,
  - the three dense coverage outputs (node abundance, trio abundance, exact
    per-base counts) are cross-shard reductions XLA lowers to psums over ICI,
  - the PAO ADMM runs on the replicated merged coverage (tiny x-dimension).

profile_step is the REAL pipeline — _query_batch (the production aligner),
ops.coverage_device._node_abundances_impl (the full-parity coverage engine,
oracle-tested against profile.rs:742-1026), and profile.pao._admm_body (the
production ADMM) — fused into one jitted step.  Every per-read coverage
contribution is integer-valued, so the psum merge is exact and N-device
output == 1-device output bit-for-bit (tests/test_parallel.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.aligner import _query_batch
from ..ops.coverage_device import _node_abundances_impl
from ..profile.pao import _admm_body


def make_mesh(n_devices: int | None = None, graph_axis: int = 1) -> Mesh:
    """Mesh over the first n devices with axes ("reads", "graph").

    The product path shards over "reads" only (graph tensors are replicated —
    the dense coverage vectors are psum-merged); the "graph" axis is kept for
    range-sharding very large DB coverage tensors."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    g = graph_axis if n % graph_axis == 0 else 1
    arr = np.array(devices[:n]).reshape(n // g, g)
    return Mesh(arr, ("reads", "graph"))


def profile_step(
    # alignment index (replicated)
    text2d, run_table, seed_pos, bucket_lo, tstart, tnode,
    # read batch (sharded over "reads"; nibble-packed, see aligner.pack_codes)
    codes_packed, read_len,
    # graph coverage tables (replicated; global 0-based node space)
    nodes_len, base_offset,
    trio_hash_sorted, trio_order, trio_abc_sorted, trio_len,
    # PAO inputs (replicated)
    A, min_depth,
    *,
    cfg_static, L_cap: int, num_nodes: int, total_bases: int, num_trios: int,
    admm_iters: int,
):
    """Full profiling step: align -> project onto node paths -> full-parity
    coverage -> masked-L1 ADMM PAO.  Pure function; shardable.

    The PAO stage solves min (1/n)||A x - b||_1 over nodes with coverage
    above min_depth (profile.rs:1387-1403 valid-node selection as a mask:
    zeroed rows contribute |0-0| = 0, identical to row selection).
    """
    ts, te, score, matches, mapq, strand, aligned = _query_batch(
        text2d, run_table, seed_pos, bucket_lo, tstart, tnode,
        codes_packed, read_len, cfg_static,
    )

    # project text intervals onto the node index (fastpath.py:125-135 on host)
    n_seg = tnode.shape[0]
    i0 = jnp.clip(jnp.searchsorted(tstart, ts, side="right") - 1, 0, n_seg - 1)
    i1 = jnp.clip(
        jnp.searchsorted(tstart, jnp.maximum(te - 1, ts), side="right") - 1,
        0, n_seg - 1,
    )
    span = jnp.clip(i1 - i0 + 1, 0, L_cap).astype(jnp.int32)
    lengths = jnp.where(aligned, span, 0)
    cols = jnp.arange(L_cap, dtype=jnp.int32)[None, :]
    take = jnp.clip(i0[:, None] + cols, 0, n_seg - 1)
    nodes = jnp.where(
        cols < lengths[:, None], tnode[take].astype(jnp.int32) - 1, -1
    )
    read_start = (ts - tstart[i0]).astype(jnp.int32)
    read_end = read_start + (te - ts).astype(jnp.int32)

    node_abund, trio_abund, node_base_cov = _node_abundances_impl(
        nodes, lengths, read_start, read_end,
        nodes_len, base_offset,
        trio_hash_sorted, trio_order, trio_abc_sorted, trio_len,
        num_nodes=num_nodes, total_bases=total_bases, num_trios=num_trios,
    )

    # PAO on the merged coverage (replicated; tiny relative to alignment)
    b = node_abund.astype(jnp.float32)
    mask = b > min_depth
    Am = A * mask[:, None].astype(A.dtype)
    bm = jnp.where(mask, b, 0.0)
    n_eff = jnp.maximum(jnp.sum(mask), 1)
    ub = 1.05 * jnp.max(b)
    scale = jnp.maximum(jnp.max(bm), jnp.float32(1e-9))
    x, obj = _admm_body(
        Am, bm / scale, ub / scale, jnp.float32(1.0), n_eff, admm_iters
    )
    x = x * scale
    return x, node_abund, trio_abund, node_base_cov, mapq, aligned


def build_global_profile_tables(db):
    """Global-node-space coverage tables + block-diagonal path coefficient
    matrix over ALL species graphs of a database.

    Rows of A live in the padded global 0-based node space (species offset =
    range.start - 1, sort_range.rs parity); columns are haplotype paths in
    species-range order, names sorted within a species (engine._coeff_matrix
    semantics, profile.rs:1333-1343).
    """
    from ..graph.core import load_species_range
    from ..graph.trio import build_trio_index
    from ..ops.coverage_device import build_padded_tables

    ranges = load_species_range(db.range_file)
    N = max(r.end for r in ranges)
    nodes_len = np.ones(N, dtype=np.int64)
    trio_nodes, trio_len, path_rows, path_names = [], [], [], []
    for r in ranges:
        g = db.load_graph(r.species)
        off = r.start - 1
        nodes_len[off:off + g.num_nodes] = g.nodes_len
        paths = g.paths_dict()
        ti = build_trio_index(g.nodes_len, paths)
        if ti.num_unique:
            trio_nodes.append(np.asarray(ti.trio_nodes) + off)
            trio_len.append(np.asarray(ti.trio_len))
        for name in sorted(paths):
            path_rows.append(np.asarray(paths[name]) + off)
            path_names.append(f"{r.species}:{name}")
    tn = (np.concatenate(trio_nodes) if trio_nodes
          else np.zeros((0, 3), np.int64))
    tl = (np.concatenate(trio_len) if trio_len else np.zeros(0, np.int64))
    tables = build_padded_tables(nodes_len, tn, tl)
    A = np.zeros((tables.N_pad, len(path_rows)), dtype=np.float32)
    for j, rows in enumerate(path_rows):
        A[rows, j] = 1.0
    return tables, A, path_names


class ShardedProfiler:
    """jit-compiled full-parity profile_step over a mesh with real shardings."""

    def __init__(self, mesh: Mesh, cfg_static, *, L_cap: int, num_nodes: int,
                 total_bases: int, num_trios: int, admm_iters: int = 200):
        self.mesh = mesh
        repl = NamedSharding(mesh, P())
        reads_sh = NamedSharding(mesh, P("reads"))
        self.fn = jax.jit(
            partial(
                profile_step,
                cfg_static=cfg_static,
                L_cap=L_cap,
                num_nodes=num_nodes,
                total_bases=total_bases,
                num_trios=num_trios,
                admm_iters=admm_iters,
            ),
            in_shardings=(
                repl, repl, repl, repl, repl, repl,  # index arrays
                reads_sh, reads_sh,                  # read batch
                repl, repl,                          # coverage tables
                repl, repl, repl, repl,              # trio tables
                repl, repl,                          # A, min_depth
            ),
            out_shardings=(repl, repl, repl, repl, reads_sh, reads_sh),
        )

    def __call__(self, *args):
        return self.fn(*args)
