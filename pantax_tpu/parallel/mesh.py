"""Device-mesh construction for the reads-sharded product pipeline.

The reference is single-host (SURVEY.md §2.4 — rayon loops only; the natural
shard axis is reads/species, profile.rs:3297).  Here the scale-out story is
jax.sharding over a ("reads",) mesh:

  - the read batch (wire-packed codes + lengths) is data-parallel over the
    "reads" axis (align/aligner.py _shard_reads),
  - the alignment index and the graph coverage tables are replicated
    (ops/fused.py build_fused_tables / _put_repl),
  - the fused step's coverage scatters psum-merge per-shard contributions
    into the replicated accumulators — integer-valued addends, so an
    N-device run is bit-identical to 1-device (tests/test_fused.py
    test_fused_pipeline_mesh_bit_parity; __graft_entry__.dryrun_multichip
    extends the assertion through the device profile tail to the final
    strain tables).

There is deliberately NO separate mesh pipeline assembly here: the product
path (ops/fused.FusedPipeline + ops/profile_tail) is the only assembly, and
the mesh tests exercise it directly.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


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
