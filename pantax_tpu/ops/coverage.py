"""Device-side coverage accumulation.

The rayon-loop + DashMap coverage of the reference
(/root/reference/pantax/src/profile.rs:742-1026) becomes segment-sum style
scatter adds over dense node tensors.  When the read batch is sharded across a
mesh axis, the dense output reduction is the cross-shard coverage merge — XLA
inserts the psum/reduce-scatter from the sharding annotations alone.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_nodes", "max_span"))
def interval_node_coverage(
    tstart, tnode, tlen, ts, te, aligned, num_nodes: int, max_span: int
):
    """Distribute each text interval [ts, te) over the path nodes it covers.

    tstart/tnode/tlen: index projection arrays (int32 [P]).
    ts/te: int32 [B] alignment text intervals; aligned: bool [B].
    Returns float32 [num_nodes] base counts per global node id (1-based ids
    mapped to id-1).  max_span bounds nodes-per-read (static).
    """
    P = tstart.shape[0]
    i0 = jnp.clip(jnp.searchsorted(tstart, ts, side="right") - 1, 0, P - 1)
    span_idx = i0[:, None] + jnp.arange(max_span, dtype=jnp.int32)[None, :]
    span_idx = jnp.clip(span_idx, 0, P - 1)
    node_start = tstart[span_idx]
    node_end = node_start + tlen[span_idx]
    lo = jnp.maximum(node_start, ts[:, None])
    hi = jnp.minimum(node_end, te[:, None])
    bases = jnp.maximum(hi - lo, 0).astype(jnp.float32)
    bases = jnp.where(aligned[:, None], bases, 0.0)
    node_ids = tnode[span_idx] - 1  # 1-based -> 0-based
    return jax.ops.segment_sum(
        bases.reshape(-1), node_ids.reshape(-1), num_segments=num_nodes
    )
