"""Worker process for tests/test_distributed.py (2-process CPU mesh).

Run as: python tests/_dist_worker.py <proc_id> <n_proc> <port> <out.npz>
with XLA_FLAGS=--xla_force_host_platform_device_count=K in the env.
"""
import sys

import numpy as np


def make_inputs(seed: int = 0, R: int = 200, N: int = 61, L: int = 7):
    """Deterministic coverage inputs shared by the workers and the in-test
    single-process oracle (same generator as test_parallel._random_packed)."""
    from pantax_tpu.profile.coverage import PackedReads

    rng = np.random.default_rng(seed)
    nodes_len = rng.integers(5, 60, size=N)
    nod = np.full((R, L), -1, np.int64)
    lens = rng.integers(1, L + 1, R)
    for i in range(R):
        s = rng.integers(0, N - 1)
        nod[i, : lens[i]] = np.arange(s, s + lens[i]) % N
    packed = PackedReads(
        nodes=nod,
        lengths=lens.astype(np.int64),
        read_start=rng.integers(0, 5, R).astype(np.int64),
        read_end=rng.integers(40, 200, R).astype(np.int64),
    )
    paths = {
        "h1": np.arange(0, N - 10, dtype=np.int64),
        "h2": np.concatenate([np.arange(0, 20), np.arange(30, N)]).astype(np.int64),
    }
    return packed, nodes_len, paths


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    idx, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )

    from pantax_tpu.graph.trio import build_trio_index
    from pantax_tpu.parallel.distributed import (
        distributed_node_abundances,
        init_distributed,
    )
    from pantax_tpu.profile.coverage import PackedReads

    init_distributed(f"localhost:{port}", nproc, idx)
    packed, nodes_len, paths = make_inputs()
    ti = build_trio_index(nodes_len, paths)

    half = packed.nodes.shape[0] // nproc
    sl = slice(idx * half, (idx + 1) * half)
    local = PackedReads(
        nodes=packed.nodes[sl],
        lengths=packed.lengths[sl],
        read_start=packed.read_start[sl],
        read_end=packed.read_end[sl],
    )
    na, ta, bc = distributed_node_abundances(local, nodes_len, ti)
    np.savez(f"{out}.p{idx}", na=na, ta=ta, bc=bc)


if __name__ == "__main__":
    main()
