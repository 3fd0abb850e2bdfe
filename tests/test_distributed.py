"""Multi-host skeleton (SURVEY.md §5 distributed-backend row): a 2-process
CPU mesh (jax.distributed + Gloo collectives) computes the same node/trio
coverage as one process, bit for bit."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_coverage_bitwise_matches_single(tmp_path):
    from _dist_worker import make_inputs
    from pantax_tpu.graph.trio import build_trio_index
    from pantax_tpu.ops.coverage_device import node_abundances_device

    packed, nodes_len, paths = make_inputs()
    ti = build_trio_index(nodes_len, paths)
    single = node_abundances_device(packed, nodes_len, ti)

    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    port = _free_port()
    out = str(tmp_path / "dist")
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        # tests dir (for _dist_worker imports) + repo root (so the worker
        # finds pantax_tpu even when the package is not pip-installed)
        "PYTHONPATH": os.pathsep.join(
            [
                os.path.dirname(__file__),
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                os.environ.get("PYTHONPATH", ""),
            ]
        ),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    for i in range(2):  # every process holds the full psum-merged result
        got = np.load(f"{out}.p{i}.npz")
        for ref, name in zip(single, ["na", "ta", "bc"]):
            assert np.array_equal(np.asarray(ref), got[name]), (i, name)
