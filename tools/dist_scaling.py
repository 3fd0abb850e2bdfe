"""Measure multi-process scaling of the distributed fused CLI path.

Runs the REAL CLI (pantax_tpu.cli.main --distributed ... --fastpath) over a
synthetic read file with 1 and 2 processes (CPU backend, 1 device per
process, same machine) and reports wall times + parallel efficiency.  The
per-process work division is the byte-range read shard; the only serial
parts are the DB/table load, the accumulator allreduce, and process 0's
profile tail.

Usage: python tools/dist_scaling.py [n_reads]
Prints one JSON line: {"t1": ..., "t2": ..., "efficiency": ...}
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(nproc: int, db_dir: str, reads_fq: str, root: str) -> float:
    worker = os.path.join(REPO, "tests", "_dist_cli_worker.py")
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": os.pathsep.join(
            [os.path.join(REPO, "tests"), REPO,
             os.environ.get("PYTHONPATH", "")]
        ),
    }
    port = _free_port()
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port), db_dir,
             os.path.join(root, f"n{nproc}_p{i}"), reads_fq],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        logs.append(out.decode())
    if any(p.returncode != 0 for p in procs):
        sys.stderr.write("\n".join(logs))
        raise SystemExit(1)
    return time.time() - t0


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from pantax_tpu.db.construct import build_database, load_database
    from pantax_tpu.sim import simulate_reads

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    root = tempfile.mkdtemp(prefix="pantax_dist_scaling_")
    db_dir = os.path.join(root, "db")
    build_database(
        "/root/reference/example/example_genomes_info.txt", db_dir,
        base_dir="/root/reference/example/ngs",
    )
    db = load_database(db_dir)
    reads = simulate_reads(
        db, {"GCF_002012065.1": 4, "GCF_024223415.1": 2,
             "GCF_006400955.1": 2}, n_reads=n_reads, read_len=150, seed=1,
    )
    reads_fq = os.path.join(root, "reads.fq")
    with open(reads_fq, "w") as f:
        for r in reads:
            seq = r.seq if isinstance(r.seq, str) else r.seq.decode()
            f.write(f"@{r.read_id}\n{seq}\n+\n{'I' * len(seq)}\n")

    _run(1, db_dir, reads_fq, root)  # warm the persistent compile cache
    t1 = _run(1, db_dir, reads_fq, root)
    t2 = _run(2, db_dir, reads_fq, root)
    print(json.dumps({
        "n_reads": n_reads,
        "t1_s": round(t1, 2),
        "t2_s": round(t2, 2),
        "speedup": round(t1 / t2, 3),
        "efficiency": round(t1 / (2 * t2), 3),
    }))


if __name__ == "__main__":
    main()
