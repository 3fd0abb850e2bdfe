"""Measure multi-process scaling of the distributed fused CLI path.

Runs the REAL CLI (pantax_tpu.cli.main --distributed ... --fastpath) over a
synthetic read file with 1, 2, and 4 processes (CPU backend, 1 device per
process, same machine) and reports wall times + parallel efficiency.  The
per-process work division is the byte-range read shard; the only serial
parts are the DB/table load, the accumulator allreduce, and process 0's
profile tail.

Each worker is PINNED to its own core (taskset + single-threaded XLA/BLAS)
so the 1-proc baseline doesn't silently use every core via intra-op
threading — the curve then models one-core-per-host multi-host scaling.

Usage: python tools/dist_scaling.py [n_reads] [procs_csv]
  e.g. python tools/dist_scaling.py 400000 1,2,4
Prints one JSON line: {"points": {"1": t, "2": t, "4": t}, ...}
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


def _run(nproc: int, db_dir: str, reads_fq: str, root: str,
         mode: str | None = None) -> float:
    worker = os.path.join(REPO, "tests", "_dist_cli_worker.py")
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        # one core per process: stop XLA/BLAS intra-op threading from
        # letting the 1-proc baseline use the whole socket
        "OMP_NUM_THREADS": "1",
        "OPENBLAS_NUM_THREADS": "1",
        "PYTHONPATH": os.pathsep.join(
            [os.path.join(REPO, "tests"), REPO,
             os.environ.get("PYTHONPATH", "")]
        ),
    }
    port = _free_port()
    t0 = time.time()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i),
             sys.executable, worker, str(i), str(nproc), str(port), db_dir,
             os.path.join(root, f"n{nproc}_p{i}")]
            + ([mode] if mode else []) + [reads_fq],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1800)
        logs.append(out.decode())
        with open(os.path.join(root, f"n{nproc}_p{i}.log"), "w") as f:
            f.write(logs[-1])
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
    proc_counts = [int(x) for x in
                   (sys.argv[2] if len(sys.argv) > 2 else "1,2,4").split(",")]
    mode = "-l" if "-l" in sys.argv[3:] else None
    root = tempfile.mkdtemp(prefix="pantax_dist_scaling_")
    db_dir = os.path.join(root, "db")
    build_database(
        "/root/reference/example/example_genomes_info.txt", db_dir,
        base_dir="/root/reference/example/ngs",
    )
    db = load_database(db_dir)
    reads = simulate_reads(
        db, {"GCF_002012065.1": 4, "GCF_024223415.1": 2,
             "GCF_006400955.1": 2}, n_reads=n_reads,
        read_len=4000 if mode == "-l" else 150, seed=1,
    )
    if mode == "-l":
        # several bounded groups so the round-robin split engages
        os.environ["PANTAX_TPU_LONG_GROUP_BASES"] = str(
            max(n_reads * 4000 // 8, 1 << 20))
    reads_fq = os.path.join(root, "reads.fq")
    with open(reads_fq, "w") as f:
        for r in reads:
            seq = r.seq if isinstance(r.seq, str) else r.seq.decode()
            f.write(f"@{r.read_id}\n{seq}\n+\n{'I' * len(seq)}\n")

    _run(1, db_dir, reads_fq, root, mode)  # warm the persistent compile cache
    points = {n: _run(n, db_dir, reads_fq, root, mode) for n in proc_counts}
    t1 = points.get(1, points[min(points)])
    print(json.dumps({
        "mode": "long" if mode else "short",
        "n_reads": n_reads,
        "points_s": {str(n): round(t, 2) for n, t in points.items()},
        "speedup": {str(n): round(t1 / t, 3) for n, t in points.items()},
        "efficiency": {str(n): round(t1 / (n * t), 3)
                       for n, t in points.items()},
    }))


if __name__ == "__main__":
    main()
