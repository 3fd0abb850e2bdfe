"""Worker for tests/test_distributed.py: run the REAL CLI as one process of
a jax.distributed fleet (CPU backend, 1 local device per process).

Run as: python tests/_dist_cli_worker.py <proc_id> <n_proc> <port> <db_dir>
        <run_dir> [-p|-l] <reads.fq> [<reads_R2.fq>]
"""
import os
import sys


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    idx, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    db, run_dir = sys.argv[4], sys.argv[5]
    rest = sys.argv[6:]
    mode = rest[0] if rest and rest[0] in ("-p", "-l") else None
    reads = rest[1:] if mode else rest

    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)
    from pantax_tpu.cli import main as cli_main

    type_flags = (["-l"] if mode == "-l"
                  else ["-s"] + (["-p"] if mode == "-p" else []))
    rc = cli_main([
        "-d", db, *type_flags, "-r", *reads,
        "--species", "--strain",
        "--fastpath", "--batch-size", "512",
        "--distributed", f"localhost:{port},{nproc},{idx}",
        "-T", os.path.join(run_dir, "tmpdir"),
        "-R", os.path.join(run_dir, "reads_classification.tsv"),
    ])
    sys.exit(rc)


if __name__ == "__main__":
    main()
