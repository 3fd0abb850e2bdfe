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


def test_two_process_cli_matches_single_process(tmp_path):
    """The REAL CLI (--distributed ... --fastpath) over a byte-range-sharded
    read file on 2 processes writes byte-identical species/strain/
    classification tables to a 1-process run of the same command — the
    product multi-host path, not a library-only harness."""
    import filecmp

    from pantax_tpu.cli import main as cli_main
    from pantax_tpu.db.construct import build_database, load_database
    from pantax_tpu.sim import simulate_reads

    db_dir = tmp_path / "db"
    build_database("/root/reference/example/example_genomes_info.txt", db_dir,
                   base_dir="/root/reference/example/ngs")
    db = load_database(db_dir)
    reads = simulate_reads(db, {"GCF_002012065.1": 4, "GCF_024223415.1": 2,
                                "GCF_006400955.1": 2},
                           n_reads=3000, read_len=150, seed=33)
    reads_fq = tmp_path / "reads.fq"
    with open(reads_fq, "w") as f:
        for r in reads:
            seq = r.seq if isinstance(r.seq, str) else r.seq.decode()
            f.write(f"@{r.read_id}\n{seq}\n+\n{'I' * len(seq)}\n")

    # single-process reference run (same command, no --distributed)
    one = tmp_path / "one"
    one.mkdir()
    cwd = os.getcwd()
    os.chdir(one)
    try:
        rc = cli_main([
            "-d", str(db_dir), "-s", "-r", str(reads_fq),
            "--species", "--strain", "--fastpath", "--batch-size", "512",
            "--mesh", "off",
            "-T", str(one / "tmpdir"),
            "-R", str(one / "reads_classification.tsv"),
        ])
    finally:
        os.chdir(cwd)
    assert rc == 0

    worker = os.path.join(os.path.dirname(__file__), "_dist_cli_worker.py")
    port = _free_port()
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": os.pathsep.join([
            os.path.dirname(__file__),
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.environ.get("PYTHONPATH", ""),
        ]),
    }
    runs = [tmp_path / "p0", tmp_path / "p1"]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(db_dir),
             str(runs[i]), str(reads_fq)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # process 0 wrote the outputs; byte-identical to the 1-process run
    for name in ("species_abundance.txt", "strain_abundance.txt",
                 "reads_classification.tsv"):
        assert filecmp.cmp(one / name, runs[0] / name, shallow=False), (
            name, "\n".join(logs)[-2000:]
        )
    # process 1 wrote nothing
    assert not (runs[1] / "strain_abundance.txt").exists()


def test_two_process_cli_paired_matches_single_process(tmp_path):
    """--distributed with -p (two mate files): the chunk-round-robin paired
    shards (cli.py _run_fastpath_fused) keep mates synchronized — 2
    processes write the same species/strain tables byte-for-byte as 1
    process, and the same classification ROWS (round-robin shard order
    permutes rows across chunks, unlike the byte-range unpaired shards, so
    rows compare as sorted lines).  PANTAX_TPU_CHUNK_BYTES forces several
    chunks from the small fixture so both processes genuinely feed reads."""
    import filecmp

    from pantax_tpu.cli import main as cli_main
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.sim import simulate_reads

    db_dir = tmp_path / "db"
    db = build_database("/root/reference/example/example_genomes_info.txt",
                        db_dir, base_dir="/root/reference/example/ngs")
    reads = simulate_reads(db, {"GCF_002012065.1": 4, "GCF_024223415.1": 2,
                                "GCF_006400955.1": 2},
                           n_reads=3000, read_len=150, seed=44)
    r1_fq, r2_fq = tmp_path / "pe_R1.fq", tmp_path / "pe_R2.fq"
    with open(r1_fq, "w") as f1, open(r2_fq, "w") as f2:
        for i in range(0, len(reads), 2):
            for f, r in ((f1, reads[i]), (f2, reads[i + 1])):
                seq = r.seq if isinstance(r.seq, str) else r.seq.decode()
                f.write(f"@{r.read_id}\n{seq}\n+\n{'I' * len(seq)}\n")

    env_chunk = {"PANTAX_TPU_CHUNK_BYTES": str(64 << 10)}  # ~4 chunks
    one = tmp_path / "one"
    one.mkdir()
    cwd = os.getcwd()
    os.chdir(one)
    os.environ.update(env_chunk)
    try:
        rc = cli_main([
            "-d", str(db_dir), "-s", "-p", "-r", str(r1_fq), str(r2_fq),
            "--species", "--strain", "--fastpath", "--batch-size", "512",
            "--mesh", "off",
            "-T", str(one / "tmpdir"),
            "-R", str(one / "reads_classification.tsv"),
        ])
    finally:
        os.chdir(cwd)
        os.environ.pop("PANTAX_TPU_CHUNK_BYTES", None)
    assert rc == 0

    worker = os.path.join(os.path.dirname(__file__), "_dist_cli_worker.py")
    port = _free_port()
    env = {
        **os.environ,
        **env_chunk,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": os.pathsep.join([
            os.path.dirname(__file__),
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.environ.get("PYTHONPATH", ""),
        ]),
    }
    runs = [tmp_path / "p0", tmp_path / "p1"]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(db_dir),
             str(runs[i]), "-p", str(r1_fq), str(r2_fq)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    for name in ("species_abundance.txt", "strain_abundance.txt"):
        assert filecmp.cmp(one / name, runs[0] / name, shallow=False), (
            name, "\n".join(logs)[-2000:]
        )
    a = open(one / "reads_classification.tsv").read().splitlines()
    b = open(runs[0] / "reads_classification.tsv").read().splitlines()
    assert sorted(a) == sorted(b), (
        "classification rows differ between 1- and 2-process runs"
    )
    # the round-robin split was real: shard order permuted the rows
    assert a != b, "expected multiple chunks (PANTAX_TPU_CHUNK_BYTES too big?)"
    assert not (runs[1] / "strain_abundance.txt").exists()


def test_two_process_cli_long_matches_single_process(tmp_path):
    """--distributed with -l --fastpath (the long-read flow,
    cli.py _run_fastpath_long): read GROUPS round-robin across processes,
    coverage accumulators psum-merged, per-read columns gathered, process 0
    writes — species/strain tables byte-identical to a 1-process run, same
    classification ROWS (group round-robin permutes row order, so rows
    compare as sorted lines).  PANTAX_TPU_LONG_GROUP_BASES forces several
    groups from the small fixture so both processes genuinely align reads."""
    import filecmp
    import itertools

    from pantax_tpu.cli import main as cli_main
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.io.fastx import iter_fastx

    db_dir = tmp_path / "db"
    build_database("/root/reference/example/example_genomes_info.txt", db_dir,
                   base_dir="/root/reference/example/ngs")
    reads_fq = tmp_path / "long.fq"
    with open(reads_fq, "wb") as f:
        for name, seq in itertools.islice(
            iter_fastx("/root/reference/example/hifi/long_reads.fq.gz"), 60
        ):
            f.write(b"@" + name.encode() + b"\n" + seq + b"\n+\n"
                    + b"I" * len(seq) + b"\n")

    env_grp = {"PANTAX_TPU_LONG_GROUP_BASES": "100000"}  # several groups
    one = tmp_path / "one"
    one.mkdir()
    cwd = os.getcwd()
    os.chdir(one)
    os.environ.update(env_grp)
    try:
        rc = cli_main([
            "-d", str(db_dir), "-l", "-r", str(reads_fq),
            "--species", "--strain", "--fastpath", "--batch-size", "512",
            "--mesh", "off",
            "-T", str(one / "tmpdir"),
            "-R", str(one / "reads_classification.tsv"),
        ])
    finally:
        os.chdir(cwd)
        os.environ.pop("PANTAX_TPU_LONG_GROUP_BASES", None)
    assert rc == 0

    worker = os.path.join(os.path.dirname(__file__), "_dist_cli_worker.py")
    port = _free_port()
    env = {
        **os.environ,
        **env_grp,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": os.pathsep.join([
            os.path.dirname(__file__),
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.environ.get("PYTHONPATH", ""),
        ]),
    }
    runs = [tmp_path / "p0", tmp_path / "p1"]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(db_dir),
             str(runs[i]), "-l", str(reads_fq)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    for name in ("species_abundance.txt", "strain_abundance.txt"):
        assert filecmp.cmp(one / name, runs[0] / name, shallow=False), (
            name, "\n".join(logs)[-2000:]
        )
    a = open(one / "reads_classification.tsv").read().splitlines()
    b = open(runs[0] / "reads_classification.tsv").read().splitlines()
    assert sorted(a) == sorted(b), (
        "classification rows differ between 1- and 2-process long runs"
    )
    # the round-robin group split was real: both processes aligned reads
    assert a != b, "expected multiple groups (PANTAX_TPU_LONG_GROUP_BASES?)"
    assert not (runs[1] / "strain_abundance.txt").exists()


def test_distributed_requires_fastpath(tmp_path, capsys):
    """--distributed with the per-species GAF flow (no --fastpath) fails
    fast with a clear error BEFORE initializing the fleet, instead of every
    process silently redoing the whole run (cli.py _main guard)."""
    from pantax_tpu.cli import main as cli_main

    rc = cli_main([
        "-d", str(tmp_path / "nodb"), "-s", "-r", str(tmp_path / "r.fq"),
        "--distributed", "localhost:1,2,0",
    ])
    assert rc == 2
