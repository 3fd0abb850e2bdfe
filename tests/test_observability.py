"""Logging, timers, progress, and DB-build failure/resume behavior."""
import logging
import os

import numpy as np
import pytest

from pantax_tpu.io.fastx import write_fasta
from pantax_tpu.io.metadata import GenomeInfo, write_genomes_info
from pantax_tpu.utils.logging import ProgressMonitor, setup_logging, stage_timer


def test_setup_logging_file_sink(tmp_path, capsys):
    setup_logging(tmp_path, discriminant="t1")
    logging.getLogger("pantax_tpu").info("hello file")
    content = (tmp_path / "pantax_tpu_t1.log").read_text()
    assert "hello file" in content
    # reset handlers so later tests aren't affected
    setup_logging(None)


def test_stage_timer_logs(caplog):
    with caplog.at_level(logging.INFO, logger="pantax_tpu"):
        with stage_timer("teststage"):
            pass
    assert any("teststage" in r.message for r in caplog.records)


def test_progress_monitor(caplog):
    with caplog.at_level(logging.INFO, logger="pantax_tpu"):
        pm = ProgressMonitor(20, "work", step_pct=25)
        for i in range(20):
            pm.update(ok=(i != 3))
    msgs = [r.getMessage() for r in caplog.records]
    assert any("25%" in m for m in msgs)
    assert any("100%" in m and "1 failed" in m for m in msgs)


def _write_genomes(tmp_path, bad_species=False):
    rng = np.random.default_rng(0)
    infos = []
    for sp in ("11", "22"):
        seq = np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, size=5000)
        ].tobytes()
        name = f"GCF_{sp}.1_x_genomic.fna"
        write_fasta(tmp_path / name, [("c", seq)])
        infos.append(GenomeInfo(f"GCF_{sp}.1_x", f"{sp}.1", sp, "org", name))
    if bad_species:
        infos.append(GenomeInfo("GCF_99.1_x", "99.1", "99", "org", "missing.fna"))
    info_file = tmp_path / "info.txt"
    write_genomes_info(info_file, infos)
    return info_file


def test_build_tolerates_failing_species(tmp_path):
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.graph.core import load_species_range

    info_file = _write_genomes(tmp_path, bad_species=True)
    db = build_database(info_file, tmp_path / "db", base_dir=tmp_path)
    ranges = load_species_range(db.range_file)
    assert {r.species for r in ranges} == {"11", "22"}  # 99 skipped


def test_build_resume_skips_finished(tmp_path):
    from pantax_tpu.db.construct import build_database

    info_file = _write_genomes(tmp_path)
    db = build_database(info_file, tmp_path / "db", base_dir=tmp_path)
    finished = (db.root / "finished_species.txt").read_text().split()
    assert set(finished) == {"11", "22"}
    # remove the range file to force re-run; graphs must be reused
    os.remove(db.range_file)
    mtimes = {f.name: f.stat().st_mtime_ns for f in db.graph_dir.iterdir()}
    db = build_database(info_file, tmp_path / "db", base_dir=tmp_path)
    for f in db.graph_dir.iterdir():
        assert f.stat().st_mtime_ns == mtimes[f.name]


def test_all_species_failing_raises(tmp_path):
    from pantax_tpu.db.construct import build_database

    infos = [GenomeInfo("GCF_1.1_x", "1.1", "1", "org", "nope.fna")]
    info_file = tmp_path / "info.txt"
    write_genomes_info(info_file, infos)
    with pytest.raises(RuntimeError, match="all species failed"):
        build_database(info_file, tmp_path / "db", base_dir=tmp_path)


def test_prefetched_order_and_gating(monkeypatch):
    """utils.prefetched yields (item, prep(item)) in exact input order with
    the worker enabled, disabled (PANTAX_TPU_PREFETCH=0), and for the
    single-item fast path; every prep call happens exactly once."""
    from pantax_tpu.utils import prefetched

    for env, items in (("1", range(7)), ("0", range(7)), ("1", [42])):
        monkeypatch.setenv("PANTAX_TPU_PREFETCH", env)
        calls = []

        def prep(i):
            calls.append(i)
            return i * 10

        got = list(prefetched(prep, items))
        assert got == [(i, i * 10) for i in items]
        assert sorted(calls) == list(items)
