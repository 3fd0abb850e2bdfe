"""Vendored reference-convention GAF fixture: table-level golden diffs.

tests/fixtures/reference_convention.gaf is a committed GAF in the
reference's column conventions (rcls.rs:119-146) — 4000 truth alignments of
a known 4:2:2:1 mixture plus the loader quirks the reference handles ('*'
null rows, '*' mapq, duplicate read ids across species, an unclassifiable
cross-range path).  Profiling it must reproduce the committed golden tables
BYTE FOR BYTE; regenerate deliberately with tools/make_reference_fixture.py
when semantics change (CLAUDE.md oracle policy: behavior changes only with
the oracle updated to match the reference)."""
import filecmp
import os

import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
EXAMPLE_INFO = "/root/reference/example/example_genomes_info.txt"
BASE = "/root/reference/example/ngs"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    from pantax_tpu.db.construct import build_database

    return build_database(EXAMPLE_INFO, tmp_path_factory.mktemp("db"),
                          base_dir=BASE)


def test_fixture_gaf_profiles_to_golden_tables(db, tmp_path):
    from pantax_tpu.config import ProfilingConfig
    from pantax_tpu.io.gaf import read_gaf
    from pantax_tpu.pipeline import profile_from_gaf

    gaf = read_gaf(os.path.join(FIXDIR, "reference_convention.gaf"))
    # the two '*'-null quirk rows are dropped by the loader
    # (profile.rs:380-399); 4005 file records -> 4004 usable
    assert len(gaf) == 4004
    out = tmp_path / "out"
    profile_from_gaf(gaf, db, ProfilingConfig.for_read_type("short"), out)
    for name in ("species_abundance.txt", "strain_abundance.txt",
                 "ori_strain_abundance.txt", "reads_classification.tsv"):
        assert filecmp.cmp(out / name, os.path.join(FIXDIR, "golden", name),
                           shallow=False), (
            f"{name} diverged from the committed golden — if the change is "
            "intended, regenerate with tools/make_reference_fixture.py"
        )


def test_fixture_quirk_rows_classified(db):
    """The committed classification golden proves the reference loader
    quirks: '*' mapq -> 0, cross-range path -> 'U', duplicate id kept in
    both species' classification rows."""
    rows = {}
    dup = []
    for line in open(os.path.join(FIXDIR, "golden",
                                  "reads_classification.tsv")):
        rid, mapq, species, _len = line.rstrip("\n").split("\t")
        if rid == "DUPREAD":
            dup.append(species)
        else:
            rows[rid] = (mapq, species)
    assert rows["starq"] == ("0", "562")
    assert rows["crossrange"][1] == "U"
    assert sorted(dup) == ["34", "562"]
