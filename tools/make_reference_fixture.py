"""Generate the committed reference-convention GAF fixture + golden tables.

Writes tests/fixtures/reference_convention.gaf — a GAF file following the
reference's column conventions (rcls.rs:119-146: cols 1,2,6,7,8,9,12 used;
'*' null rows; both step orientations; duplicate read ids; an unclassifiable
cross-range path) over the example database — and the golden
species/strain/classification tables produced by profiling it.  The test
(tests/test_reference_fixture.py) rebuilds the DB and byte-diffs against
these goldens, pinning table-level profiling semantics: any behavior change
must update the fixture deliberately (CLAUDE.md oracle policy).

Run from the repo root: python tools/make_reference_fixture.py
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main() -> None:
    from pantax_tpu.config import ProfilingConfig
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.io.gaf import read_gaf
    from pantax_tpu.pipeline import profile_from_gaf
    from pantax_tpu.sim import simulate_reads

    os.makedirs(FIXDIR, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="pantax_fixture_")
    db = build_database(
        "/root/reference/example/example_genomes_info.txt",
        os.path.join(tmp, "db"), base_dir="/root/reference/example/ngs",
    )
    reads = simulate_reads(
        db,
        {"GCF_002012065.1": 4, "GCF_024223415.1": 2, "GCF_006400955.1": 2,
         "MGYG000002538_genomic": 1},
        n_reads=4000, read_len=150, seed=42, error_rate=0.0,
    )
    lines = [r.truth.to_line() for r in reads]

    # reference-format quirks the loader must honor (rcls.rs:119-146 and
    # profile.rs:380-437):
    from pantax_tpu.graph.core import load_species_range

    last_node = max(r.end for r in load_species_range(db.range_file))
    quirks = [
        # unaligned row: '*' in path_len/path_start/path_end -> dropped
        "unaligned1\t150\t0\t150\t+\t*\t*\t*\t*\t0\t150\t0",
        # mapq '*' -> parsed as 0 (below the species credibility band)
        "starq\t150\t0\t150\t+\t>1\t1024\t0\t150\t150\t150\t*",
        # duplicate read id across two species -> dropped from strain
        # profiling (profile.rs:406-437 multi-species fallback)
        "\t".join(["DUPREAD"] + lines[1].split("\t")[1:]),
        "\t".join(["DUPREAD"] + lines[2].split("\t")[1:]),
        # cross-range path: min node in range 1, max in the last range -> 'U'
        f"crossrange\t150\t0\t150\t+\t>1>{last_node}\t300\t0\t150"
        "\t150\t150\t60",
    ]
    gaf_path = os.path.join(FIXDIR, "reference_convention.gaf")
    with open(gaf_path, "w") as f:
        f.write("\n".join(lines + quirks) + "\n")

    out = os.path.join(tmp, "out")
    cfg = ProfilingConfig.for_read_type("short")
    profile_from_gaf(read_gaf(gaf_path), db, cfg, out)
    golden = os.path.join(FIXDIR, "golden")
    shutil.rmtree(golden, ignore_errors=True)
    os.makedirs(golden)
    for name in ("species_abundance.txt", "strain_abundance.txt",
                 "ori_strain_abundance.txt", "reads_classification.tsv"):
        shutil.copy(os.path.join(out, name), os.path.join(golden, name))
        print("golden:", name)
    print("fixture:", gaf_path, f"({len(lines) + len(quirks)} records)")


if __name__ == "__main__":
    main()
