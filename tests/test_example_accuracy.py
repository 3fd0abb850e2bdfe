"""Accuracy on the reference's own example workloads (BASELINE configs 1-3).

The reference repo ships no expected-output tables and its pipeline (Rust +
vg/giraffe) cannot run here, so the strongest available reference anchors are:

  - the species-level example row in /root/reference/README.md:341-345
    (species 34 -> predicted_abundance 0.5005489...), matching the example
    community's 50/50 species design;
  - the example reads' designed strain mixture: the full pipeline on both
    example/ngs and example/hifi recovers strain abundances 0.4/0.3/0.2/0.1
    (MGYG000002538 : GCF_024223415 : GCF_002012065 : GCF_006400955), and the
    two independent read sets agree with each other — documented L1
    tolerances per BASELINE.md's bit-tolerant target.

These run the REAL reads end to end (aligner included), not simulated truth.
"""
import os

import numpy as np
import pytest

EXAMPLE_INFO = "/root/reference/example/example_genomes_info.txt"
BASE = "/root/reference/example/ngs"
NGS = "/root/reference/example/ngs/short_reads.fq.gz"
HIFI = "/root/reference/example/hifi/long_reads.fq.gz"

# designed mixture of the example community (recovered identically by both
# read sets; README.md:341 quotes species 34 = 0.5005489 at species level)
STRAIN_TRUTH = {
    "MGYG000002538": 0.4,
    "GCF_024223415.1_ASM2422341v1": 0.3,
    "GCF_002012065.1_ASM201206v1": 0.2,
    "GCF_006400955.1": 0.1,
}


def _species(path):
    out = {}
    for line in open(path).read().splitlines()[1:]:
        f = line.split("\t")
        out[f[0]] = float(f[1])
    return out


def _strains(path):
    out = {}
    for line in open(path).read().splitlines()[1:]:
        f = line.split("\t")
        out[f[2]] = float(f[4])
    return out


def _l1(pred: dict, truth: dict) -> float:
    l1 = sum(abs(pred.get(g, 0.0) - t) for g, t in truth.items())
    return l1 + sum(p for g, p in pred.items() if g not in truth)


@pytest.fixture(scope="module")
def example_runs(tmp_path_factory):
    from pantax_tpu.cli import main

    wd = tmp_path_factory.mktemp("example_acc")
    os.chdir(wd)
    rc = main(["-f", EXAMPLE_INFO, "-d", "exdb", "--base-dir", BASE,
               "-s", "-p", "-r", NGS, "--species", "--strain",
               "-o", "ngs", "-T", "tmpngs", "--batch-size", "2048"])
    assert rc == 0
    rc = main(["-d", "exdb", "-l", "-r", HIFI, "--species", "--strain",
               "-o", "hifi", "-T", "tmphifi", "--batch-size", "512"])
    assert rc == 0
    return wd


def test_ngs_species_matches_reference(example_runs):
    sp = _species("ngs_species_abundance.txt")
    # README.md:341 — species 34 predicted_abundance 0.5005489240249426
    assert abs(sp["34"] - 0.5005489240249426) < 0.02
    assert abs(sp["562"] - 0.5) < 0.02


def test_ngs_strains_match_design(example_runs):
    st = _strains("ngs_strains_abundance.txt")
    assert set(st) == set(STRAIN_TRUTH), "all four strains detected"
    assert _l1(st, STRAIN_TRUTH) < 0.05


def test_hifi_strains_match_design(example_runs):
    st = _strains("hifi_strains_abundance.txt")
    assert set(st) == set(STRAIN_TRUTH), "all four strains detected"
    assert _l1(st, STRAIN_TRUTH) < 0.12


def test_read_types_agree(example_runs):
    """Two independent sequencing simulations of the same mixture, two
    different alignment paths (paired short vs chunked long) — the strain
    tables must agree."""
    a = _strains("ngs_strains_abundance.txt")
    b = _strains("hifi_strains_abundance.txt")
    assert _l1(a, b) < 0.15
    sa = _species("ngs_species_abundance.txt")
    sb = _species("hifi_species_abundance.txt")
    assert _l1(sa, sb) < 0.05
