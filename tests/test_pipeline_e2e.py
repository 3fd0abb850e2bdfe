"""End-to-end profiling on a database built from the reference example
genomes, with simulated truth-GAF reads (no aligner in the loop yet)."""
import numpy as np
import pandas as pd
import pytest

from pantax_tpu.config import ProfilingConfig
from pantax_tpu.db.construct import build_database
from pantax_tpu.graph.core import load_species_range
from pantax_tpu.io.metadata import read_genomes_info
from pantax_tpu.pipeline import profile_from_gaf
from pantax_tpu.sim import simulate_reads

EXAMPLE_INFO = "/root/reference/example/example_genomes_info.txt"


@pytest.fixture(scope="module")
def example_db(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("db")
    return build_database(EXAMPLE_INFO, db_dir,
                          base_dir="/root/reference/example/ngs")


def test_database_layout(example_db):
    ranges = load_species_range(example_db.range_file)
    infos = read_genomes_info(EXAMPLE_INFO)
    species = {i.species_taxid for i in infos}
    assert {r.species for r in ranges} == species
    # contiguous ascending global ranges starting at 1
    assert ranges[0].start == 1
    for a, b in zip(ranges[:-1], ranges[1:]):
        assert b.start == a.end + 1
    # multi-genome species (562: 2 E. coli, 34: 2 M. xanthus) are pan and first
    pan = {r.species for r in ranges if r.is_pan}
    assert pan == {"562", "34"}
    assert [r.is_pan for r in ranges] == sorted(
        (r.is_pan for r in ranges), reverse=True
    )


def test_pangenome_paths_spell_genomes(example_db):
    # haplotype paths of the pangenome graphs reproduce the input genomes
    from pantax_tpu.io.fastx import iter_fastx

    infos = read_genomes_info(EXAMPLE_INFO)
    by_hap = {i.hap_id: i for i in infos if i.species_taxid == "562"}
    g = example_db.load_graph("562")
    assert g.num_paths == 2
    for hi, name in enumerate(g.path_names):
        gi = by_hap[name]
        genome = b"".join(
            s for _, s in iter_fastx(gi.resolved_path("/root/reference/example/ngs"))
        )
        assert g.path_seq(hi).tobytes() == genome
    # NOTE: the example "strains" are synthetic fragments sharing no 31-mers,
    # so the graph is (correctly) two parallel chains; node sharing between
    # real strains is covered by tests/test_pangenome.py


def test_profile_recovers_simulated_abundances(example_db, tmp_path):
    infos = read_genomes_info(EXAMPLE_INFO)
    hap_ids = [i.hap_id for i in infos]
    # uneven strain abundances across all 4 genomes (2 species x 2 strains)
    weights = {hap_ids[0]: 4.0, hap_ids[1]: 2.0, hap_ids[2]: 2.0, hap_ids[3]: 1.0}
    reads = simulate_reads(example_db, weights, n_reads=6000, read_len=150, seed=1)
    gaf = [r.truth for r in reads]

    cfg = ProfilingConfig.for_read_type("short")
    out = tmp_path / "out"
    profile_from_gaf(gaf, example_db, cfg, out)

    sp = pd.read_csv(out / "species_abundance.txt", sep="\t",
                     dtype={"species_taxid": str})
    sp_ab = dict(zip(sp["species_taxid"], sp["predicted_abundance"]))
    # species 562 carries 6/9 of coverage, species 34 carries 3/9
    assert sp_ab["562"] == pytest.approx(6 / 9, abs=0.05)
    assert sp_ab["34"] == pytest.approx(3 / 9, abs=0.05)

    st = pd.read_csv(out / "strain_abundance.txt", sep="\t",
                     dtype={"species_taxid": str, "strain_taxid": str})
    assert len(st) == 4
    st_ab = dict(zip(st["genome_ID"], st["predicted_abundance"]))
    info_by_hap = {i.hap_id: i for i in infos}
    for hap, w in weights.items():
        assert st_ab[info_by_hap[hap].genome_id] == pytest.approx(w / 9, abs=0.08)

    # reads classification file exists with one line per read
    rc = (out / "reads_classification.tsv").read_text().strip().split("\n")
    assert len(rc) == len(reads)


def test_profile_single_strain_species(example_db, tmp_path):
    """Only one strain of one multi-strain species present."""
    infos = read_genomes_info(EXAMPLE_INFO)
    target = infos[0]
    reads = simulate_reads(example_db, {target.hap_id: 1.0}, 3000, 150, seed=2)
    cfg = ProfilingConfig.for_read_type("short")
    out = tmp_path / "out2"
    profile_from_gaf([r.truth for r in reads], example_db, cfg, out)
    st = pd.read_csv(out / "strain_abundance.txt", sep="\t",
                     dtype={"species_taxid": str})
    assert list(st["genome_ID"]) == [target.genome_id]
    assert st["predicted_abundance"].iloc[0] == pytest.approx(1.0)


def test_device_coverage_profile_matches_host(example_db, tmp_path):
    """Strain profiling with the device coverage engine reproduces the host
    engine's report."""
    import pandas as pd

    infos = read_genomes_info(EXAMPLE_INFO)
    hap_ids = [i.hap_id for i in infos]
    weights = {hap_ids[0]: 3.0, hap_ids[1]: 1.0, hap_ids[2]: 2.0, hap_ids[3]: 1.0}
    reads = simulate_reads(example_db, weights, n_reads=3000, read_len=150, seed=9)
    gaf = [r.truth for r in reads]
    outs = {}
    for mode in ("host", "device"):
        cfg = ProfilingConfig.for_read_type("short", coverage=mode)
        out = tmp_path / f"out_{mode}"
        profile_from_gaf(gaf, example_db, cfg, out)
        outs[mode] = pd.read_csv(out / "strain_abundance.txt", sep="\t",
                                 dtype={"species_taxid": str})
    h, d = outs["host"], outs["device"]
    assert list(h["genome_ID"]) == list(d["genome_ID"])
    np.testing.assert_allclose(
        h["predicted_coverage"], d["predicted_coverage"], rtol=1e-4
    )


def test_small_community_accuracy(tmp_path):
    """Scaled-down accuracy benchmark: staggered strains, full align+profile,
    L1 error bound (CPU-sized version of benchmarks.accuracy_benchmark)."""
    from pantax_tpu.benchmarks import accuracy_benchmark, scale_db

    db = scale_db(tmp_path / "scale", n_species=3, strains_per=3,
                  genome_len=60_000, snp_rate=0.01, seed=3)
    r = accuracy_benchmark(db, n_reads=16384, batch=2048,
                           out_dir=str(tmp_path / "acc"))
    assert r["detected"] == r["total"] == 9
    assert r["l1_error"] < 0.12


def test_mixed_benchmark_smoke(tmp_path):
    """run_mixed_benchmark (BASELINE config 5 harness) at CPU-test sizes:
    short fraction through the fused pipeline to strain tables, long fraction
    through chunked alignment + best-alignment filter."""
    from pantax_tpu.benchmarks import run_mixed_benchmark, scale_db

    db = scale_db(tmp_path / "scale", n_species=2, strains_per=2,
                  genome_len=50_000, snp_rate=0.01, seed=5)
    m = run_mixed_benchmark(
        db, n_short=4096, n_long=64, batch=1024, long_len=4096,
        long_batch=256, out_dir=str(tmp_path / "mixed"),
    )
    assert m["total_reads"] == 4096 + 64
    assert m["short_aligned_frac"] > 0.95
    assert m["long_aligned_frac"] > 0.9
    assert m["strains_detected"] == 4


def test_fastpath_matches_gaf_pipeline(example_db, tmp_path):
    """Array-native profiling (no GAF text) reproduces the GAF pipeline."""
    import pandas as pd
    from pantax_tpu.align.aligner import Aligner
    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.align.index import build_align_index
    from pantax_tpu.fastpath import collect_alignment_arrays, profile_from_alignments

    infos = read_genomes_info(EXAMPLE_INFO)
    hap_ids = [i.hap_id for i in infos]
    weights = {hap_ids[0]: 3.0, hap_ids[1]: 1.0, hap_ids[2]: 2.0, hap_ids[3]: 1.0}
    reads = simulate_reads(example_db, weights, n_reads=4000, read_len=150, seed=21)
    index = build_align_index(example_db)
    aligner = Aligner(index)

    # GAF route
    gaf = aligner.align_reads([(r.read_id, r.seq) for r in reads], batch_size=1024)
    cfg = ProfilingConfig.for_read_type("short")
    out_gaf = tmp_path / "gafroute"
    profile_from_gaf(gaf, example_db, cfg, out_gaf)

    # array route (same reads -> codes matrix)
    L = 160
    codes = np.full((len(reads), L), 4, dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int64)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = encode_seq(r.seq)
        lens[i] = len(r.seq)
    arrays = collect_alignment_arrays(aligner, codes, lens, batch=1024)
    out_arr = tmp_path / "arrroute"
    profile_from_alignments(arrays, index, example_db, cfg, out_arr)

    for fname in ("species_abundance.txt", "strain_abundance.txt"):
        a = pd.read_csv(out_gaf / fname, sep="\t", dtype={"species_taxid": str})
        b = pd.read_csv(out_arr / fname, sep="\t", dtype={"species_taxid": str})
        assert len(a) == len(b)
        key = "species_taxid" if "genome_ID" not in a else "genome_ID"
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        np.testing.assert_allclose(
            a["predicted_coverage"], b["predicted_coverage"], rtol=1e-6
        )
