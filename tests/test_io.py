import gzip

import numpy as np
import pytest

from pantax_tpu.io.fastx import iter_fastx, write_fasta
from pantax_tpu.io.gfa import read_gfa, write_gfa
from pantax_tpu.io.gaf import GafRecord, parse_gaf_line, filter_best_long_read_alignments
from pantax_tpu.io.metadata import GenomeInfo, read_genomes_info, write_genomes_info


def test_fasta_roundtrip(tmp_path):
    recs = [("seq1", b"ACGTACGT"), ("seq2", b"GGGG")]
    p = tmp_path / "x.fna"
    write_fasta(p, recs, width=4)
    assert list(iter_fastx(p)) == recs


def test_fasta_gzip_and_lowercase(tmp_path):
    p = tmp_path / "x.fna.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">a desc here\nacgt\nACGT\n")
    assert list(iter_fastx(p)) == [("a", b"ACGTACGT")]


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_bytes(b"@r1/1\nACGT\n+\nIIII\n@r2/1\nGGCC\n+\nIIII\n")
    assert list(iter_fastx(p)) == [("r1/1", b"ACGT"), ("r2/1", b"GGCC")]


def test_gfa_roundtrip(tmp_path):
    p = tmp_path / "g.gfa"
    node_seqs = [b"ACGT", b"GG", b"TTTT"]
    walks = [("GCF_1", "0", "c1", 10, np.array([0, 1, 2]))]
    write_gfa(p, node_seqs, walks)
    g = read_gfa(p)
    assert list(g.nodes_len) == [4, 2, 4]
    assert g.node_seqs == node_seqs
    assert list(g.paths["GCF_1"]) == [0, 1, 2]
    assert not g.is_pan


def test_gfa_w_line_reversal(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_bytes(
        b"H\tVN:Z:1.1\n"
        b"S\t1\tAC\nS\t2\tGT\nS\t3\tCC\n"
        b"W\thapA\t0\tc1\t0\t6\t<3<2<1\n"
    )
    g = read_gfa(p)
    assert list(g.paths["hapA"]) == [0, 1, 2]


def test_gfa_p_line_pansn_and_merge(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_bytes(
        b"S\t1\tAC\nS\t2\tGT\nS\t3\tCC\n"
        b"P\thapA#0#c1\t1+,2+\t*\n"
        b"P\thapA#0#c2\t3+\t*\n"
    )
    g = read_gfa(p)
    assert list(g.paths["hapA"]) == [0, 1, 2]
    assert not g.is_pan


def test_gfa_out_of_order_nodes_rejected(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_bytes(b"S\t2\tAC\n")
    with pytest.raises(ValueError):
        read_gfa(p)


def test_gaf_parse_and_filter():
    line = (
        "r1\t1500\t10\t1400\t+\t>5>6>7\t2000\t100\t1500\t1350\t1400\t60\tid:f:0.97"
    )
    rec = parse_gaf_line(line)
    assert rec.path_nodes() == [5, 6, 7]
    assert rec.mapq == 60 and rec.identity == 0.97

    # best per read by matches then identity; drop mapq<=20 or span<=1000
    a = GafRecord("r", 2000, 0, 1500, "+", ">1", 100, 0, 99, 900, 1000, 60, 0.9)
    b = GafRecord("r", 2000, 0, 1500, "+", ">2", 100, 0, 99, 950, 1000, 60, 0.8)
    c = GafRecord("q", 2000, 0, 500, "+", ">3", 100, 0, 99, 990, 1000, 60, 0.8)
    d = GafRecord("s", 2000, 0, 1500, "+", ">4", 100, 0, 99, 990, 1000, 10, 0.8)
    kept = filter_best_long_read_alignments([a, b, c, d])
    assert [r.path for r in kept] == [">2"]


def test_genomes_info_roundtrip(tmp_path):
    p = tmp_path / "gi.txt"
    infos = [
        GenomeInfo("GCF_1.1_x", "562.1", "562", "E coli", "../genomes/GCF_000001.1_asm_genomic.fna"),
    ]
    write_genomes_info(p, infos)
    back = read_genomes_info(p)
    assert back == infos
    assert back[0].hap_id == "GCF_000001.1"
    assert back[0].file_stem == "GCF_000001.1_asm_genomic"


def test_genomes_info_example_file():
    infos = read_genomes_info("/root/reference/example/example_genomes_info.txt")
    assert len(infos) == 4
    assert infos[0].species_taxid == "562"
    # gz path: stem strips .gz then .fna
    gz = [i for i in infos if i.path.endswith(".gz")][0]
    assert gz.hap_id == "GCF_006400955.1"


def test_gaf_write_read_roundtrip(tmp_path):
    from pantax_tpu.io.gaf import read_gaf, write_gaf

    recs = [
        GafRecord("r1", 150, 0, 150, "+", ">5>6>7", 300, 10, 160, 148, 150, 60, 0.987),
        GafRecord("r2", 151, 0, 151, "-", ">8", 100, 2, 153, 140, 151, 12, 0.93),
    ]
    p = tmp_path / "x.gaf"
    write_gaf(p, recs)
    back = read_gaf(p)
    assert len(back) == 2
    for a, b in zip(recs, back):
        assert a.read_id == b.read_id and a.path == b.path
        assert a.path_start == b.path_start and a.path_end == b.path_end
        assert a.mapq == b.mapq and abs(a.identity - b.identity) < 1e-6
        assert a.path_nodes() == b.path_nodes()


def test_gaf_star_fields():
    # Unaligned rows ('*' path_len/start/end) are dropped entirely, matching
    # the reference's null-row drop before profiling (profile.rs:380-399).
    rec = parse_gaf_line("r\t150\t0\t150\t+\t*\t*\t*\t*\t*\t*\t*")
    assert rec is None
    # '*' in tag-only columns still parses
    rec = parse_gaf_line("r\t150\t0\t150\t+\t>1>2\t300\t10\t160\t140\t150\t60")
    assert rec is not None and rec.path_nodes() == [1, 2]


def _shard_all(path, P):
    from pantax_tpu.io.fastx import iter_fastx_shard

    out = []
    for i in range(P):
        out.extend(iter_fastx_shard(path, i, P))
    return out


def test_shard_fastq_partitions_exactly(tmp_path):
    """P processes streaming byte-range shards of one FASTQ collectively see
    every record exactly once, in order within each shard — including quality
    lines that start with '@' or '+' (the boundary-detection trap)."""
    import gzip

    from pantax_tpu.io.fastx import iter_fastx

    rng = __import__("numpy").random.default_rng(3)
    lines = []
    for i in range(487):
        L = int(rng.integers(30, 220))
        seq = bytes(rng.choice(list(b"ACGT"), size=L))
        # adversarial qualities: start with '@' or '+' on a schedule
        lead = b"@" if i % 5 == 0 else (b"+" if i % 7 == 0 else b"I")
        qual = lead + b"I" * (L - 1)
        lines += [b"@read%d extra" % i, seq, b"+", qual]
    p = tmp_path / "r.fq"
    p.write_bytes(b"\n".join(lines) + b"\n")

    full = list(iter_fastx(p))
    assert len(full) == 487
    for P in (1, 2, 3, 7):
        got = _shard_all(p, P)
        assert sorted(r[0] for r in got) == sorted(r[0] for r in full), P
        assert dict(got) == dict(full), P

    # gzip: non-seekable round-robin path, same exact partition
    pz = tmp_path / "r.fq.gz"
    pz.write_bytes(gzip.compress(p.read_bytes()))
    got = _shard_all(pz, 3)
    assert dict(got) == dict(full)


def test_shard_fasta_multiline(tmp_path):
    from pantax_tpu.io.fastx import iter_fastx

    rng = __import__("numpy").random.default_rng(4)
    recs = []
    for i in range(97):
        L = int(rng.integers(10, 4000))
        recs.append((f"c{i}", bytes(rng.choice(list(b"ACGT"), size=L))))
    p = tmp_path / "g.fa"
    with open(p, "wb") as f:
        for name, seq in recs:
            f.write(b">" + name.encode() + b"\n")
            for j in range(0, len(seq), 60):
                f.write(seq[j : j + 60] + b"\n")
    full = list(iter_fastx(p))
    for P in (2, 5):
        got = _shard_all(p, P)
        assert dict(got) == dict(full), P
        # every shard's records are a contiguous run of the file order
        names = [r[0] for r in full]
        from pantax_tpu.io.fastx import iter_fastx_shard

        runs = [[r[0] for r in iter_fastx_shard(p, i, P)] for i in range(P)]
        assert [n for run in runs for n in run] == names


def test_shard_more_processes_than_records(tmp_path):
    p = tmp_path / "tiny.fq"
    p.write_bytes(b"@a\nACGT\n+\nIIII\n@b\nGGCC\n+\nIIII\n")
    got = _shard_all(p, 16)
    assert sorted(r[0] for r in got) == ["a", "b"]
