"""Aligner: seeding, banded extension, projection, mapq — against simulated
reads with known truth on the example database."""
import numpy as np
import pytest

from pantax_tpu.align.aligner import Aligner
from pantax_tpu.align.encode import encode_seq, kmer_hashes
from pantax_tpu.align.index import build_align_index
from pantax_tpu.config import AlignConfig, ProfilingConfig
from pantax_tpu.db.construct import build_database
from pantax_tpu.graph.core import load_species_range
from pantax_tpu.io.metadata import read_genomes_info
from pantax_tpu.sim import simulate_reads, revcomp

EXAMPLE_INFO = "/root/reference/example/example_genomes_info.txt"
BASE = "/root/reference/example/ngs"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    return build_database(EXAMPLE_INFO, tmp_path_factory.mktemp("db"), base_dir=BASE)


@pytest.fixture(scope="module")
def index(db):
    return build_align_index(db)


@pytest.fixture(scope="module")
def aligner(index):
    return Aligner(index)


@pytest.fixture(scope="module")
def aligner_long(index):
    """Long-read product config: wider DP band for chunk indel drift
    (AlignConfig.for_read_type('long') — what the CLI long flows build)."""
    from pantax_tpu.config import AlignConfig

    return Aligner(index, cfg=AlignConfig.for_read_type("long"))


@pytest.fixture(scope="module")
def hap_weights(db):
    infos = read_genomes_info(EXAMPLE_INFO)
    return {i.hap_id if i.hap_id != "MGYG000002538" else i.hap_id: 1.0
            for i in infos} | {}


def all_hap_weights(db):
    names = []
    from pantax_tpu.graph.core import load_species_range
    for r in load_species_range(db.range_file):
        names.extend(db.load_graph(r.species).path_names)
    return {n: 1.0 for n in names}


def test_hash_device_host_parity(index):
    rng = np.random.default_rng(0)
    seq = rng.choice(list(b"ACGT"), size=200).astype(np.uint8).tobytes()
    codes = encode_seq(seq)
    h_host, v_host = kmer_hashes(codes, index.k)
    from pantax_tpu.align.aligner import _kmer_hashes_j
    import jax.numpy as jnp
    h_dev, v_dev = _kmer_hashes_j(jnp.asarray(codes)[None, :], index.k)
    np.testing.assert_array_equal(h_host, np.asarray(h_dev)[0])
    np.testing.assert_array_equal(v_host, np.asarray(v_dev)[0])


def test_hash_strand_symmetry():
    rng = np.random.default_rng(1)
    seq = rng.choice(list(b"ACGT"), size=100).astype(np.uint8).tobytes()
    h1, _ = kmer_hashes(encode_seq(seq), 21)
    h2, _ = kmer_hashes(encode_seq(revcomp(seq)), 21)
    np.testing.assert_array_equal(np.sort(h1), np.sort(h2))


def test_perfect_reads_exact_projection(db, aligner):
    reads = simulate_reads(db, all_hap_weights(db), 300, 150, seed=3,
                           error_rate=0.0)
    gaf = aligner.align_reads([(r.read_id, r.seq) for r in reads])
    by_id = {g.read_id: g for g in gaf}
    assert len(by_id) >= 0.97 * len(reads)
    exact = 0
    for r in reads:
        g = by_id.get(r.read_id)
        if g is None:
            continue
        if (g.path_nodes() == r.truth.path_nodes()
                and g.path_start == r.truth.path_start
                and g.path_end == r.truth.path_end):
            exact += 1
    assert exact >= 0.95 * len(by_id)


def test_noisy_reads_classify_correctly(db, aligner):
    reads = simulate_reads(db, all_hap_weights(db), 300, 150, seed=4,
                           error_rate=0.01)
    gaf = aligner.align_reads([(r.read_id, r.seq) for r in reads])
    assert len(gaf) >= 0.95 * len(reads)
    ranges = load_species_range(db.range_file)
    from pantax_tpu.profile.rcls import classify_reads
    species = classify_reads(
        [np.array(g.path_nodes()) for g in gaf], ranges
    )
    truth = {r.read_id: r.species for r in reads}
    correct = sum(1 for g, s in zip(gaf, species) if truth[g.read_id] == s)
    assert correct >= 0.99 * len(gaf)


def test_mapq_unique_vs_shared(db, aligner):
    """Reads from species 562 (strains share nothing) must be mapq 60;
    species 34's two strains are near-identical, so most reads hit shared
    nodes and still dedupe to mapq 60, while strain-distinguishing reads
    stay high-mapq for their own haplotype."""
    reads = simulate_reads(db, all_hap_weights(db), 400, 150, seed=5)
    gaf = aligner.align_reads([(r.read_id, r.seq) for r in reads])
    mapqs = np.array([g.mapq for g in gaf])
    assert (mapqs == 60).mean() > 0.9


def test_random_read_unaligned(aligner):
    rng = np.random.default_rng(9)
    junk = rng.choice(list(b"ACGT"), size=150).astype(np.uint8).tobytes()
    gaf = aligner.align_reads([("junk", junk)])
    assert gaf == []


def test_full_pipeline_with_aligner(db, aligner, tmp_path):
    import pandas as pd
    from pantax_tpu.pipeline import profile_from_gaf

    weights = dict(all_hap_weights(db))
    names = sorted(weights)
    weights[names[0]] = 4.0
    weights[names[3]] = 2.0
    reads = simulate_reads(db, weights, 6000, 150, seed=6, error_rate=0.005)
    gaf = aligner.align_reads([(r.read_id, r.seq) for r in reads])
    out = tmp_path / "out"
    profile_from_gaf(gaf, db, ProfilingConfig.for_read_type("short"), out)
    st = pd.read_csv(out / "strain_abundance.txt", sep="\t",
                     dtype={"species_taxid": str})
    assert len(st) == 4
    # heaviest strain first
    total = 4.0 + 2.0 + 1.0 + 1.0
    top = st.iloc[0]
    assert top["predicted_abundance"] == pytest.approx(4.0 / total, abs=0.08)


def test_long_reads_with_indels(db, aligner_long):
    """Chunked long-read alignment survives indels (HiFi-like error model)."""
    from pantax_tpu.align.long_read import align_long_reads

    rng = np.random.default_rng(11)
    g = db.load_graph("562")
    seq = g.path_seq(0).tobytes()
    reads = []
    for i in range(20):
        s = int(rng.integers(0, len(seq) - 8000))
        piece = bytearray(seq[s : s + 8000])
        # ~0.3% indels + 0.5% substitutions
        for _ in range(24):
            p = int(rng.integers(0, len(piece) - 2))
            if rng.random() < 0.5:
                del piece[p]
            else:
                piece.insert(p, ord("ACGT"[rng.integers(4)]))
        reads.append((f"L{i}", bytes(piece)))
    gaf = align_long_reads(aligner_long, reads, chunk=512, batch_size=512)
    assert len(gaf) >= 18
    ranges = load_species_range(db.range_file)
    from pantax_tpu.profile.rcls import classify_reads
    species = classify_reads([np.array(g.path_nodes()) for g in gaf], ranges)
    assert all(s == "562" for s in species)
    # spans cover most of the read
    assert np.mean([(g.path_end - g.path_start) / g.read_len for g in gaf]) > 0.9


def test_long_read_seed_stride_matches_full_seeding(db, aligner_long):
    """seed_stride=2 (skip seeding for every other chunk; rescue at
    neighbour-predicted windows) reproduces full seeding's emitted spans on
    HiFi-like reads — the carried-band blockwise DP path."""
    from pantax_tpu.align.long_read import align_long_reads

    rng = np.random.default_rng(17)
    g = db.load_graph("562")
    seq = g.path_seq(0).tobytes()
    reads = []
    for i in range(24):
        s = int(rng.integers(0, len(seq) - 6000))
        piece = bytearray(seq[s : s + 6000])
        for _ in range(30):  # ~0.5% subs
            p = int(rng.integers(len(piece)))
            piece[p] = ord("ACGT"[rng.integers(4)])
        for _ in range(12):  # ~0.2% indels
            p = int(rng.integers(len(piece) - 2))
            if rng.random() < 0.5:
                del piece[p]
            else:
                piece.insert(p, ord("ACGT"[rng.integers(4)]))
        reads.append((f"S{i}", bytes(piece)))
    full = {r.read_id: r for r in
            align_long_reads(aligner_long, reads, chunk=512, batch_size=512)}
    strided = {r.read_id: r for r in
               align_long_reads(aligner_long, reads, chunk=512, batch_size=512,
                                seed_stride=2)}
    assert len(strided) >= len(full) - 1
    both = set(full) & set(strided)
    assert len(both) >= 22
    for rid in both:
        f, s = full[rid], strided[rid]
        assert s.strand == f.strand
        # same locus, near-identical span
        assert abs(s.path_start - f.path_start) <= 64
        assert abs((s.path_end - s.path_start) - (f.path_end - f.path_start)) <= 1024
        # rescued chunks contribute coverage: strided span stays full-read
        assert (s.path_end - s.path_start) / s.read_len > 0.9


def test_long_read_buffer_wire_matches_codes_wire(db, aligner_long,
                                                  monkeypatch):
    """The device-resident group-buffer wire (put_read_group + per-batch
    byte offsets) is bit-identical to the per-batch codes upload: the
    unpacked chunk codes are equal by construction, so every emitted record
    must match field for field.  Fixture includes N bases (buffer exception
    scatter) and short tail chunks (read_len masking of neighbour bases)."""
    from pantax_tpu.align.long_read import align_long_reads

    rng = np.random.default_rng(23)
    g = db.load_graph("562")
    seq = g.path_seq(0).tobytes()
    reads = []
    for i in range(16):
        s = int(rng.integers(0, len(seq) - 5000))
        L = int(rng.integers(3000, 5000))  # odd lengths -> partial chunks
        piece = bytearray(seq[s : s + L])
        for _ in range(8):
            piece[int(rng.integers(len(piece)))] = ord("N")
        reads.append((f"B{i}", bytes(piece)))

    def run():
        return align_long_reads(aligner_long, reads, chunk=512,
                                batch_size=256, seed_stride=2)

    buf = run()
    monkeypatch.setenv("PANTAX_TPU_READ_BUFFER", "0")
    plain = run()
    assert len(buf) == len(plain) > 0
    for a, b in zip(buf, plain):
        assert (a.read_id, a.strand, a.path_start, a.path_end, a.mapq) == \
            (b.read_id, b.strand, b.path_start, b.path_end, b.mapq)


def test_long_read_upload_subgroups_match_single_group(db, aligner_long,
                                                       monkeypatch):
    """A tiny PANTAX_TPU_UPLOAD_ROWS forces the upload-pipelined sub-group
    split (prep thread + per-sub buffers); results must be bit-identical to
    the unsplit single-buffer run — read partitioning is exact because the
    chunk vote/merge/rescue are all per read."""
    from pantax_tpu.align.long_read import align_long_reads

    rng = np.random.default_rng(31)
    g = db.load_graph("562")
    seq = g.path_seq(0).tobytes()
    reads = []
    for i in range(24):
        s = int(rng.integers(0, len(seq) - 5000))
        L = int(rng.integers(3000, 5000))
        piece = bytearray(seq[s : s + L])
        for _ in range(4):
            piece[int(rng.integers(len(piece)))] = ord("N")
        reads.append((f"U{i}", bytes(piece)))

    def run():
        return align_long_reads(aligner_long, reads, chunk=512,
                                batch_size=256, seed_stride=2)

    whole = run()
    monkeypatch.setenv("PANTAX_TPU_UPLOAD_ROWS", "32")  # ~3 reads per sub
    split = run()
    assert len(split) == len(whole) > 0
    for a, b in zip(split, whole):
        assert (a.read_id, a.strand, a.path_start, a.path_end, a.mapq) == \
            (b.read_id, b.strand, b.path_start, b.path_end, b.mapq)


def test_long_read_streamed_groups_match_whole_list(db, aligner_long, tmp_path):
    """The streamed long-read flow (iter_read_groups + per-group
    align_long_reads + concat) is bit-identical to the whole-list call:
    chunk merging is per read, so group boundaries cannot change any output.
    Bounded-memory replacement for reads.extend(iter_fastx(...)),
    GraphAligner's streaming role (alignment.rs:144-165)."""
    from pantax_tpu.align.long_read import (
        align_long_reads, concat_arrays, iter_read_groups,
    )

    rng = np.random.default_rng(5)
    g = db.load_graph("562")
    seq = g.path_seq(0).tobytes()
    reads = []
    for i in range(20):
        s = int(rng.integers(0, len(seq) - 5000))
        piece = bytearray(seq[s : s + 5000])
        for _ in range(25):
            p = int(rng.integers(len(piece)))
            piece[p] = ord("ACGT"[rng.integers(4)])
        reads.append((f"S{i}", bytes(piece)))
    fq = tmp_path / "lr.fq"
    with open(fq, "wb") as f:
        for name, s in reads:
            f.write(b"@" + name.encode() + b"\n" + s + b"\n+\n"
                    + b"I" * len(s) + b"\n")

    whole = align_long_reads(aligner_long, reads, chunk=512, batch_size=512,
                             as_arrays=True)
    # ~12KB groups -> several groups from the 100KB input
    groups = list(iter_read_groups([fq], group_bases=12_000))
    assert len(groups) > 3
    assert [r for grp in groups for r in grp] == reads
    streamed = concat_arrays([
        align_long_reads(aligner_long, grp, chunk=512, batch_size=512,
                         as_arrays=True)
        for grp in groups
    ])
    assert streamed.read_ids == whole.read_ids
    for f in ("ts", "te", "mapq", "read_len"):
        assert np.array_equal(getattr(streamed, f), getattr(whole, f)), f


def test_short_engine_rejects_long_reads(aligner, tmp_path):
    p = tmp_path / "long.fq"
    p.write_bytes(b"@r1\n" + b"A" * 2000 + b"\n+\n" + b"I" * 2000 + b"\n")
    with pytest.raises(ValueError, match="long-read"):
        aligner.align_file(p)


@pytest.mark.parametrize("sub,indel,chunk", [
    (0.015, 0.005, 384),   # ONT R10-like
    (0.04, 0.02, 256),     # ONT R9-like
])
def test_long_reads_high_error(db, aligner_long, sub, indel, chunk):
    from pantax_tpu.align.long_read import align_long_reads

    rng = np.random.default_rng(13)
    g = db.load_graph("562")
    seq = g.path_seq(0).tobytes()
    reads = []
    for i in range(15):
        s = int(rng.integers(0, len(seq) - 5000))
        piece = bytearray(seq[s : s + 5000])
        for _ in range(int(sub * len(piece))):
            p = int(rng.integers(len(piece)))
            piece[p] = ord("ACGT"[rng.integers(4)])
        for _ in range(int(indel * len(piece))):
            p = int(rng.integers(len(piece) - 2))
            if rng.random() < 0.5:
                del piece[p]
            else:
                piece.insert(p, ord("ACGT"[rng.integers(4)]))
        reads.append((f"E{i}", bytes(piece)))
    gaf = align_long_reads(aligner_long, reads, chunk=chunk, batch_size=512)
    assert len(gaf) >= 13
    spans = [(g.path_end - g.path_start) / g.read_len for g in gaf]
    assert np.mean(spans) > 0.9


# ---------------------------------------------------------------------------
# paired-end fragment model (alignment.rs:14-119 giraffe-paired analog)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def paired_setup(tmp_path_factory):
    """Single-genome DB whose sequence contains an exact distant repeat."""
    from pantax_tpu.io.fastx import write_fasta
    from pantax_tpu.io.metadata import GenomeInfo, write_genomes_info

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    u1 = bases[rng.integers(0, 4, 6000)].tobytes()
    rep = bases[rng.integers(0, 4, 400)].tobytes()
    u2 = bases[rng.integers(0, 4, 6000)].tobytes()
    u3 = bases[rng.integers(0, 4, 6000)].tobytes()
    genome = u1 + rep + u2 + rep + u3
    root = tmp_path_factory.mktemp("paired")
    write_fasta(root / "GCF_p.1_g_genomic.fna", [("c", genome)])
    info = root / "info.txt"
    write_genomes_info(info, [
        GenomeInfo("GCF_p.1_g", "88.1", "88", "org", "GCF_p.1_g_genomic.fna")
    ])
    db = build_database(info, root / "db", base_dir=root)
    index = build_align_index(db)
    return db, index, Aligner(index), genome, len(u1), len(u1) + 400 + len(u2)


def _codes(seqs, L):
    codes = np.full((len(seqs), L), 4, dtype=np.int8)
    lens = np.zeros(len(seqs), dtype=np.int64)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = encode_seq(s)
        lens[i] = len(s)
    return codes, lens


def test_paired_disambiguates_repeat(paired_setup):
    """Mate1 inside an exact repeat copy is ambiguous alone (mapq 0); the
    fragment model places it at the copy consistent with its unique mate and
    restores a confident mapq."""
    db, index, aligner, genome, rep1, rep2 = paired_setup
    L = 160
    n = 8
    m1, m2 = [], []
    truth = []
    for i in range(n):
        s = rep1 + 40 + i  # read fully inside the first repeat copy
        frag_end = s + 420  # mate2 lands in unique u2 sequence
        m1.append(genome[s : s + 150])
        m2.append(revcomp(genome[frag_end - 150 : frag_end]))
        truth.append(s)
    c1, l1 = _codes(m1, L)
    c2, l2 = _codes(m2, L)

    ind = aligner.align_codes(c1, l1)
    r1, r2 = aligner.align_paired_codes(c1, l1, c2, l2)

    # the text has one hap == the genome, so truth text positions == s
    hap_off = int(index.hap_offsets[0])
    assert (ind.mapq == 0).all(), "repeat reads should be ambiguous alone"
    assert r1.aligned.all() and r2.aligned.all()
    np.testing.assert_array_equal(r1.text_start, hap_off + np.array(truth))
    assert (r1.mapq > 0).all(), "fragment consistency must restore confidence"
    # paired never loses alignments vs independent
    assert int(r1.aligned.sum()) >= int(ind.aligned.sum())


def test_paired_rescues_junk_tail_mate(paired_setup):
    """A mate with a junk tail (score between rescue_frac and min_score_frac)
    is kept only when its clean partner anchors a consistent fragment."""
    db, index, aligner, genome, rep1, rep2 = paired_setup
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = 160
    n = 8
    m1, m2 = [], []
    for i in range(n):
        s = 1000 + 37 * i
        clean = genome[s : s + 100]
        junk = bases[rng.integers(0, 4, 50)].tobytes()
        m1.append(clean + junk)           # ~0.45-0.6 score fraction
        frag_end = s + 400
        m2.append(revcomp(genome[frag_end - 150 : frag_end]))
    c1, l1 = _codes(m1, L)
    c2, l2 = _codes(m2, L)

    ind = aligner.align_codes(c1, l1)
    r1, r2 = aligner.align_paired_codes(c1, l1, c2, l2)
    assert int(r1.aligned.sum()) > int(ind.aligned.sum()), (
        "fragment rescue should recover junk-tail mates"
    )
    assert r2.aligned.all()


def test_paired_bulk_not_worse_than_independent(paired_setup):
    """Proper FR pairs across the genome: paired mode's aligned fraction and
    placement accuracy are >= the independent aligner's."""
    db, index, aligner, genome, rep1, rep2 = paired_setup
    rng = np.random.default_rng(11)
    L = 160
    n = 128
    starts = rng.integers(0, len(genome) - 600, n)
    frag = rng.integers(280, 460, n)
    m1 = [genome[s : s + 150] for s in starts]
    m2 = [revcomp(genome[s + f - 150 : s + f]) for s, f in zip(starts, frag)]
    c1, l1 = _codes(m1, L)
    c2, l2 = _codes(m2, L)
    hap_off = int(index.hap_offsets[0])

    i1 = aligner.align_codes(c1, l1)
    i2 = aligner.align_codes(c2, l2)
    r1, r2 = aligner.align_paired_codes(c1, l1, c2, l2)

    paired_aligned = int(r1.aligned.sum()) + int(r2.aligned.sum())
    indep_aligned = int(i1.aligned.sum()) + int(i2.aligned.sum())
    assert paired_aligned >= indep_aligned

    def correct(res, truths):
        return int((res.aligned & (np.abs(res.text_start - (hap_off + truths)) <= 2)).sum())

    t2 = starts + frag - 150
    assert correct(r1, starts) + correct(r2, t2) >= correct(i1, starts) + correct(i2, t2)
    # mapq of correctly-placed pairs should not collapse
    ok = r1.aligned & (np.abs(r1.text_start - (hap_off + starts)) <= 2)
    assert float(r1.mapq[ok].mean()) >= float(i1.mapq[i1.aligned].mean())


def test_pack_unpack_roundtrip():
    """pack_codes (host nibble pack) inverts exactly through _unpack_codes_j,
    including the odd-length pad column (value 4)."""
    from pantax_tpu.align.aligner import _unpack_codes_j, pack_codes

    rng = np.random.default_rng(3)
    for L in (150, 151, 2):
        codes = rng.integers(0, 5, size=(7, L)).astype(np.int8)
        packed = pack_codes(codes)
        Lp = -(-L // 4) * 4  # width padded to 4 (matches the 2-bit wire)
        assert packed.dtype == np.uint8 and packed.shape == (7, Lp // 2)
        un = np.asarray(_unpack_codes_j(packed))
        assert np.array_equal(un[:, :L], codes)
        assert (un[:, L:] == 4).all()  # pad columns are sentinel


def test_pack2_unpack_roundtrip():
    """pack_codes2 (2-bit wire format + N exception list) inverts exactly
    through _unpack_reads_j: N bases inside reads come back as 4 via the
    exception scatter, and every position at or beyond read_len is restored
    to the pad sentinel 4 — bit-identical to the nibble-pack path."""
    import jax
    import jax.numpy as jnp

    from pantax_tpu.align.aligner import _unpack_reads_j, pack_codes2

    unpack = jax.jit(_unpack_reads_j)
    rng = np.random.default_rng(5)
    for L in (150, 151, 32):
        B = 9
        lens = rng.integers(1, L + 1, size=B).astype(np.int32)
        codes = np.full((B, L), 4, dtype=np.int8)
        for i in range(B):
            row = rng.integers(0, 4, size=lens[i]).astype(np.int8)
            # sprinkle real N bases inside the read
            n_idx = rng.integers(0, lens[i], size=3)
            row[n_idx] = 4
            codes[i, : lens[i]] = row
        p2 = pack_codes2(codes, lens)
        assert p2 is not None
        packed2, exc = p2
        assert packed2.dtype == np.uint8
        assert packed2.shape == (B, (L + 3) // 4)
        un = np.asarray(unpack((jnp.asarray(packed2), jnp.asarray(exc)),
                               jnp.asarray(lens)))
        Lp = un.shape[1]
        expect = np.full((B, Lp), 4, dtype=np.int8)
        expect[:, :L] = codes
        assert np.array_equal(un, expect)


def test_pack2_overflow_falls_back():
    """More than the exception capacity of N bases -> pack_codes2 returns
    None, and Aligner._pack_reads transparently falls back to the nibble
    pack — align_codes gives identical results through both wire formats."""
    from pantax_tpu.align.aligner import pack_codes2

    codes = np.full((4, 64), 4, dtype=np.int8)  # all-N reads
    lens = np.full(4, 64, dtype=np.int32)
    assert pack_codes2(codes, lens, cap=16) is None
    p2 = pack_codes2(codes, lens, cap=4 * 64)
    assert p2 is not None


def test_wire_formats_same_unpacked_shape_any_width():
    """Both wire formats unpack to the SAME 4-aligned width for every read
    width — an exception-overflow fallback mid-run must reuse the compiled
    downstream graphs, not introduce a second shape family (L=150 used to
    give 152 columns via 2-bit but 150 via the nibble pack)."""
    import jax
    import jax.numpy as jnp

    from pantax_tpu.align.aligner import (
        _unpack_reads_j, pack_codes, pack_codes2,
    )

    unpack = jax.jit(_unpack_reads_j)
    rng = np.random.default_rng(3)
    for L in (150, 151, 149, 96):
        B = 4
        codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
        lens = np.full(B, L, dtype=np.int32)
        p4 = np.asarray(unpack(jnp.asarray(pack_codes(codes)),
                               jnp.asarray(lens)))
        packed2, exc = pack_codes2(codes, lens)
        p2 = np.asarray(unpack((jnp.asarray(packed2), jnp.asarray(exc)),
                               jnp.asarray(lens)))
        assert p4.shape == p2.shape == (B, -(-L // 4) * 4)
        assert np.array_equal(p4, p2)


def test_query_batch_same_result_both_wire_formats(index, aligner):
    """The 2-bit and 4-bit wire formats produce bit-identical query results
    (same reads, one with N bases injected; L=150 exercises the non-4-aligned
    width where the formats' pad columns must still agree)."""
    import jax.numpy as jnp

    from pantax_tpu.align.aligner import (
        _query_batch_packed, pack_codes, pack_codes2,
    )

    rng = np.random.default_rng(11)
    text = np.asarray(index.text)
    B, L = 16, 150
    codes = np.full((B, L), 4, dtype=np.int8)
    lens = np.full(B, L, dtype=np.int32)
    for i in range(B):
        s = rng.integers(0, index.text_len - L)
        codes[i] = text[s : s + L]
        codes[i, rng.integers(0, L)] = 4  # one N per read
    legacy = _query_batch_packed(
        aligner.text_d, aligner.run_table_d, aligner.seed_pos_d,
        aligner.bucket_lo_d, aligner.tstart_d, aligner.tnode_d,
        jnp.asarray(pack_codes(codes)), jnp.asarray(lens), aligner._static(),
    )
    packed2, exc = pack_codes2(codes, lens)
    twobit = _query_batch_packed(
        aligner.text_d, aligner.run_table_d, aligner.seed_pos_d,
        aligner.bucket_lo_d, aligner.tstart_d, aligner.tnode_d,
        (jnp.asarray(packed2), jnp.asarray(exc)), jnp.asarray(lens),
        aligner._static(),
    )
    assert np.array_equal(np.asarray(legacy), np.asarray(twobit))


def test_device_revcomp_matches_host():
    """_rev_codes_j equals the host reverse complement on right-padded codes
    (left-aligned result, N bases preserved, pad stays 4)."""
    from pantax_tpu.align.aligner import _rev_codes_j

    rng = np.random.default_rng(4)
    B, Lr = 5, 32
    codes = np.full((B, Lr), 4, dtype=np.int8)
    lens = rng.integers(1, Lr + 1, size=B)
    for i in range(B):
        codes[i, : lens[i]] = rng.integers(0, 5, size=lens[i])  # incl. N=4
    out = np.asarray(_rev_codes_j(codes, lens.astype(np.int32)))
    for i in range(B):
        fwd = codes[i, : lens[i]]
        exp = np.where(fwd[::-1] < 4, 3 - fwd[::-1], 4).astype(np.int8)
        assert np.array_equal(out[i, : lens[i]], exp)
        assert (out[i, lens[i]:] == 4).all()


def test_native_pack_codes2_matches_numpy():
    """The C++ 2-bit wire pack is bit-identical to the NumPy oracle
    (packed bytes, exception positions in scan order, sentinel padding,
    and the overflow fallback)."""
    import pytest

    from pantax_tpu.utils.native import pack_codes2_native

    if pack_codes2_native(np.zeros((1, 4), np.int8),
                          np.zeros(1, np.int64), 4) is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    for B, L in ((9, 150), (7, 151), (4, 96), (3, 7)):
        codes = rng.integers(0, 5, size=(B, L)).astype(np.int8)
        lens = rng.integers(0, L + 1, size=B).astype(np.int64)
        cols = np.arange(L)[None, :]
        rows_m, cols_m = np.nonzero(
            (codes >= 4) & (cols < lens.reshape(B, 1))
        )
        cap = 512
        c = codes
        if L % 4:
            c = np.pad(c, ((0, 0), (0, 4 - L % 4)), constant_values=0)
        Lp = c.shape[1]
        cc = c.astype(np.uint8) & 3
        ref_packed = (cc[:, 0::4] | (cc[:, 1::4] << 2)
                      | (cc[:, 2::4] << 4) | (cc[:, 3::4] << 6))
        ref_exc = np.full(cap, B * Lp, np.int32)
        ref_exc[: len(rows_m)] = rows_m * Lp + cols_m
        p, e = pack_codes2_native(codes, lens, cap)
        assert np.array_equal(p, ref_packed), (B, L)
        assert np.array_equal(e, ref_exc), (B, L)
        # overflow -> False (pack_codes2 then takes the 4-bit fallback)
        codes_n = np.full((B, L), 4, np.int8)
        assert pack_codes2_native(
            codes_n, np.full(B, L, np.int64), 2
        ) is False


def test_paired_streaming_chunks_match_whole_file(db, index, aligner,
                                                  tmp_path):
    """align_paired_files streams in bounded record-aligned buffers; tiny
    chunk sizes (forcing many chunks, odd interleaved splits, and the
    dangling-mate carry) emit exactly the same GAF records as one big
    chunk, for both the two-file and interleaved modes."""
    from pantax_tpu.sim import simulate_reads

    reads = simulate_reads(db, {"GCF_002012065.1": 2, "GCF_024223415.1": 1},
                           n_reads=601 * 2, read_len=150, seed=23)
    r1 = tmp_path / "R1.fq"
    r2 = tmp_path / "R2.fq"
    inter = tmp_path / "inter.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2, open(inter, "w") as fi:
        for i in range(0, len(reads), 2):
            for f, r in ((f1, reads[i]), (f2, reads[i + 1])):
                s = r.seq if isinstance(r.seq, str) else r.seq.decode()
                rec = f"@{r.read_id}\n{s}\n+\n{'I' * len(s)}\n"
                f.write(rec)
                fi.write(rec)

    def key(recs):
        return sorted((g.read_id, g.path_start, g.path_end, g.mapq)
                      for g in recs)

    whole2 = aligner.align_paired_files(r1, r2, batch_size=256)
    small2 = aligner.align_paired_files(r1, r2, batch_size=256,
                                        chunk_bytes=40_000)
    assert key(whole2) == key(small2)

    whole1 = aligner.align_paired_files(inter, None, batch_size=256)
    # ~40KB chunks ~ 101 records -> odd splits exercise the mate carry
    small1 = aligner.align_paired_files(inter, None, batch_size=256,
                                        chunk_bytes=40_000)
    assert key(whole1) == key(small1)
    assert key(whole1) == key(whole2)


def test_packed_window_extraction_matches_slicing():
    """pack_text2d + _extract_windows == naive text[w0:w0+W] for arbitrary
    offsets (odd/even, row-straddling), any W family used by the engines
    (short 150bp, long chunk 512+band)."""
    import jax.numpy as jnp

    from pantax_tpu.align.aligner import _extract_windows, pack_text2d

    rng = np.random.default_rng(7)
    T = 256 * 64
    text = rng.integers(0, 5, size=T).astype(np.int8)
    packed = jnp.asarray(pack_text2d(text))
    for W in (176, 168, 528):
        w0 = rng.integers(0, T - W - 512, size=257).astype(np.int32)
        w0[:3] = [0, 1, 255]  # boundary offsets
        got = np.asarray(_extract_windows(packed, jnp.asarray(w0), W))
        want = np.stack([text[s : s + W] for s in w0])
        assert np.array_equal(got, want), f"W={W}"


def test_auto_density_bits_scales_with_text():
    """Seed sampling density adapts to DB size at build time (VERDICT r3
    item 2): small/mid DBs keep bits=3 (warmed graphs unchanged); each ~4x
    of text beyond 48M bases adds one bit, capped at 5 so a 150bp read still
    samples enough seeds for the diagonal vote."""
    from pantax_tpu.align.index import auto_density_bits

    assert auto_density_bits(1 << 20) == 3
    assert auto_density_bits(48 << 20) == 3       # scale-1 (~31M) stays 3
    assert auto_density_bits(102 << 20) == 4      # scale-2 (~103M) -> 4
    assert auto_density_bits(192 << 20) == 4
    assert auto_density_bits(500 << 20) == 5
    assert auto_density_bits(1 << 40) == 5        # capped


def test_chd_lookup_matches_bisect():
    """The CHD displacement-hash lookup (plan -1) returns the same hits as
    the bucketed-bisection fallback on the same seed table: identical
    hit_valid masks and identical positions wherever valid."""
    import jax.numpy as jnp

    from pantax_tpu.align.aligner import (
        _lookup_hits,
        build_bucket_table,
        build_seed_lookup,
    )
    from pantax_tpu.align.encode import _mix32

    rng = np.random.default_rng(7)
    # runs of repeated keys (mixed, like real seed hashes), sorted
    n_runs, C = 5000, 4
    run_keys = np.unique(_mix32(rng.integers(0, 2**32, size=n_runs,
                                             dtype=np.uint32)))
    run_len = rng.integers(1, 7, size=len(run_keys))
    seed_keys = np.repeat(run_keys, run_len)
    seed_pos = rng.integers(0, 10**6, size=len(seed_keys)).astype(np.int32)

    table, pos_wide, mb, disp, plan = build_seed_lookup(
        seed_keys, seed_pos, hits_per_seed=C)
    assert plan == -1, "CHD build must converge on a well-mixed key set"

    # bisect tables, the way the fallback path builds them
    starts = np.flatnonzero(
        np.concatenate([[True], seed_keys[1:] != seed_keys[:-1]]))
    ends = np.concatenate([starts[1:], [len(seed_keys)]])
    run_table = np.stack([
        seed_keys[starts].astype(np.uint32).view(np.int32),
        starts.astype(np.int32), (ends - starts).astype(np.int32)], axis=1)
    bits, lo = build_bucket_table(seed_keys[starts])
    occ = int(np.diff(lo).max())
    steps = int(np.ceil(np.log2(occ + 1)))

    # queries: half present keys, half absent, some invalid lanes
    B, S = 16, 24
    present = rng.choice(run_keys, size=B * S // 2)
    absent = _mix32(rng.integers(0, 2**32, size=B * S - B * S // 2,
                                 dtype=np.uint32) | np.uint32(1))
    sel_hash = rng.permutation(np.concatenate([present, absent]))
    sel_hash = jnp.asarray(sel_hash.reshape(B, S))
    sel_valid = jnp.asarray(rng.random((B, S)) < 0.9)

    pos_chd, hv_chd = _lookup_hits(
        jnp.asarray(table), jnp.asarray(pos_wide), jnp.asarray(disp),
        mb, plan, sel_hash, sel_valid, C)
    pos_bis, hv_bis = _lookup_hits(
        jnp.asarray(run_table), jnp.asarray(seed_pos), jnp.asarray(lo),
        bits, steps, sel_hash, sel_valid, C)
    np.testing.assert_array_equal(np.asarray(hv_chd), np.asarray(hv_bis))
    m = np.asarray(hv_bis)
    np.testing.assert_array_equal(np.asarray(pos_chd)[m],
                                  np.asarray(pos_bis)[m])
