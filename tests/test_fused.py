"""Fused align+classify+coverage pipeline: batch additivity and full parity
against the per-species fastpath flow on the example database."""
import filecmp
import os

import numpy as np
import pytest

from pantax_tpu.align.aligner import Aligner
from pantax_tpu.align.index import build_align_index
from pantax_tpu.config import ProfilingConfig
from pantax_tpu.db.construct import build_database
from pantax_tpu.sim import simulate_reads

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


def test_scatter_batches_accumulate(db, index):
    """Summing _coverage_scatter over read sub-batches + one finalize equals
    the single whole-batch _node_abundances_impl call bit-for-bit."""
    import jax.numpy as jnp

    from pantax_tpu.graph.core import load_species_range
    from pantax_tpu.graph.trio import build_trio_index
    from pantax_tpu.ops.coverage_device import (
        _coverage_finalize, _coverage_scatter, _node_abundances_impl,
        build_padded_tables,
    )

    r = load_species_range(db.range_file)[0]
    g = db.load_graph(r.species)
    ti = build_trio_index(g.nodes_len, g.paths_dict())
    t = build_padded_tables(g.nodes_len, ti.trio_nodes, ti.trio_len)

    rng = np.random.default_rng(0)
    R, L = 64, 8
    nodes = rng.integers(0, g.num_nodes, size=(R, L)).astype(np.int32)
    lengths = rng.integers(1, L + 1, size=R).astype(np.int32)
    rs = rng.integers(0, 5, size=R).astype(np.int32)
    re = rs + rng.integers(1, 150, size=R).astype(np.int32)

    kw = dict(num_nodes=t.N_pad, total_bases=t.TB_pad, num_trios=t.U_pad)
    tables = (t.nodes_len, t.base_offset, t.trio_hash, t.trio_order, t.trio_abc)
    whole = _node_abundances_impl(
        nodes, lengths, rs, re, t.nodes_len, t.base_offset,
        t.trio_hash, t.trio_order, t.trio_abc, t.trio_len, **kw,
    )
    # chained accumulators (what the fused pipeline donates across batches)
    acc = (
        jnp.zeros(t.N_pad, jnp.float32),
        jnp.zeros(t.TB_pad + 1, jnp.int32),
        jnp.zeros(t.U_pad, jnp.float32),
    )
    for lo in range(0, R, 16):
        acc = _coverage_scatter(
            nodes[lo:lo + 16], lengths[lo:lo + 16], rs[lo:lo + 16],
            re[lo:lo + 16], *tables, **kw, acc=acc,
        )
    inc = _coverage_finalize(
        *acc, t.nodes_len, t.base_offset, t.trio_len, num_nodes=t.N_pad
    )
    for w, i in zip(whole, inc):
        assert np.array_equal(np.asarray(w), np.asarray(i))


def test_pos_lookup_matches_searchsorted(index):
    from pantax_tpu.ops.fused import build_pos_lookup, locate_segment
    import jax.numpy as jnp

    tstart = index.tstart.astype(np.int32)
    pos_lo, shift, steps = build_pos_lookup(
        index.tstart.astype(np.int64), index.text_len
    )
    rng = np.random.default_rng(1)
    ts = rng.integers(0, index.text_len, size=4096).astype(np.int32)
    got = np.asarray(locate_segment(
        jnp.asarray(tstart), jnp.asarray(pos_lo), shift, steps, jnp.asarray(ts)
    ))
    want = np.clip(
        np.searchsorted(index.tstart, ts, side="right") - 1, 0, len(tstart) - 1
    )
    assert np.array_equal(got, want)


def test_fused_paired_matches_fastpath(db, index, aligner, tmp_path):
    """feed_paired (joint fragment step + shared coverage scatter) writes
    byte-identical classification/species tables and ulp-level strain tables
    vs the per-species paired flow on the same mate pairs."""
    from pantax_tpu.fastpath import (
        AlignmentArrays, collect_paired_alignment_arrays,
        profile_from_alignments,
    )
    from pantax_tpu.ops.fused import (
        FusedPipeline, build_fused_tables, profile_from_fused_result,
    )

    rng = np.random.default_rng(21)
    n, Lr, frag, L = 2000, 150, 400, 160
    H = len(index.hap_names)
    hap = rng.integers(0, H, size=n)
    spans = np.diff(index.hap_offsets) - 1
    starts = (
        index.hap_offsets[hap]
        + rng.integers(0, np.maximum(spans[hap] - frag - 64, 1))
    ).astype(np.int64)
    cols = np.arange(Lr)
    c1 = np.full((n, L), 4, np.int8)
    c2 = np.full((n, L), 4, np.int8)
    c1[:, :Lr] = index.text[starts[:, None] + cols]
    m2 = index.text[(starts + frag - Lr)[:, None] + cols]
    rc = (3 - m2[:, ::-1]).astype(np.int8)
    c2[:, :Lr] = np.where(rc < 0, 4, rc)
    l1 = np.full(n, Lr, np.int64)
    l2 = l1.copy()
    ids = [f"P{i}" for i in range(n)]

    cfg = ProfilingConfig.for_read_type("short")
    out_fast = tmp_path / "pfast"
    a1, a2 = collect_paired_alignment_arrays(aligner, c1, l1, c2, l2,
                                             batch=2048)
    a1.read_ids = [ids[int(r[1:])] for r in a1.read_ids]
    a2.read_ids = [ids[int(r[1:])] for r in a2.read_ids]
    merged = AlignmentArrays(
        read_ids=a1.read_ids + a2.read_ids,
        ts=np.concatenate([a1.ts, a2.ts]),
        te=np.concatenate([a1.te, a2.te]),
        mapq=np.concatenate([a1.mapq, a2.mapq]),
        read_len=np.concatenate([a1.read_len, a2.read_len]),
    )
    profile_from_alignments(merged, index, db, cfg, out_fast)

    out_fused = tmp_path / "pfused"
    tables = build_fused_tables(db, index)
    pipe = FusedPipeline(aligner, tables, batch=2048)
    pipe.feed_paired(c1, l1, c2, l2, ids1=ids, ids2=ids)
    result = pipe.finish()
    assert result[4] == 0, "paired fused fell back (L_cap overflow)"
    ok = profile_from_fused_result(result, tables, index, db, cfg, out_fused)
    assert ok

    for name in ("reads_classification.tsv", "species_abundance.txt"):
        assert filecmp.cmp(out_fast / name, out_fused / name, shallow=False), (
            f"{name} differs between fused-paired and fastpath-paired"
        )
    for name in ("strain_abundance.txt", "ori_strain_abundance.txt"):
        a = (out_fast / name).read_text().splitlines()
        b = (out_fused / name).read_text().splitlines()
        assert len(a) == len(b) and a[0] == b[0], name
        for ra, rb in zip(a[1:], b[1:]):
            ca, cb = ra.split("\t"), rb.split("\t")
            assert ca[:3] == cb[:3], (name, ra, rb)
            np.testing.assert_allclose(
                [float(x) for x in ca[3:]], [float(x) for x in cb[3:]],
                rtol=1e-6, atol=1e-9, err_msg=f"{name}: {ra} vs {rb}",
            )


def test_ranges_vs_windowed_bit_parity(db, index, aligner):
    """The range-decomposition scatter (_classify_scatter_ranges, the
    default on dup-free DBs) produces BIT-identical finalized coverage and
    per-read columns to the windowed _classify_scatter on the same reads:
    every addend is integer-valued, so the different accumulation orders
    cannot round differently."""
    from pantax_tpu.benchmarks import simulate_read_batch
    from pantax_tpu.ops.fused import FusedPipeline, build_fused_tables

    codes, lens, _ = simulate_read_batch(index, 1500, 150, 0.02, seed=11)
    tables = build_fused_tables(db, index)

    def run(force: str):
        os.environ["PANTAX_TPU_FUSED_RANGES"] = force
        try:
            pipe = FusedPipeline(aligner, tables, batch=512)
            pipe.feed(codes, lens)
            r = pipe.finish()
            assert pipe.use_ranges is (force == "1")
            return r
        finally:
            del os.environ["PANTAX_TPU_FUSED_RANGES"]

    rw = run("0")
    rr = run("1")
    assert rw.n_overflow == 0  # both formulations saw every read
    # meaningful only if multi-segment (trio-window) spans occurred
    res = aligner.align_codes(codes[:256], lens[:256])
    tstart = np.asarray(index.tstart, dtype=np.int64)
    i0 = np.searchsorted(tstart, res.text_start, side="right") - 1
    i1 = np.searchsorted(
        tstart, np.maximum(res.text_end - 1, res.text_start), side="right"
    ) - 1
    assert ((i1 - i0 + 1) >= 3).any(), "no span>=3 read; test is vacuous"
    for k in ("mapq", "aligned", "ridx", "read_len"):
        assert np.array_equal(rw.reads[k], rr.reads[k]), k
    for name, a, b in (("na", rw.na_d, rr.na_d), ("ta", rw.ta_d, rr.ta_d),
                       ("bc", rw.bc_d, rr.bc_d)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_prefetch_pipeline_bit_parity(db, index, aligner):
    """The upload-prefetch dispatch loop (pack+put on a worker thread,
    PANTAX_TPU_PREFETCH default) feeds batches in the identical order with
    identical contents as the inline loop — coverage and per-read columns
    must match bit-for-bit for both feed() and feed_paired(), including a
    partial tail batch."""
    from pantax_tpu.benchmarks import simulate_read_batch
    from pantax_tpu.ops.fused import FusedPipeline, build_fused_tables

    codes, lens, _ = simulate_read_batch(index, 1200, 150, 0.02, seed=17)
    tables = build_fused_tables(db, index)

    def run(prefetch: str):
        os.environ["PANTAX_TPU_PREFETCH"] = prefetch
        try:
            pipe = FusedPipeline(aligner, tables, batch=512)  # 3 batches, tail 176
            pipe.feed(codes, lens, ids=[f"r{i}" for i in range(len(lens))])
            half = 600
            pipe2 = FusedPipeline(aligner, tables, batch=256)
            pipe2.feed_paired(
                codes[:half], lens[:half], codes[half:], lens[half:]
            )
            return pipe.finish(), pipe2.finish()
        finally:
            del os.environ["PANTAX_TPU_PREFETCH"]

    (r_in, p_in) = run("0")
    (r_pf, p_pf) = run("1")
    for a, b in ((r_in, r_pf), (p_in, p_pf)):
        for k in ("mapq", "aligned", "ridx", "read_len"):
            assert np.array_equal(a.reads[k], b.reads[k]), k
        for name, x, y in (("na", a.na_d, b.na_d), ("ta", a.ta_d, b.ta_d),
                           ("bc", a.bc_d, b.bc_d)):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name
    assert r_in.reads["ids"] == r_pf.reads["ids"]


def test_feed_intervals_dup_routing_parity(db, index, aligner):
    """Forcing hap_dup=True routes interval rows through the windowed step
    (span <= 8) and the host residual (span > 8) instead of the range
    decomposition — coverage must come out bit-identical either way (the
    example DB is genuinely dup-free, so all three formulations share one
    oracle)."""
    from pantax_tpu.ops.fused import FusedPipeline, build_fused_tables

    rng = np.random.default_rng(13)
    H = len(index.hap_names)
    hap_off = index.hap_offsets
    n = 400
    hap = rng.integers(0, H, size=n)
    hap_len = (np.diff(hap_off) - 8)[hap]
    want = np.where(rng.random(n) < 0.5,
                    rng.integers(60, 200, size=n),
                    rng.integers(1500, 20000, size=n))
    length = np.minimum(want, np.maximum(hap_len - 2, 50))
    starts = hap_off[hap] + rng.integers(0, np.maximum(hap_len - length, 1))
    ts, te = starts.astype(np.int64), (starts + length).astype(np.int64)
    mapq = rng.integers(30, 61, size=n).astype(np.int64)

    def run(force_dup: bool):
        tables = build_fused_tables(db, index)
        if force_dup:
            tables.hap_dup = np.ones_like(tables.hap_dup)
        pipe = FusedPipeline(aligner, tables, batch=256)
        pipe.feed_intervals(ts, te, mapq, length.astype(np.int64))
        r = pipe.finish()
        if force_dup:
            assert pipe._n_int_residual > 0  # long spans took the residual
        return r

    rr = run(False)
    rw = run(True)
    for name, a, b in (("na", rr.na_d, rw.na_d), ("ta", rr.ta_d, rw.ta_d),
                       ("bc", rr.bc_d, rw.bc_d)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_hash_bisect_matches_searchsorted():
    """Bucketed trio-hash bisection == np.searchsorted side='left' for
    queries hitting, missing, and beyond the table."""
    import jax.numpy as jnp

    from pantax_tpu.ops.coverage_device import (
        _hash_bisect_left, build_hash_lookup,
    )

    rng = np.random.default_rng(7)
    U, U_pad = 5000, 8192
    table = np.full(U_pad, np.iinfo(np.uint32).max, dtype=np.uint32)
    real = np.sort(rng.integers(0, 2**32, size=U, dtype=np.uint64)).astype(np.uint32)
    real[100:104] = real[100]  # equal-hash run -> probes > 1
    real = np.sort(real)
    table[:U] = real
    lo, bits, steps, probes = build_hash_lookup(table, U)
    assert probes >= 4
    q = np.concatenate([
        rng.integers(0, 2**32, size=3000, dtype=np.uint64).astype(np.uint32),
        real[rng.integers(0, U, size=1000)],          # exact hits
        np.array([0, 2**32 - 1], dtype=np.uint32),     # extremes
    ])
    got = np.asarray(_hash_bisect_left(
        jnp.asarray(table), jnp.asarray(lo), bits, steps, jnp.asarray(q)
    ))
    want = np.searchsorted(real.astype(np.uint64), q.astype(np.uint64),
                           side="left")
    assert np.array_equal(got, want)


def test_window_dup_detection(index):
    from pantax_tpu.ops.fused import _window_has_dup_nodes, auto_node_window

    # the example DB's chunked/anchor graphs never revisit a node in-window
    assert _window_has_dup_nodes(index) is False
    cap = auto_node_window(index, 160)
    assert 4 <= cap <= 64

    # synthetic index with a repeated node inside one hap window
    class FakeIdx:
        tnode = np.array([1, 2, 3, 2, 5], dtype=np.int64)
        tstart = np.array([0, 100, 200, 300, 400], dtype=np.int64)
        hap_offsets = np.array([0, 500], dtype=np.int64)
    assert _window_has_dup_nodes(FakeIdx()) is True
    # same revisit but in a different haplotype -> not a within-read dup
    class FakeIdx2:
        tnode = np.array([1, 2, 3, 2, 5], dtype=np.int64)
        tstart = np.array([0, 100, 200, 300, 400], dtype=np.int64)
        hap_offsets = np.array([0, 300, 500], dtype=np.int64)
    assert _window_has_dup_nodes(FakeIdx2()) is False


def test_fused_overflow_residual_matches_fastpath(db, index, aligner,
                                                  tmp_path):
    """A forced-tiny L_cap makes every aligned read overflow the node
    window; finish() pulls the overflowing dispatches' ts/span buffers to
    host, recomputes their contributions with the host coverage oracle, and
    scatter-adds them into the accumulators — the resulting tables match
    the per-species flow on the same reads (strain tables to float32
    tolerance: the fused finalize divides bases/len in f32)."""
    import filecmp as _filecmp

    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.fastpath import (
        collect_alignment_arrays, profile_from_alignments,
    )
    from pantax_tpu.ops.fused import (
        FusedPipeline, build_fused_tables, profile_from_fused_result,
    )

    reads = simulate_reads(db, {"GCF_002012065.1": 3, "GCF_024223415.1": 1},
                           n_reads=800, read_len=150, seed=13)
    L = 160
    codes = np.full((len(reads), L), 4, dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int64)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = encode_seq(r.seq)
        lens[i] = len(r.seq)
    ids = [r.read_id for r in reads]

    cfg = ProfilingConfig.for_read_type("short")
    tables = build_fused_tables(db, index)
    pipe = FusedPipeline(aligner, tables, batch=256, L_cap=1)
    pipe.feed(codes, lens, ids=ids)
    result = pipe.finish()
    assert result[4] > 0, "L_cap=1 should overflow 150bp reads"
    assert "ts" not in result[3]  # intervals never fully downloaded
    out_fused = tmp_path / "ovf"
    ok = profile_from_fused_result(result, tables, index, db, cfg, out_fused)
    assert ok

    out_fast = tmp_path / "fast"
    arrays = collect_alignment_arrays(aligner, codes, lens, batch=256)
    arrays.read_ids = [ids[int(r[1:])] for r in arrays.read_ids]
    profile_from_alignments(arrays, index, db, cfg, out_fast)
    assert _filecmp.cmp(out_fast / "species_abundance.txt",
                        out_fused / "species_abundance.txt", shallow=False)
    for name in ("strain_abundance.txt", "ori_strain_abundance.txt"):
        a = (out_fast / name).read_text().splitlines()
        b = (out_fused / name).read_text().splitlines()
        assert len(a) == len(b) and a[0] == b[0], name
        for ra, rb in zip(a[1:], b[1:]):
            ca, cb = ra.split("\t"), rb.split("\t")
            assert ca[:3] == cb[:3], (name, ra, rb)
            for x, y in zip(ca[3:], cb[3:]):
                if x == "" or y == "":  # dropped-strain blanks must agree
                    assert x == y, (name, ra, rb)
                else:
                    np.testing.assert_allclose(
                        float(x), float(y), rtol=1e-6, atol=1e-9,
                        err_msg=f"{name}: {ra} vs {rb}",
                    )


def test_fused_partial_overflow_residual(db, index, aligner, tmp_path):
    """Mixed case: most reads fit a small L_cap, a minority overflows —
    fused scatter + host residual must equal the per-species flow (the
    overflow reads' contributions are the difference)."""
    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.fastpath import collect_alignment_arrays
    from pantax_tpu.graph.core import load_species_range
    from pantax_tpu.graph.trio import build_trio_index
    from pantax_tpu.ops.fused import FusedPipeline, build_fused_tables
    from pantax_tpu.profile.coverage import PackedReads, node_abundances_packed

    reads = simulate_reads(db, {"GCF_002012065.1": 2, "GCF_024223415.1": 1},
                           n_reads=600, read_len=150, seed=29)
    L = 160
    codes = np.full((len(reads), L), 4, dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int64)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = encode_seq(r.seq)
        lens[i] = len(r.seq)

    tables = build_fused_tables(db, index)
    # oracle alignments first, to pick an L_cap that splits the span
    # distribution: reads at/below the median node span fit the window,
    # the rest overflow into the host residual path
    arrays = collect_alignment_arrays(aligner, codes, lens, batch=256)
    i0 = np.searchsorted(index.tstart, arrays.ts, side="right") - 1
    i1 = np.searchsorted(index.tstart, np.maximum(arrays.te - 1, arrays.ts),
                         side="right") - 1
    L_cap = int(np.median(i1 - i0 + 1))
    pipe = FusedPipeline(aligner, tables, batch=256, L_cap=L_cap)
    pipe.feed(codes, lens)
    result = pipe.finish()
    assert 0 < result[4] < int(result[3]["aligned"].sum()), (
        f"want a PARTIAL overflow at L_cap={L_cap} "
        f"(ov={result[4]}, aligned={int(result[3]['aligned'].sum())})"
    )
    for sp in tables.species:
        r = sp.range_
        hap_idx = np.searchsorted(index.hap_offsets, arrays.ts,
                                  side="right") - 1
        sel = np.array([index.hap_species[h] == r.species for h in hap_idx])
        if not sel.any():
            continue
        s0, s1 = i0[sel], i1[sel]
        span = s1 - s0 + 1
        Lw = int(span.max())
        nodes = np.full((len(s0), Lw), -1, dtype=np.int64)
        cols = np.arange(Lw)
        take = np.clip(s0[:, None] + cols[None, :], 0, len(index.tnode) - 1)
        valid = cols[None, :] < span[:, None]
        nodes[valid] = (index.tnode[take] - r.start)[valid]
        rs = (arrays.ts[sel] - index.tstart[s0]).astype(np.int64)
        packed = PackedReads(
            nodes=nodes, lengths=span.astype(np.int64), read_start=rs,
            read_end=rs + (arrays.te[sel] - arrays.ts[sel]).astype(np.int64),
        )
        ti = build_trio_index(sp.nodes_len, sp.paths)
        na, ta, bc = node_abundances_packed(packed, sp.nodes_len, ti)
        np.testing.assert_allclose(
            np.asarray(result.na_d)[sp.off:sp.off + sp.num_nodes], na,
            rtol=1e-6, err_msg=f"node abundance {r.species}",
        )
        np.testing.assert_array_equal(
            np.asarray(result.bc_d)[sp.off:sp.off + sp.num_nodes], bc,
            err_msg=f"base cov {r.species}",
        )
        np.testing.assert_allclose(
            np.asarray(result.ta_d)[sp.trio_lo:sp.trio_hi], ta,
            rtol=1e-6, err_msg=f"trio abundance {r.species}",
        )


def test_fused_pipeline_mesh_bit_parity(db, index, tmp_path):
    """The PRODUCT fused path (FusedPipeline + device tail) on an 8-device
    ("reads",) mesh is bit-identical to the single-device run: coverage
    arrays, per-read columns, and the final species/strain tables (the
    reads-sharded scatters psum-merge integer-valued addends, so the merge
    order cannot change any output)."""
    import filecmp as _filecmp

    from pantax_tpu import parallel
    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.ops.fused import (
        FusedPipeline, build_fused_tables, profile_from_fused_result,
    )

    reads = simulate_reads(db, {"GCF_002012065.1": 4, "GCF_024223415.1": 2,
                                "GCF_006400955.1": 2,
                                "MGYG000002538_genomic": 1},
                           n_reads=2000, read_len=150, seed=17)
    L = 160
    codes = np.full((len(reads), L), 4, dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int64)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = encode_seq(r.seq)
        lens[i] = len(r.seq)
    ids = [r.read_id for r in reads]
    cfg = ProfilingConfig.for_read_type("short")
    cfg.tail = "device"

    def run(mesh, out):
        a = Aligner(index, mesh=mesh)
        tables = build_fused_tables(db, index, mesh=mesh)
        pipe = FusedPipeline(a, tables, batch=512)
        pipe.feed(codes, lens, ids=ids)
        result = pipe.finish()
        profile_from_fused_result(result, tables, index, db, cfg, out)
        return result

    r1 = run(None, tmp_path / "one")
    parallel.set_default_mesh(None)  # meshes passed explicitly
    r8 = run(parallel.make_mesh(8), tmp_path / "mesh")

    for name in ("na_d", "ta_d", "bc_d"):
        assert np.array_equal(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r8, name))
        ), f"{name} differs between 1-device and 8-device mesh"
    for k in ("mapq", "aligned", "ridx", "read_len"):
        assert np.array_equal(r1.reads[k], r8.reads[k]), k
    for name in ("species_abundance.txt", "strain_abundance.txt",
                 "ori_strain_abundance.txt", "reads_classification.tsv"):
        assert _filecmp.cmp(tmp_path / "one" / name, tmp_path / "mesh" / name,
                            shallow=False), name


def test_fused_paired_and_intervals_mesh_bit_parity(db, index, tmp_path):
    """Mesh x paired and mesh x interval-feed intersections: feed_paired
    (joint fragment step, 4-bit wire on multi-device) and feed_intervals
    (windowed + range-decomposed long spans) on the 8-device mesh produce
    coverage arrays and per-read columns bit-identical to 1 device."""
    from pantax_tpu import parallel
    from pantax_tpu.ops.fused import FusedPipeline, build_fused_tables

    rng = np.random.default_rng(31)
    n, Lr, frag, L = 1024, 150, 400, 160
    H = len(index.hap_names)
    hap = rng.integers(0, H, size=n)
    spans = np.diff(index.hap_offsets) - 1
    starts = (
        index.hap_offsets[hap]
        + rng.integers(0, np.maximum(spans[hap] - frag - 64, 1))
    ).astype(np.int64)
    cols = np.arange(Lr)
    c1 = np.full((n, L), 4, np.int8)
    c2 = np.full((n, L), 4, np.int8)
    c1[:, :Lr] = index.text[starts[:, None] + cols]
    m2 = index.text[(starts + frag - Lr)[:, None] + cols]
    rc = (3 - m2[:, ::-1]).astype(np.int8)
    c2[:, :Lr] = np.where(rc < 0, 4, rc)
    l1 = np.full(n, Lr, np.int64)
    l2 = l1.copy()
    # long intervals for feed_intervals: spans well past the window cap
    iv_hap = rng.integers(0, H, size=64)
    iv_lo = index.hap_offsets[iv_hap]
    iv_hi = index.hap_offsets[iv_hap + 1] - 1
    iv_ts = iv_lo + rng.integers(0, np.maximum((iv_hi - iv_lo) // 2, 1))
    iv_te = np.minimum(iv_ts + 9000, iv_hi)
    iv_mapq = rng.integers(0, 61, size=64)
    iv_len = (iv_te - iv_ts).astype(np.int64)

    def run(mesh):
        a = Aligner(index, mesh=mesh)
        tables = build_fused_tables(db, index, mesh=mesh)
        pipe = FusedPipeline(a, tables, batch=256)
        pipe.feed_paired(c1, l1, c2, l2)
        pipe.feed_intervals(iv_ts, iv_te, iv_mapq, iv_len)
        return pipe.finish()

    r1 = run(None)
    parallel.set_default_mesh(None)
    r8 = run(parallel.make_mesh(8))
    assert int(r1.reads["aligned"].sum()) > n  # both mates + intervals
    for name in ("na_d", "ta_d", "bc_d"):
        assert np.array_equal(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r8, name))
        ), f"{name} differs between 1-device and 8-device paired/interval run"
    for k in ("mapq", "aligned", "ridx", "read_len"):
        assert np.array_equal(r1.reads[k], r8.reads[k]), k


def test_fused_mesh_overflow_residual_bit_parity(db, index, tmp_path):
    """Mesh x overflow intersection: a forced-tiny L_cap makes reads
    overflow the node window ON THE 8-DEVICE MESH, so host_residual_updates
    scatter-adds host-computed contributions into the REPLICATED (sharded-
    scatter-merged) accumulators (ops/fused.py apply_residual) — an
    interaction no n_overflow=0 mesh run exercises.  Coverage arrays,
    per-read columns, overflow count, and the final tables must be
    bit-identical to the single-device run at the same L_cap."""
    import filecmp as _filecmp

    from pantax_tpu import parallel
    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.ops.fused import (
        FusedPipeline, build_fused_tables, profile_from_fused_result,
    )

    reads = simulate_reads(db, {"GCF_002012065.1": 3, "GCF_024223415.1": 2,
                                "GCF_006400955.1": 1},
                           n_reads=1600, read_len=150, seed=23)
    L = 160
    codes = np.full((len(reads), L), 4, dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int64)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = encode_seq(r.seq)
        lens[i] = len(r.seq)
    ids = [r.read_id for r in reads]
    cfg = ProfilingConfig.for_read_type("short")
    cfg.tail = "device"

    def run(mesh, out, L_cap):
        a = Aligner(index, mesh=mesh)
        tables = build_fused_tables(db, index, mesh=mesh)
        pipe = FusedPipeline(a, tables, batch=512, L_cap=L_cap)
        pipe.feed(codes, lens, ids=ids)
        result = pipe.finish()
        profile_from_fused_result(result, tables, index, db, cfg, out)
        return result

    r1 = run(None, tmp_path / "one", L_cap=1)
    assert r1.n_overflow > 0, "L_cap=1 should overflow 150bp reads"
    parallel.set_default_mesh(None)  # meshes passed explicitly
    r8 = run(parallel.make_mesh(8), tmp_path / "mesh", L_cap=1)
    assert r8.n_overflow == r1.n_overflow

    for name in ("na_d", "ta_d", "bc_d"):
        assert np.array_equal(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r8, name))
        ), f"{name} differs between 1-device and 8-device overflow runs"
    for k in ("mapq", "aligned", "ridx", "read_len"):
        assert np.array_equal(r1.reads[k], r8.reads[k]), k
    for name in ("species_abundance.txt", "strain_abundance.txt",
                 "ori_strain_abundance.txt", "reads_classification.tsv"):
        assert _filecmp.cmp(tmp_path / "one" / name, tmp_path / "mesh" / name,
                            shallow=False), name


def test_feed_intervals_matches_fastpath(db, index, aligner, tmp_path):
    """Long-read interval feeds (windowed short spans + the segment-range
    decomposition for long spans) produce the same coverage and the same
    species/strain tables as the host per-species flow over identical
    intervals."""
    from pantax_tpu.fastpath import AlignmentArrays, profile_from_alignments
    from pantax_tpu.graph.trio import build_trio_index
    from pantax_tpu.ops.fused import (
        FusedPipeline, build_fused_tables, profile_from_fused_result,
    )
    from pantax_tpu.profile.coverage import PackedReads, node_abundances_packed

    rng = np.random.default_rng(7)
    H = len(index.hap_names)
    hap_off = index.hap_offsets
    n = 1200
    hap = rng.integers(0, H, size=n)
    hap_len = (np.diff(hap_off) - 8)[hap]
    # mixed spans: mostly long (up to 60kb), some short (<= ~200bp)
    want = np.where(rng.random(n) < 0.3,
                    rng.integers(60, 200, size=n),
                    rng.integers(2000, 60000, size=n))
    length = np.minimum(want, np.maximum(hap_len - 2, 50))
    starts = hap_off[hap] + rng.integers(
        0, np.maximum(hap_len - length, 1)
    )
    arrays = AlignmentArrays(
        read_ids=[f"L{i}" for i in range(n)],
        ts=starts.astype(np.int64),
        te=(starts + length).astype(np.int64),
        mapq=rng.integers(30, 61, size=n).astype(np.int64),
        read_len=length.astype(np.int64),
    )

    cfg = ProfilingConfig.for_read_type("long")
    out_fast = tmp_path / "fast"
    profile_from_alignments(arrays, index, db, cfg, out_fast)

    tables = build_fused_tables(db, index)
    pipe = FusedPipeline(aligner, tables, batch=512)
    pipe.feed_intervals(arrays.ts, arrays.te, arrays.mapq, arrays.read_len,
                        ids=arrays.read_ids)
    result = pipe.finish()
    out_fused = tmp_path / "fused"
    profile_from_fused_result(result, tables, index, db, cfg, out_fused)

    # coverage parity per species against the host oracle
    i0 = np.searchsorted(index.tstart, arrays.ts, side="right") - 1
    i1 = np.searchsorted(index.tstart, np.maximum(arrays.te - 1, arrays.ts),
                         side="right") - 1
    spans = i1 - i0 + 1
    assert (spans > 8).any() and (spans <= 8).any(), (
        "fixture must exercise both the windowed and the range paths"
    )
    for sp in tables.species:
        r = sp.range_
        hap_idx = np.searchsorted(index.hap_offsets, arrays.ts,
                                  side="right") - 1
        sel = np.array([index.hap_species[h] == r.species for h in hap_idx])
        if not sel.any():
            continue
        s0, s1 = i0[sel], i1[sel]
        span = s1 - s0 + 1
        Lw = int(span.max())
        nodes = np.full((len(s0), Lw), -1, dtype=np.int64)
        cols = np.arange(Lw)
        take = np.clip(s0[:, None] + cols[None, :], 0, len(index.tnode) - 1)
        valid = cols[None, :] < span[:, None]
        nodes[valid] = (index.tnode[take] - r.start)[valid]
        rs = (arrays.ts[sel] - index.tstart[s0]).astype(np.int64)
        packed = PackedReads(
            nodes=nodes, lengths=span.astype(np.int64), read_start=rs,
            read_end=rs + (arrays.te[sel] - arrays.ts[sel]).astype(np.int64),
        )
        ti = build_trio_index(sp.nodes_len, sp.paths)
        na, ta, bc = node_abundances_packed(packed, sp.nodes_len, ti)
        np.testing.assert_allclose(
            np.asarray(result.na_d)[sp.off:sp.off + sp.num_nodes], na,
            rtol=1e-5, err_msg=f"node abundance {r.species}",
        )
        np.testing.assert_array_equal(
            np.asarray(result.bc_d)[sp.off:sp.off + sp.num_nodes], bc,
            err_msg=f"base cov {r.species}",
        )
        np.testing.assert_allclose(
            np.asarray(result.ta_d)[sp.trio_lo:sp.trio_hi], ta,
            rtol=1e-5, err_msg=f"trio abundance {r.species}",
        )

    # table parity (strain tables to f32 tolerance, species byte-identical)
    import filecmp as _filecmp

    assert _filecmp.cmp(out_fast / "species_abundance.txt",
                        out_fused / "species_abundance.txt", shallow=False)
    for name in ("strain_abundance.txt", "ori_strain_abundance.txt"):
        a = (out_fast / name).read_text().splitlines()
        b = (out_fused / name).read_text().splitlines()
        assert len(a) == len(b) and a[0] == b[0], name
        for ra, rb in zip(a[1:], b[1:]):
            ca, cb = ra.split("\t"), rb.split("\t")
            assert ca[:3] == cb[:3], (name, ra, rb)
            for x, y in zip(ca[3:], cb[3:]):
                if x == "" or y == "":
                    assert x == y, (name, ra, rb)
                else:
                    np.testing.assert_allclose(
                        float(x), float(y), rtol=1e-5, atol=1e-8,
                        err_msg=f"{name}: {ra} vs {rb}",
                    )


def test_fused_profile_matches_fastpath(db, index, aligner, tmp_path):
    """profile_fused writes byte-identical abundance tables to the
    per-species fastpath flow on the same reads."""
    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.fastpath import (
        collect_alignment_arrays, profile_from_alignments,
    )
    from pantax_tpu.ops.fused import profile_fused

    reads = simulate_reads(db, {"GCF_002012065.1": 4, "GCF_024223415.1": 2,
                                "GCF_006400955.1": 2,
                                "MGYG000002538_genomic": 1},
                           n_reads=3000, read_len=150, seed=11)
    L = 160
    codes = np.full((len(reads), L), 4, dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int64)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = encode_seq(r.seq)
        lens[i] = len(r.seq)

    cfg = ProfilingConfig.for_read_type("short")
    out_fast = tmp_path / "fast"
    arrays = collect_alignment_arrays(aligner, codes, lens, batch=1024)
    profile_from_alignments(arrays, index, db, cfg, out_fast)

    out_fused = tmp_path / "fused"
    ok = profile_fused(aligner, codes, lens, index, db, cfg, out_fused,
                       batch=1024)
    assert ok, "fused path fell back (L_cap overflow) on the example DB"

    # classification and species tables are byte-identical; the strain tables
    # match to float tolerance (the fused path accumulates trio coverage per
    # BATCH in float32, so the summation order differs from the one-call
    # per-species path by last-ulp amounts)
    for name in ("reads_classification.tsv", "species_abundance.txt"):
        assert filecmp.cmp(out_fast / name, out_fused / name, shallow=False), (
            f"{name} differs between fused and fastpath"
        )
    for name in ("strain_abundance.txt", "ori_strain_abundance.txt"):
        a = (out_fast / name).read_text().splitlines()
        b = (out_fused / name).read_text().splitlines()
        assert len(a) == len(b), name
        assert a[0] == b[0]
        for ra, rb in zip(a[1:], b[1:]):
            ca, cb = ra.split("\t"), rb.split("\t")
            assert ca[:3] == cb[:3], (name, ra, rb)  # taxids + genome id
            np.testing.assert_allclose(
                [float(x) for x in ca[3:]], [float(x) for x in cb[3:]],
                rtol=1e-6, atol=1e-9, err_msg=f"{name}: {ra} vs {rb}",
            )
