"""Mesh sharding: entry() compile check and the 8-device dryrun (CPU mesh)."""
import numpy as np

import jax


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    ts, te, score, matches, mapq, strand, aligned = (np.asarray(x) for x in out)
    assert aligned.all()
    # strains differ by ~1% SNPs: reads without a SNP hit shared nodes (mapq
    # 60 after location dedup), strain-specific reads sit in the 3..60 band
    assert (mapq == 60).mean() > 0.2
    assert mapq.mean() > 20


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def _random_packed(seed=0, R=200, N=61):
    from pantax_tpu.profile.coverage import PackedReads

    rng = np.random.default_rng(seed)
    nodes_len = rng.integers(5, 60, size=N)
    L = 7
    nod = np.full((R, L), -1, np.int64)
    lens = rng.integers(1, L + 1, R)
    for i in range(R):
        s = rng.integers(0, N - 1)
        nod[i, : lens[i]] = (np.arange(s, s + lens[i]) % N)
    packed = PackedReads(
        nodes=nod,
        lengths=lens.astype(np.int64),
        read_start=rng.integers(0, 5, R).astype(np.int64),
        read_end=rng.integers(40, 200, R).astype(np.int64),
    )
    paths = {
        "h1": np.arange(0, N - 10, dtype=np.int64),
        "h2": np.concatenate(
            [np.arange(0, 20), np.arange(30, N)]
        ).astype(np.int64),
    }
    return packed, nodes_len, paths


def test_sharded_coverage_bitwise_matches_single_device():
    """8-device reads-sharded coverage == 1-device, bit for bit."""
    from pantax_tpu.graph.trio import build_trio_index
    from pantax_tpu.ops.coverage_device import node_abundances_device
    from pantax_tpu.parallel import make_mesh

    packed, nodes_len, paths = _random_packed()
    ti = build_trio_index(nodes_len, paths)
    single = node_abundances_device(packed, nodes_len, ti)
    mesh = make_mesh(8)
    sharded = node_abundances_device(packed, nodes_len, ti, mesh=mesh)
    for a, b, name in zip(single, sharded, ["node", "trio", "base_cov"]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_default_mesh_routes_device_coverage():
    """Installing a default mesh shards the device coverage path implicitly."""
    from pantax_tpu import parallel
    from pantax_tpu.graph.trio import build_trio_index
    from pantax_tpu.ops.coverage_device import node_abundances_device
    from pantax_tpu.profile.coverage import node_abundances_packed

    packed, nodes_len, paths = _random_packed(seed=3)
    ti = build_trio_index(nodes_len, paths)
    host = node_abundances_packed(packed, nodes_len, ti)
    parallel.set_default_mesh(parallel.make_mesh(8))
    try:
        dev = node_abundances_device(packed, nodes_len, ti)
    finally:
        parallel.set_default_mesh(None)
    for a, b, name in zip(host, dev, ["node", "trio", "base_cov"]):
        assert np.allclose(np.asarray(a, float), np.asarray(b, float)), name


def test_coverage_totals_match_alignment_spans():
    """Sharded coverage sums to the total aligned bases."""
    import __graft_entry__ as g
    from pantax_tpu.align.aligner import (
        _query_batch, build_seed_lookup, pack_codes, pack_text2d,
    )
    from pantax_tpu.align.index import build_align_index
    from pantax_tpu.config import AlignConfig
    from pantax_tpu.ops.coverage import interval_node_coverage

    db = g._tiny_db()
    index = build_align_index(db)
    cfg = AlignConfig()
    run_table, pos, bucket_bits, bucket_lo, steps = build_seed_lookup(
        index.seed_keys, index.seed_pos
    )
    cfg_static = (
        index.k, index.density_bits, bucket_bits, steps, cfg.max_seeds,
        cfg.hits_per_seed, cfg.max_candidates, cfg.extension_band, cfg.match,
        cfg.mismatch, cfg.gap_extend, cfg.mapq_scale, cfg.min_score_frac,
    )
    codes, lens = g._reads_from_index(index, 128, 128, seed=5)
    ts, te, *_rest = _query_batch(
        pack_text2d(index.text),
        run_table, pos, bucket_lo,
        index.tstart.astype(np.int32), index.tnode.astype(np.int32),
        pack_codes(codes), lens.astype(np.int32), cfg_static,
    )
    aligned = np.asarray(_rest[-1])
    N = int(index.tnode.max())
    cov = interval_node_coverage(
        index.tstart.astype(np.int32), index.tnode.astype(np.int32),
        index.tlen.astype(np.int32),
        ts, te, _rest[-1], N, 16,
    )
    total_span = int((np.asarray(te) - np.asarray(ts))[aligned].sum())
    # a read whose window touches a haplotype separator loses <= 1 base
    assert abs(int(np.asarray(cov).sum()) - total_span) <= int(aligned.sum())
