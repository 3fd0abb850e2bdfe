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


def test_coverage_totals_match_alignment_spans():
    """Sharded coverage sums to the total aligned bases."""
    import __graft_entry__ as g
    from pantax_tpu.align.aligner import _RC, _query_batch, build_bucket_table
    from pantax_tpu.align.index import build_align_index
    from pantax_tpu.config import AlignConfig
    from pantax_tpu.ops.coverage import interval_node_coverage

    db = g._tiny_db()
    index = build_align_index(db)
    cfg = AlignConfig()
    bucket_bits, bucket_lo = build_bucket_table(index.seed_keys)
    cfg_static = (
        index.k, index.density_bits, bucket_bits, cfg.max_seeds,
        cfg.hits_per_seed, cfg.max_candidates, cfg.extension_band, cfg.match,
        cfg.mismatch, cfg.gap_extend, cfg.mapq_scale, cfg.min_score_frac,
    )
    codes, lens = g._reads_from_index(index, 128, 128, seed=5)
    rev = _RC[codes[:, ::-1]]
    ts, te, *_rest = _query_batch(
        index.text.reshape(-1, 256),
        np.stack([index.seed_keys.view(np.int32), index.seed_pos.astype(np.int32)], axis=1), bucket_lo,
        index.tstart.astype(np.int32), index.tnode.astype(np.int32),
        codes, rev, lens, cfg_static,
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
