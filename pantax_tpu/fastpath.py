"""Array-native profiling: alignment arrays -> abundance tables without GAF
text round-trips.

The GAF file stays the interop/resume artifact (pipeline.profile_from_gaf),
but per-read string building caps throughput near 10M reads.  This path keeps
everything as arrays: text intervals from the aligner are projected onto graph
nodes with vectorized reduceat/searchsorted, classification and read grouping
are numpy, and the per-species engine receives PackedReads directly.
"""
from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass

import numpy as np

from .align.index import AlignIndex
from .config import ProfilingConfig
from .db.construct import DatabasePaths
from .graph.core import load_species_range
from .profile.coverage import PackedReads
from .profile.report import abundance_constraint, abundance_est

log = logging.getLogger("pantax_tpu")
from .profile.species import read_species_mean_len, species_profiling


@dataclass
class AlignmentArrays:
    """Batch-concatenated aligner outputs (aligned reads only)."""

    read_ids: list[str]
    ts: np.ndarray        # int64 text start
    te: np.ndarray        # int64 text end (exclusive)
    mapq: np.ndarray      # int64
    read_len: np.ndarray  # int64


from .utils import pipeline_depth as _pipeline_depth


def collect_alignment_arrays(aligner, codes, lens, batch: int) -> AlignmentArrays:
    """Align a codes matrix in pipelined batches, keeping results as arrays."""
    n = len(lens)
    parts = []
    pending = []
    depth = _pipeline_depth()

    def drain(entry):
        lo, hi, dev = entry
        res = aligner.collect(dev)
        m = hi - lo
        keep = res.aligned[:m]
        parts.append((lo, keep, res.text_start[:m][keep], res.text_end[:m][keep],
                      res.mapq[:m][keep]))

    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        b_codes = codes[lo:hi]
        b_lens = lens[lo:hi]
        if hi - lo < batch:  # pad the tail batch
            b_codes = np.vstack(
                [b_codes, np.full((batch - (hi - lo), codes.shape[1]), 4, np.int8)]
            )
            b_lens = np.concatenate([b_lens, np.zeros(batch - (hi - lo), b_lens.dtype)])
        pending.append((lo, hi, aligner.dispatch_codes(b_codes, b_lens)))
        if len(pending) >= depth:
            drain(pending.pop(0))
    for e in pending:
        drain(e)

    ids = []
    ts, te, mq, rl = [], [], [], []
    for lo, keep, a, b, q in parts:
        idxs = np.flatnonzero(keep) + lo
        ids.extend(f"R{i}" for i in idxs)
        ts.append(a)
        te.append(b)
        mq.append(q)
        rl.append(lens[idxs])
    return AlignmentArrays(
        read_ids=ids,
        ts=np.concatenate(ts).astype(np.int64) if ts else np.zeros(0, np.int64),
        te=np.concatenate(te).astype(np.int64) if te else np.zeros(0, np.int64),
        mapq=np.concatenate(mq).astype(np.int64) if mq else np.zeros(0, np.int64),
        read_len=np.concatenate(rl).astype(np.int64) if rl else np.zeros(0, np.int64),
    )


def collect_paired_alignment_arrays(
    aligner, codes1, lens1, codes2, lens2, batch: int
) -> tuple[AlignmentArrays, AlignmentArrays]:
    """Paired-mate variant of collect_alignment_arrays: joint fragment-model
    batches, one AlignmentArrays per mate (read ids R{i} index the pair)."""
    n = len(lens1)
    parts1, parts2 = [], []
    pending = []
    depth = _pipeline_depth()

    def drain(entry):
        lo, hi, dev = entry
        m = hi - lo
        res1, res2 = aligner.collect_pair(dev)
        for res, parts in ((res1, parts1), (res2, parts2)):
            keep = res.aligned[:m]
            parts.append((lo, keep, res.text_start[:m][keep],
                          res.text_end[:m][keep], res.mapq[:m][keep]))

    def pad(c, l, lo, hi):
        bc, bl = c[lo:hi], l[lo:hi]
        if hi - lo < batch:
            bc = np.vstack([bc, np.full((batch - (hi - lo), c.shape[1]), 4, np.int8)])
            bl = np.concatenate([bl, np.zeros(batch - (hi - lo), l.dtype)])
        return bc, bl

    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        b1, l1 = pad(codes1, lens1, lo, hi)
        b2, l2 = pad(codes2, lens2, lo, hi)
        pending.append((lo, hi, aligner.dispatch_paired_codes(b1, l1, b2, l2)))
        if len(pending) >= depth:
            drain(pending.pop(0))
    for e in pending:
        drain(e)

    def collect(parts, lens):
        ids, ts, te, mq, rl = [], [], [], [], []
        for lo, keep, a, b, q in parts:
            idxs = np.flatnonzero(keep) + lo
            ids.extend(f"R{i}" for i in idxs)
            ts.append(a)
            te.append(b)
            mq.append(q)
            rl.append(lens[idxs])
        return AlignmentArrays(
            read_ids=ids,
            ts=np.concatenate(ts).astype(np.int64) if ts else np.zeros(0, np.int64),
            te=np.concatenate(te).astype(np.int64) if te else np.zeros(0, np.int64),
            mapq=np.concatenate(mq).astype(np.int64) if mq else np.zeros(0, np.int64),
            read_len=np.concatenate(rl).astype(np.int64) if rl else np.zeros(0, np.int64),
        )

    return collect(parts1, lens1), collect(parts2, lens2)


def profile_from_alignments(
    arrays: AlignmentArrays,
    index: AlignIndex,
    db: DatabasePaths,
    cfg: ProfilingConfig,
    out_dir: str | os.PathLike,
) -> None:
    """Full species+strain profiling from alignment arrays (no GAF text)."""
    out = os.fspath(out_dir)
    os.makedirs(out, exist_ok=True)
    ranges = load_species_range(db.range_file)

    # project text intervals onto node index spans
    i0 = np.searchsorted(index.tstart, arrays.ts, side="right") - 1
    i1 = np.searchsorted(index.tstart, np.maximum(arrays.te - 1, arrays.ts),
                         side="right") - 1
    n = len(i0)

    # classification: every fastpath alignment lies within one linearized
    # haplotype (windows never cross the sentinel separators with a positive
    # score), so species = the haplotype's species — equivalent to the
    # min/max-node range walk (rcls.rs:210-235) but one searchsorted instead
    # of a per-read gather over tnode (which dominated profiling wall time)
    range_of_species = {r.species: j for j, r in enumerate(ranges)}
    hap_range = np.array(
        [range_of_species.get(s, -1) for s in index.hap_species], dtype=np.int64
    )
    hap_idx = np.searchsorted(index.hap_offsets, arrays.ts, side="right") - 1
    hap_idx = np.clip(hap_idx, 0, len(hap_range) - 1)
    ridx = hap_range[hap_idx] if n else np.zeros(0, dtype=np.int64)
    species = np.array(
        [ranges[i].species if i >= 0 else "U" for i in ridx], dtype=object
    )

    # reads_classification.tsv (one fast join)
    with open(os.path.join(out, "reads_classification.tsv"), "w") as f:
        f.write("\n".join(
            f"{rid}\t{q}\t{sp}\t{rl}" for rid, q, sp, rl in zip(
                arrays.read_ids, arrays.mapq, species, arrays.read_len
            )
        ))
        if n:
            f.write("\n")

    keep = ridx >= 0
    profile = species_profiling(
        species[keep], arrays.read_len[keep], arrays.mapq[keep],
        read_species_mean_len(db.stats_file), filtered=cfg.filtered,
    )
    profile.save(os.path.join(out, "species_abundance.txt"))
    if not cfg.strain:
        return

    # strain profiling per abundant species, PackedReads built by projection
    abundant = {
        str(row["species_taxid"]): float(row["predicted_abundance"])
        for _, row in profile.df.iterrows()
    }
    from .io.metadata import read_genomes_info

    selected = []
    for rsel, r in enumerate(ranges):
        if cfg.mode == 0 and r.is_pan != 0:
            continue
        if cfg.mode == 1 and r.is_pan != 1:
            continue
        if cfg.designated_species and r.species not in cfg.designated_species:
            continue
        if abundant.get(r.species, 0.0) <= cfg.min_species_abundance:
            continue
        selected.append((rsel, r))

    def _work(item):
        rsel, r = item
        sel = keep & (ridx == rsel)
        if not sel.any():
            return None
        s_i0 = i0[sel]
        s_i1 = i1[sel]
        span = s_i1 - s_i0 + 1
        R = len(s_i0)
        L = int(span.max())
        nodes = np.full((R, L), -1, dtype=np.int64)
        cols = np.arange(L)
        take = s_i0[:, None] + cols[None, :]
        valid = cols[None, :] < span[:, None]
        take = np.clip(take, 0, len(index.tnode) - 1)
        nodes[valid] = (index.tnode[take] - r.start)[valid]
        packed = PackedReads(
            nodes=nodes,
            lengths=span.astype(np.int64),
            read_start=(arrays.ts[sel] - index.tstart[s_i0]).astype(np.int64),
            read_end=(
                arrays.ts[sel] - index.tstart[s_i0] + arrays.te[sel] - arrays.ts[sel]
            ).astype(np.int64),
        )
        graph = db.load_graph(r.species)
        return _prepare_packed(cfg, r.species, graph, r.start, packed)

    # species-parallel (profile.rs:3297 rayon shard axis): threads overlap
    # host packing with device coverage waits, then every species' PAO solves
    # run batched in one device program per bucket (engine.finish_two_stage)
    from .profile.engine import finish_two_stage
    from .utils.logging import stage_timer

    metrics = []
    _STAGE_SECONDS.clear()
    with stage_timer(f"strain profiling ({len(selected)} species)"):
        if len(selected) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(8, len(selected))) as ex:
                prepared = list(ex.map(_work, selected))
        else:
            prepared = [_work(it) for it in selected]
        t_pao = time.time()
        finish_two_stage([p[1] for p in prepared if p and p[1] is not None], cfg)
        _acct("pao", t_pao)
    if _STAGE_SECONDS:
        log.info(
            "  strain stage thread-seconds: %s",
            ", ".join(f"{k}={v:.1f}s" for k, v in _STAGE_SECONDS.items()),
        )
    for p in prepared:
        if p:
            m = p[0].hap_metrics
            abundance_constraint(profile, m)
            metrics.extend(m)

    genomes_info = read_genomes_info(db.genomes_info_file)
    abundance_est(cfg, metrics, genomes_info, out)


_STAGE_SECONDS: dict[str, float] = {}


def _acct(key: str, t0: float) -> float:
    """Accumulate per-stage wall time across the species pool (GIL-atomic
    float adds; logged once by profile_from_alignments)."""
    t1 = time.time()
    _STAGE_SECONDS[key] = _STAGE_SECONDS.get(key, 0.0) + (t1 - t0)
    return t1


def _prepare_packed(cfg, otu, graph, range_start, packed: PackedReads):
    """prepare_otu over pre-packed reads (mirrors profile/engine.prepare_otu
    without the ReadRecord detour); returns (state, OtuSolveJob|None)."""
    from .graph.trio import build_trio_index
    from .ops.coverage_device import node_abundances_device
    from .profile.engine import prepare_two_stage
    from .profile.filters import HapMetrics, OtuState, first_filter_paths

    t = time.time()
    paths = graph.paths_dict()
    trio_index = build_trio_index(graph.nodes_len, paths)
    t = _acct("trio_index", t)
    use_device = cfg.coverage == "device" or (
        cfg.coverage == "auto" and len(packed.lengths) >= cfg.auto_device_reads
    )
    if use_device:
        node_abund, trio_abund, node_base_cov = node_abundances_device(
            packed, graph.nodes_len, trio_index
        )
    else:
        from .profile.coverage import node_abundances_packed

        node_abund, trio_abund, node_base_cov = node_abundances_packed(
            packed, graph.nodes_len, trio_index
        )
    t = _acct("coverage", t)
    node_abund_opt = np.where(node_abund > cfg.min_depth, node_abund, 0.0)
    state = OtuState(otu=otu, hap_metrics=[HapMetrics() for _ in paths])
    first_filter_paths(
        state, paths, trio_index.hap_matrix, trio_abund, node_abund_opt, cfg
    )
    t = _acct("filters", t)
    job = None
    if state.possible_paths_idx:
        job = prepare_two_stage(
            state, graph.num_nodes, paths, node_abund, node_base_cov,
            graph.nodes_len, cfg,
        )
        _acct("prepare", t)
    return state, job
