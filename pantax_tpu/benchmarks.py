"""Benchmark workloads (BASELINE.md measurement configs).

config "example": the reference's own 21,300-read NGS workload (config 1).
config "scale":   synthetic 10-species / 30-strain community, 1M 150bp reads
                  at 1% error (config 4), built once and cached on disk.
"""
from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

from .align.aligner import Aligner
from .align.index import build_align_index
from .db.construct import DatabasePaths, build_database, load_database
from .io.fastx import write_fasta
from .io.metadata import GenomeInfo, write_genomes_info

EXAMPLE_INFO = "/root/reference/example/example_genomes_info.txt"
EXAMPLE_BASE = "/root/reference/example/ngs"
EXAMPLE_READS = "/root/reference/example/ngs/short_reads.fq.gz"


def example_db(path: str) -> DatabasePaths:
    if os.path.exists(os.path.join(path, "species_range.txt")):
        return load_database(path)
    return build_database(EXAMPLE_INFO, path, base_dir=EXAMPLE_BASE)


def scale_db(
    path: str, n_species: int = 10, strains_per: int = 3,
    genome_len: int = 1_000_000, snp_rate: float = 0.01, seed: int = 7,
) -> DatabasePaths:
    """Synthetic community database (cached)."""
    root = Path(path)
    if (root / "db" / "species_range.txt").exists():
        return load_database(root / "db")
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    infos = []
    for sp in range(n_species):
        ref = bases[rng.integers(0, 4, size=genome_len)]
        for st in range(strains_per):
            g = ref.copy()
            m = rng.random(genome_len) < snp_rate
            g[m] = bases[rng.integers(0, 4, size=int(m.sum()))]
            name = f"GCF_{900 + sp}{chr(97 + st)}.1_x_genomic.fna"
            write_fasta(root / name, [(f"c{sp}{st}", g.tobytes())])
            infos.append(
                GenomeInfo(f"GCF_{900 + sp}{chr(97 + st)}.1_x",
                           f"{900 + sp}.{st + 1}", str(900 + sp),
                           "synthetic", name)
            )
    info_file = root / "genomes_info.txt"
    write_genomes_info(info_file, infos)
    return build_database(info_file, root / "db", base_dir=root)


def simulate_read_batch(
    index, n_reads: int, read_len: int, error_rate: float, seed: int = 0,
    hap_weights=None, indel_rate: float = 0.0005,
):
    """Vectorized read simulation straight from the index text.

    Returns (codes [n, Lr+pad], lens, truth_hap_idx).  hap_weights (optional,
    [H]) draws reads coverage-proportionally.  ``error_rate`` injects
    substitutions; ``indel_rate`` injects 1bp insertions and deletions (half
    each) as coordinate shifts against the template, so the headline accuracy
    benchmarks exercise the DP's gap model (VERDICT r1 'what's weak' #3)."""
    rng = np.random.default_rng(seed)
    H = len(index.hap_names)
    if hap_weights is None:
        hap = rng.integers(0, H, size=n_reads)
    else:
        w = np.asarray(hap_weights, dtype=np.float64)
        hap = rng.choice(H, size=n_reads, p=w / w.sum())
    spans = np.diff(index.hap_offsets) - 1  # exclude separator
    margin = 32
    starts = (
        index.hap_offsets[hap]
        + rng.integers(0, np.maximum(spans[hap] - read_len - margin, 1))
    ).astype(np.int64)
    L = ((read_len + 31) // 32) * 32
    cols = np.arange(read_len)
    codes = np.full((n_reads, L), 4, dtype=np.int8)
    if indel_rate > 0:
        # deletions skip a template base; insertions inject a random base and
        # shift the rest of the template right
        ev = rng.random((n_reads, read_len))
        is_del = ev < indel_rate / 2
        is_ins = (ev >= indel_rate / 2) & (ev < indel_rate)
        shift = np.cumsum(is_del.astype(np.int64) - is_ins.astype(np.int64), axis=1)
        take = np.clip(cols[None, :] + shift, 0, None)
        codes[:, :read_len] = index.text[starts[:, None] + take]
        codes[:, :read_len][is_ins] = rng.integers(
            0, 4, size=int(is_ins.sum()), dtype=np.int8
        )
    else:
        codes[:, :read_len] = index.text[starts[:, None] + cols[None, :]]
    if error_rate > 0:
        m = rng.random(codes[:, :read_len].shape) < error_rate
        codes[:, :read_len] = np.where(
            m, rng.integers(0, 4, size=m.shape, dtype=np.int8),
            codes[:, :read_len],
        )
    # reverse-complement half
    flip = rng.random(n_reads) < 0.5
    rc = 3 - codes[flip][:, ::-1]
    rc = np.where(rc < 0, 4, rc)  # pad 4 -> -1 -> back to 4
    # left-align: padding was on the right before reversal
    codes[flip] = np.roll(rc, read_len - L, axis=1)
    lens = np.full(n_reads, read_len, dtype=np.int64)
    return codes, lens, hap


def run_alignment_benchmark(
    db: DatabasePaths, n_reads: int, batch: int, error_rate: float = 0.01
):
    """Returns dict with reads/s, aligned fraction, species accuracy."""
    index = build_align_index(db)
    aligner = Aligner(index)
    codes, lens, hap = simulate_read_batch(index, n_reads, 150, error_rate)
    # warmup/compile
    aligner.align_codes(codes[:batch], lens[:batch])

    n_batches = n_reads // batch
    t0 = time.time()
    aligned = 0
    correct = 0
    # species of each hap as an index
    species_names = sorted(set(index.hap_species))
    sp_idx = {s: i for i, s in enumerate(species_names)}
    hap_sp = np.array([sp_idx[s] for s in index.hap_species])

    def account(sl, res):
        nonlocal aligned, correct
        aligned += int(res.aligned.sum())
        # classification check: hap of the alignment vs truth hap's species
        pred_hap = np.searchsorted(index.hap_offsets, res.text_start,
                                   side="right") - 1
        pred_hap = np.clip(pred_hap, 0, len(hap_sp) - 1)
        ok = res.aligned & (hap_sp[pred_hap] == hap_sp[hap[sl]])
        correct += int(ok.sum())

    # pipelined several batches deep: the dispatch->result round trip through
    # the tunnel is latency-bound in bad windows, so keeping a queue of
    # in-flight batches sustains device occupancy (the production align_file /
    # fastpath flow pipelines the same way; a sync loop would double the wall).
    # The batch pack+upload runs ahead via utils.prefetched (honors the
    # PANTAX_TPU_PREFETCH=0 A/B gate) so the upload RPC overlaps compute +
    # collects instead of serializing between dispatches.
    from .utils import pipeline_depth, prefetched

    depth = pipeline_depth()
    pending = []
    marks = []  # collect-completion timestamps -> steady per-batch intervals

    def prep(bidx):
        sl = slice(bidx * batch, (bidx + 1) * batch)
        return sl, aligner.prep_codes(codes[sl], lens[sl])

    touch_on = os.environ.get("PANTAX_TPU_COLLECT_PREFETCH", "1") != "0"

    def _touch(dev):
        # start the oldest in-flight batch's host copy (safe AFTER dispatch
        # returned — calling it inline with the launch hangs on axon, see
        # CLAUDE.md) so collect()'s asarray finds the bytes local
        f = getattr(dev, "copy_to_host_async", None) if touch_on else None
        if f is not None:
            f()

    for _, (sl, wire) in prefetched(prep, range(n_batches)):
        pending.append((sl, aligner.dispatch_prepped(wire)))
        _touch(pending[0][1])
        if len(pending) >= depth:
            sl0, dev0 = pending.pop(0)
            account(sl0, aligner.collect(dev0))
            marks.append(time.time())
    for sl0, dev0 in pending:
        account(sl0, aligner.collect(dev0))
        marks.append(time.time())
    dt = time.time() - t0
    total = n_batches * batch
    # steady-state rate: median inter-collect interval of the pipelined loop,
    # robust to tunnel-latency windows (same policy as bench.py's example
    # config, which reports the median of 8 timed batches)
    gaps = np.diff(np.array(marks))
    steady = batch / float(np.median(gaps)) if len(gaps) >= 3 else total / dt
    return {
        "reads_per_s": steady,
        "aligned_frac": aligned / total,
        "species_acc": correct / max(aligned, 1),
        "wall_s": dt,
        "wall_reads_per_s": total / dt,
        "total_reads": total,
    }


def run_e2e_benchmark(
    db: DatabasePaths, n_reads: int, batch: int, error_rate: float = 0.01,
    out_dir: str = "/tmp/pantax_tpu_e2e",
):
    """Full-pipeline throughput: align -> classify -> species profile ->
    strain profile -> abundance tables (the array-native fastpath flow the
    CLI's --fastpath uses).  Separately reports the alignment-stage rate so
    the stage vs pipeline gap is visible (VERDICT r1 'what's weak' #2).

    One warmup pass over a subsample compiles the aligner and the bucketed
    coverage/ADMM shapes before the timed run."""
    import shutil

    from .config import ProfilingConfig
    from .ops.fused import build_fused_tables, profile_fused

    index = build_align_index(db)
    aligner = Aligner(index)
    cfg = ProfilingConfig.for_read_type("short")
    codes, lens, hap = simulate_read_batch(index, n_reads, 150, error_rate,
                                           seed=3)
    # warmup: one full untimed pass so the timed run hits no compiles at all —
    # the full-size coverage/ADMM bucket shapes differ from any subsample's,
    # and a cold compile mid-run would be charged to the pipeline
    tables = build_fused_tables(db, index)
    shutil.rmtree(out_dir, ignore_errors=True)
    profile_fused(aligner, codes, lens, index, db, cfg, out_dir, batch,
                  tables=tables)

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    stage = {}
    profile_fused(aligner, codes, lens, index, db, cfg, out_dir, batch,
                  tables=tables, stage_out=stage)
    wall = time.time() - t0
    # align+coverage run as one fused device pipeline; "profile" is the rest
    t_align = stage.get("align_cover_s", wall)
    n_strains = max(sum(1 for _ in open(f"{out_dir}/strain_abundance.txt")) - 1, 0)
    return {
        "e2e_reads_per_s": n_reads / wall,
        "align_reads_per_s": n_reads / t_align,
        "align_s": t_align,
        "profile_s": wall - t_align,
        "wall_s": wall,
        "total_reads": n_reads,
        "aligned_frac": stage.get("n_aligned", 0) / n_reads,
        "strains_detected": n_strains,
    }


def run_long_e2e_benchmark(
    db: DatabasePaths, n_long: int = 100_000, long_len: int = 8192,
    read_type: str = "hifi", long_batch: int = 16384,
    out_dir: str = "/tmp/pantax_tpu_long_e2e",
):
    """Pure long-read end-to-end: chunked alignment + best-alignment filter
    -> FUSED interval profiling (ops/fused.feed_intervals: windowed short
    spans, segment-range decomposition for long spans, device tail) to full
    species/strain tables — the long-read analog of run_e2e_benchmark."""
    import shutil

    from .align.long_read import (
        LONG_READ_PRESETS, LONG_READ_SEED_STRIDE, align_long_reads,
    )
    from .config import ProfilingConfig
    from .ops.fused import (
        FusedPipeline, build_fused_tables, profile_from_fused_result,
    )

    index = build_align_index(db)
    from .config import AlignConfig

    aligner = Aligner(index, cfg=AlignConfig.for_read_type("long"))
    cfg = ProfilingConfig.for_read_type("long")
    tables = build_fused_tables(db, index)
    chunk = LONG_READ_PRESETS[read_type]
    stride = LONG_READ_SEED_STRIDE[read_type]

    reads, _hap = simulate_long_reads(index, n_long, long_len, seed=9)

    # warm the chunk kernels + the fused interval/finalize shapes.  The
    # warm slice must fill one UPLOAD SUB-GROUP's buffer rows (the buffer
    # shape is part of the jit key): a small warm group warms a smaller
    # quantized family and the timed run then compiles the production one.
    from .align.long_read import _DEFAULT_UPLOAD_ROWS, _UPLOAD_ROWS_ENV

    sub_rows = int(os.environ.get(_UPLOAD_ROWS_ENV, _DEFAULT_UPLOAD_ROWS))
    acc = n_warm = 0
    for _, s in reads:
        k = -(-len(s) // chunk)
        if acc + k > sub_rows - 1:
            break
        acc += k
        n_warm += 1
    shutil.rmtree(out_dir, ignore_errors=True)
    warm = align_long_reads(aligner, reads[:max(n_warm, 64)], chunk=chunk,
                            batch_size=long_batch, seed_stride=stride,
                            as_arrays=True)
    pipe = FusedPipeline(aligner, tables, batch=long_batch)
    pipe.feed_intervals(warm.ts, warm.te, warm.mapq, warm.read_len,
                        ids=warm.read_ids)
    profile_from_fused_result(pipe.finish(), tables, index, db, cfg, out_dir)

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    merged = align_long_reads(aligner, reads, chunk=chunk,
                              batch_size=long_batch, seed_stride=stride,
                              as_arrays=True)
    t_align = time.time() - t0
    pipe = FusedPipeline(aligner, tables, batch=long_batch)
    pipe.feed_intervals(merged.ts, merged.te, merged.mapq, merged.read_len,
                        ids=merged.read_ids)
    profile_from_fused_result(pipe.finish(), tables, index, db, cfg, out_dir)
    wall = time.time() - t0
    n_strains = max(
        sum(1 for _ in open(f"{out_dir}/strain_abundance.txt")) - 1, 0)
    return {
        "total_reads": n_long,
        "total_bases": n_long * long_len,
        "wall_s": wall,
        "align_s": t_align,
        "profile_s": wall - t_align,
        "reads_per_s": n_long / wall,
        "bases_per_s": n_long * long_len / wall,
        "aligned_frac": len(merged.read_ids) / n_long,
        "strains_detected": n_strains,
    }


def run_mixed_benchmark(
    db: DatabasePaths, n_short: int = 9_900_000, n_long: int = 100_000,
    batch: int = 65536, long_len: int = 8192, read_type: str = "hifi",
    long_batch: int = 16384, out_dir: str = "/tmp/pantax_tpu_mixed",
):
    """BASELINE config 5, single-chip slice: 10M mixed reads (99% 150bp NGS +
    1% 8kb HiFi-like) against the 102-strain community database.

    The short fraction streams through the fused align+classify+coverage
    pipeline to full species/strain tables; the long fraction runs chunked
    alignment + the reference's best-alignment GAF filter
    (gaf_filter.rs:44-97 semantics).  Both stages are warmed (compiles are a
    DB-build cost, not a query cost), then timed back to back; the headline
    rate is total reads over combined wall."""
    import shutil

    from .align.long_read import (
        LONG_READ_PRESETS, LONG_READ_SEED_STRIDE, align_long_reads,
    )
    from .config import ProfilingConfig
    from .io.gaf import filter_best_long_read_alignments
    from .ops.fused import build_fused_tables, profile_fused

    index = build_align_index(db)
    from .config import AlignConfig

    aligner = Aligner(index)
    aligner_long = Aligner(index, cfg=AlignConfig.for_read_type("long"))
    cfg = ProfilingConfig.for_read_type("short")
    tables = build_fused_tables(db, index)

    codes, lens, _hap = simulate_read_batch(index, n_short, 150, 0.01, seed=5)
    long_reads, _lhap = simulate_long_reads(index, n_long, long_len, seed=9)
    chunk = LONG_READ_PRESETS[read_type]

    # warmup both kernels + the fused finalize/profile shapes
    shutil.rmtree(out_dir, ignore_errors=True)
    profile_fused(aligner, codes[: 2 * batch], lens[: 2 * batch], index, db,
                  cfg, out_dir, batch, tables=tables)
    stride = LONG_READ_SEED_STRIDE[read_type]
    align_long_reads(aligner_long, long_reads[:1024], chunk=chunk,
                     batch_size=long_batch, seed_stride=stride)

    shutil.rmtree(out_dir, ignore_errors=True)
    stage = {}
    t0 = time.time()
    profile_fused(aligner, codes, lens, index, db, cfg, out_dir, batch,
                  tables=tables, stage_out=stage)
    short_s = time.time() - t0
    t1 = time.time()
    gaf = align_long_reads(aligner_long, long_reads, chunk=chunk,
                           batch_size=long_batch, seed_stride=stride)
    gaf = filter_best_long_read_alignments(gaf)
    long_s = time.time() - t1
    total = n_short + n_long
    n_strains = max(
        sum(1 for _ in open(f"{out_dir}/strain_abundance.txt")) - 1, 0)
    return {
        "total_reads": total,
        "reads_per_s": total / (short_s + long_s),
        "short_reads_per_s": n_short / short_s,
        "long_reads_per_s": n_long / long_s,
        "short_s": short_s,
        "long_s": long_s,
        "short_aligned_frac": stage.get("n_aligned", 0) / n_short,
        "long_aligned_frac": len(gaf) / n_long,
        "strains_detected": n_strains,
    }


def accuracy_benchmark(
    db: DatabasePaths, n_reads: int = 262144, batch: int = 16384,
    error_rate: float = 0.01, seed: int = 11, out_dir: str = "/tmp/pantax_tpu_acc",
):
    """End-to-end strain-abundance accuracy: staggered 1:3:9 strain weights
    per species, full align -> profile pipeline, L1 error vs truth.

    Returns dict with l1_error, detected/total strains, per-strain table.
    """
    import pandas as pd

    from .config import ProfilingConfig
    from .pipeline import profile_from_gaf

    index = build_align_index(db)
    aligner = Aligner(index)
    H = len(index.hap_names)
    weights = np.array([1.0 * (3 ** (i % 3)) for i in range(H)])
    codes, lens, hap = simulate_read_batch(
        index, n_reads, 150, error_rate, seed=seed, hap_weights=weights
    )
    gaf = []
    pending = []
    for lo in range(0, n_reads, batch):
        dev = aligner.dispatch_codes(codes[lo : lo + batch], lens[lo : lo + batch])
        pending.append((lo, dev))
        if len(pending) > 1:
            lo0, dev0 = pending.pop(0)
            res = aligner.collect(dev0)
            chunk = [(f"R{lo0 + i}", None) for i in range(batch)]
            gaf.extend(aligner._emit_gaf_lens(chunk, lens[lo0 : lo0 + batch], res))
    for lo0, dev0 in pending:
        res = aligner.collect(dev0)
        chunk = [(f"R{lo0 + i}", None) for i in range(batch)]
        gaf.extend(aligner._emit_gaf_lens(chunk, lens[lo0 : lo0 + batch], res))

    profile_from_gaf(gaf, db, ProfilingConfig.for_read_type("short"), out_dir,
                     force=True)
    return _strain_l1(db, index, weights, out_dir)


def _strain_l1(db, index, weights, out_dir):
    """L1 strain-abundance error vs hap-weight truth from a finished run."""
    import pandas as pd

    from .io.metadata import read_genomes_info

    st = pd.read_csv(f"{out_dir}/strain_abundance.txt", sep="\t",
                     dtype={"species_taxid": str, "strain_taxid": str})
    # truth: every genome has (almost) equal length, so abundance ~ weight
    infos = read_genomes_info(db.genomes_info_file)
    name_to_hidx = {n: i for i, n in enumerate(index.hap_names)}
    truth = {}
    for gi in infos:
        truth[gi.genome_id] = weights[name_to_hidx[gi.hap_id]]
    tot = sum(truth.values())
    truth = {k: v / tot for k, v in truth.items()}
    pred = dict(zip(st["genome_ID"], st["predicted_abundance"]))
    l1 = sum(abs(pred.get(g, 0.0) - t) for g, t in truth.items())
    l1 += sum(p for g, p in pred.items() if g not in truth)
    return {
        "l1_error": l1,
        "detected": len(st),
        "total": len(truth),
        "pred": pred,
        "truth": truth,
    }


_CODE2BASE = np.frombuffer(b"ACGTN", dtype=np.uint8)


def simulate_long_reads(
    index, n_reads: int, read_len: int, sub_rate: float = 0.004,
    ins_rate: float = 0.003, del_rate: float = 0.003, seed: int = 0,
    hap_weights=None,
):
    """HiFi/ONT-like long reads with substitutions AND 1bp indels, sampled
    from the index text.  Returns [(read_id, seq_bytes)] and truth hap ids."""
    from .sim import revcomp

    rng = np.random.default_rng(seed)
    H = len(index.hap_names)
    if hap_weights is None:
        hap = rng.integers(0, H, size=n_reads)
    else:
        w = np.asarray(hap_weights, dtype=np.float64)
        hap = rng.choice(H, size=n_reads, p=w / w.sum())
    spans = np.diff(index.hap_offsets) - 1
    margin = int(read_len * max(del_rate, 0.01) * 4) + 64
    starts = (
        index.hap_offsets[hap]
        + rng.integers(0, np.maximum(spans[hap] - read_len - margin, 1))
    ).astype(np.int64)
    reads = []
    for i in range(n_reads):
        tmpl = index.text[starts[i] : starts[i] + read_len + margin]
        ev = rng.random(read_len)
        is_del = ev < del_rate
        is_ins = (ev >= del_rate) & (ev < del_rate + ins_rate)
        shift = np.cumsum(is_del.astype(np.int64) - is_ins.astype(np.int64))
        codes = tmpl[np.clip(np.arange(read_len) + shift, 0, len(tmpl) - 1)].copy()
        codes[is_ins] = rng.integers(0, 4, size=int(is_ins.sum()), dtype=np.int8)
        sub = rng.random(read_len) < sub_rate
        codes[sub] = rng.integers(0, 4, size=int(sub.sum()), dtype=np.int8)
        seq = _CODE2BASE[np.clip(codes, 0, 4)].tobytes()
        if rng.random() < 0.5:
            seq = revcomp(seq)
        reads.append((f"L{i}", seq))
    return reads, hap


def long_read_accuracy_benchmark(
    db: DatabasePaths, n_reads: int = 16384, read_len: int = 8192,
    batch: int = 2048, seed: int = 13, read_type: str = "hifi",
    out_dir: str = "/tmp/pantax_tpu_lr_acc",
):
    """End-to-end long-read strain accuracy: staggered 1:3:9 weights, indel-
    bearing HiFi-like reads, chunked alignment + best-alignment filter + full
    profiling; L1 error vs truth (BASELINE config 2/4 long-read analog)."""
    from .align.long_read import (
        LONG_READ_PRESETS, LONG_READ_SEED_STRIDE, align_long_reads,
    )
    from .config import ProfilingConfig
    from .io.gaf import filter_best_long_read_alignments
    from .pipeline import profile_from_gaf

    index = build_align_index(db)
    from .config import AlignConfig

    aligner = Aligner(index, cfg=AlignConfig.for_read_type("long"))
    H = len(index.hap_names)
    weights = np.array([1.0 * (3 ** (i % 3)) for i in range(H)])
    reads, hap = simulate_long_reads(
        index, n_reads, read_len, seed=seed, hap_weights=weights
    )
    t0 = time.time()
    gaf = align_long_reads(
        aligner, reads, chunk=LONG_READ_PRESETS[read_type], batch_size=batch,
        seed_stride=LONG_READ_SEED_STRIDE[read_type],
    )
    gaf = filter_best_long_read_alignments(gaf)
    align_s = time.time() - t0
    profile_from_gaf(gaf, db, ProfilingConfig.for_read_type("long"), out_dir,
                     force=True)
    out = _strain_l1(db, index, weights, out_dir)
    out["aligned_frac"] = len(gaf) / n_reads
    out["align_s"] = align_s
    out["reads_per_s"] = n_reads / align_s
    return out
