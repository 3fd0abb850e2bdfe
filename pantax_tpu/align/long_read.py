"""Long-read alignment: blockwise reuse of the banded short-read engine.

A long read is cut into fixed-size chunks; each chunk runs through the same
jitted seed+banded-DP batch kernel (the TPU analog of GraphAligner's
seed-chain-extend, /root/reference/pantax/src/alignment.rs:144-165); chunk hits
are then merged per read on the host: the haplotype with the most consistent
chunk diagonals wins, the merged text interval is projected onto the node path
and emitted as one GAF record.  The GAF then flows through the long-read
best-alignment filter (io/gaf.py, parity with gaf_filter.rs:44-97).

Robust across error profiles: measured recall 30/30 with >=97% span coverage
from HiFi (0.5%) through CLR-like (12% mixed) error rates — failed chunks are
absorbed by the majority merge (min_chunk_frac).
"""
from __future__ import annotations

import numpy as np

from ..io.gaf import GafRecord
from .aligner import Aligner
from .encode import encode_seq

# chunk sizes per read technology: higher error rates need shorter chunks so
# per-chunk indel drift stays inside the DP band (the role GraphAligner's
# --precise-clipping per-type presets play, alignment.rs:144-165).
# NOTE (measured, do not shrink): 160bp chunks match 512 on span/matches and
# even beat them at ONT/CLR error, but INVERT within-species strain
# attribution on the real example/hifi reads — close haplotypes need the
# longer chunk to carry enough variant sites for the (hap, strand) majority
# vote.  Chunk length is a strain-discrimination parameter, not just a DP
# robustness one.
LONG_READ_PRESETS = {
    "hifi": 512,
    "ontr10": 384,
    "ontr9": 256,
    "clr": 256,
}

# seed-lookup stride per technology: at low error rates nearly every chunk
# extends cleanly from its neighbour's predicted window (the rescue pass), so
# only every other chunk pays the seed stage; high-error technologies keep
# full seeding for placement robustness
LONG_READ_SEED_STRIDE = {
    "hifi": 2,
    "ontr10": 2,
    "ontr9": 1,
    "clr": 1,
}


def _empty_arrays():
    from ..fastpath import AlignmentArrays

    z = np.zeros(0, dtype=np.int64)
    return AlignmentArrays(read_ids=[], ts=z, te=z, mapq=z, read_len=z)


# streamed long-read group size (total bases): the chunk/codes matrices built
# per group scale with it, so it bounds host RAM for arbitrarily large inputs
# (GraphAligner streams reads from disk, alignment.rs:144-165); overridable
# for tests and small-RAM hosts.  1GB: the sub-group upload pipeline hides
# every upload EXCEPT the first sub of each group (~1.4s device-idle per
# group boundary), so fewer, larger groups amortize that stall — the 0.8Gb
# long bench is one group (was 4 at 256MB = 3 extra stalls).
_GROUP_BASES_ENV = "PANTAX_TPU_LONG_GROUP_BASES"
DEFAULT_GROUP_BASES = 1 << 30


def iter_read_groups(paths, group_bases: int | None = None):
    """Yield lists of (read_id, seq) from FASTA/FASTQ ``paths``, each group
    capped at ~``group_bases`` total sequence.  align_long_reads merges
    chunks PER READ, so running it group-by-group is exact (bit-identical
    outputs to the whole-list call, tests/test_aligner.py) while keeping
    memory bounded — the whole-file ``reads.extend(iter_fastx(...))`` it
    replaces held every parsed read in RAM at once."""
    import os

    from ..io.fastx import iter_fastx

    if group_bases is None:
        group_bases = int(os.environ.get(_GROUP_BASES_ENV,
                                         DEFAULT_GROUP_BASES))
    group: list[tuple[str, bytes]] = []
    nb = 0
    for rf in paths:
        for rec in iter_fastx(rf):
            group.append(rec)
            nb += len(rec[1])
            if nb >= group_bases:
                yield group
                group, nb = [], 0
    if group:
        yield group


def concat_arrays(parts):
    """Concatenate per-group AlignmentArrays (streamed long-read flow)."""
    from ..fastpath import AlignmentArrays

    parts = [p for p in parts if len(p.read_ids)]
    if not parts:
        return _empty_arrays()
    return AlignmentArrays(
        read_ids=[r for p in parts for r in p.read_ids],
        ts=np.concatenate([p.ts for p in parts]),
        te=np.concatenate([p.te for p in parts]),
        mapq=np.concatenate([p.mapq for p in parts]),
        read_len=np.concatenate([p.read_len for p in parts]),
    )


# upload-pipeline sub-group size in buffer rows (x chunk bases each): one
# sub-buffer uploads while the previous one's batches compute, so a large
# group's wall is max(upload, compute) instead of their sum — the single
# 100k x 8kb group buffer cost 17.8s of SERIAL upload (206MB at ~12MB/s
# tunnel) before the first dispatch.  131072 rows x 512 = 67MB of bases
# (~17MB packed, ~1.5s upload) per sub-buffer.
_UPLOAD_ROWS_ENV = "PANTAX_TPU_UPLOAD_ROWS"
_DEFAULT_UPLOAD_ROWS = 131072


def align_long_reads(
    aligner: Aligner,
    reads: list[tuple[str, bytes]],
    chunk: int = 512,
    batch_size: int = 2048,
    min_chunk_frac: float = 0.5,
    seed_stride: int = 1,
    as_arrays: bool = False,
    _grp="auto",
    _enc=None,
):
    """Returns GafRecords, or with ``as_arrays`` an AlignmentArrays for the
    array-native long-read fastpath (no GAF text / node-path strings; the
    best-alignment filter's thresholds are applied inline — one merged
    record per read already holds, gaf_filter.rs:44-97).

    ``_grp`` (internal): "auto" builds the device read-group buffer here —
    splitting oversized groups into upload-pipelined sub-groups — while the
    sub-group recursion passes a prepared buffer (or None for the codes
    wire) directly.  ``_enc`` carries the sub-group's already-encoded reads
    from the prep thread so each base is encoded once, not twice."""
    if not reads:
        return _empty_arrays() if as_arrays else []
    idx = aligner.index

    import os as _os

    # A/B knob: wider strides trade the seed-lookup pass (the expensive
    # kernel) for more rescue extensions; accuracy must be re-checked per
    # preset before changing LONG_READ_SEED_STRIDE defaults
    env_stride = _os.environ.get("PANTAX_TPU_SEED_STRIDE")
    if env_stride is not None:
        seed_stride = int(env_stride)

    buffer_on = _os.environ.get("PANTAX_TPU_READ_BUFFER") != "0"
    if _grp == "auto" and buffer_on:
        sub_rows = int(_os.environ.get(_UPLOAD_ROWS_ENV,
                                       _DEFAULT_UPLOAD_ROWS))
        rows_of = [-(-len(s) // chunk) for _, s in reads]
        if sum(rows_of) > 2 * sub_rows:
            # contiguous read sub-lists of <= sub_rows buffer rows each;
            # read-partitioning is exact (chunk vote/merge/rescue are all
            # per read), proven by the streamed-groups parity test
            subs: list[list[tuple[str, bytes]]] = []
            cur: list[tuple[str, bytes]] = []
            acc = 0
            # budget sub_rows - 1: put_read_group appends one slack row, so
            # an exactly-full sub would quantize past sub_rows into a
            # second (never-warmed) graph family
            for r, k in zip(reads, rows_of):
                if cur and acc + k > sub_rows - 1:
                    subs.append(cur)
                    cur, acc = [], 0
                cur.append(r)
                acc += k
            subs.append(cur)

            from concurrent.futures import ThreadPoolExecutor

            def prep(sub):
                enc_sub = [encode_seq(s) for _, s in sub]
                return aligner.put_read_group(
                    enc_sub, chunk, rows_min=sub_rows,
                ), enc_sub

            # two prep threads: parallel upload RPCs raise the tunnel's
            # aggregate bandwidth (A/B at 100k x 8kb: depth 1/2/3 = 24.2 /
            # 15.6 / 18.6s align in one window; 2 also beat 1 re-measured)
            depth = int(_os.environ.get("PANTAX_TPU_UPLOAD_DEPTH", "2"))
            parts = []
            with ThreadPoolExecutor(depth) as ex:
                futs = [ex.submit(prep, s) for s in subs[:depth]]
                for i, sub in enumerate(subs):
                    g, enc_sub = futs.pop(0).result()
                    if i + depth < len(subs):
                        futs.append(ex.submit(prep, subs[i + depth]))
                    parts.append(align_long_reads(
                        aligner, sub, chunk, batch_size, min_chunk_frac,
                        seed_stride, as_arrays, _grp=g, _enc=enc_sub,
                    ))
            if as_arrays:
                return concat_arrays(parts)
            return [rec for p in parts for rec in p]

    # cut into chunks — vectorized (one encode + one reshape per read; the
    # previous per-chunk encode loop dominated host wall at millions of
    # chunks).  Offsets are 0, chunk, 2*chunk, ... below max(len - chunk/2, 1)
    # and a chunk is kept iff it has >= 64 bases; since piece length shrinks
    # with offset, kept chunks are a prefix, so counts compose per read.
    R = len(reads)
    enc = _enc if _enc is not None else [encode_seq(seq) for _, seq in reads]
    rl = np.array([len(e) for e in enc], dtype=np.int64)
    span = np.maximum(rl - chunk // 2, 1)
    n_off = (span + chunk - 1) // chunk           # offsets generated
    n_fit = np.maximum((rl - 64) // chunk + 1, 0)  # offsets with >= 64 bases
    n_chunks = np.minimum(n_off, n_fit)
    first = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=first[1:])
    n = int(first[-1])
    n_pad = (n + batch_size - 1) // batch_size * batch_size
    read_idx = np.repeat(np.arange(R, dtype=np.int64), n_chunks)
    chunk_off = (np.arange(n, dtype=np.int64) - first[read_idx]) * chunk
    lens = np.zeros(n_pad, dtype=np.int64)
    lens[:n] = np.minimum(chunk, rl[read_idx] - chunk_off)

    # device-resident group buffer: bases upload ONCE, chunk batches ship
    # [B] byte offsets (seeded AND rescue passes gather from the same
    # buffer).  None -> per-batch codes-matrix fallback (multi-device mesh,
    # N-heavy groups, PANTAX_TPU_READ_BUFFER=0).
    if _grp != "auto":
        grp = _grp
    else:
        grp = aligner.put_read_group(enc, chunk) if buffer_on else None
    if grp is not None:
        base_all = grp["read_off"][read_idx] + chunk_off
        codes = None
    else:
        base_all = None
        codes = np.full((n_pad, chunk), 4, dtype=np.int8)
        for ri in range(R):
            k = int(n_chunks[ri])
            if k == 0:
                continue
            take = min(k * chunk, int(rl[ri]))
            block = codes[int(first[ri]) : int(first[ri]) + k].reshape(-1)
            block[:take] = enc[ri][:take]

    ts = np.zeros(n, dtype=np.int64)
    te = np.zeros(n, dtype=np.int64)
    matches = np.zeros(n, dtype=np.int64)
    mapq = np.zeros(n, dtype=np.int64)
    strand = np.zeros(n, dtype=np.int8)
    aligned = np.zeros(n, dtype=bool)

    # seed only every `seed_stride`-th chunk (plus each read's last): skipped
    # chunks are aligned by the rescue pass below at windows predicted from
    # their neighbours, trading the seed-lookup stage (the kernel's dominant
    # fixed cost) for a cheap banded extension (SURVEY §2.4: blockwise DP
    # with carried band state)
    if seed_stride > 1:
        within = chunk_off // chunk
        seeded_rows = (within % seed_stride == 0) | (
            within == n_chunks[read_idx] - 1
        )
        s_idx = np.flatnonzero(seeded_rows)
        ns = len(s_idx)
        ns_pad = (ns + batch_size - 1) // batch_size * batch_size
        s_lens = np.zeros(ns_pad, dtype=np.int64)
        s_lens[:ns] = lens[s_idx]
        if grp is not None:
            s_codes = None
            s_base = np.full(ns_pad, grp["pad_off"], dtype=np.int64)
            s_base[:ns] = base_all[s_idx]
        else:
            s_base = None
            s_codes = np.full((ns_pad, chunk), 4, dtype=np.int8)
            s_codes[:ns] = codes[s_idx]
    else:
        s_idx = None
        ns, s_codes, s_lens = n, codes, lens
        if grp is not None:
            s_base = np.full(n_pad, grp["pad_off"], dtype=np.int64)
            s_base[:n] = base_all[:n]

    # pipelined dispatch: keep several batches in flight while results
    # transfer (the serial align_codes loop left the device idle for a
    # dispatch round-trip per batch — 3x wall time on the tunnel); the
    # per-batch wire uploads (row offsets + lens, or the packed codes)
    # run ahead on a prefetch thread (utils.prefetched) so their RPCs
    # overlap compute instead of serializing between dispatches
    from ..utils import pipeline_depth, prefetched

    depth = pipeline_depth()
    pending: list[tuple[int, object]] = []

    def drain(entry):
        lo, dev = entry
        res = aligner.collect(dev)
        hi = min(lo + batch_size, ns)
        m = hi - lo
        if m <= 0:
            return
        rows = slice(lo, hi) if s_idx is None else s_idx[lo:hi]
        ts[rows] = res.text_start[:m]
        te[rows] = res.text_end[:m]
        matches[rows] = res.matches[:m]
        mapq[rows] = res.mapq[:m]
        strand[rows] = res.strand[:m]
        aligned[rows] = res.aligned[:m]

    def prep_seeded(lo):
        if grp is not None:
            return aligner.prep_codes_buf(
                grp, s_base[lo : lo + batch_size],
                s_lens[lo : lo + batch_size],
            )
        return aligner.prep_codes(s_codes[lo : lo + batch_size],
                                  s_lens[lo : lo + batch_size])

    def _touch(entry):
        # consumer-side async host copy of the oldest in-flight batch
        # (safe after dispatch returns; inline-with-launch hangs on axon)
        f = getattr(entry[1], "copy_to_host_async", None)
        if f is not None:
            f()

    for lo, wire in prefetched(prep_seeded, range(0, len(s_lens),
                                                  batch_size)):
        pending.append((lo, aligner.dispatch_prepped(wire)))
        _touch(pending[0])
        if len(pending) >= depth:
            drain(pending.pop(0))
    for entry in pending:
        drain(entry)

    hap_of = np.searchsorted(idx.hap_offsets, ts, side="right") - 1
    n_reads = len(reads)
    total_chunks = np.bincount(read_idx, minlength=n_reads)

    # majority (hap, strand) per read over aligned chunks — vectorized
    # groupby: count (read, key) pairs, then pick per read the key with the
    # highest count (smallest key on ties, matching np.unique+argmax order)
    a_sel = np.flatnonzero(aligned)
    H = len(idx.hap_names)
    out: list[GafRecord] = []
    if len(a_sel) == 0:
        return _empty_arrays() if as_arrays else out
    key = hap_of[a_sel] * 2 + strand[a_sel]
    pairs = read_idx[a_sel] * (2 * H) + key
    uniq_pairs, pair_counts = np.unique(pairs, return_counts=True)
    u_read = uniq_pairs // (2 * H)
    u_key = uniq_pairs % (2 * H)
    order = np.lexsort((u_key.max() - u_key if len(u_key) else u_key,
                        pair_counts, u_read))
    last_of_read = np.ones(len(order), dtype=bool)
    sr = u_read[order]
    last_of_read[:-1] = sr[:-1] != sr[1:]
    winners = order[last_of_read]
    win_key = np.full(n_reads, -1, dtype=np.int64)
    win_key[u_read[winners]] = u_key[winners]
    aligned_per_read = np.bincount(read_idx[a_sel], minlength=n_reads)

    # member chunks = aligned chunks matching the winner key AND collinear
    # with the read's consensus diagonal.  A spurious same-hap hit far from
    # the true locus would otherwise blow up the merged [min ts, max te]
    # interval and smear node coverage (VERDICT r1 item 5: chained anchors).
    # diagonal: fwd chunks satisfy ts - off ~ const; rev chunks ts + off ~
    # const (the read is reverse-complemented, so later query offsets map to
    # earlier text positions)
    member = aligned & (hap_of * 2 + strand == win_key[read_idx])
    m_sel0 = np.flatnonzero(member)
    mr0 = read_idx[m_sel0]
    diag = np.where(strand[m_sel0] == 0,
                    ts[m_sel0] - chunk_off[m_sel0],
                    ts[m_sel0] + chunk_off[m_sel0])
    # per-read median diagonal (vectorized groupby: sort by (read, diag))
    order_d = np.lexsort((diag, mr0))
    mr_sorted = mr0[order_d]
    diag_sorted = diag[order_d]
    cnt = np.bincount(mr_sorted, minlength=n_reads)
    grp_start = np.zeros(n_reads, dtype=np.int64)
    np.cumsum(cnt[:-1], out=grp_start[1:])
    med_idx = grp_start + cnt // 2
    med_diag = np.zeros(n_reads, dtype=np.int64)
    has = cnt > 0
    med_diag[has] = diag_sorted[np.minimum(med_idx[has], len(diag_sorted) - 1)]
    read_len_arr = np.array([len(s) for _, s in reads], dtype=np.int64)
    tol = np.maximum(128, read_len_arr // 32)
    collinear = np.abs(diag - med_diag[mr0]) <= tol[mr0]
    member[m_sel0[~collinear]] = False

    # --- blockwise rescue (carried-band DP): chunks that failed or skipped
    # seeding are re-extended at windows predicted from their NEAREST member
    # chunk's diagonal (drift between neighbours is a few bp, well inside
    # the DP band), then accepted only if they align, land on the winning
    # haplotype, and stay collinear.  Rescued chunks carry mapq 0 — a
    # predicted placement adds coverage evidence, not location evidence.
    m_sel1 = np.flatnonzero(member)
    if len(m_sel1):
        mr1 = read_idx[m_sel1]
        m_off1 = chunk_off[m_sel1]
        m_diag1 = np.where(strand[m_sel1] == 0,
                           ts[m_sel1] - m_off1, ts[m_sel1] + m_off1)
        has_member = np.zeros(n_reads, dtype=bool)
        has_member[mr1] = True
        cand = np.flatnonzero(
            ~member & (win_key[read_idx] >= 0) & has_member[read_idx]
        )
        if len(cand):
            # nearest member chunk of the same read, by query offset
            # (member rows are read-major offset-sorted)
            BIGK = np.int64(1) << 40
            mkey = mr1 * BIGK + m_off1
            pos = np.searchsorted(mkey, read_idx[cand] * BIGK + chunk_off[cand])
            left = np.maximum(pos - 1, 0)
            right = np.minimum(pos, len(mkey) - 1)
            lvalid = (pos > 0) & (mr1[left] == read_idx[cand])
            rvalid = mr1[right] == read_idx[cand]
            ldist = np.where(lvalid, chunk_off[cand] - m_off1[left], BIGK)
            rdist = np.where(rvalid, m_off1[right] - chunk_off[cand], BIGK)
            nb = np.where(ldist <= rdist, left, right)
            keep_c = lvalid | rvalid
            cand, nb = cand[keep_c], nb[keep_c]
        if len(cand):
            s_w = (win_key[read_idx[cand]] % 2).astype(np.int8)
            pred = np.where(s_w == 0,
                            m_diag1[nb] + chunk_off[cand],
                            m_diag1[nb] - chunk_off[cand])
            w0 = pred - aligner.cfg.extension_band
            nr = len(cand)
            nr_pad = (nr + batch_size - 1) // batch_size * batch_size
            if grp is not None:
                r_codes = None
                r_base = np.full(nr_pad, grp["pad_off"], dtype=np.int64)
                r_base[:nr] = base_all[cand]
            else:
                r_codes = np.full((nr_pad, chunk), 4, dtype=np.int8)
                r_codes[:nr] = codes[cand]
            r_lens = np.zeros(nr_pad, dtype=np.int64)
            r_lens[:nr] = lens[cand]
            r_w0 = np.zeros(nr_pad, dtype=np.int64)
            r_w0[:nr] = w0
            r_st = np.zeros(nr_pad, dtype=np.int8)
            r_st[:nr] = s_w

            pend2: list[tuple[int, object]] = []

            def drain2(entry):
                lo, dev = entry
                res = aligner.collect(dev)
                hi = min(lo + batch_size, nr)
                m = hi - lo
                if m <= 0:
                    return
                rows = cand[lo:hi]
                rts = res.text_start[:m].astype(np.int64)
                rte = res.text_end[:m].astype(np.int64)
                rst = r_st[lo:hi]
                rok = res.aligned[:m].copy()
                rdiag = np.where(rst == 0, rts - chunk_off[rows],
                                 rts + chunk_off[rows])
                rr = read_idx[rows]
                rok &= np.abs(rdiag - med_diag[rr]) <= tol[rr]
                rhap = np.searchsorted(idx.hap_offsets, rts,
                                       side="right") - 1
                rok &= rhap * 2 + rst == win_key[rr]
                acc = rows[rok]
                ts[acc] = rts[rok]
                te[acc] = rte[rok]
                matches[acc] = res.matches[:m][rok]
                mapq[acc] = 0
                strand[acc] = rst[rok]
                aligned[acc] = True
                member[acc] = True

            def prep_rescue(lo):
                if grp is not None:
                    return aligner.prep_extend_buf(
                        grp, r_base[lo : lo + batch_size],
                        r_lens[lo : lo + batch_size],
                        r_w0[lo : lo + batch_size],
                        r_st[lo : lo + batch_size],
                    )
                return aligner.prep_extend(
                    r_codes[lo : lo + batch_size],
                    r_lens[lo : lo + batch_size],
                    r_w0[lo : lo + batch_size],
                    r_st[lo : lo + batch_size],
                )

            for lo, wire in prefetched(prep_rescue,
                                       range(0, nr_pad, batch_size)):
                pend2.append((lo, aligner.dispatch_extend_prepped(wire)))
                _touch(pend2[0])
                if len(pend2) >= depth:
                    drain2(pend2.pop(0))
            for entry in pend2:
                drain2(entry)
            aligned_per_read = np.bincount(
                read_idx[aligned], minlength=n_reads
            )

    m_sel = np.flatnonzero(member)
    mr = read_idx[m_sel]
    BIG = np.int64(2**62)
    mts = np.full(n_reads, BIG)
    np.minimum.at(mts, mr, ts[m_sel])
    mte = np.full(n_reads, -BIG)
    np.maximum.at(mte, mr, te[m_sel])
    m_sum = np.zeros(n_reads, dtype=np.int64)
    np.add.at(m_sum, mr, matches[m_sel])
    q_sum = np.zeros(n_reads, dtype=np.int64)
    np.add.at(q_sum, mr, mapq[m_sel])
    q_off_min = np.full(n_reads, BIG)
    np.minimum.at(q_off_min, mr, chunk_off[m_sel])
    q_off_max = np.full(n_reads, -BIG)
    np.maximum.at(q_off_max, mr, chunk_off[m_sel])
    member_count = np.bincount(mr, minlength=n_reads)

    # when membership is strong, extend the merged interval to the full read
    # span inferred from the member chunks' query offsets — chunks that
    # failed to align at the read edges are alignment dropouts, not absence
    # of the read (GraphAligner would align the whole read), and the missing
    # span costs exactly the trio coverage that strain detection keys on
    member_frac = member_count / np.maximum(total_chunks, 1)
    strong = member_frac >= 0.75
    q_end_m = np.minimum(q_off_max + chunk, read_len_arr)
    missing_head = np.maximum(q_off_min, 0)
    missing_tail = np.maximum(read_len_arr - q_end_m, 0)
    is_rev = win_key % 2 == 1
    ext_lo = np.where(is_rev, missing_tail, missing_head)
    ext_hi = np.where(is_rev, missing_head, missing_tail)
    mts = np.where(strong, mts - ext_lo, mts)
    mte = np.where(strong, mte + ext_hi, mte)

    # clip to the winning haplotype's span (ragged merges near separators)
    win_hap = np.maximum(win_key // 2, 0)
    h0 = idx.hap_offsets[win_hap]
    h1 = idx.hap_offsets[np.minimum(win_hap + 1, len(idx.hap_names))] - 1
    mts = np.maximum(mts, h0)
    mte = np.minimum(mte, h1)

    emit = (
        (win_key >= 0)
        & (aligned_per_read >= np.maximum(min_chunk_frac * total_chunks, 1))
        & (mte > mts)
    )
    e_sel = np.flatnonzero(emit)
    if len(e_sel) == 0:
        return _empty_arrays() if as_arrays else out
    if as_arrays:
        # vectorized arrays output: merged text intervals + evidence mapq;
        # apply the long-read best-alignment filter thresholds inline
        # (mapq > 20, query span > 1000 — gaf_filter.rs:44-97)
        rl_e = read_len_arr[e_sel]
        qs = np.where(strong[e_sel], 0, q_off_min[e_sel])
        qe = np.where(strong[e_sel], rl_e,
                      np.minimum(q_off_max[e_sel] + chunk, rl_e))
        mq = np.minimum(q_sum[e_sel], 60)
        keep = (mq > 20) & ((qe - qs) > 1000)
        k = e_sel[keep]
        from ..fastpath import AlignmentArrays

        return AlignmentArrays(
            read_ids=[reads[i][0] for i in k],
            ts=mts[k].astype(np.int64),
            te=mte[k].astype(np.int64),
            mapq=np.minimum(q_sum[k], 60).astype(np.int64),
            read_len=read_len_arr[k].astype(np.int64),
        )
    i0, i1, off = idx.project(mts[e_sel], mte[e_sel])
    for j, ri in enumerate(e_sel):
        read_id, seq = reads[ri]
        path_len = int(idx.tlen[int(i0[j]) : int(i1[j]) + 1].sum())
        span = int(mte[ri] - mts[ri])
        if strong[ri]:
            q_start, q_end = 0, len(seq)
        else:
            q_start = int(q_off_min[ri])
            q_end = min(int(q_off_max[ri]) + chunk, len(seq))
        out.append(
            GafRecord(
                read_id=read_id,
                read_len=len(seq),
                query_start=q_start,
                query_end=q_end,
                strand="+" if win_key[ri] % 2 == 0 else "-",
                path=idx.path_str(int(i0[j]), int(i1[j])),
                path_len=path_len,
                path_start=int(off[j]),
                path_end=int(off[j]) + span,
                matches=int(m_sum[ri]),
                block_len=q_end - q_start,
                # chunks are independent location evidence: their score gaps
                # (per-chunk mapq) add, capped at 60 — a read with one
                # confident chunk and many ambiguous ones keeps its evidence
                # instead of having it averaged away
                mapq=int(min(q_sum[ri], 60)),
                identity=int(m_sum[ri]) / max(q_end - q_start, 1),
            )
        )
    return out
