"""Anchor-partition pangenome constructor for multi-genome species.

Replaces the reference's external pggb/cactus pipeline
(/root/reference/pantax/src/task_scheduling.rs:404-500) with an in-process,
deterministic construction designed for strain-level genomes (ANI >= ~95):

  1. find *universal unique anchors* — k-mers occurring exactly once in every
     genome of the species;
  2. enforce collinearity by keeping, per genome, a longest-increasing
     subsequence of anchor positions (orientation-preserving; structural
     rearrangements degrade into longer segments, never into a broken graph);
  3. cut every genome at its anchor start positions; between consecutive
     anchors each genome contributes one segment;
  4. collapse identical segment sequences within a slot into shared nodes;
     distinct sequences become parallel bubble nodes; every node is chopped
     into <= chunk_size pieces (matching the eq-1 chunking granularity,
     /root/reference/pantax/src/constants.rs:3);
  5. haplotype paths spell each input genome exactly.

The output is a :class:`SpeciesGraph` whose unique trio nodes discriminate
strains exactly as pggb-built graphs do in the reference pipeline.
"""
from __future__ import annotations

from bisect import bisect_left

import numpy as np

from .core import SpeciesGraph

DEFAULT_K = 31
# Pangenome nodes are chopped finer than the eq-1 chain graphs (1024) so that
# short reads span >= 3 nodes and produce trio-node coverage — the strain
# filters key on it (profile.rs:1080-1227).  pggb graphs get this granularity
# from base-level alignment; the anchor-partition graph gets it by chunking.
DEFAULT_PAN_CHUNK = 64


def _unique_kmers(seq: bytes, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(sorted keys, positions) of k-mers occurring exactly once.

    Native single-pass scan when available (utils/native.py); Python dict
    fallback otherwise.  N-containing k-mers are excluded."""
    from ..align.encode import encode_seq

    try:
        from ..utils.native import unique_kmer_positions_native

        res = unique_kmer_positions_native(encode_seq(seq), k)
        if res is not None:
            return res
    except Exception:  # pragma: no cover - fallback path
        pass
    # Mirror the native last_invalid logic: skip windows containing any
    # ambiguity code (code 4 covers N plus lowercase/IUPAC bases), not just
    # uppercase b'N' — code 4 would overflow the 2-bit key shift and make
    # keys non-injective (spurious cross-genome anchor matches).
    codes = encode_seq(seq)
    invalid = np.flatnonzero(codes == 4)
    bad = np.zeros(max(len(seq) - k + 1, 0), dtype=bool)
    for p in invalid:
        bad[max(p - k + 1, 0) : p + 1] = True
    seen: dict[bytes, int] = {}
    dup: set[bytes] = set()
    for i in range(len(seq) - k + 1):
        if bad[i]:
            continue
        kmer = seq[i : i + k]
        if kmer in dup:
            continue
        if kmer in seen:
            del seen[kmer]
            dup.add(kmer)
        else:
            seen[kmer] = i
    # pack to 2-bit keys for a sorted representation matching the native path
    keys = np.empty(len(seen), dtype=np.uint64)
    poss = np.empty(len(seen), dtype=np.int64)
    for j, (kmer, p) in enumerate(seen.items()):
        key = np.uint64(0)
        for c in codes[p : p + k]:
            key = (key << np.uint64(2)) | np.uint64(c)
        keys[j] = key
        poss[j] = p
    order = np.argsort(keys)
    return keys[order], poss[order]


def _lis_indices(values: list[int]) -> list[int]:
    """Indices of a longest strictly-increasing subsequence (O(n log n))."""
    tails: list[int] = []          # values
    tails_idx: list[int] = []      # index of tail element
    prev = [-1] * len(values)
    for i, v in enumerate(values):
        pos = bisect_left(tails, v)
        if pos == len(tails):
            tails.append(v)
            tails_idx.append(i)
        else:
            tails[pos] = v
            tails_idx[pos] = i
        prev[i] = tails_idx[pos - 1] if pos > 0 else -1
    out: list[int] = []
    i = tails_idx[-1] if tails_idx else -1
    while i >= 0:
        out.append(i)
        i = prev[i]
    return out[::-1]


def find_universal_anchors(seqs: list[bytes], k: int = DEFAULT_K) -> list[list[int]]:
    """Anchor positions per genome: k-mers unique in every genome, made
    collinear (LIS per genome, anchored to genome 0 order), then thinned so
    consecutive anchors don't overlap (>= k apart in every genome)."""
    uniq = [_unique_kmers(s, k) for s in seqs]
    common = uniq[0][0]
    for keys, _ in uniq[1:]:
        common = np.intersect1d(common, keys, assume_unique=True)
    if len(common) == 0:
        return [[] for _ in seqs]
    # positions of the common anchors in every genome
    pos = []
    for keys, poss in uniq:
        idx = np.searchsorted(keys, common)
        pos.append(poss[idx])
    order0 = np.argsort(pos[0], kind="stable")
    pos = [p[order0] for p in pos]
    keep_idx = np.arange(len(common))
    for g in range(1, len(seqs)):
        keep = _lis_indices(pos[g][keep_idx].tolist())
        keep_idx = keep_idx[keep]
        if len(keep_idx) == 0:
            break
    # thin overlapping anchors
    thinned: list[int] = []
    last = np.full(len(seqs), -(10**18), dtype=np.int64)
    for i in keep_idx:
        cur = np.array([pos[g][i] for g in range(len(seqs))])
        if (cur >= last + k).all():
            thinned.append(int(i))
            last = cur
    return [[int(pos[g][i]) for i in thinned] for g in range(len(seqs))]


def build_pangenome_graph(
    genomes: dict[str, bytes],
    k: int = DEFAULT_K,
    chunk_size: int = DEFAULT_PAN_CHUNK,
) -> SpeciesGraph:
    """Build a variation graph from strain genomes of one species.

    genomes: hap_id -> full genome sequence (contigs pre-concatenated; the
    reference likewise merges chromosomes of a haplotype into one path,
    zip.rs:154-158).
    """
    names = sorted(genomes)
    seqs = [genomes[n] for n in names]
    if len(names) < 2:
        raise ValueError("pangenome construction needs >= 2 genomes")

    anchor_pos = find_universal_anchors(seqs, k)
    n_anchors = len(anchor_pos[0]) if anchor_pos else 0

    node_seqs: list[bytes] = []
    node_ids: dict[bytes, list[int]] = {}  # segment seq -> its chunk node ids
    paths: dict[str, list[int]] = {n: [] for n in names}

    def nodes_for_segment(segment: bytes) -> list[int]:
        ids = node_ids.get(segment)
        if ids is None:
            ids = []
            for off in range(0, len(segment), chunk_size):
                ids.append(len(node_seqs))
                node_seqs.append(segment[off : off + chunk_size])
            node_ids[segment] = ids
        return ids

    # slot boundaries per genome: [0, a_0, a_1, ..., len]
    for slot in range(n_anchors + 1):
        # per-slot map so identical segments collapse only within a slot —
        # keeps node order coordinate-sorted and paths collinear
        node_ids = {}
        for g, name in enumerate(names):
            lo = 0 if slot == 0 else anchor_pos[g][slot - 1]
            hi = len(seqs[g]) if slot == n_anchors else anchor_pos[g][slot]
            segment = seqs[g][lo:hi]
            if not segment:
                continue
            paths[name].extend(nodes_for_segment(segment))

    nodes_len = np.array([len(s) for s in node_seqs], dtype=np.int64)
    return SpeciesGraph.from_paths(
        nodes_len,
        {n: np.array(p, dtype=np.int64) for n, p in paths.items()},
        node_seqs,
    )
