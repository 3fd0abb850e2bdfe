"""Anchor-partition pangenome constructor on synthetic strain genomes."""
import numpy as np
import pytest

from pantax_tpu.graph.pangenome import build_pangenome_graph, find_universal_anchors
from pantax_tpu.graph.trio import build_trio_index


def make_strains(rng, length=20000, n_strains=3, snp_rate=0.005, indel_rate=0.0005):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, size=length)]
    strains = {}
    for s in range(n_strains):
        g = ref.copy()
        snps = rng.random(length) < snp_rate
        g[snps] = bases[rng.integers(0, 4, size=int(snps.sum()))]
        seq = g.tobytes()
        # a few deletions
        dels = np.sort(rng.choice(length - 100, size=int(length * indel_rate), replace=False))
        out = bytearray()
        prev = 0
        for d in dels:
            if d < prev:
                continue
            out += seq[prev:d]
            prev = d + int(rng.integers(1, 30))
        out += seq[prev:]
        strains[f"GCF_{s}.1"] = bytes(out)
    return strains


def test_paths_spell_genomes_and_share_nodes():
    rng = np.random.default_rng(0)
    strains = make_strains(rng)
    g = build_pangenome_graph(strains, chunk_size=256)
    assert g.num_paths == 3
    for hi, name in enumerate(g.path_names):
        assert g.path_seq(hi).tobytes() == strains[name]
    counts = np.zeros(g.num_nodes, dtype=int)
    for hi in range(3):
        counts[np.unique(g.path(hi))] += 1
    shared_len = g.nodes_len[counts == 3].sum()
    total_len = max(g.nodes_len[np.unique(g.path(0))].sum(), 1)
    assert shared_len > 0.5 * total_len


def test_unique_trios_discriminate_strains():
    rng = np.random.default_rng(1)
    strains = make_strains(rng, n_strains=2)
    g = build_pangenome_graph(strains, chunk_size=256)
    ti = build_trio_index(g.nodes_len, g.paths_dict())
    assert ti.num_unique > 0
    # each strain owns some unique trios
    owned = ti.hap_matrix.sum(axis=0)
    assert (owned > 0).all()


def test_anchor_collinearity():
    rng = np.random.default_rng(2)
    strains = make_strains(rng, length=5000, n_strains=3)
    seqs = [strains[k] for k in sorted(strains)]
    anchors = find_universal_anchors(seqs)
    assert len(anchors[0]) > 0
    for pos in anchors:
        assert all(b - a >= 31 for a, b in zip(pos[:-1], pos[1:]))


def test_identical_genomes_single_chain():
    seq = np.random.default_rng(3).integers(0, 4, size=5000)
    seq = np.frombuffer(b"ACGT", dtype=np.uint8)[seq].tobytes()
    g = build_pangenome_graph({"a_1": seq, "b_1": seq}, chunk_size=512)
    # fully collapsed: both paths identical
    assert np.array_equal(g.path(0), g.path(1))


def test_rejects_single_genome():
    with pytest.raises(ValueError):
        build_pangenome_graph({"a_1": b"ACGT" * 100})


def _rc(seq: bytes) -> bytes:
    from pantax_tpu.graph.pangenome import _rc_seq

    return _rc_seq(seq)


def _shared_frac(g) -> float:
    counts = np.zeros(g.num_nodes, dtype=int)
    for hi in range(g.num_paths):
        counts[np.unique(g.path(hi))] += 1
    shared_len = g.nodes_len[counts == g.num_paths].sum()
    return shared_len / max(g.nodes_len[np.unique(g.path(0))].sum(), 1)


def test_rc_keys_matches_direct_encoding():
    from pantax_tpu.align.encode import encode_seq
    from pantax_tpu.graph.pangenome import _rc_keys

    rng = np.random.default_rng(9)
    k = 31
    for _ in range(20):
        kmer = np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, size=k)
        ].tobytes()

        def pack(s):
            key = np.uint64(0)
            for c in encode_seq(s):
                key = (key << np.uint64(2)) | np.uint64(c)
            return key

        assert _rc_keys(np.array([pack(kmer)]), k)[0] == pack(_rc(kmer))


def test_opposite_strand_assembly_shares_nodes():
    """A genome assembled on the opposite strand must share nodes (not
    degrade to parallel chains) and still be spelled exactly by its path."""
    rng = np.random.default_rng(7)
    strains = make_strains(rng, n_strains=2)
    flipped = {k: (_rc(v) if k == "GCF_1.1" else v) for k, v in strains.items()}
    g = build_pangenome_graph(flipped, chunk_size=256)
    for i, name in enumerate(g.path_names):
        assert g.path_seq(i).tobytes() == flipped[name], name
    assert _shared_frac(g) > 0.5


def test_segmental_inversion_shares_nodes():
    """An exact inverted block reuses the forward block's nodes with reverse
    orientation instead of duplicating them."""
    rng = np.random.default_rng(8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, size=20000)].tobytes()
    binv = ref[:8000] + _rc(ref[8000:12000]) + ref[12000:]
    g = build_pangenome_graph({"GCF_0.1": ref, "GCF_1.1": binv}, chunk_size=256)
    for i, name in enumerate(g.path_names):
        want = ref if name == "GCF_0.1" else binv
        assert g.path_seq(i).tobytes() == want, name
    assert g.path_strands is not None and g.path_strands.any(), (
        "the inverted block must traverse shared nodes in reverse"
    )
    assert _shared_frac(g) > 0.9


def test_snp_bearing_inversion_shares_nodes():
    """An inverted block carrying substitutions still shares the matching
    chunks of the forward block reverse-oriented; only the SNP-bearing
    chunks become parallel bubble nodes (PARITY known-gap closure)."""
    rng = np.random.default_rng(12)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = bases[rng.integers(0, 4, size=20000)].tobytes()
    inv = bytearray(_rc(ref[8000:12000]))
    snp_at = rng.choice(4000, size=5, replace=False)
    for p in snp_at:
        old = inv[p]
        inv[p] = next(c for c in b"ACGT" if c != old)
    binv = ref[:8000] + bytes(inv) + ref[12000:]
    g = build_pangenome_graph({"GCF_0.1": ref, "GCF_1.1": binv}, chunk_size=256)
    for i, name in enumerate(g.path_names):
        want = ref if name == "GCF_0.1" else binv
        assert g.path_seq(i).tobytes() == want, name
    assert g.path_strands is not None and g.path_strands.any(), (
        "SNP-free chunks of the inverted block must be shared in reverse"
    )
    # 5 SNPs hit at most 5 of the ~16 inverted 256bp chunks; everything else
    # (flanks + clean inverted chunks) is shared — the old 'own' fallback
    # duplicated the whole 4kb block and capped the fraction at 0.8
    assert _shared_frac(g) > 0.9
