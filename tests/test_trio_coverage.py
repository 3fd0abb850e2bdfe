"""Trio index + coverage against a literal (loop-based) implementation of the
reference semantics (profile.rs:658-1026)."""
import numpy as np
import pytest

from pantax_tpu.graph.trio import build_trio_index, path_windows
from pantax_tpu.profile.coverage import node_abundances
from pantax_tpu.profile.records import ReadRecord


# ---------------------------------------------------------------------------
# oracle implementations (straight loops, written from the spec)
# ---------------------------------------------------------------------------
def oracle_trio(nodes_len, paths):
    counts = {}
    per_hap = {}
    names = sorted(paths)
    for name in names:
        p = list(paths[name])
        trios = []
        for i in range(len(p) - 2):
            w = (p[i], p[i + 1], p[i + 2])
            if w[0] > w[2]:
                w = (w[2], w[1], w[0])
            trios.append(w)
            counts[w] = counts.get(w, 0) + 1
        per_hap[name] = trios
    unique = sorted([t for t, c in counts.items() if c == 1])
    idx = {t: i for i, t in enumerate(unique)}
    lens = [nodes_len[a] + nodes_len[b] + nodes_len[c] for a, b, c in unique]
    m = np.zeros((len(unique), len(names)), dtype=np.uint8)
    for h, name in enumerate(names):
        for t in per_hap[name]:
            if t in idx:
                m[idx[t], h] = 1
    return unique, np.array(lens, dtype=np.int64), m


def oracle_coverage(reads, nodes_len, unique, range_start):
    N = len(nodes_len)
    trio_idx = {t: i for i, t in enumerate(unique)}
    bases = np.zeros(N)
    trio_bases = np.zeros(len(unique))
    bitmap = [np.zeros(l, dtype=np.uint8) for l in nodes_len]
    for r in reads:
        nodes = [int(n) - range_start for n in r.nodes]
        if not nodes:
            continue
        target_len = r.read_end - r.read_start
        seen = 0
        rn_len = {n: 0 for n in nodes}
        undup = set()
        if len(nodes) == 1:
            n = nodes[0]
            if target_len < 0:
                continue
            rn_len[n] += target_len
            bases[n] += target_len
            if r.read_start < r.read_end and r.read_end <= nodes_len[n]:
                bitmap[n][r.read_start : r.read_end] = 1
        else:
            for i, n in enumerate(nodes):
                nl = nodes_len[n]
                if i == 0:
                    assert r.read_start <= nl
                    aln, s = nl - r.read_start, r.read_start
                elif i == len(nodes) - 1:
                    if target_len < seen:
                        target_len = seen
                    aln, s = target_len - seen, 0
                else:
                    aln, s = nl, 0
                bitmap[n][s : min(s + aln, nl)] = 1
                seen += aln
                if n not in undup:
                    undup.add(n)
                    rn_len[n] += aln
                    bases[n] += aln
        if len(nodes) < 3:
            continue
        for i in range(len(nodes) - 2):
            w = (nodes[i], nodes[i + 1], nodes[i + 2])
            s = sum(rn_len.get(n, 0) for n in w)
            j = trio_idx.get(w, trio_idx.get((w[2], w[1], w[0])))
            if j is not None:
                trio_bases[j] += s
    node_ab = bases / np.maximum(nodes_len, 1)
    lens = np.array(
        [nodes_len[a] + nodes_len[b] + nodes_len[c] for a, b, c in unique]
    )
    trio_ab = trio_bases / np.maximum(lens, 1) if len(unique) else np.zeros(0)
    base_cov = np.array([int(b.sum()) for b in bitmap])
    return node_ab, trio_ab, base_cov


def random_case(rng, n_nodes=30, n_paths=3, n_reads=40, max_path=8):
    nodes_len = rng.integers(5, 60, size=n_nodes).astype(np.int64)
    paths = {}
    for p in range(n_paths):
        ln = rng.integers(5, n_nodes)
        walk = np.sort(rng.choice(n_nodes, size=ln, replace=False))
        # occasionally revisit a node to exercise dedup
        if ln > 3 and rng.random() < 0.5:
            walk = np.concatenate([walk, walk[:2]])
        paths[f"hap{p}"] = walk.astype(np.int64)
    reads = []
    range_start = 7  # arbitrary global offset
    for i in range(n_reads):
        hap = paths[f"hap{rng.integers(n_paths)}"]
        ln = int(rng.integers(1, min(max_path, len(hap)) + 1))
        s = int(rng.integers(0, len(hap) - ln + 1))
        sub = hap[s : s + ln]
        first_len = int(nodes_len[sub[0]])
        read_start = int(rng.integers(0, first_len + 1))
        total = int(nodes_len[sub].sum())
        read_end = int(rng.integers(read_start, total + 1))
        reads.append(
            ReadRecord(
                read_id=f"r{i}",
                nodes=sub + range_start,
                read_path_len=total,
                read_start=read_start,
                read_end=read_end,
                species="s",
            )
        )
    return nodes_len, paths, reads, range_start


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_trio_index_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    nodes_len, paths, _, _ = random_case(rng)
    unique, lens, m = oracle_trio(nodes_len, paths)
    ti = build_trio_index(nodes_len, paths)
    assert ti.num_unique == len(unique)
    assert [tuple(t) for t in ti.trio_nodes] == unique
    np.testing.assert_array_equal(ti.trio_len, lens)
    np.testing.assert_array_equal(ti.hap_matrix, m)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_coverage_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    nodes_len, paths, reads, range_start = random_case(rng)
    unique, _, _ = oracle_trio(nodes_len, paths)
    ti = build_trio_index(nodes_len, paths)
    node_ab, trio_ab, base_cov = node_abundances(reads, nodes_len, ti, range_start)
    o_node, o_trio, o_base = oracle_coverage(reads, nodes_len, unique, range_start)
    np.testing.assert_allclose(node_ab, o_node, atol=1e-9)
    np.testing.assert_allclose(trio_ab, o_trio, atol=1e-9)
    np.testing.assert_array_equal(base_cov, o_base)


def test_single_node_negative_span_dropped():
    nodes_len = np.array([100], dtype=np.int64)
    ti = build_trio_index(nodes_len, {"h": np.array([0])})
    reads = [
        ReadRecord("r0", np.array([1]), 100, 50, 20, "s"),  # negative span
        ReadRecord("r1", np.array([1]), 100, 10, 30, "s"),
    ]
    node_ab, _, base_cov = node_abundances(reads, nodes_len, ti, 1)
    assert node_ab[0] == pytest.approx(20 / 100)
    assert base_cov[0] == 20


def test_single_node_out_of_bounds_bitmap_skipped():
    # read_end beyond the node: bases still credited, bitmap untouched
    nodes_len = np.array([50], dtype=np.int64)
    ti = build_trio_index(nodes_len, {"h": np.array([0])})
    reads = [ReadRecord("r0", np.array([1]), 100, 10, 60, "s")]
    node_ab, _, base_cov = node_abundances(reads, nodes_len, ti, 1)
    assert node_ab[0] == pytest.approx(50 / 50)
    assert base_cov[0] == 0


def test_trio_reverse_orientation_match():
    nodes_len = np.array([10, 10, 10, 10], dtype=np.int64)
    paths = {"h1": np.array([0, 1, 2, 3]), "h2": np.array([0, 2, 3])}
    ti = build_trio_index(nodes_len, paths)
    # read walks hap1 backwards: windows appear reversed
    reads = [ReadRecord("r0", np.array([4, 3, 2, 1]), 40, 0, 40, "s")]
    _, trio_ab, _ = node_abundances(reads, nodes_len, ti, 1)
    assert (trio_ab > 0).any()


def test_path_windows_short():
    assert path_windows(np.array([1, 2])).shape == (0, 3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_coverage_matches_host(seed):
    """The jitted device coverage path reproduces the host implementation."""
    from pantax_tpu.ops.coverage_device import node_abundances_device
    from pantax_tpu.profile.coverage import pack_reads

    rng = np.random.default_rng(300 + seed)
    nodes_len, paths, reads, range_start = random_case(rng)
    ti = build_trio_index(nodes_len, paths)
    h_node, h_trio, h_base = node_abundances(reads, nodes_len, ti, range_start)
    packed = pack_reads(reads, range_start)
    d_node, d_trio, d_base = node_abundances_device(packed, nodes_len, ti)
    np.testing.assert_allclose(d_node, h_node, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(d_trio, h_trio, rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(d_base, h_base)


def test_device_coverage_no_trios():
    from pantax_tpu.ops.coverage_device import node_abundances_device
    from pantax_tpu.profile.coverage import pack_reads

    nodes_len = np.array([100, 50], dtype=np.int64)
    ti = build_trio_index(nodes_len, {"h": np.array([0, 1])})
    reads = [ReadRecord("r", np.array([1, 2]), 150, 10, 120, "s")]
    d_node, d_trio, d_base = node_abundances_device(
        pack_reads(reads, 1), nodes_len, ti
    )
    h_node, h_trio, h_base = node_abundances(reads, nodes_len, ti, 1)
    np.testing.assert_allclose(d_node, h_node)
    np.testing.assert_array_equal(d_base, h_base)
