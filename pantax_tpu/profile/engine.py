"""Per-species strain profiling engine: coverage → filters → two-stage PAO.

Parity: /root/reference/pantax/src/profile.rs —
  optimize_otu      profile.rs:2884-3026
  strain_profiling  profile.rs:3291-3323
  (the PAO model itself: gurobi_opt profile.rs:1297-1511; see pao.py)
"""
from __future__ import annotations

import logging

import numpy as np

from dataclasses import dataclass

from ..config import ProfilingConfig
from ..graph.core import SpeciesGraph, SpeciesRange
from ..graph.trio import build_trio_index
from .coverage import node_abundances
from .filters import HapMetrics, OtuState, first_filter_paths, second_filter_paths
from .pao import sample_valid_nodes, solve_pao_batch
from .records import ReadRecord
from .report import abundance_constraint
from .species import SpeciesProfile

log = logging.getLogger(__name__)


def _coeff_matrix(
    paths: dict[str, np.ndarray], possible_idx: list[int], nvert: int
) -> np.ndarray:
    """Binary node-membership matrix [nvert, len(possible_idx)]
    (profile.rs:1333-1343)."""
    names = sorted(paths)
    A = np.zeros((nvert, len(possible_idx)), dtype=np.float32)
    for j, path_i in enumerate(possible_idx):
        A[paths[names[path_i]], j] = 1.0
    return A


def optimize_otu(
    cfg: ProfilingConfig,
    otu: str,
    graph: SpeciesGraph,
    range_start: int,
    range_end: int,
    reads: list[ReadRecord],
) -> list[HapMetrics]:
    state, job = prepare_otu(cfg, otu, graph, range_start, range_end, reads)
    if job is not None:
        finish_two_stage([job], cfg)
    return state.hap_metrics


def prepare_otu(
    cfg: ProfilingConfig,
    otu: str,
    graph: SpeciesGraph,
    range_start: int,
    range_end: int,
    reads: list[ReadRecord],
) -> tuple[OtuState, "OtuSolveJob | None"]:
    """Coverage + first filter + solve preparation for one species; the PAO
    solves themselves run in `finish_two_stage` (batched across species by
    `strain_profiling`)."""
    paths = graph.paths_dict()
    trio_index = build_trio_index(graph.nodes_len, paths)
    use_device = cfg.coverage == "device" or (
        cfg.coverage == "auto" and len(reads) >= cfg.auto_device_reads
    )
    if use_device:
        from ..ops.coverage_device import node_abundances_device
        from .coverage import pack_reads

        node_abund, trio_abund, node_base_cov = node_abundances_device(
            pack_reads(reads, range_start), graph.nodes_len, trio_index
        )
    else:
        node_abund, trio_abund, node_base_cov = node_abundances(
            reads, graph.nodes_len, trio_index, range_start
        )
    nvert = range_end - (range_start - 1)
    if nvert != graph.num_nodes:
        log.warning(
            "%s: species range size %d != graph nodes %d", otu, nvert, graph.num_nodes
        )
    nvert = graph.num_nodes
    node_abund_opt = np.where(node_abund > cfg.min_depth, node_abund, 0.0)

    state = OtuState(otu=otu, hap_metrics=[HapMetrics() for _ in paths])
    first_filter_paths(
        state, paths, trio_index.hap_matrix, trio_abund, node_abund_opt, cfg
    )
    job = None
    if state.possible_paths_idx:
        job = prepare_two_stage(
            state, nvert, paths, node_abund, node_base_cov, graph.nodes_len, cfg
        )
    return state, job


@dataclass
class OtuSolveJob:
    """A species' prepared PAO instance, awaiting the (possibly batched)
    two-stage solve."""

    state: OtuState
    A: np.ndarray
    b: np.ndarray
    ub: float


def prepare_two_stage(
    state: OtuState,
    nvert: int,
    paths: dict[str, np.ndarray],
    node_abundance_vec: np.ndarray,
    node_base_cov: np.ndarray,
    node_len: np.ndarray,
    cfg: ProfilingConfig,
) -> OtuSolveJob:
    """Everything up to the first PAO solve (profile.rs:1297-1361): coeff
    matrix, per-path base-coverage ratios, node subsampling."""
    possible = state.possible_paths_idx
    max_val = float(np.max(node_abundance_vec)) if len(node_abundance_vec) else 0.0
    ub = 1.05 * max_val

    coeff = _coeff_matrix(paths, possible, nvert)

    # per-path base-coverage ratio over ALL nodes (profile.rs:1344-1361)
    path_cov = node_base_cov.astype(np.float32) @ coeff
    path_len = node_len.astype(np.float32) @ coeff
    with np.errstate(divide="ignore", invalid="ignore"):
        path_ratio = np.where(path_len > 0, path_cov / path_len, 0.0)
    for j, path_i in enumerate(possible):
        state.hap_metrics[path_i].path_cov_ratio = float(path_ratio[j])

    valid_nodes = np.flatnonzero(node_abundance_vec > 0.0)
    rows = sample_valid_nodes(valid_nodes, cfg.sample_nodes, cfg.sample_test)
    return OtuSolveJob(state=state, A=coeff[rows], b=node_abundance_vec[rows], ub=ub)


def finish_two_stage(jobs: list[OtuSolveJob], cfg: ProfilingConfig) -> None:
    """The two PAO solves around the second filter (profile.rs:1363-1511),
    batched across species: all first solves in one `solve_pao_batch` call,
    then the divergence filter, then all second solves (paths pinned to zero
    via ub=0, profile.rs:1482-1510)."""
    firsts = solve_pao_batch([(j.A, j.b, j.ub, None) for j in jobs], cfg.solver)
    for job, first in zip(jobs, firsts):
        state = job.state
        for j, path_i in enumerate(state.possible_paths_idx):
            state.hap_metrics[path_i].first_sol = float(first.x[j])
        second_filter_paths(state, cfg)

    second_jobs = [job for job in jobs if job.state.second_opt]
    if not second_jobs:
        return
    pins = [
        np.array(
            [
                path_i not in job.state.second_possible_paths_idx
                for path_i in job.state.possible_paths_idx
            ]
        )
        for job in second_jobs
    ]
    seconds = solve_pao_batch(
        [(j.A, j.b, j.ub, pin) for j, pin in zip(second_jobs, pins)], cfg.solver
    )
    for job, second in zip(second_jobs, seconds):
        state = job.state
        for j, path_i in enumerate(state.possible_paths_idx):
            if path_i in state.second_possible_paths_idx:
                state.hap_metrics[path_i].second_sol = float(second.x[j])


def _solve_two_stage(
    state: OtuState,
    nvert: int,
    paths: dict[str, np.ndarray],
    node_abundance_vec: np.ndarray,
    node_base_cov: np.ndarray,
    node_len: np.ndarray,
    cfg: ProfilingConfig,
) -> None:
    """Serial prepare+finish for one species (tests / single-species calls)."""
    job = prepare_two_stage(
        state, nvert, paths, node_abundance_vec, node_base_cov, node_len, cfg
    )
    finish_two_stage([job], cfg)


def strain_profiling(
    cfg: ProfilingConfig,
    species_ranges: list[SpeciesRange],
    species_profile: SpeciesProfile,
    reads_by_species: dict[str, list[ReadRecord]],
    load_graph,
) -> list[HapMetrics]:
    """Run optimize_otu per abundant species and apply the species-coverage
    constraint.  ``load_graph(taxid) -> SpeciesGraph`` abstracts the DB so the
    engine also runs on in-memory graphs (tests) and sharded loaders.

    Species selection parity (load_species_range, profile.rs:547-656): ranges
    filtered by --smode/is_pan and designated species, then inner-joined with
    species whose predicted_abundance > min_species_abundance.
    """
    abundant = {
        str(row["species_taxid"]): float(row["predicted_abundance"])
        for _, row in species_profile.df.iterrows()
    }
    selected = []
    for r in species_ranges:
        if cfg.mode == 0 and r.is_pan != 0:
            continue
        if cfg.mode == 1 and r.is_pan != 1:
            continue
        if cfg.designated_species and r.species not in cfg.designated_species:
            continue
        if abundant.get(r.species, 0.0) <= cfg.min_species_abundance:
            continue
        selected.append(r)

    # Species are independent (the reference's rayon par_iter shard axis,
    # profile.rs:3297): a thread pool overlaps per-species host work (graph
    # load, trio index, packing) with device coverage waits, then ALL species'
    # PAO solves run batched on device (finish_two_stage → solve_pao_batch).
    # Results are consumed in `selected` order, so output is deterministic.
    def _work(r: SpeciesRange):
        reads = reads_by_species.get(r.species)
        if not reads:
            return None
        graph = load_graph(r.species)
        return prepare_otu(cfg, r.species, graph, r.start, r.end, reads)

    results: list[HapMetrics] = []
    if len(selected) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(8, len(selected))) as ex:
            prepared = list(ex.map(_work, selected))
    else:
        prepared = [_work(r) for r in selected]
    finish_two_stage([p[1] for p in prepared if p and p[1] is not None], cfg)
    for p in prepared:
        if p:
            metrics = p[0].hap_metrics
            abundance_constraint(species_profile, metrics)
            results.extend(metrics)
    return results
