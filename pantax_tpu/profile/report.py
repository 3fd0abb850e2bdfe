"""Species-coverage constraint and the final strain abundance report.

Parity: /root/reference/pantax/src/profile.rs —
  abundace_constraint  profile.rs:3028-3070
  abundance_est        profile.rs:3091-3289
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..config import ProfilingConfig
from ..io.metadata import GenomeInfo
from .filters import HapMetrics
from .species import SpeciesProfile

ORI_COLUMNS = [
    "species_taxid", "strain_taxid", "genome_ID",
    "predicted_coverage", "predicted_abundance", "path_base_cov",
    "unique_trio_fraction", "uniq_trio_cov_mean", "first_sol",
    "strain_cov_diff", "total_cov_diff",
]


def abundance_constraint(
    species_profile: SpeciesProfile, metrics: list[HapMetrics]
) -> None:
    """Clamp strain coverages by the species coverage (profile.rs:3028-3070)."""
    strain_abs = []
    for m in metrics:
        if m.is_rescue and m.first_sol is not None and m.second_sol is not None:
            m.second_sol = min(m.first_sol, m.second_sol)
        strain_abs.append(m.second_sol if m.second_sol is not None else 0.0)

    species_abs = species_profile.coverage_of(metrics[0].otu)
    total = float(np.sum(strain_abs))
    denom = (total + species_abs) / 2.0
    total_cov_diff = abs(total - species_abs) / denom if denom else 0.0
    for m in metrics:
        m.total_cov_diff = total_cov_diff

    if strain_abs and max(strain_abs) > 1.05 * species_abs and total:
        factor = species_abs / total
        for m in metrics:
            if not m.is_rescue and m.second_sol is not None:
                m.second_sol = m.second_sol * factor


def _hap_id_of(file_stem: str) -> str:
    parts = file_stem.split("_")
    return "_".join(parts[:2]) if len(parts) >= 2 else file_stem


def abundance_est(
    cfg: ProfilingConfig,
    metrics: list[HapMetrics],
    genomes_info: list[GenomeInfo],
    out_dir: str | os.PathLike,
) -> pd.DataFrame:
    """Join metrics with genome metadata, filter, normalize, and write
    ``ori_strain_abundance.txt`` + ``strain_abundance.txt``."""
    meta = pd.DataFrame(
        {
            "genome_ID": [g.genome_id for g in genomes_info],
            "strain_taxid": [g.strain_taxid for g in genomes_info],
            "hap_id": [_hap_id_of(g.file_stem) for g in genomes_info],
        }
    )
    hm = pd.DataFrame(
        {
            "species_taxid": [m.otu for m in metrics],
            "hap_id": [m.hap_id for m in metrics],
            "unique_trio_fraction": [m.unique_trio_nodes_fraction for m in metrics],
            "uniq_trio_cov_mean": [m.frequencies_mean for m in metrics],
            "path_base_cov": [m.path_cov_ratio for m in metrics],
            "first_sol": [m.first_sol for m in metrics],
            "strain_cov_diff": [m.divergence for m in metrics],
            "predicted_coverage": [m.second_sol for m in metrics],
            "total_cov_diff": [m.total_cov_diff for m in metrics],
        }
    )
    merged = hm.merge(meta, on="hap_id", how="left")
    cov_sum = merged["predicted_coverage"].sum()
    merged["predicted_abundance"] = (
        merged["predicted_coverage"] / cov_sum if cov_sum else np.nan
    )

    ori = merged[ORI_COLUMNS]
    ori.to_csv(os.path.join(os.fspath(out_dir), "ori_strain_abundance.txt"),
               sep="\t", index=False)

    group_size = merged.groupby("species_taxid")["hap_id"].count().rename("group_size")
    filtered = merged.join(group_size, on="species_taxid")
    filtered = filtered[
        (filtered["group_size"] > 1)
        | (filtered["total_cov_diff"] <= cfg.single_cov_diff)
    ]
    filtered = filtered[
        (filtered["predicted_coverage"] >= cfg.min_cov)
        & (filtered["predicted_coverage"] != 0.0)
    ]
    cov_sum = filtered["predicted_coverage"].sum()
    filtered = filtered.copy()
    filtered["predicted_abundance"] = (
        filtered["predicted_coverage"] / cov_sum if cov_sum else np.nan
    )
    filtered = filtered.sort_values(
        "predicted_abundance", ascending=False, kind="stable"
    )

    final = filtered[ORI_COLUMNS].copy()
    if not cfg.full:
        for col in [
            "predicted_coverage", "path_base_cov", "unique_trio_fraction",
            "uniq_trio_cov_mean", "first_sol", "strain_cov_diff", "total_cov_diff",
        ]:
            final[col] = final[col].round(2)
    final.to_csv(os.path.join(os.fspath(out_dir), "strain_abundance.txt"),
                 sep="\t", index=False)
    return final
