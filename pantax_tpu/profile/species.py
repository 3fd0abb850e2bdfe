"""Species-level profiling: per-species base counts with the mapq credibility
filter, normalized by mean genome length.

Parity: /root/reference/pantax/src/profile.rs:208-349:
  - equal-length detection samples the first 1000 read lengths (profile.rs:311-319);
  - credibility filter keeps species with >= 1 mapq-60 read AND
    #(3 <= mapq <= 60) > read_count / 10;
  - coverage = base_count / species mean genome length; abundance normalized;
  - output sorted descending by abundance.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class SpeciesProfile:
    """species_abundance.txt rows."""

    df: pd.DataFrame  # columns: species_taxid, predicted_abundance, predicted_coverage

    def coverage_of(self, species: str) -> float:
        rows = self.df[self.df["species_taxid"] == species]
        return float(rows["predicted_coverage"].iloc[0]) if len(rows) else 0.0

    def save(self, path) -> None:
        self.df.to_csv(path, sep="\t", index=False)

    @classmethod
    def load(cls, path) -> "SpeciesProfile":
        return cls(pd.read_csv(path, sep="\t", dtype={"species_taxid": str}))


def species_profiling(
    species: np.ndarray | list[str],
    read_len: np.ndarray,
    mapq: np.ndarray,
    species_mean_len: dict[str, float],
    filtered: bool = True,
) -> SpeciesProfile:
    """Inputs are per classified read (species != 'U' already filtered)."""
    df = pd.DataFrame(
        {
            "species": np.asarray(species, dtype=object),
            "read_len": np.asarray(read_len, dtype=np.int64),
            "mapq": np.asarray(mapq, dtype=np.int64),
        }
    )
    uniq_lens = df["read_len"].head(1000).unique()
    equal_length = len(uniq_lens) == 1

    if equal_length:
        rl = int(uniq_lens[0])
        grouped = df.groupby("species", sort=False).agg(
            read_count=("read_len", "size")
        )
        grouped["base_count"] = grouped["read_count"] * rl
    else:
        grouped = df.groupby("species", sort=False).agg(
            read_count=("read_len", "size"), base_count=("read_len", "sum")
        )

    if filtered:
        sel = df[(df["mapq"] >= 3) & (df["mapq"] <= 60)]
        cred = sel.groupby("species", sort=False).agg(
            less_multi=("mapq", "size"),
            uniq_count=("mapq", lambda s: int((s == 60).sum())),
        )
        grouped = grouped.join(cred, how="inner")
        grouped = grouped[
            (grouped["uniq_count"] > 0)
            & (grouped["less_multi"] > grouped["read_count"] / 10.0)
        ]

    out = grouped.reset_index()[["species", "base_count"]]
    out["len"] = out["species"].map(species_mean_len)
    out["absolute_abund"] = out["base_count"] / out["len"]
    total = out["absolute_abund"].sum()
    result = pd.DataFrame(
        {
            "species_taxid": out["species"],
            "predicted_abundance": out["absolute_abund"] / total if total else 0.0,
            "predicted_coverage": out["absolute_abund"],
        }
    ).sort_values("predicted_abundance", ascending=False, kind="stable")
    return SpeciesProfile(result.reset_index(drop=True))


def read_species_mean_len(path) -> dict[str, float]:
    """species_genomes_stats.txt: two tab columns (species_taxid, mean_len),
    no header (profile.rs:299-309)."""
    out: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            fields = line.split()
            if len(fields) >= 2:
                out[fields[0]] = float(fields[1])
    return out
