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
    """Inputs are per classified read (species != 'U' already filtered).

    Vectorized as bincounts over first-occurrence group codes (a pandas
    object-key groupby costs >1s per 1M reads); group order, the credibility
    filter's inner-join drop of species with zero 3..60-mapq reads, and the
    stable descending sort all match the original pandas formulation.
    """
    species = np.asarray(species, dtype=object)
    uniq, first_idx, inv = np.unique(
        species, return_index=True, return_inverse=True
    )
    order = np.argsort(first_idx, kind="stable")  # first-occurrence order
    names = uniq[order]
    remap = np.empty(len(names), dtype=np.int64)
    remap[order] = np.arange(len(names))
    g = remap[inv] if len(inv) else inv
    return _profile_from_groups(
        g, names, read_len, mapq, species_mean_len, filtered
    )


def species_profiling_codes(
    codes: np.ndarray,
    code_names: np.ndarray,
    read_len: np.ndarray,
    mapq: np.ndarray,
    species_mean_len: dict[str, float],
    filtered: bool = True,
) -> SpeciesProfile:
    """species_profiling taking integer species codes per read (plus
    code_names[code] -> taxid string) — skips the 1M-string np.unique the
    fused flow doesn't need.  Groups are re-ordered to first occurrence so
    the output is byte-identical to the string entry (tests/test_fused.py).
    """
    codes = np.asarray(codes, dtype=np.int64)
    C = len(code_names)
    n = len(codes)
    # first-occurrence index per code without a 1M-element sort: sequential
    # fancy assignment keeps the LAST write, so writing positions in
    # descending order leaves each code's smallest position
    first = np.full(C, n, dtype=np.int64)
    if n:
        first[codes[::-1]] = np.arange(n - 1, -1, -1)
    kept_codes = np.flatnonzero(first < n)
    kept = kept_codes[np.argsort(first[kept_codes], kind="stable")]
    remap = np.full(max(C, 1), -1, dtype=np.int64)
    remap[kept] = np.arange(len(kept))
    g = remap[codes] if n else codes
    names = np.asarray(code_names, dtype=object)[kept]
    return _profile_from_groups(
        g, names, read_len, mapq, species_mean_len, filtered
    )


def _profile_from_groups(
    g, names, read_len, mapq, species_mean_len, filtered
) -> SpeciesProfile:
    read_len = np.asarray(read_len, dtype=np.int64)
    mapq = np.asarray(mapq, dtype=np.int64)
    G = len(names)
    read_count = np.bincount(g, minlength=G)
    equal_length = len(np.unique(read_len[:1000])) == 1 and len(read_len)
    if equal_length:
        base_count = read_count * int(read_len[0])
    else:
        base_count = np.bincount(g, weights=read_len, minlength=G).astype(
            np.int64
        )

    if filtered:
        in_band = (mapq >= 3) & (mapq <= 60)
        less_multi = np.bincount(g[in_band], minlength=G)
        uniq_count = np.bincount(g[mapq == 60], minlength=G)
        keep = (uniq_count > 0) & (less_multi > read_count / 10.0)
        names, base_count = names[keep], base_count[keep]

    lens = np.array(
        [species_mean_len.get(n, np.nan) for n in names], dtype=np.float64
    )
    absolute_abund = base_count / lens if len(names) else np.zeros(0)
    total = absolute_abund.sum()
    result = pd.DataFrame(
        {
            "species_taxid": names,
            "predicted_abundance": absolute_abund / total if total else 0.0,
            "predicted_coverage": absolute_abund,
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
