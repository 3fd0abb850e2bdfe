"""End-to-end profiling pipeline: GAF → classification → species profile →
strain profile → reports.

Parity: /root/reference/pantax/src/profile.rs:3325-3436 (profile()) and
rcls.rs:452-536 (rcls_profile), with file-existence checkpoint semantics
(outputs are skipped when they already exist unless force=True,
profile.rs:136-156).
"""
from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from .config import ProfilingConfig
from .db.construct import DatabasePaths
from .graph.core import load_species_range
from .io.gaf import GafRecord
from .profile.engine import strain_profiling
from .profile.rcls import UNCLASSIFIED, classify_min_max
from .profile.records import ReadRecord, group_reads_by_species
from .profile.report import abundance_est
from .profile.species import SpeciesProfile, read_species_mean_len, species_profiling

log = logging.getLogger(__name__)


def classify_gaf(
    gaf_records: list[GafRecord], db: DatabasePaths
) -> tuple[list[str], list[np.ndarray]]:
    """Species label per GAF record ('U' = unclassified) + parsed node paths."""
    ranges = load_species_range(db.range_file)
    node_paths = [np.array(r.path_nodes(), dtype=np.int64) for r in gaf_records]
    mins = np.array([p.min() if len(p) else -1 for p in node_paths], dtype=np.int64)
    maxs = np.array([p.max() if len(p) else -1 for p in node_paths], dtype=np.int64)
    idx = classify_min_max(mins, maxs, ranges)
    species = [ranges[i].species if i >= 0 else UNCLASSIFIED for i in idx]
    return species, node_paths


def write_reads_classification(
    path, gaf_records: list[GafRecord], species: list[str]
) -> None:
    """reads_classification.tsv: read_id, mapq, species, read_len (no header;
    rcls.rs:409-420 / profile.rs:3337-3351)."""
    with open(path, "w") as f:
        for rec, sp in zip(gaf_records, species):
            f.write(f"{rec.read_id}\t{rec.mapq}\t{sp}\t{rec.read_len}\n")


def profile_from_gaf(
    gaf_records: list[GafRecord],
    db: DatabasePaths,
    cfg: ProfilingConfig,
    out_dir: str | os.PathLike,
    force: bool = False,
) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    species_abund_file = out / "species_abundance.txt"
    strain_abund_file = out / "strain_abundance.txt"

    log.info("- Read classification...")
    species, node_paths = classify_gaf(gaf_records, db)
    write_reads_classification(out / "reads_classification.tsv", gaf_records, species)

    keep = [i for i, s in enumerate(species) if s != UNCLASSIFIED]
    kept_records = [gaf_records[i] for i in keep]
    kept_species = [species[i] for i in keep]
    kept_paths = [node_paths[i] for i in keep]

    if cfg.species and (force or not species_abund_file.exists()):
        log.info("- Species level profiling...")
        mean_len = read_species_mean_len(db.stats_file)
        profile = species_profiling(
            np.array(kept_species, dtype=object),
            np.array([r.read_len for r in kept_records], dtype=np.int64),
            np.array([r.mapq for r in kept_records], dtype=np.int64),
            mean_len,
            filtered=cfg.filtered,
        )
        profile.save(species_abund_file)
    else:
        profile = SpeciesProfile.load(species_abund_file)

    if cfg.strain and (force or not strain_abund_file.exists()):
        log.info("- Strain level profiling...")
        reads = [
            ReadRecord(
                read_id=r.read_id,
                nodes=p,
                read_path_len=r.path_len,
                read_start=r.path_start,
                read_end=r.path_end,
                species=s,
            )
            for r, p, s in zip(kept_records, kept_paths, kept_species)
        ]
        reads_by_species = group_reads_by_species(reads)
        ranges = load_species_range(db.range_file)
        from .io.metadata import read_genomes_info

        metrics = strain_profiling(
            cfg, ranges, profile, reads_by_species, db.load_graph
        )
        genomes_info = read_genomes_info(db.genomes_info_file)
        abundance_est(cfg, metrics, genomes_info, out)
    log.info("- Profiling done.")
