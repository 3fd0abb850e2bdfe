from .core import SpeciesGraph, SpeciesRange, load_species_range, save_species_range
from .build_eq1 import build_chain_graph, CHUNK_SIZE
from .trio import TrioIndex, build_trio_index

__all__ = [
    "SpeciesGraph", "SpeciesRange", "load_species_range", "save_species_range",
    "build_chain_graph", "CHUNK_SIZE",
    "TrioIndex", "build_trio_index",
]
