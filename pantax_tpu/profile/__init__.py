from .records import ReadRecord, group_reads_by_species
from .rcls import classify_reads
from .coverage import node_abundances
from .pao import solve_pao, PaoResult

__all__ = [
    "ReadRecord", "group_reads_by_species",
    "classify_reads",
    "node_abundances",
    "solve_pao", "PaoResult",
]
