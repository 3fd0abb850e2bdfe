from .fastx import read_fasta, read_fastq, iter_fastx, write_fasta
from .gfa import read_gfa, write_gfa
from .gaf import GafRecord, read_gaf, write_gaf, filter_best_long_read_alignments
from .metadata import GenomeInfo, read_genomes_info, write_genomes_info

__all__ = [
    "read_fasta", "read_fastq", "iter_fastx", "write_fasta",
    "read_gfa", "write_gfa",
    "GafRecord", "read_gaf", "write_gaf", "filter_best_long_read_alignments",
    "GenomeInfo", "read_genomes_info", "write_genomes_info",
]
