from .index import AlignIndex, build_align_index
from .aligner import Aligner

__all__ = ["AlignIndex", "build_align_index", "Aligner"]
