import os

from .cache import enable_compilation_cache


def pipeline_depth() -> int:
    """In-flight device batch queue depth for pipelined dispatch/collect
    loops.  The dispatch->result round trip is latency-bound through the
    device tunnel, so several outstanding batches keep the chip occupied
    during slow windows; override with PANTAX_TPU_PIPELINE_DEPTH."""
    return int(os.environ.get("PANTAX_TPU_PIPELINE_DEPTH", "4"))


__all__ = ["enable_compilation_cache", "pipeline_depth"]
