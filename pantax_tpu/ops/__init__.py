from .coverage import interval_node_coverage

__all__ = ["interval_node_coverage"]
