from .construct import build_database, DatabasePaths

__all__ = ["build_database", "DatabasePaths"]
