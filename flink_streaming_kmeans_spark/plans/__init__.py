from .registry import QUERIES, ORACLE, collect  # noqa: F401
