from . import olap, queries, scalar  # noqa: F401
