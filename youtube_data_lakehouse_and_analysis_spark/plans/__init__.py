from . import dedup, multimodal, olap, queries, scalar, similarity, text_analysis  # noqa: F401
