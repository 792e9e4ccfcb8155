from . import (  # noqa: F401
    dedup,
    multimodal,
    olap,
    queries,
    scalar,
    similarity,
    streaming_q,
    text_analysis,
)
