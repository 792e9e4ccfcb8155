from . import (  # noqa: F401
    advanced,
    dedup,
    multimodal,
    olap,
    timeseries,
    queries,
    scalar,
    similarity,
    streaming_q,
    text_analysis,
)
