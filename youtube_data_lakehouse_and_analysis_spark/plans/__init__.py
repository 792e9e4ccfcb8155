from . import (  # noqa: F401
    advanced,
    dedup,
    extras,
    multimodal,
    olap,
    timeseries,
    queries,
    scalar,
    similarity,
    streaming_q,
    text_analysis,
)
