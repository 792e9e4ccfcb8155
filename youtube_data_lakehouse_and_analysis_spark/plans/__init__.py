from . import (  # noqa: F401
    advanced,
    dedup,
    extras,
    multimodal,
    olap,
    olap2,
    timeseries,
    queries,
    scalar,
    similarity,
    streaming_q,
    text_analysis,
)
