"""Presentation adapter (K4 — the reference renders query results with
st.table / st.bar_chart, /root/reference/app.py:599-631). The engine's
contract ends at a DataFrame; display is a driver-side concern:
`.toPandas()` happens HERE and only here — never inside an operator.

Streamlit is optional (import-gated); without it, `render` falls back to
console output. A cap guards against accidentally collecting a 100 TB
result to the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # optional dependency — presentation only
    import streamlit as _st
except Exception:  # pragma: no cover - streamlit not in this container
    _st = None

MAX_DISPLAY_ROWS = 10_000


def to_display(df: DataFrame, max_rows: int = MAX_DISPLAY_ROWS):
    """Bounded driver-side materialization for display."""
    return df.limit(max_rows).toPandas()


def render(df: DataFrame, title: str = "", chart_col: str | None = None) -> None:
    """st.table / st.bar_chart when Streamlit is present; console print
    otherwise."""
    pdf = to_display(df)
    if _st is not None:  # pragma: no cover
        if title:
            _st.subheader(title)
        if chart_col is not None:
            _st.bar_chart(pdf.set_index(pdf.columns[0])[chart_col])
        else:
            _st.table(pdf)
    else:
        if title:
            print(f"== {title} ==")
        print(pdf.to_string(max_rows=50))
