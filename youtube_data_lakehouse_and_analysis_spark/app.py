"""Streamlit dashboard twin of the reference front end.

The reference (/root/reference/app.py:599-631) ends in a `st.selectbox`
over ten English questions and dispatches the chosen one to its query
function, rendering with `st.table`. This module reproduces that surface
1:1 — same ten option strings, same placeholder row, same table render —
on top of the silver warehouse DataFrames and `plans/domain.py` (the
SQL-observed semantics of app.py:443-591).

Streamlit is an optional presentation dependency (not in this container):
every entry point accepts an injected `st` module, so tests drive the
full selectbox→dispatch→table path with a recording stub, and a real
`streamlit run` picks up the genuine module via the import guard in
`present.py`. Without either, `render_dashboard` degrades to console
output through `present.render`.

Scale note: presentation is driver-side by definition; the ONLY
`.toPandas()` in the repo lives in `present.to_display`, which caps the
collected rows (MAX_DISPLAY_ROWS) so a dashboard pointed at a 100 TB
result cannot pull it to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .plans import domain
from .present import _st, to_display

PLACEHOLDER = "Select Option"

# Exact option strings from the reference selectbox (app.py:599-611).
QUESTIONS: list[tuple[str, object]] = [
    (
        "1. What are the names of all the videos and their corresponding channels?",
        domain.q1_channel_names,
    ),
    (
        "2. Which channels have the most number of videos, and how many videos do they have?",
        domain.q2_channels_most_videos,
    ),
    (
        "3. What are the top 10 most viewed videos and their respective channels?",
        domain.q3_top10_viewed,
    ),
    (
        "4. How many comments were made on each video, and what are their corresponding video names?",
        domain.q4_comments_per_video,
    ),
    (
        "5. Which videos have the highest number of likes, and what are their corresponding channel names?",
        domain.q5_most_liked_per_channel,
    ),
    (
        "6. What is the total number of likes and dislikes for each video, and what are their corresponding video names?",
        domain.q6_likes_per_video,
    ),
    (
        "7. What is the total number of views for each channel, and what are their corresponding channel names?",
        domain.q7_views_per_channel,
    ),
    (
        "8. What are the names of all the channels that have published videos in the year 2022?",
        domain.q8_channels_published_2022,
    ),
    (
        "9. What is the average duration of all videos in each channel, and what are their corresponding channel names?",
        domain.q9_avg_duration_per_channel,
    ),
    (
        "10. Which videos have the highest number of comments, and what are their corresponding channel names?",
        domain.q10_top10_commented,
    ),
]

_DISPATCH = {label: fn for label, fn in QUESTIONS}


def question_options() -> list[str]:
    """Selectbox options, placeholder first (app.py:599)."""
    return [PLACEHOLDER, *(label for label, _ in QUESTIONS)]


def run_question(label: str, tables: domain.Tables) -> DataFrame | None:
    """Resolve one selectbox choice to its domain query result.
    The placeholder (and any unknown string) maps to None — the
    reference's trailing `else: pass` branch (app.py:631)."""
    fn = _DISPATCH.get(label)
    return fn(tables) if fn is not None else None


# Questions the reference ALSO renders as a bar chart before the table:
# Q2 charts channel_uploads indexed by channel_name (ref app.py:472) and
# Q3 charts views indexed by video_title (ref app.py:497).
_CHARTS = {
    QUESTIONS[1][0]: ("channel_name", "channel_uploads"),
    QUESTIONS[2][0]: ("video_title", "views"),
}


def render_dashboard(tables: domain.Tables, st=None) -> None:
    """The selectbox→dispatch→st.table loop body (app.py:599-631), with
    the reference's bar-chart panels for Q2/Q3 (app.py:472, 497 — chart
    first inside the query function, table from the dispatch).

    `st` defaults to the real streamlit when importable; inject a stub to
    test, or leave None without streamlit for console fallback."""
    st = st if st is not None else _st
    if st is None:  # no streamlit anywhere: print every query once
        from .present import render

        for label, fn in QUESTIONS:
            render(fn(tables), title=label)
        return
    choice = st.selectbox("Select option", question_options())
    df = run_question(choice, tables)
    if df is not None:
        pdf = to_display(df)
        chart = _CHARTS.get(choice)
        if chart is not None:
            index_col, value_col = chart
            st.bar_chart(pdf.set_index(index_col)[value_col])
        st.table(pdf)


def main(silver_dir: str, st=None) -> None:
    """`streamlit run`-able entry: silver warehouse path → dashboard."""
    from .plans.silver import read_silver
    from .schemas import ENTITIES
    from .session import get_spark

    spark = get_spark("youtube_dashboard")
    tables = {name: read_silver(spark, silver_dir, name) for name in ENTITIES}
    render_dashboard(tables, st=st)
