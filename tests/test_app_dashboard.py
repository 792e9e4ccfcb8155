"""Dashboard-twin smoke test: drive the selectbox→dispatch→st.table path
for all ten reference questions (app.py:599-631) over silver tables built
from the recorded API fixtures, using a recording streamlit stub (the
real package is not in this container — presentation is import-gated)."""

from __future__ import annotations

import pytest

from youtube_data_lakehouse_and_analysis_spark.app import (
    PLACEHOLDER,
    QUESTIONS,
    question_options,
    render_dashboard,
    run_question,
)
from youtube_data_lakehouse_and_analysis_spark.plans.silver import migrate, read_silver
from youtube_data_lakehouse_and_analysis_spark.schemas import ENTITIES
from youtube_data_lakehouse_and_analysis_spark.sources import youtube_api as yt
from youtube_data_lakehouse_and_analysis_spark.sources.bronze import write_bronze

FIX = "/root/repo/tests/fixtures/youtube"


@pytest.fixture(scope="module")
def silver(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dash")
    bronze_dir, silver_dir = str(root / "bronze"), str(root / "silver")
    write_bronze(
        {
            "channel": yt.read_channels(spark, f"{FIX}/channels"),
            "playlist": yt.read_playlists(spark, f"{FIX}/playlists"),
            "video": yt.read_videos(spark, f"{FIX}/videos"),
            "comment": yt.read_comments(spark, f"{FIX}/comments"),
        },
        bronze_dir,
    )
    migrate(spark, bronze_dir, silver_dir)
    return {name: read_silver(spark, silver_dir, name) for name in ENTITIES}


class RecordingSt:
    """Minimal streamlit stand-in: selectbox returns a preset choice,
    table/subheader record what they were given."""

    def __init__(self, choice: str):
        self.choice = choice
        self.selectbox_calls: list[tuple[str, list[str]]] = []
        self.tables: list = []
        self.bar_charts: list = []

    def selectbox(self, label, options):
        self.selectbox_calls.append((label, list(options)))
        return self.choice

    def table(self, data):
        self.tables.append(data)

    def bar_chart(self, data):
        self.bar_charts.append(data)


def test_options_match_reference():
    opts = question_options()
    assert opts[0] == PLACEHOLDER
    assert len(opts) == 11
    assert opts[3] == "3. What are the top 10 most viewed videos and their respective channels?"


def test_every_question_renders_a_table(silver):
    for label, _ in QUESTIONS:
        st = RecordingSt(label)
        render_dashboard(silver, st=st)
        assert st.selectbox_calls[0][1] == question_options()
        assert len(st.tables) == 1, label
        assert len(st.tables[0]) > 0, f"{label}: rendered an empty table"


def test_bar_chart_parity(silver):
    """Reference renders Q2/Q3 with st.bar_chart BEFORE the table
    (ref app.py:472, 497) and the other eight questions table-only."""
    for label, _ in QUESTIONS:
        st = RecordingSt(label)
        render_dashboard(silver, st=st)
        if label.startswith("2."):
            assert len(st.bar_charts) == 1, label
            assert st.bar_charts[0].name == "channel_uploads"
            assert st.bar_charts[0].index.name == "channel_name"
        elif label.startswith("3."):
            assert len(st.bar_charts) == 1, label
            assert st.bar_charts[0].name == "views"
            assert st.bar_charts[0].index.name == "video_title"
        else:
            assert st.bar_charts == [], label


def test_placeholder_renders_nothing(silver):
    st = RecordingSt(PLACEHOLDER)
    render_dashboard(silver, st=st)
    assert st.tables == []
    assert run_question("not a question", silver) is None


def test_console_fallback_renders_all(silver, capsys):
    render_dashboard(silver, st=None)
    out = capsys.readouterr().out
    for label, _ in QUESTIONS:
        assert label in out


def test_end_to_end_pipeline_entry(spark, tmp_path, capsys):
    """python -m <package> flow: ingest → bronze → silver → all ten
    queries, in-process via run() + the console render path."""
    from youtube_data_lakehouse_and_analysis_spark.__main__ import run
    from youtube_data_lakehouse_and_analysis_spark.present import render as prender

    tables = run(spark, FIX, str(tmp_path / "wh"))
    assert set(tables) == {"channel", "playlist", "video", "comment"}
    for label, fn in QUESTIONS:
        prender(fn(tables), title=label)
    out = capsys.readouterr().out
    for label, _ in QUESTIONS:
        assert label in out
