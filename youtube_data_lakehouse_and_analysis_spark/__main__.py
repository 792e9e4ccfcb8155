"""End-to-end pipeline entry point — the reference's whole script
(/root/reference/app.py: API extract → lake → warehouse → 10 analytics
queries → render) as one command:

    python -m youtube_data_lakehouse_and_analysis_spark <fixtures_dir> <out_dir>

Runs ingestion from recorded API responses, writes the bronze lake and
the silver warehouse under <out_dir>, executes all ten reference
queries, and renders each (Streamlit when importable, console
otherwise). A user of the reference switches by pointing this at their
recorded responses directory.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

from .app import QUESTIONS, render_dashboard
from .plans.silver import migrate, read_silver
from .present import render
from .schemas import ENTITIES
from .sources import youtube_api as yt
from .sources.bronze import write_bronze


def run(spark: SparkSession, fixtures_dir: str, out_dir: str) -> dict:
    """Ingest → bronze → silver → the 10 domain queries. Returns the
    silver table dict so callers (tests, notebooks) can keep querying."""
    bronze_dir = os.path.join(out_dir, "bronze")
    silver_dir = os.path.join(out_dir, "silver")
    write_bronze(
        {
            "channel": yt.read_channels(spark, f"{fixtures_dir}/channels"),
            "playlist": yt.read_playlists(spark, f"{fixtures_dir}/playlists"),
            "video": yt.read_videos(spark, f"{fixtures_dir}/videos"),
            "comment": yt.read_comments(spark, f"{fixtures_dir}/comments"),
        },
        bronze_dir,
    )
    migrate(spark, bronze_dir, silver_dir)
    return {name: read_silver(spark, silver_dir, name) for name in ENTITIES}


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    fixtures_dir, out_dir = argv
    from .session import get_spark

    spark = get_spark("youtube_pipeline")
    tables = run(spark, fixtures_dir, out_dir)
    # Only a MISSING streamlit routes to the console fallback; a genuine
    # render bug must propagate, not silently re-run all ten queries.
    try:
        import streamlit  # noqa: F401 — full dashboard when present
    except ImportError:
        for label, fn in QUESTIONS:
            render(fn(tables), title=label)
    else:
        render_dashboard(tables)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
