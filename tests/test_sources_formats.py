"""File-format round-trips (sources/files.py): CSV, JSON-lines, ORC carry
the same rows and types back; ORC scans push down filters/columns like
parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_data_lakehouse_and_analysis_spark.sources import files as FF

from .conftest import SF_DIR


def _sample(spark):
    # nulls, timestamps, strings-with-commas, doubles — the round-trip traps
    return (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .limit(200)
        .withColumn(
            "tricky",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit('a,"b",c')).otherwise(F.lit(None)),
        )
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


def test_csv_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "csv")
    FF.write_csv(df, path, coalesce=2)
    back = FF.read_csv(spark, path, df.schema)
    assert back.schema == df.schema
    assert _sorted_rows(back) == _sorted_rows(df)


def test_jsonl_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "jsonl")
    FF.write_jsonl(df, path)
    back = FF.read_jsonl(spark, path, df.schema)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orc")
    FF.write_orc(df, path)
    back = FF.read_orc(spark, path, df.schema)
    assert _sorted_rows(back) == _sorted_rows(df)

    # pushdown parity with parquet: filter + projection reach the ORC scan
    q = FF.read_orc(spark, path).filter(F.col("o_custkey") == 7).select("o_orderkey")
    fmt = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in fmt and "EqualTo(o_custkey,7)" in fmt, fmt
    assert "struct<o_orderkey:bigint" in fmt.replace(" ", "") or "o_orderkey:bigint" in fmt


def test_text_roundtrip(spark, tmp_path):
    from youtube_data_lakehouse_and_analysis_spark.catalog import load
    from youtube_data_lakehouse_and_analysis_spark.sources.files import read_text, write_text

    docs = load(spark, SF_DIR, "documents").select("text")
    path = str(tmp_path / "corpus_txt")
    write_text(docs, path)
    back = read_text(spark, path)
    assert back.columns == ["value"]
    assert back.count() == docs.count()
    # content round-trips as a multiset
    import pyspark.sql.functions as F

    a = docs.agg(F.sum(F.crc32("text"))).collect()[0][0]
    b = back.agg(F.sum(F.crc32("value"))).collect()[0][0]
    assert a == b


def test_binary_files_ingest(spark, tmp_path):
    from youtube_data_lakehouse_and_analysis_spark.sources.files import read_binary_files

    # any opaque files work; use parquet files on disk as stand-in payloads
    df = read_binary_files(spark, SF_DIR, glob="*.parquet")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 10  # the ten driver tables
    import os

    for r in rows:
        local = r["path"].replace("file:", "")
        assert r["length"] == os.path.getsize(local)
        assert len(r["content"]) == r["length"]  # full payload materialized


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """Hive-partitioned layout (the bronze/silver pattern): a predicate on
    the partition column must land in PartitionFilters — directories are
    pruned by the file index before any file is opened, the 100 TB
    equivalent of not reading last year's data at all."""
    import pyspark.sql.functions as F

    from youtube_data_lakehouse_and_analysis_spark.catalog import load

    ev = load(spark, SF_DIR, "events").withColumn("event_date", F.col("ts").cast("date"))
    path = str(tmp_path / "part_events")
    ev.write.partitionBy("event_date").parquet(path)

    one_day = ev.select("event_date").distinct().limit(1).collect()[0][0]
    back = spark.read.parquet(path).filter(F.col("event_date") == F.lit(one_day))
    fmt = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in fmt and "event_date" in fmt.split("PartitionFilters", 1)[1][:200]
    # and it actually prunes: rows match the single day's count
    assert back.count() == ev.filter(F.col("event_date") == F.lit(one_day)).count()


def test_xml_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "xml")
    FF.write_xml(df, path)
    back = FF.read_xml(spark, path, df.schema)
    assert back.schema == df.schema
    assert _sorted_rows(back) == _sorted_rows(df)


def test_schema_evolution_merge(spark, tmp_path):
    """A later batch adds a column: the merged read exposes the union
    schema with NULL back-fill, and per-batch values survive intact."""
    old = spark.createDataFrame([(1, "a")], ["id", "name"])
    new = spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"])
    p_old, p_new = str(tmp_path / "b0"), str(tmp_path / "b1")
    old.write.parquet(p_old)
    new.write.parquet(p_new)
    merged = FF.read_evolved_parquet(spark, p_old, p_new)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
