"""Ingest regression gate: the loaded fixtures must land in their
declared value ranges, whatever the parquet physical types are.

Round-3 post-mortem: the events fixture flipped from TIMESTAMP(NANOS)
to TIMESTAMP(MICROS) and the reader kept dividing by 1000 — every
event landed in Jan 1970 with the timeline compressed 1000×, breaking
24 oracle rows at once. This test fails instantly on any such
reader/fixture disagreement (either direction), including the next
fixture regeneration.
"""

from __future__ import annotations

import datetime
import os

import pytest

from siddhi_operator_spark.catalog import TABLES, load, load_events_stream

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

def _minmax(df, col):
    import pyspark.sql.functions as F

    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    return row["lo"], row["hi"]


@pytest.mark.parametrize(
    "table,col,lo_year,hi_year",
    [
        ("events", "ts", 2024, 2025),  # declared 2024 event timeline
        ("orders", "o_orderdate", 1990, 2010),  # TPC-H-style date span
        ("lineitem", "l_shipdate", 1990, 2010),
    ],
)
def test_fixture_timestamps_land_in_declared_range(
    spark, table, col, lo_year, hi_year
):
    df = load(spark, SF, table)
    assert str(df.schema[col].dataType) == "TimestampType()"
    lo, hi = _minmax(df, col)
    lo_b = datetime.datetime(lo_year, 1, 1)
    hi_b = datetime.datetime(hi_year, 1, 1)
    assert lo_b <= lo <= hi < hi_b, (
        f"{table}.{col} range [{lo}, {hi}] escapes [{lo_year},{hi_year}) — "
        "the reader disagrees with the fixture's physical type "
        "(see r3 post-mortem: nanos-vs-micros misread put events in 1970)"
    )


def test_events_stream_matches_batch_read(spark):
    """Streaming and batch reads of events must agree byte-for-byte on
    ts — they share catalog._events_stream_or_batch by construction,
    but this pins the seam against future divergence."""
    import pyspark.sql.functions as F

    batch = load(spark, SF, "events")
    s = load_events_stream(spark, SF)
    assert batch.schema == s.schema
    name = "ingest_stream_check"
    q = (
        s.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name).agg(
        F.min("ts"), F.max("ts"), F.count("*")
    ).first()
    want = batch.agg(F.min("ts"), F.max("ts"), F.count("*")).first()
    assert got == want


def test_all_tables_load_nonempty(spark):
    for t in TABLES:
        assert load(spark, SF, t).limit(1).count() == 1, t


def test_events_stream_reads_directory_fixture(spark, tmp_path):
    """When events.parquet is a DIRECTORY of part files (Spark's own
    write layout, and bench's scaled copies), the stream must read it —
    pathGlobFilter matches leaf file names only and would silently
    stream zero rows from the parent glob."""
    import pyspark.sql.functions as F

    sf_dir = str(tmp_path)
    batch = load(spark, SF, "events")
    batch.write.parquet(f"{sf_dir}/events.parquet")

    s = load_events_stream(spark, sf_dir)
    name = "ingest_stream_dir_check"
    q = (
        s.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert (
        spark.table(name).count() == batch.count() != 0
    )
