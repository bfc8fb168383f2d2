from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from siddhi_operator_spark.session import build_session

    s = build_session("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def events_df(spark):
    """The reference's canonical hand-fed event list pattern
    (FIXTURES.md §B): tiny cseEventStream-style fixture with event
    time."""
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, "2024-01-01 00:00:01", 1, "signup", 10.0),
        (2, "2024-01-01 00:00:05", 1, "click", 5.0),
        (3, "2024-01-01 00:00:09", 1, "purchase", 100.0),
        (4, "2024-01-01 00:00:12", 2, "signup", 1.0),
        (5, "2024-01-01 00:10:00", 2, "click", 2.0),
        (6, "2024-01-01 00:59:00", 2, "purchase", 50.0),
        (7, "2024-01-01 01:10:00", 1, "click", 7.0),
        (8, "2024-01-01 01:11:00", 1, "click", 8.0),
        (9, "2024-01-01 01:12:00", 1, "click", 9.0),
        (10, "2024-01-01 02:00:00", 2, "error", 0.0),
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
