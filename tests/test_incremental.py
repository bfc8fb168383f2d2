"""Incremental-aggregation cascade: materialization layout, partition
pruning on retrieval, @purge retention."""

from __future__ import annotations

import pyspark.sql.functions as F

from siddhi_operator_spark.operators import incremental as I


def test_cascade_materialize_query_purge(spark, events_df, tmp_path):
    cascade = I.rollup_cascade(
        events_df, "ts", "value", keys=("event_type",), granularities=("hour", "day")
    )
    paths = I.materialize_cascade(cascade, str(tmp_path / "agg"))

    hourly = spark.read.parquet(paths["hour"])
    # retrieval is partition-prunable: filter on p_date prunes dirs
    plan = (
        hourly.filter(F.col("p_date") == "2024-01-01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan

    # finalize derived measures from composable state
    fin = I.finalize(hourly)
    row = fin.filter(
        (F.col("bucket_start") == "2024-01-01 00:00:00")
        & (F.col("event_type") == "click")
    ).collect()[0]
    assert row.cnt == 2 and row.sum_v == 7.0 and row.avg_v == 3.5

    # purge: drop everything before a cutoff; retained data untouched
    removed = I.purge_before(spark, paths["hour"], "2024-01-02")
    assert removed >= 1
    remaining = [
        d.name for d in (tmp_path / "agg" / "gran=hour").glob("p_date=*")
    ]
    assert all(name >= "p_date=2024-01-02" for name in remaining)
