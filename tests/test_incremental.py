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


def test_streaming_cascade_matches_batch(spark, events_df, tmp_path):
    """Streaming foreachBatch merge-add over micro-batches must land on
    exactly the batch cascade's state (composable state is order-free),
    and coarser granularities derive from the streamed base state."""
    from siddhi_operator_spark.operators.incremental import rollup_up
    from siddhi_operator_spark.streaming import sources
    from siddhi_operator_spark.streaming.incremental import (
        IncrementalStateTable,
        incremental_agg_sink,
    )

    src = str(tmp_path / "src")
    sources.replay_dir(events_df, src, "ts", 3)
    stream = sources.file_stream(
        spark, src, events_df.schema, max_files_per_trigger=1
    )
    state = IncrementalStateTable(
        spark, str(tmp_path / "agg_hour"), keys=["event_type"]
    )
    q = incremental_agg_sink(
        stream, state, ts="ts", value="value", gran="hour",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    streamed = state.current()
    batch = I.rollup_cascade(
        events_df, "ts", "value", keys=("event_type",), granularities=("hour",)
    )["hour"]
    key = lambda r: (r.bucket_start, r.event_type)  # noqa: E731
    sgot = {key(r): (r.cnt, r.sum_v, r.min_v, r.max_v) for r in streamed.collect()}
    bgot = {key(r): (r.cnt, r.sum_v, r.min_v, r.max_v) for r in batch.collect()}
    assert sgot == bgot

    # day granularity derives from the streamed hour state
    day = rollup_up(streamed, "day", keys=("event_type",))
    dgot = {r.event_type: (r.cnt, r.sum_v) for r in day.collect()}
    assert dgot["click"] == (5, 31.0) and dgot["purchase"] == (2, 150.0)
