"""Suite: incremental (multi-granularity) aggregation
(SURVEY.md §3.5 — `[core] aggregation/IncrementalExecutor.java`).
The cascade derives each coarser granularity from the previous one
(hour→day→month here), so correctness of `month` transitively proves
the composable-state merge (`sum/cnt/sum_sq/min/max`) — the same trick
as the reference's `IncrementalAttributeAggregator` subclasses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import incremental as I
from ..fpround import r4
from .registry import register


def _finalized(spark: SparkSession, sf: str, per: str, start: str, end: str) -> DataFrame:
    e = load(spark, sf, "events")
    # `within` pushdown — the partition-pruning analog: in production
    # the cascade tables are materialized parquet partitioned by date
    # and the within range prunes partitions; recomputing from raw (as
    # this query does), the same range prunes the raw scan instead.
    # Sound because both endpoints are aligned to the base granularity
    # (hour), so no in-range bucket loses events.
    e = e.filter(
        (F.col("ts") >= F.lit(start).cast("timestamp"))
        & (F.col("ts") < F.lit(end).cast("timestamp"))
    )
    cascade = I.rollup_cascade(
        e, "ts", "value", keys=("event_type",), granularities=("hour", "day", "month")
    )
    out = I.query_within_per(cascade, per, start, end)
    return out.select(
        "bucket_start",
        "event_type",
        F.col("cnt").alias("n"),
        r4(F.col("sum_v"), 4).alias("sum_v"),
        r4(F.col("avg_v"), 4).alias("avg_v"),
        r4(F.col("stddev_v"), 4).alias("std_v"),
        r4(F.col("min_v"), 4).alias("min_v"),
        r4(F.col("max_v"), 4).alias("max_v"),
    )


@register(
    "incr_agg_day",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start, event_type,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4)        AS sum_v,
           round(1e-9 + avg(value), 4)        AS avg_v,
           round(1e-9 + stddev_pop(value), 4) AS std_v,
           round(1e-9 + min(value), 4)        AS min_v,
           round(1e-9 + max(value), 4)        AS max_v
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY 1, 2
    """,
    tags=("incremental", "day"),
)
def incr_agg_day(spark: SparkSession, sf: str) -> DataFrame:
    """`define aggregation ... every hour...month` queried
    `within [Jan 5, Jan 25) per 'days'`. Day table is derived from the
    hour table, never from raw events — avg/stddev finalized from
    composable state."""
    return _finalized(spark, sf, "day", "2024-01-05 00:00:00", "2024-01-25 00:00:00")


def _materialized_paths(spark: SparkSession, sf: str) -> dict[str, str]:
    """Build the hour→day→month cascade to partitioned parquet ONCE per
    input dir (idempotent, keyed by the events file's mtime so a fresh
    fixture invalidates the cache) — production materializes the
    cascade on ingest and retrieval never touches raw events."""
    import os

    from ..catalog import _events_ts_kind

    src = f"{sf.rstrip('/')}/events.parquet"
    # Key by mtime AND the sniffed physical ts vintage AND the WRITER
    # MODULE's hash (r12 — replaces the hand-maintained "v2" reader
    # token, the same stale-cache class the r11 verdict flagged for
    # the ivfpq serve rows: a code change to the cascade writer must
    # invalidate layouts it wrote, without anyone remembering to bump
    # a literal), so a reader fix (r4: nanos→native), a fixture flip,
    # or any edit to `operators/incremental.py` rebuilds the cascade.
    from .registry import module_code_token

    stamp = (
        f"{int(os.stat(src).st_mtime)}-{_events_ts_kind(sf)}"
        f"-{module_code_token(I)}"
    )
    base = f"/tmp/spark_graft_incr/{os.path.basename(sf.rstrip('/'))}-{stamp}"
    marker = f"{base}/_READY"
    paths = {g: f"{base}/gran={g}" for g in ("hour", "day", "month")}
    if not os.path.exists(marker):
        e = load(spark, sf, "events")
        cascade = I.rollup_cascade(
            e, "ts", "value", keys=("event_type",),
            granularities=("hour", "day", "month"),
        )
        I.materialize_cascade(cascade, base)
        with open(marker, "w") as f:
            f.write("ok")
    return paths


@register(
    "incr_agg_day_retrieval",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start, event_type,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4)        AS sum_v,
           round(1e-9 + avg(value), 4)        AS avg_v,
           round(1e-9 + stddev_pop(value), 4) AS std_v,
           round(1e-9 + min(value), 4)        AS min_v,
           round(1e-9 + max(value), 4)        AS max_v
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY 1, 2
    """,
    tags=("incremental", "day", "materialized"),
)
def incr_agg_day_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """The deployed-aggregation retrieval path: `within [Jan 5, Jan 25)
    per 'days'` served from the MATERIALIZED cascade (partitioned
    parquet, built once on ingest) — `incr_agg_day` recomputes the same
    answer from raw events; this entry is what production actually runs
    and what SCALEBENCH times as the honest 100 TB number. The oracle
    recomputes from raw (DuckDB has no rollup store), proving the
    materialized tables serve identical values."""
    paths = _materialized_paths(spark, sf)
    out = I.query_materialized(
        spark, paths, "day", "2024-01-05 00:00:00", "2024-01-25 00:00:00"
    )
    return out.select(
        "bucket_start",
        "event_type",
        F.col("cnt").alias("n"),
        r4(F.col("sum_v"), 4).alias("sum_v"),
        r4(F.col("avg_v"), 4).alias("avg_v"),
        r4(F.col("stddev_v"), 4).alias("std_v"),
        r4(F.col("min_v"), 4).alias("min_v"),
        r4(F.col("max_v"), 4).alias("max_v"),
    )


@register(
    "incr_agg_month",
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start, event_type,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4)        AS sum_v,
           round(1e-9 + avg(value), 4)        AS avg_v,
           round(1e-9 + stddev_pop(value), 4) AS std_v,
           round(1e-9 + min(value), 4)        AS min_v,
           round(1e-9 + max(value), 4)        AS max_v
    FROM events
    GROUP BY 1, 2
    """,
    tags=("incremental", "month"),
)
def incr_agg_month(spark: SparkSession, sf: str) -> DataFrame:
    """`per 'months'` over the whole fixture range — exercises two
    cascade hops (hour→day→month)."""
    return _finalized(spark, sf, "month", "2020-01-01 00:00:00", "2030-01-01 00:00:00")


@register(
    "incr_agg_hour_slice",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4)        AS sum_v,
           round(1e-9 + avg(value), 4)        AS avg_v,
           round(1e-9 + stddev_pop(value), 4) AS std_v,
           round(1e-9 + min(value), 4)        AS min_v,
           round(1e-9 + max(value), 4)        AS max_v
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      AND ts <  TIMESTAMP '2024-01-16 00:00:00'
    GROUP BY 1, 2
    """,
    tags=("incremental", "hour"),
)
def incr_agg_hour_slice(spark: SparkSession, sf: str) -> DataFrame:
    """Narrow `within` slice `per 'hours'` — the retrieval planner
    range-prunes the bucket column before any join/scan of coarser
    data (partition pruning at scale)."""
    return _finalized(spark, sf, "hour", "2024-01-15 00:00:00", "2024-01-16 00:00:00")
