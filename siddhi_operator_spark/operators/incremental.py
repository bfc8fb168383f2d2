"""Incremental (multi-granularity time-series) aggregation —
SURVEY.md §3.5 (`[core] aggregation/IncrementalExecutor.java`,
`AggregationParser.java`, `IncrementalAggregateCompileCondition.java`).

Siddhi: `define aggregation A from S select sum(x), avg(x) … aggregate
by ts every sec…year`, queried with `within <range> per <granularity>`.
The engine cascades rollups second→minute→hour→day→month→year and only
*composable* sub-aggregates are stored (avg = sum/count; stdDev = sum of
squares) — `[core] aggregation/IncrementalAttributeAggregator`
subclasses.

Spark design: the base granularity is one tumbling aggregation storing
the composable state (count, sum, sum_sq, min, max); each coarser
granularity is derived FROM the previous one (never re-reads the raw
100 TB), so the cascade costs one full scan + five tiny re-aggs.
Retrieval picks the requested granularity table, applies the `within`
range as a partition-prunable filter, and finalizes derived measures
(avg, stddev) from the composable state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRANULARITIES = ("second", "minute", "hour", "day", "month", "year")

_TRUNC_FMT = {
    # date_trunc fmt per granularity
    "second": "second",
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "month": "month",
    "year": "year",
}


def base_rollup(df: DataFrame, ts: str, value: str, keys: tuple[str, ...], gran: str) -> DataFrame:
    """Aggregate raw events to one granularity, storing composable
    state only (sum/count/sum_sq/min/max)."""
    return (
        df.groupBy(
            F.date_trunc(_TRUNC_FMT[gran], F.col(ts)).alias("bucket_start"), *keys
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value).alias("sum_v"),
            F.sum(F.col(value) * F.col(value)).alias("sum_sq"),
            F.min(value).alias("min_v"),
            F.max(value).alias("max_v"),
        )
    )


def rollup_up(prev: DataFrame, gran: str, keys: tuple[str, ...]) -> DataFrame:
    """Derive a coarser granularity from the previous one — composable
    state merges with sum/sum/sum/min/max (this is the whole trick that
    makes the cascade one-scan)."""
    return (
        prev.groupBy(
            F.date_trunc(_TRUNC_FMT[gran], F.col("bucket_start")).alias("bucket_start"),
            *keys,
        ).agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sum_sq").alias("sum_sq"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def rollup_cascade(
    df: DataFrame,
    ts: str,
    value: str,
    keys: tuple[str, ...] = (),
    granularities: tuple[str, ...] = GRANULARITIES,
    base: str | None = None,
) -> dict[str, DataFrame]:
    """Build the full cascade. ``base`` defaults to the finest requested
    granularity. Returns {granularity: rollup DataFrame}; callers
    materialize each to partitioned parquet in production (the
    `@purge`-style retention is then parquet partition deletion)."""
    grans = [g for g in GRANULARITIES if g in granularities]
    base = base or grans[0]
    out: dict[str, DataFrame] = {}
    prev = base_rollup(df, ts, value, keys, base)
    out[base] = prev
    for g in grans[grans.index(base) + 1 :]:
        prev = rollup_up(prev, g, keys)
        out[g] = prev
    return out


def finalize(rollup: DataFrame) -> DataFrame:
    """Finalize derived measures from composable state: avg = sum/cnt,
    population stddev = sqrt(sum_sq/cnt − (sum/cnt)²) — the same
    composition the reference's `AvgIncrementalAttributeAggregator` /
    stdDev incremental aggregator use."""
    avg = F.col("sum_v") / F.col("cnt")
    var = F.col("sum_sq") / F.col("cnt") - avg * avg
    return rollup.withColumn("avg_v", avg).withColumn(
        "stddev_v", F.sqrt(F.greatest(var, F.lit(0.0)))
    )


def materialize_cascade(
    cascade: dict[str, DataFrame],
    base_path: str,
) -> dict[str, str]:
    """Persist each granularity as parquet partitioned by a derived
    date column (`p_date`) — the production layout: `within` range
    retrieval becomes partition pruning, and `@purge` retention is
    partition deletion. Returns {granularity: path}."""
    from pyspark.sql import functions as F

    paths = {}
    for gran, df in cascade.items():
        path = f"{base_path}/gran={gran}"
        (
            df.withColumn("p_date", F.to_date("bucket_start"))
            .write.mode("overwrite")
            .partitionBy("p_date")
            .parquet(path)
        )
        paths[gran] = path
    return paths


def purge_before(spark, path: str, cutoff_date: str) -> int:
    """`@purge(... retention period)` analog
    (`[core] aggregation/persistedaggregation/` retention): drop
    partitions older than the cutoff — pure directory deletion, no
    rewrite of retained data. Returns partitions removed."""
    import shutil
    from pathlib import Path

    removed = 0
    for d in Path(path).glob("p_date=*"):
        if d.name.split("=", 1)[1] < cutoff_date:
            shutil.rmtree(d)
            removed += 1
    return removed


def query_within_per(
    cascade: dict[str, DataFrame],
    per: str,
    start,
    end,
) -> DataFrame:
    """`within [start, end) per '<granularity>'` retrieval: pick the
    granularity table, range-filter the bucket (partition-prunable),
    finalize."""
    r = cascade[per].filter(
        (F.col("bucket_start") >= F.lit(start)) & (F.col("bucket_start") < F.lit(end))
    )
    return finalize(r)


def query_materialized(
    spark,
    paths: dict[str, str],
    per: str,
    start: str,
    end: str,
) -> DataFrame:
    """Retrieval against a `materialize_cascade` layout — what a
    deployed aggregation actually serves (`[core]
    aggregation/IncrementalExecutor.java` reads its tables, not raw
    events). The `within` range hits the `p_date` PARTITION column
    first (directory pruning: out-of-range dates are never opened,
    the 100 TB property) and `bucket_start` second (row-group
    min/max skip within the boundary dates)."""
    r = spark.read.parquet(paths[per]).filter(
        (F.col("p_date") >= F.to_date(F.lit(start)))
        & (F.col("p_date") <= F.to_date(F.lit(end)))
        & (F.col("bucket_start") >= F.lit(start).cast("timestamp"))
        & (F.col("bucket_start") < F.lit(end).cast("timestamp"))
    )
    return finalize(r).drop("p_date")
