"""Window operators — batch/analytics mode.

The reference's window family lives in
`[core] query/processor/stream/window/` (one `WindowProcessor` subclass
per window; SURVEY.md §3.3). In batch/analytics mode each window maps to
either a `groupBy(window(...))` tumbling aggregation or an analytic
`Window.partitionBy().orderBy()` frame; the streaming twins are in
``siddhi_operator_spark.streaming``.

Scale notes (100 TB): every helper below groups/partitions by explicit
keys so the shuffle is keyed and AQE can split skew; none of them
collect to the driver; frame-based windows avoid a global sort by
partitioning first (a `Window` with no partitionBy is refused).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _keyed_window(keys: Sequence[str], order: Sequence[Column | str]) -> WindowSpec:
    if not keys:
        raise ValueError(
            "analytic windows require partition keys at scale; "
            "a global window serializes 100 TB through one task"
        )
    return Window.partitionBy(*keys).orderBy(*order)


def time_batch(
    df: DataFrame,
    ts: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Tumbling time window: Siddhi `timeBatch(t)` / `externalTimeBatch`
    (`TimeBatchWindowProcessor.java`, `ExternalTimeBatchWindowProcessor.java`).

    Native `window()` tumbling aggregation — partial aggregation happens
    map-side before the shuffle, so this scales linearly.
    """
    out = df.groupBy(F.window(ts, duration).alias("w"), *keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("w", *keys)],
    )


def sliding_time(
    df: DataFrame,
    ts: str,
    seconds: float,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Sliding time window: Siddhi `time(t)` (`TimeWindowProcessor.java`).

    Siddhi semantics: each arriving event sees the set of events from the
    last `t` — i.e. a per-event aggregate over `[ts - t, ts]`. That is an
    analytic frame: RANGE BETWEEN t PRECEDING AND CURRENT ROW over the
    event-time axis (epoch seconds, fractional), partitioned by key.
    """
    if not keys:
        raise ValueError("sliding time windows require partition keys at scale")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).cast("double"))
        .rangeBetween(-seconds, 0)
    )
    out = df
    for name, c in aggs.items():
        out = out.withColumn(name, c.over(w))
    return out


def length(
    df: DataFrame,
    n: int,
    keys: Sequence[str],
    order: Sequence[Column | str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Sliding count window: Siddhi `length(n)`
    (`LengthWindowProcessor.java`) — each event sees the last n events.

    Batch mapping: ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW. Count
    windows are inherently per-key at scale (SURVEY.md §8.4): a global
    count window totally orders the stream, so keys are mandatory.
    """
    w = _keyed_window(keys, order).rowsBetween(-(n - 1), 0)
    out = df
    for name, c in aggs.items():
        out = out.withColumn(name, c.over(w))
    return out


def length_batch(
    df: DataFrame,
    n: int,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Tumbling count window: Siddhi `lengthBatch(n)`
    (`LengthBatchWindowProcessor.java`) — emit per n events.

    Adds a `batch_id` column (0-based, per key): floor((row_number-1)/n).
    Callers group by (keys..., batch_id).
    """
    w = _keyed_window(keys, order)
    return df.withColumn(
        "batch_id", ((F.row_number().over(w) - F.lit(1)) / F.lit(n)).cast("long")
    )


def session(
    df: DataFrame,
    ts: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session window: Siddhi `session(gap, key)`
    (`SessionWindowProcessor.java`). Native `session_window` (works in
    batch and streaming; merges events closer than `gap`)."""
    out = df.groupBy(F.session_window(ts, gap).alias("w"), *keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys,
        *[c for c in out.columns if c not in ("w", *keys)],
    )


def sort_topk(
    df: DataFrame,
    n: int,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Retained top/bottom-n: Siddhi `sort(n, attr, 'asc'|'desc')`
    (`SortWindowProcessor.java`) and `extrema:topK`.

    row_number ≤ n per key. At scale Catalyst runs this as a per-key
    TopK (WindowGroupLimit pushes the limit below the sort since
    Spark 3.5) — no global sort."""
    w = _keyed_window(keys, order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n)


def frequent(
    df: DataFrame,
    n: int,
    keys: Sequence[str],
    group_cols: Sequence[str],
) -> DataFrame:
    """Heavy hitters: Siddhi `frequent(n, attrs)` / `lossyFrequent`
    (`FrequentWindowProcessor.java`, `LossyFrequentWindowProcessor.java`,
    Misra-Gries / lossy counting).

    Batch mode computes *exact* heavy hitters (count + rank ≤ n), which
    is the fixed point the reference's sketches approximate. The
    streaming twin keeps Misra-Gries state (streaming module).
    Two-level agg: partial count map-side, then a tiny ranked set.
    """
    counts = df.groupBy(*keys, *group_cols).agg(F.count("*").alias("freq"))
    w = Window.partitionBy(*keys).orderBy(F.desc("freq"), *[F.asc(c) for c in group_cols])
    return counts.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n)


def lossy_frequent(
    df: DataFrame,
    support: float,
    keys: Sequence[str],
    group_cols: Sequence[str],
) -> DataFrame:
    """Support-threshold heavy hitters: Siddhi `lossyFrequent(support,
    error, attrs)` (`LossyFrequentWindowProcessor.java`, lossy counting).

    Lossy counting's contract is "emit every item whose true frequency
    ≥ support × N, none below (support − error) × N". Batch mode
    computes the exact fixed point: count per item, keep freq ≥
    support × group total. Two keyed aggregations, both with map-side
    partial aggregation — no item list ever sits on one node."""
    counts = df.groupBy(*keys, *group_cols).agg(F.count(F.lit(1)).alias("freq"))
    totals = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_total"))
    if keys:
        joined = counts.join(totals, list(keys))
    else:
        # keyless: totals is a single row — broadcast cross join
        joined = counts.crossJoin(F.broadcast(totals))
    return joined.filter(F.col("freq") >= support * F.col("_total")).drop("_total")


def expression_batch(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    budget_col: str,
    limit: float,
) -> DataFrame:
    """Dynamic retain-while window: Siddhi `expressionBatch('…')` /
    `expression('…')` (`ExpressionBatchWindowProcessor.java`,
    `ExpressionWindowProcessor.java`) — the window keeps events while a
    state expression holds (here the canonical form: cumulative
    `sum(budget) <= limit` over the newest events).

    Batch analog: per key, walk from the newest event backwards and
    keep the maximal suffix whose running sum stays within the limit —
    a reverse-cumulative-sum frame filter, no self-join, one keyed
    shuffle."""
    order_cols = [c if isinstance(c, Column) else F.col(c) for c in order]
    w = _keyed_window(keys, [c.desc() for c in order_cols]).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("_run", F.sum(budget_col).over(w))
        .filter(F.col("_run") <= limit)
        .drop("_run")
    )


def unique_last(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Keep the latest event per key: `unique:*` extension family
    (`[ext:unique]`, SURVEY.md §3.3) — first/last per unique key.

    row_number desc = 1. (`dropDuplicates` would keep an *arbitrary*
    row; the reference's unique:last is order-defined.)"""
    w = _keyed_window(keys, [c if isinstance(c, Column) else F.col(c) for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def delay(df: DataFrame, ts: str, duration: str) -> DataFrame:
    """Time-shift: Siddhi `delay(t)` (`DelayWindowProcessor.java`) —
    events re-emitted t later. In event-time terms that is `ts + t`."""
    return df.withColumn(ts, F.col(ts) + F.expr(f"INTERVAL {duration}"))
