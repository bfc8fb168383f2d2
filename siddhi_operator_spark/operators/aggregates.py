"""Aggregator inventory — SURVEY.md §3.5
(`[core] query/selector/attribute/aggregator/*AttributeAggregatorExecutor.java`).

Almost everything is a native Catalyst aggregate (partial+final split,
whole-stage codegen — strictly better than the reference's per-event
accumulators). The few reference-specific semantics are encoded here:

- `stdDev` is **population** std-dev → `stddev_pop` (Spark's `stddev`
  is sample).
- `distinctCount` is exact (hash map per group) → `countDistinct`;
  `approx_count_distinct` is the 100 TB-friendly variant, exposed
  separately (mirrors `[ext:approximate]`).
- `minForever`/`maxForever` never retract → running cumulative extrema.
- `unionSet` accumulates a set → `collect_set`; we expose a
  deterministic sorted rendering for comparisons.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def agg_map(col: str) -> dict[str, Column]:
    """The full scalar aggregator set over one numeric column, named."""
    c = F.col(col)
    return {
        "sum": F.sum(c),
        "avg": F.avg(c),
        "count": F.count(F.lit(1)),
        "distinct_count": F.countDistinct(c),
        "min": F.min(c),
        "max": F.max(c),
        "std_dev": F.stddev_pop(c),
    }


def union_set(col: str) -> Column:
    """`unionSet(x)` (`UnionSetAttributeAggregatorExecutor`): group set.
    Rendered sorted-joined so results are deterministic under shuffle
    reordering."""
    return F.array_join(F.sort_array(F.collect_set(F.col(col))), ",")


def bool_and(cond: Column) -> Column:
    """`and` aggregator (`AndAttributeAggregatorExecutor`)."""
    return F.bool_and(cond)


def bool_or(cond: Column) -> Column:
    """`or` aggregator (`OrAttributeAggregatorExecutor`)."""
    return F.bool_or(cond)


def forever_extrema(
    df: DataFrame,
    col: str,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """`minForever`/`maxForever` (`MinForeverAttributeAggregatorExecutor`,
    `MaxForever…`): all-time running extrema that never retract even as
    window events expire. Batch mapping: cumulative min/max over event
    order per key (UNBOUNDED PRECEDING .. CURRENT ROW)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("min_forever", F.min(col).over(w)).withColumn(
        "max_forever", F.max(col).over(w)
    )
