"""Partition executors — Siddhi `partition with (…)` (SURVEY.md §2.1
`[qapi] execution/partition/Partition.java`; `[core]
partition/PartitionRuntime.java`).

The reference clones a query group per key value (thread-local
instances). On Spark the partition IS the shuffle: `groupBy(key)` /
`repartition(key)` gives per-key isolation with cluster-wide
parallelism — no cloning. The two executor forms map to:

- value partition (`ValuePartitionExecutor.java`): the key column
  itself.
- range partition (`RangePartitionExecutor.java`:
  `partition with (value < 50 as 'low' or … of S)`): a CASE WHEN
  bucket column, then group on the bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def range_partition(
    col: Column, bounds: Sequence[tuple[float, str]], default_label: str
) -> Column:
    """Bucket a numeric column into labeled ranges: successive
    `(upper_bound, label)` pairs, first match wins, else the default —
    exactly `RangePartitionExecutor`'s ordered-condition semantics.
    Pure Catalyst CASE WHEN: codegen'd, pushdown-friendly, and usable
    directly as a groupBy/repartition key."""
    expr: Column | None = None
    for upper, label in bounds:
        cond = col < upper
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    if expr is None:
        raise ValueError("range_partition requires at least one bound")
    return expr.otherwise(default_label)
