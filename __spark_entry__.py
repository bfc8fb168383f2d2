"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship tumbling-window aggregation on
sf0.001. ``queries()``/``oracle_sql()`` expose the full registered
suite (siddhi_operator_spark.suite) — one entry per implemented
operator from SURVEY.md §3, each with a DuckDB oracle where the
semantics are SQL-expressible (streaming-only/hash-specific ops are
rows-only, as permitted by the contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from siddhi_operator_spark.suite import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events tumbling 1-hour
    window, sum/count by event_type (SURVEY.md §8.2's end-to-end
    slice)."""
    return REGISTRY["window_timebatch"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
