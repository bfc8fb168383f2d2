"""UDAF SPI (`[core] AttributeAggregatorExecutor.java` → pandas
GROUPED_AGG via `functions.register_udaf`): registration, lookup,
single- and multi-argument reduction, and use alongside builtins."""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F

from siddhi_operator_spark.functions import register_udaf, udaf


def test_builtin_udafs_reduce_groups(spark):
    df = spark.createDataFrame(
        [("a", 2.0, 1.0), ("a", 8.0, 3.0), ("b", 5.0, 1.0)],
        ["k", "v", "w"],
    )
    out = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            udaf("custom:geomean")(F.col("v")).alias("g"),
            udaf("custom:wavg")(F.col("v"), F.col("w")).alias("wa"),
        )
        .collect()
    }
    assert math.isclose(out["a"]["g"], 4.0)  # sqrt(2*8)
    assert math.isclose(out["a"]["wa"], (2.0 + 24.0) / 4.0)
    assert math.isclose(out["b"]["g"], 5.0)


def test_register_custom_udaf(spark):
    def _range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    register_udaf("test:range")(_range)
    df = spark.createDataFrame([(1, 3.0), (1, 10.0), (2, 4.0)], ["k", "v"])
    rows = {
        r["k"]: r["rng"]
        for r in df.groupBy("k")
        .agg(udaf("test:range")(F.col("v")).alias("rng"))
        .collect()
    }
    assert rows == {1: 7.0, 2: 0.0}
