"""Approximate / sketch aggregations — `[ext:approximate]`
(SURVEY.md §3.9: `approximate:distinctCount` ≈ HLL,
`approximate:count` ≈ count-min sketch).

Two flavors:

- **HLL distinct count**: Spark-native `approx_count_distinct`
  (HyperLogLog++, mergeable partial aggregates — the canonical 100 TB
  distinct counter). Sketch internals differ across engines, so the
  oracle checks the *accuracy contract* (estimate within rsd bounds of
  exact), not sketch bytes.

- **Count-min sketch**: built from first principles in DataFrame
  algebra so the arithmetic is engine-portable (md5-derived bucket
  hashes — DuckDB runs the byte-identical computation): d independent
  hash rows × w buckets; `estimate(item) = min_d sketch[d][h_d(item)]`.
  Building the sketch is ONE groupBy((depth, bucket)) count — at 100 TB
  the sketch table is d×w rows regardless of input size, and point
  queries are a broadcast join against it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(item: Column, depth: int, width: int) -> Column:
    """Portable bucket hash: first 8 hex chars of md5(depth || '|' ||
    item) as an int, mod width. Identical in DuckDB:
    `('0x' || substr(md5(d || '|' || item), 1, 8))::BIGINT % width`."""
    h = F.md5(F.concat(F.lit(f"{depth}|"), item.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def count_min_build(
    df: DataFrame, item: Column, depth: int = 3, width: int = 64
) -> DataFrame:
    """Build the d×w sketch: explode each row into d (depth, bucket)
    cells, count per cell. Output is exactly depth×width rows."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        cms_bucket(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.depth", "cell.bucket")
    return cells.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Point query: min over the d cells an item hashes to. The sketch
    side is tiny (d×w rows) → broadcast join, no shuffle of `items`.
    CMS guarantees estimate ≥ true count."""
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        cms_bucket(F.col(item_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(item_col, "cell.depth", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def hll_distinct_with_bound(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    rsd: float = 0.05,
    tolerance: float = 0.15,
) -> DataFrame:
    """`approximate:distinctCount` with its accuracy contract made
    checkable: emit the HLL estimate, the exact count, and whether the
    estimate honors the error bound (HLL++ at rsd=0.05 is well inside
    ±15% with overwhelming probability — the flag is the testable
    invariant that survives engine-specific sketch internals)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
        F.countDistinct(col).alias("exact_distinct"),
        (
            F.abs(
                F.approx_count_distinct(col, rsd) - F.countDistinct(col)
            )
            <= tolerance * F.countDistinct(col)
        ).alias("within_bound"),
    )


def approx_percentile_with_bound(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    percentile: float = 0.95,
    accuracy: int = 1000,
    rank_tolerance: float = 0.02,
) -> DataFrame:
    """`approximate:percentile(value, p)` (`[ext:approximate]`
    percentile over a quantile sketch) with the accuracy contract made
    checkable, same pattern as ``hll_distinct_with_bound``: the sketch
    estimate is engine-specific, so the hash-checked output is the
    EXACT percentile plus a flag that the approx value's true rank sits
    within ±rank_tolerance of the requested percentile (the
    KLL/GK-sketch guarantee; `percentile_approx` at accuracy=1000
    bounds rank error at 1/1000).

    Scale: both aggregates are partial-merge aggregations (sketch
    merge map-side); the rank check is one extra keyed agg over a
    broadcast of the tiny estimate table."""
    est = df.groupBy(*keys).agg(
        F.percentile_approx(col, percentile, accuracy).alias("approx_p"),
        F.expr(f"percentile({col}, {percentile})").alias("exact_p"),
    )
    joined = df.join(F.broadcast(est), on=list(keys))
    return joined.groupBy(*keys).agg(
        F.first("approx_p").alias("approx_p"),
        F.first("exact_p").alias("exact_p"),
        (
            F.abs(
                F.avg((F.col(col) <= F.col("approx_p")).cast("double"))
                - F.lit(percentile)
            )
            <= F.lit(rank_tolerance) + F.lit(1.0) / F.count(F.lit(1))
        ).alias("within_bound"),
    )
