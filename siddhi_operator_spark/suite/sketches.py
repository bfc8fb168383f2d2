"""Suite: approximate aggregation — `[ext:approximate]`
(SURVEY.md §3.9: `approximate:distinctCount` HLL-style,
`approximate:count` count-min-style).

HLL sketch internals differ per engine, so its oracle checks the
*accuracy contract* (estimate within bound → boolean), while the
count-min sketch is built from portable md5 arithmetic and must match
DuckDB byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..fpround import r4
from ..operators import sketches as SK
from .registry import register


@register(
    "approx_distinct_bound",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_distinct,
           TRUE                    AS within_bound
    FROM events
    GROUP BY event_type
    """,
    tags=("sketch", "approximate"),
)
def approx_distinct_bound(spark: SparkSession, sf: str) -> DataFrame:
    """`approximate:distinctCount` (HLL++ via approx_count_distinct):
    the estimate itself is engine-specific, so the hash-checked output
    is the exact count plus the accuracy-contract flag (|approx −
    exact| ≤ 15% · exact) — TRUE on healthy sketches."""
    e = load(spark, sf, "events")
    out = SK.hll_distinct_with_bound(
        e, keys=["event_type"], col="user_id", rsd=0.05, tolerance=0.15
    )
    return out.select("event_type", "exact_distinct", "within_bound")


@register(
    "sketch_count_min",
    oracle="""
    WITH depths AS (SELECT * FROM (VALUES (0),(1),(2)) d(depth)),
    cells AS (
      SELECT depth,
             ('0x' || substr(md5(depth || '|' || event_type), 1, 8))::BIGINT % 64
               AS bucket
      FROM events CROSS JOIN depths
    ),
    sketch AS (
      SELECT depth, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
    ),
    items AS (SELECT DISTINCT event_type FROM events),
    probes AS (
      SELECT event_type, depth,
             ('0x' || substr(md5(depth || '|' || event_type), 1, 8))::BIGINT % 64
               AS bucket
      FROM items CROSS JOIN depths
    ),
    est AS (
      SELECT event_type, min(cnt) AS cms_estimate
      FROM probes JOIN sketch USING (depth, bucket)
      GROUP BY 1
    ),
    exact AS (SELECT event_type, count(*) AS exact_cnt FROM events GROUP BY 1)
    SELECT x.event_type, e.cms_estimate, x.exact_cnt,
           e.cms_estimate >= x.exact_cnt AS overcount_ok
    FROM est e JOIN exact x ON e.event_type = x.event_type
    """,
    tags=("sketch", "approximate"),
)
def sketch_count_min(spark: SparkSession, sf: str) -> DataFrame:
    """`approximate:count` (count-min sketch) built in DataFrame
    algebra: d×w cell counts (one keyed agg — the sketch is d·w rows
    at ANY input scale), point queries via broadcast join, estimate =
    min over depth cells. md5 bucket hashes → DuckDB computes the
    byte-identical sketch; CMS overcount invariant is part of the
    checked output."""
    e = load(spark, sf, "events")
    sketch = SK.count_min_build(e, F.col("event_type"), depth=3, width=64)
    items = e.select("event_type").distinct()
    est = SK.count_min_estimate(sketch, items, "event_type", depth=3, width=64)
    exact = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "cms_estimate",
            "exact_cnt",
            (F.col("cms_estimate") >= F.col("exact_cnt")).alias("overcount_ok"),
        )
    )


@register(
    "approx_percentile_bound",
    oracle="""
    SELECT event_type,
           round(1e-9 + quantile_cont(value, 0.95), 4) AS exact_p,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    """,
    tags=("sketch", "approximate", "percentile"),
)
def approx_percentile_bound(spark: SparkSession, sf: str) -> DataFrame:
    """`approximate:percentile(value, 0.95)` per event_type: the
    hash-checked columns are the exact continuous percentile and the
    rank-error contract flag; the sketch estimate itself is
    engine-specific and excluded (same discipline as
    approx_distinct_bound)."""
    e = load(spark, sf, "events")
    out = SK.approx_percentile_with_bound(
        e, keys=["event_type"], col="value", percentile=0.95, accuracy=1000
    )
    return out.select(
        "event_type",
        r4(F.col("exact_p"), 4).alias("exact_p"),
        "within_bound",
    )
