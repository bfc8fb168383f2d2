"""Suite: join forms (SURVEY.md §3.4 —
`[core] query/input/stream/join/JoinProcessor.java`,
`util/parser/JoinInputStreamParser.java`, table probes via
`IndexedEventHolder`/`IndexOperator`).

Scale notes: dimension sides are broadcast (the reference's hash-index
probe ≡ broadcast hash join — zero shuffle of the fact stream);
stream-stream joins carry equi keys + a time-range residual so Catalyst
plans a keyed join, never a cartesian range probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import incremental as I
from ..operators import joins as J
from ..fpround import r4
from .registry import register


@register(
    "join_stream_table",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*)              AS n,
           round(1e-9 + sum(e.value), 4) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    tags=("join", "stream-table"),
)
def join_stream_table(spark: SparkSession, sf: str) -> DataFrame:
    """Stream ⋈ table on `@PrimaryKey` (`IndexOperator` hash lookup) ≡
    broadcast hash join + agg."""
    e = load(spark, sf, "events")
    c = load(spark, sf, "customer")
    joined = J.stream_table_join(e, c, on=e.user_id == c.c_custkey)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "join_outer_stream_table",
    oracle="""
    SELECT c.c_custkey,
           count(e.event_id)                  AS n_events,
           round(1e-9 + coalesce(sum(e.value), 0), 4) AS sum_value
    FROM customer c LEFT JOIN events e ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    tags=("join", "outer"),
)
def join_outer_stream_table(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join (`JoinInputStreamParser` outer handling):
    unmatched side emitted with nulls → customers with zero events kept."""
    e = load(spark, sf, "events")
    c = load(spark, sf, "customer")
    joined = c.join(e, on=e.user_id == c.c_custkey, how="left")
    return joined.groupBy("c_custkey").agg(
        F.count("event_id").alias("n_events"),
        r4(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias("sum_value"),
    )


@register(
    "join_windowed_self",
    oracle="""
    SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id,
           a.ts AS click_ts, b.ts AS view_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'view'
     AND b.ts >= a.ts - INTERVAL 5 MINUTES
     AND b.ts <= a.ts + INTERVAL 5 MINUTES
    """,
    tags=("join", "stream-stream"),
)
def join_windowed_self(spark: SparkSession, sf: str) -> DataFrame:
    """Stream ⋈ stream over `#window.time(5 min)` on both sides
    (`JoinProcessor.java`): click events probe the views window ±5 min,
    per user. Equi key (user_id) + time-range residual."""
    e = load(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click")
    views = e.filter(F.col("event_type") == "view")
    joined = J.windowed_stream_join(
        clicks,
        views,
        left_ts="ts",
        right_ts="ts",
        equi_keys=[("user_id", "user_id")],
        within_seconds=300,
    )
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("view_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("view_ts"),
    )


@register(
    "join_in_table",
    oracle="""
    SELECT e.event_id, e.user_id, e.value
    FROM events e
    WHERE e.user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
    tags=("join", "in-table"),
)
def join_in_table(spark: SparkSession, sf: str) -> DataFrame:
    """`user_id in RichCustomers` (`InConditionExpressionExecutor.java`)
    → broadcast left-semi join."""
    e = load(spark, sf, "events")
    rich = load(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    out = J.in_table(e, rich.select("c_custkey"), on=e.user_id == rich.c_custkey)
    return out.select("event_id", "user_id", "value")


@register(
    "join_not_in_table",
    oracle="""
    SELECT e.event_id, e.user_id
    FROM events e
    WHERE e.user_id NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
    tags=("join", "in-table"),
)
def join_not_in_table(spark: SparkSession, sf: str) -> DataFrame:
    """`not (user_id in T)` → broadcast left-anti join."""
    e = load(spark, sf, "events")
    rich = load(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    out = J.in_table(
        e, rich.select("c_custkey"), on=e.user_id == rich.c_custkey, negate=True
    )
    return out.select("event_id", "user_id")


@register(
    "join_theta_residual",
    oracle="""
    SELECT e.event_id, e.user_id, e.value, c.c_acctbal
    FROM events e JOIN customer c
      ON e.user_id = c.c_custkey AND e.value > c.c_acctbal / 100
    """,
    tags=("join", "theta"),
)
def join_theta_residual(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary θ-condition join (the reference compiles any `on`
    expression — `JoinProcessor.java`): equi key carries the join,
    the θ-part rides as a residual filter."""
    e = load(spark, sf, "events")
    c = load(spark, sf, "customer")
    joined = J.stream_table_join(
        e, c, on=(e.user_id == c.c_custkey) & (e.value > c.c_acctbal / 100)
    )
    return joined.select("event_id", "user_id", "value", "c_acctbal")


@register(
    "join_multiway_dims",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_customers, round(1e-9 + sum(c.c_acctbal), 4) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    tags=("join", "multiway"),
)
def join_multiway_dims(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-way dimension chain (customer⋈nation⋈region) — broadcast
    both tiny dims; zero shuffles on the fact side until the final agg."""
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        r4(F.sum("c_acctbal"), 4).alias("total_bal"),
    )


@register(
    "join_stream_aggregation",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start, event_type,
             count(*) AS cnt, sum(value) AS sum_v
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type,
           d.bucket_start,
           round(1e-9 + d.sum_v, 4)           AS day_sum,
           round(1e-9 + d.sum_v / d.cnt, 4)   AS day_avg
    FROM events e
    JOIN daily d ON d.event_type = e.event_type
                AND d.bucket_start = CAST(date_trunc('day', e.ts) AS TIMESTAMP)
    WHERE e.ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND e.ts <  TIMESTAMP '2024-01-20 00:00:00'
      AND d.bucket_start >= TIMESTAMP '2024-01-10 00:00:00'
      AND d.bucket_start <  TIMESTAMP '2024-01-20 00:00:00'
    """,
    tags=("join", "aggregation"),
)
def join_stream_aggregation(spark: SparkSession, sf: str) -> DataFrame:
    """Stream ⋈ incremental aggregation `within … per 'days'`
    (`IncrementalAggregateCompileCondition.java`): events enriched with
    their day-granularity rollup, range-pruned to the `within` window.
    The rollup comes from the cascade (operators/incremental.py) —
    derived sec→…→day without re-reading raw data."""
    e = load(spark, sf, "events")
    cascade = I.rollup_cascade(e, "ts", "value", keys=("event_type",), granularities=("hour", "day"))
    start, end = "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    daily = I.query_within_per(cascade, "day", start, end)
    ev = e.filter(
        (F.col("ts") >= F.lit(start).cast("timestamp"))
        & (F.col("ts") < F.lit(end).cast("timestamp"))
    )
    joined = J.join_aggregation(
        ev.withColumn("day", F.date_trunc("day", "ts")),
        daily.withColumnRenamed("event_type", "agg_event_type"),
        on=(F.col("event_type") == F.col("agg_event_type"))
        & (F.col("day") == F.col("bucket_start")),
    )
    return joined.select(
        "event_id",
        "event_type",
        "bucket_start",
        r4(F.col("sum_v"), 4).alias("day_sum"),
        r4(F.col("avg_v"), 4).alias("day_avg"),
    )


@register(
    "join_unidirectional",
    oracle="""
    SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'view'
     AND b.ts >= a.ts - INTERVAL 5 MINUTES
     AND b.ts <= a.ts
    """,
    tags=("join", "unidirectional"),
)
def join_unidirectional(spark: SparkSession, sf: str) -> DataFrame:
    """`from clicks unidirectional join views#window.time(5 min)`
    (grammar keyword; `JoinProcessor` trigger flags): only click
    arrivals emit — a pair exists iff the view was already inside the
    window when the click arrived (view.ts ≤ click.ts)."""
    e = load(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click")
    views = e.filter(F.col("event_type") == "view")
    joined = J.windowed_stream_join(
        clicks,
        views,
        left_ts="ts",
        right_ts="ts",
        equi_keys=[("user_id", "user_id")],
        within_seconds=300,
        unidirectional=True,
    )
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("view_id"),
    )


@register(
    "join_asof",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'click'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) = 1
    ), purchases AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           c.event_id AS click_id,
           round(1e-9 + c.value, 4) AS click_value,
           date_diff('second', c.ts, p.ts) AS lag_sec
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """Backward as-of join (beyond-reference timeseries op): each
    purchase picks up the latest prior-or-equal click of the same
    user. Union-tag + last(ignorenulls) window — ONE keyed shuffle,
    no inequality-join range explosion (operators/joins.asof_join)."""
    from pyspark.sql.window import Window

    e = load(spark, sf, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(
                    F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    j = J.asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        right_cols=["event_id", "value"],
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("r_event_id").alias("click_id"),
        r4(F.col("r_value")).alias("click_value"),
        (F.col("ts").cast("long") - F.col("r_ts").cast("long")).alias("lag_sec"),
    )


@register(
    "join_range_interval",
    oracle="""
    WITH windows AS (
      SELECT event_id AS window_id, ts AS w_start,
             ts + INTERVAL 10 MINUTES AS w_end
      FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id AS event_id, w.window_id AS window_id,
           date_diff('second', w.w_start, e.ts) AS offset_sec
    FROM events e JOIN windows w
      ON e.ts >= w.w_start AND e.ts < w.w_end
    WHERE e.event_type != 'error' OR e.event_id != w.window_id
    """,
    tags=("join", "range"),
)
def join_range_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-interval join (beyond-reference range op): pair every
    event with each 10-minute error window containing it. Intervals
    explode into covered time buckets → equi-join on bucket + exact
    range residual; candidate volume O(points + intervals·L/g) instead
    of the O(n·m) cartesian range probe
    (operators/joins.range_interval_join)."""
    e = load(spark, sf, "events")
    windows = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    pts = e.select("event_id", "ts", "event_type")
    j = J.range_interval_join(
        pts, windows, point_ts="ts", start_ts="w_start", end_ts="w_end",
        bucket_seconds=600,
    )
    return j.filter(
        (F.col("event_type") != "error") | (F.col("event_id") != F.col("window_id"))
    ).select(
        "event_id",
        "window_id",
        (F.col("ts").cast("long") - F.col("w_start").cast("long")).alias(
            "offset_sec"
        ),
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS n,
           round(1e-9 + sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("join", "bucketed", "colocated"),
)
def join_bucketed_colocated(spark: SparkSession, sf: str) -> DataFrame:
    """Fact⋈fact via the CO-LOCATED bucketed layout (the third leg of
    the join strategy next to broadcast and shuffle): both facts are
    written `bucketBy(orderkey)` + sorted, so the join plans with NO
    exchange on either side — matching buckets are co-partitioned on
    disk (plan pinned by `tests/test_plans.py::
    test_bucketed_join_shuffle_free`). At 100 TB this is the layout
    the nightly fact tables are maintained in; here the write is the
    test ingest and the oracle proves the exchange-free join returns
    byte-identical aggregates.

    NB: building this entry's plan WRITES the two bucketed tables into
    the session's warehouse (names scoped by sf so different fixture
    dirs don't clobber each other) — the one registry fn with a stage
    side effect, same class as the file-staging source entries. The
    merge hint pins the SORT-MERGE path: without it the gate-scale
    tables fall under the broadcast threshold and the co-located
    layout would go untested."""
    import re as _re

    from ..catalog import write_bucketed

    tag = _re.sub(r"[^a-z0-9]+", "_", sf.lower()).strip("_")
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(o, f"suite_bkt_orders_{tag}", "o_orderkey", n_buckets=8)
    write_bucketed(li, f"suite_bkt_lineitem_{tag}", "l_orderkey", n_buckets=8)
    ob = spark.table(f"suite_bkt_orders_{tag}").hint("merge")
    lb = spark.table(f"suite_bkt_lineitem_{tag}")
    j = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


@register(
    "join_windowed_self_auto",
    oracle="""
    SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id,
           a.ts AS click_ts, b.ts AS view_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'view'
     AND b.ts >= a.ts - INTERVAL 5 MINUTES
     AND b.ts <= a.ts + INTERVAL 5 MINUTES
    """,
    tags=("join", "stream-stream", "auto-tier"),
)
def join_windowed_self_auto(spark: SparkSession, sf: str) -> DataFrame:
    """The r13 ``bucket="auto"`` tier of :func:`join_windowed_self`:
    the plain-vs-epoch-coarsened pick is DERIVED from measured key
    density (`operators/joins.py::derive_join_bucket` — worst-key
    l×r pair production vs max(total/4, 1e6), the same anchored rule
    as the pattern tier's `choose_pattern_impl`). On constant-density
    fixtures it resolves to the plain keyed join (measured faster at
    ×100 r8 and ×10000 r13); the hot-key pick is unit-pinned in
    `tests/test_operators_batch.py::test_join_bucket_auto_derives_regime`
    and decade-measured in SCALEBENCH r13 `jws_hotkey`. Driver-gated
    against the same relational oracle as the shipped row, so
    whichever plan the stats pick must match DuckDB."""
    e = load(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click")
    views = e.filter(F.col("event_type") == "view")
    joined = J.windowed_stream_join(
        clicks,
        views,
        left_ts="ts",
        right_ts="ts",
        equi_keys=[("user_id", "user_id")],
        within_seconds=300,
        bucket="auto",
    )
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("view_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("view_ts"),
    )
