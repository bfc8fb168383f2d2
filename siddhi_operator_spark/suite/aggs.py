"""Suite: aggregator inventory (SURVEY.md §3.5 —
`[core] query/selector/attribute/aggregator/`), plus group-by/having/
order-by/limit selector semantics (`QuerySelector.java`) and the
Spark-free extensions (cube/rollup — absent in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import aggregates as A
from ..fpround import r4
from .registry import register


@register(
    "agg_basic",
    oracle="""
    SELECT event_type,
           round(1e-9 + sum(value), 4)        AS sum_v,
           round(1e-9 + avg(value), 4)        AS avg_v,
           count(*)                    AS cnt,
           count(DISTINCT user_id)     AS distinct_users,
           round(1e-9 + min(value), 4)        AS min_v,
           round(1e-9 + max(value), 4)        AS max_v,
           round(1e-9 + stddev_pop(value), 4) AS std_v
    FROM events
    GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_basic(spark: SparkSession, sf: str) -> DataFrame:
    """sum/avg/count/distinctCount/min/max/stdDev per group
    (`SumAttributeAggregatorExecutor` et al.). Reference's stdDev is
    population → `stddev_pop`."""
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        r4(F.sum("value"), 4).alias("sum_v"),
        r4(F.avg("value"), 4).alias("avg_v"),
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("user_id").alias("distinct_users"),
        r4(F.min("value"), 4).alias("min_v"),
        r4(F.max("value"), 4).alias("max_v"),
        r4(F.stddev_pop("value"), 4).alias("std_v"),
    )


@register(
    "agg_forever_extrema",
    oracle="""
    SELECT event_id, user_id,
           round(1e-9 + min(value) OVER w, 4) AS min_forever,
           round(1e-9 + max(value) OVER w, 4) AS max_forever
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
    """,
    tags=("agg", "forever"),
)
def agg_forever_extrema(spark: SparkSession, sf: str) -> DataFrame:
    """minForever/maxForever (`MinForeverAttributeAggregatorExecutor`):
    all-time running extrema, never retracted."""
    e = load(spark, sf, "events")
    out = A.forever_extrema(e, "value", keys=["user_id"], order=[F.col("ts"), F.col("event_id")])
    return out.select(
        "event_id",
        "user_id",
        r4(F.col("min_forever"), 4).alias("min_forever"),
        r4(F.col("max_forever"), 4).alias("max_forever"),
    )


@register(
    "agg_unionset",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_set,
           count(DISTINCT event_type)                               AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "unionSet"),
)
def agg_unionset(spark: SparkSession, sf: str) -> DataFrame:
    """unionSet/createSet/sizeOfSet
    (`UnionSetAttributeAggregatorExecutor`): the set of event types per
    user, rendered sorted for determinism."""
    e = load(spark, sf, "events")
    return e.groupBy("user_id").agg(
        A.union_set("event_type").alias("type_set"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "agg_bool",
    oracle="""
    SELECT user_id,
           bool_and(value > 5)   AS all_gt5,
           bool_or(value > 900)  AS any_gt900
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "bool"),
)
def agg_bool(spark: SparkSession, sf: str) -> DataFrame:
    """and/or aggregators (`AndAttributeAggregatorExecutor`,
    `OrAttributeAggregatorExecutor`)."""
    e = load(spark, sf, "events")
    return e.groupBy("user_id").agg(
        A.bool_and(F.col("value") > 5).alias("all_gt5"),
        A.bool_or(F.col("value") > 900).alias("any_gt900"),
    )


@register(
    "agg_having_orderby_limit",
    oracle="""
    SELECT user_id, round(1e-9 + sum(value), 4) AS total, count(*) AS n
    FROM events
    GROUP BY user_id
    HAVING sum(value) > 1000
    ORDER BY total DESC, user_id
    LIMIT 20
    """,
    tags=("agg", "having", "orderby", "limit"),
)
def agg_having_orderby_limit(spark: SparkSession, sf: str) -> DataFrame:
    """group by + having + order by + limit (`QuerySelector.java` —
    having is a post-agg filter; order/limit are chunk-scoped in the
    reference, global here in batch mode). Deterministic tiebreak on
    user_id so LIMIT is stable on both sides."""
    e = load(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .agg(r4(F.sum("value"), 4).alias("total"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("total") > 1000)
        .orderBy(F.desc("total"), F.asc("user_id"))
        .limit(20)
    )


@register(
    "agg_multikey",
    oracle="""
    SELECT event_type, user_id % 10 AS user_bucket,
           count(*) AS n, round(1e-9 + avg(value), 4) AS avg_v
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "groupby"),
)
def agg_multikey(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-key group by (`GroupByKeyGenerator.java`)."""
    e = load(spark, sf, "events")
    return e.groupBy(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    ).agg(F.count(F.lit(1)).alias("n"), r4(F.avg("value"), 4).alias("avg_v"))


@register(
    "agg_rollup_cube",
    oracle="""
    SELECT event_type, user_id % 5 AS ub,
           count(*) AS n, round(1e-9 + sum(value), 4) AS sum_v
    FROM events
    GROUP BY CUBE (event_type, user_id % 5)
    """,
    tags=("agg", "cube"),
)
def agg_rollup_cube(spark: SparkSession, sf: str) -> DataFrame:
    """cube/rollup — absent in the reference (SURVEY.md §3.5), exposed
    free from Spark as an engine extension."""
    e = load(spark, sf, "events")
    return e.cube("event_type", (F.col("user_id") % 5).alias("ub")).agg(
        F.count(F.lit(1)).alias("n"), r4(F.sum("value"), 4).alias("sum_v")
    )


@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(1e-9 + sum(l_quantity), 4)                                        AS sum_qty,
           round(1e-9 + sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(1e-9 + sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(1e-9 + avg(l_quantity), 4)                                        AS avg_qty,
           round(1e-9 + avg(l_extendedprice), 4)                                   AS avg_price,
           round(1e-9 + avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 — the canonical wide-agg benchmark query; also the
    BASELINE.md headline. Partial aggregation map-side; scan reads only
    the 7 referenced columns (check ReadSchema)."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity"), 4).alias("sum_qty"),
            r4(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            r4(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            r4(F.avg("l_quantity"), 4).alias("avg_qty"),
            r4(F.avg("l_extendedprice"), 4).alias("avg_price"),
            r4(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_group_concat",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list_distinct(list(CAST(user_id AS VARCHAR)))), ',')
             AS users_concat
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "string"),
)
def agg_group_concat(spark: SparkSession, sf: str) -> DataFrame:
    """`str:groupConcat(x)` (`[ext:string]` aggregator). Sorted
    rendering — arrival order doesn't exist under a distributed
    shuffle, so sorted order is the documented semantic delta."""
    e = load(spark, sf, "events")
    return (
        e.withColumn("user_str", F.col("user_id").cast("string"))
        .groupBy("event_type")
        .agg(A.group_concat("user_str", distinct=True).alias("users_concat"))
    )


@register(
    "agg_extrema_min_max_by",
    oracle="""
    SELECT event_type,
           arg_min(event_id, printf('%017.4f|%010d', value, event_id)) AS min_event,
           arg_max(event_id, printf('%017.4f|%010d', value, event_id)) AS max_event
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "extrema"),
)
def agg_extrema_min_max_by(spark: SparkSession, sf: str) -> DataFrame:
    """`extrema:minByValue`/`maxByValue` (`[ext:extrema]`): the event
    holding the group's extreme value — `min_by`/`max_by` native
    aggregates. Ties broken deterministically via a fixed-width
    (value, id) ordering key, identical on both oracle sides."""
    e = load(spark, sf, "events")
    key = F.format_string("%017.4f|%010d", F.col("value"), F.col("event_id"))
    return e.groupBy("event_type").agg(
        F.min_by("event_id", key).alias("min_event"),
        F.max_by("event_id", key).alias("max_event"),
    )


@register(
    "agg_ts_regress_forecast",
    oracle="""
    SELECT event_type,
           round(1e-9 + regr_slope(value, x), 4)     AS slope,
           round(1e-9 + regr_intercept(value, x), 4) AS intercept,
           round(1e-9 + regr_r2(value, x), 4)        AS r2,
           regr_count(value, x)                      AS n,
           round(1e-9 + regr_intercept(value, x) + regr_slope(value, x) * 1000.0, 4)
             AS forecast_h1000
    FROM (
      SELECT event_type, value,
             (epoch(ts) - 1704067200.0) / 3600.0 AS x
      FROM events
    )
    GROUP BY event_type
    """,
    tags=("agg", "timeseries"),
)
def agg_ts_regress_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """`timeseries:regress` + `forecast` (`[ext:timeseries]`): OLS of
    value against hours-since-2024, extrapolated to hour 1000 — all
    native regr_* aggregates, one pass, partial+final split."""
    e = load(spark, sf, "events").withColumn(
        "x", (F.unix_timestamp("ts") - F.lit(1704067200.0)) / 3600.0
    )
    fit = A.regress(F.col("x"), F.col("value"))
    return e.groupBy("event_type").agg(
        r4(fit["slope"], 4).alias("slope"),
        r4(fit["intercept"], 4).alias("intercept"),
        r4(fit["r2"], 4).alias("r2"),
        fit["n"].alias("n"),
        r4(
            A.forecast(fit["slope"], fit["intercept"], F.lit(1000.0)), 4
        ).alias("forecast_h1000"),
    )


@register(
    "analytic_window_fns",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER w                    AS rn,
           lag(value)  OVER w                     AS prev_value,
           lead(value) OVER w                     AS next_value,
           rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
                                                  AS value_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("analytics", "window-functions"),
)
def analytic_window_fns(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY §3.6: the analytic/ranking family the reference LACKS as
    a category (its nearest equivalents are sort(n)/extrema:*/
    unique:first) — exposed natively because Spark gives
    `Window.partitionBy().orderBy()` for free. Ties broken by event_id
    so lag/lead are deterministic. One hash-partition shuffle on
    user_id serves all four functions (single Window spec = single
    sort), which is the shape a 100 TB run wants."""
    from pyspark.sql.window import Window as W

    e = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wr = W.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.rank().over(wr).alias("value_rank"),
    )


@register(
    "set_ops",
    oracle="""
    SELECT 'both' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'click_only' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    tags=("analytics", "set-ops"),
)
def set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY §3.8: the reference has no intersect/except syntax (union
    is its idiomatic multi-insert into one stream); Spark exposes them
    free. Clickers ∩ purchasers and clickers ∖ purchasers, labeled and
    unioned. Both legs are keyed distinct-shuffles (no cross product);
    `intersect`/`exceptAll` compile to left-semi/anti aggregations."""
    e = load(spark, sf, "events")
    clickers = e.filter(F.col("event_type") == "click").select("user_id")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    both = clickers.intersect(buyers).select(F.lit("both").alias("op"), "user_id")
    only = clickers.subtract(buyers).select(F.lit("click_only").alias("op"), "user_id")
    return both.unionByName(only)


@register(
    "tpch_q6",
    oracle="""
    SELECT round(1e-9 + sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.05
      AND l_quantity < 24
    """,
    tags=("agg", "tpch"),
)
def tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 — forecast revenue change: the maximally selective
    scan+agg. Every predicate must reach the parquet scan as a pushed
    filter; the agg is a single global partial+final pair."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           round(1e-9 + sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("agg", "tpch", "join"),
)
def tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, o_orderpriority standing in for the
    fixture's missing o_shippriority): selective dimension → broadcast
    into the fact scan, one keyed agg, TopK via sort+limit. The
    customer filter prunes BEFORE the join so only matching custkeys
    ship to executors. No forced broadcast on orders/customer: they
    are SF-linear (150 M orders at sf100 — a forced hint is honored at
    ANY size and OOMs); AQE picks broadcast at gate scale from runtime
    stats and falls back to shuffle joins at fact scale."""
    c = load(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    joined = li.join(
        o.join(c, o.o_custkey == c.c_custkey),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle="""
    SELECT n.n_name,
           round(1e-9 + sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("agg", "tpch", "join"),
)
def tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): five-way join over the single
    lineitem fact scan. Only the bounded dims (region, nation) carry
    forced broadcast hints; the SF-linear sides (customer, orders,
    supplier) are left to AQE — it broadcasts them at gate scale from
    runtime stats, and at 100 TB they co-shuffle with the fact instead
    of OOMing under a size-blind hint."""
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf, "customer")
    co = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    li = load(spark, sf, "lineitem")
    joined = li.join(
        co, F.col("l_orderkey") == F.col("o_orderkey")
    ).join(
        s,
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return joined.groupBy("n_name").agg(
        r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


@register(
    "agg_udaf_custom",
    oracle="""
    SELECT event_type,
           round(1e-9 + exp(avg(ln(value))), 4) AS geo_mean,
           round(1e-9 + sum(value * (user_id % 7 + 1))
                 / sum(user_id % 7 + 1), 4)     AS w_avg
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
    tags=("agg", "udaf"),
)
def agg_udaf_custom(spark: SparkSession, sf: str) -> DataFrame:
    """User-defined aggregators through the engine's UDAF SPI
    (`[core] AttributeAggregatorExecutor.java` → pandas GROUPED_AGG,
    `functions.register_udaf`): the worked geometric-mean aggregator
    plus the multi-argument weighted-average one, used exactly like
    built-ins inside agg(). Arrow ships each group's column(s) to the
    Python reducer in one batch; Catalyst still plans the shuffle."""
    from ..functions import udaf

    e = load(spark, sf, "events").filter(F.col("value") > 0)
    w = (F.col("user_id") % 7 + 1).cast("double")
    return e.groupBy("event_type").agg(
        r4(udaf("custom:geomean")(F.col("value")), 4).alias("geo_mean"),
        r4(udaf("custom:wavg")(F.col("value"), w), 4).alias("w_avg"),
    )


@register(
    "agg_distinct_count_salted",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS distinct_count
    FROM events GROUP BY 1
    """,
    tags=("agg", "skew"),
)
def agg_distinct_count_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distinctCount through the value-hash salt split
    (operators/aggregates.salted_distinct_count): a hot key's distinct
    state shards across n_salts reducers and the partial counts add
    back exactly — the skewed-aggregation answer AQE's skew-join
    splitting does not give you. Oracle is the plain COUNT(DISTINCT)."""
    from ..operators.aggregates import salted_distinct_count

    return salted_distinct_count(
        load(spark, sf, "events"), "event_type", "user_id", n_salts=32
    )



@register(
    "tpch_q14",
    oracle="""
    SELECT round(1e-9 + 100.0 * sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
             AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    tags=("agg", "tpch", "join"),
)
def tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 — promotion revenue share: fact-side date predicates
    push to the scan, the part dimension broadcasts, and the
    conditional ratio is one partial+final agg pair. (Adapted to the
    fixture's flat p_type domain: equality on 'PROMO' instead of the
    spec's LIKE prefix.)"""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load(spark, sf, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            r4(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 4) DESC,
             c_custkey
    LIMIT 20
    """,
    tags=("agg", "tpch", "join", "topk"),
)
def tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 — returned-item revenue, top-20 customers: the
    4-table join exercises the full dimension strategy (nation carries
    the only forced broadcast; SF-linear customer is AQE's call), the
    agg is partial+final on the customer key, and the top-20 compiles
    to TakeOrderedAndProject. Rank key rounded 4 dp (+ custkey
    tiebreak) so the cutoff is engine-deterministic."""
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(r4(F.sum(rev), 4).alias("revenue"))
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


@register(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("agg", "tpch", "join", "semi"),
)
def tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), late-shipment adaptation:
    the fixture has no l_commitdate/l_receiptdate, so "late" =
    a lineitem shipped >90 days after the order date. Shape is the
    point: EXISTS compiles to a LEFT SEMI join with a non-equi
    residual — the order scan never duplicates rows no matter how
    many lineitems match."""
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(1e-9 + sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("agg", "tpch", "join"),
)
def tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations): the dual-nation
    disjunction stays a residual over two broadcast nation probes —
    the lineitem fact scans ONCE. Forced hints only on the bounded
    nation dims; supplier/orders/customer are SF-linear and left to
    AQE (broadcast at gate scale by runtime stats, orderkey/custkey
    co-shuffles at 100 TB — a size-blind hint there is an OOM)."""
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    s = load(spark, sf, "supplier").join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c = load(spark, sf, "customer").join(
        F.broadcast(
            n.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
                "n_nationkey", "n2_nationkey"
            )
        ),
        F.col("c_nationkey") == F.col("n2_nationkey"),
    ).select("c_custkey", "cust_nation")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("agg", "tpch", "join", "outer"),
)
def tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution; the comment-regex
    exclusion adapted to a priority exclusion — the fixture has no
    o_comment). Shape: outer join preserving zero-order customers,
    then a two-level aggregation — the classic histogram-of-groups
    double shuffle, second one tiny."""
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 4)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("agg", "tpch", "join", "subquery"),
)
def tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue 'view' computes once and
    feeds both its own max (a one-row broadcast) and the supplier
    probe — no self-recompute, no window sort over the whole frame."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    top = revenue.join(
        F.broadcast(mx), revenue.total_revenue == F.col("_mx")
    ).drop("_mx")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return s.join(top, s.s_suppkey == top.supplier_no).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, round(1e-9 + sum(l.l_quantity), 4) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    """,
    tags=("agg", "tpch", "join", "semi"),
)
def tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the qualifying-orderkey set
    (group-having over the fact) semi-joins back into the fact before
    the wide customer join — the big scan is pre-filtered to ~1 % of
    orders, so the expensive 3-way join runs on the survivors only.
    No forced hints: the qualifying set and the orders/customer sides
    all grow with SF; AQE broadcasts whichever is small at runtime."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey")
    )
    li_f = li.join(big, "l_orderkey", "left_semi")
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    j = li_f.join(
        o, li_f.l_orderkey == o.o_orderkey
    ).join(c, F.col("o_custkey") == c.c_custkey)
    return j.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(r4(F.sum("l_quantity"), 4).alias("sum_qty"))


@register(
    "agg_percentile",
    oracle="""
    SELECT event_type,
           round(1e-9 + quantile_cont(value, 0.25), 4) AS p25,
           round(1e-9 + quantile_cont(value, 0.50), 4) AS p50,
           round(1e-9 + quantile_cont(value, 0.90), 4) AS p90
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def agg_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    SQL-standard continuous quantile ≡ DuckDB `quantile_cont`) — the
    §3.5 distribution-summary surface. Exact percentile sorts within
    the aggregation buffer, which is per-group bounded here; at
    100 TB-scale groups switch to `approx_percentile` (t-digest-style
    mergeable sketch, same call shape) and trade ≤ the configured
    relative error for constant memory."""
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        r4(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        r4(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
        r4(F.percentile("value", F.lit(0.90)), 4).alias("p90"),
    )


@register(
    "agg_percentile_approx_contract",
    oracle="""
    SELECT event_type,
           round(1e-9 + quantile_cont(value, 0.25), 4) AS p25,
           round(1e-9 + quantile_cont(value, 0.50), 4) AS p50,
           round(1e-9 + quantile_cont(value, 0.90), 4) AS p90,
           TRUE AS within_p25, TRUE AS within_p50, TRUE AS within_p90
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "percentile", "approximate"),
)
def agg_percentile_approx_contract(spark: SparkSession, sf: str) -> DataFrame:
    """The error contract behind agg_percentile's scale story: that row
    documents "at 100 TB switch to approx_percentile (mergeable
    sketch, same call shape)" — this row PINS that claim. One pass
    computes the exact continuous percentiles AND the sketch estimates
    (accuracy=10000) at p25/p50/p90 plus the group spread; the
    hash-checked columns are the exact values and a per-percentile
    flag |approx − exact| ≤ 5 % · spread (the sketch's rank error at
    this accuracy is ~0.01 %, far inside the bound — a flag flips only
    if the sketch tier actually breaks). Estimates themselves are
    engine-specific and excluded, same discipline as
    approx_distinct_bound / streaming_approx_percentile."""
    e = load(spark, sf, "events")
    qs = (0.25, 0.50, 0.90)
    agg = e.groupBy("event_type").agg(
        *[
            r4(F.percentile("value", F.lit(q)), 4).alias(f"p{int(q * 100)}")
            for q in qs
        ],
        F.approx_percentile(
            "value", F.array(*[F.lit(q) for q in qs]), 10000
        ).alias("_ap"),
        (F.max("value") - F.min("value")).alias("_spread"),
    )
    flags = [
        (
            F.abs(F.col("_ap")[i] - F.col(f"p{int(q * 100)}"))
            <= 0.05 * F.col("_spread")
        ).alias(f"within_p{int(q * 100)}")
        for i, q in enumerate(qs)
    ]
    return agg.select("event_type", "p25", "p50", "p90", *flags)


@register(
    "tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(1e-9 + sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS amount
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type LIKE '%ECO%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INTEGER)
    """,
    tags=("agg", "tpch", "join"),
)
def tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), supply-cost adaptation: the
    fixture has no partsupp, so profit = discounted revenue over the
    part-type filter. Shape is the point: the most-filtered dimension
    (part LIKE) broadcasts FIRST so the fact scan drops to the
    matching partkeys before the wider joins; orders joins on the
    shrunken fact."""
    p = load(spark, sf, "part").filter(
        F.col("p_type").like("%ECO%")
    ).select("p_partkey")
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(
        r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("amount")
    )


@register(
    "tpch_q19",
    oracle="""
    SELECT round(1e-9 + sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS revenue,
           count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
    tags=("agg", "tpch", "join", "disjunction"),
)
def tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), container adaptation (fixture
    has no p_container — size ranges stand in): the classic
    DISJUNCTION-of-conjunctions residual over a broadcast dimension
    join. The per-branch part predicates can't prune the fact scan
    (they cross sides), but the part side pre-filters to the union of
    brands before broadcasting."""
    p = load(spark, sf, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(p, li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(branch).agg(
        r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "tpch_q22",
    oracle="""
    SELECT c.c_nationkey,
           count(*) AS numcust,
           round(1e-9 + sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    )
    GROUP BY c.c_nationkey
    """,
    tags=("agg", "tpch", "join", "anti"),
)
def tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), nation adaptation (the
    fixture has no c_phone — nationkey groups stand in for country
    codes): scalar AVG subquery → one-row broadcast threshold, then a
    LEFT ANTI join against RECENT orders finds lapsed customers (the
    fixture has orders for every customer, so "no orders at all" is
    empty — "none since 1999" keeps Q22's shape with live rows). The
    anti join shuffles only custkeys; the threshold never leaves the
    executors."""
    c = load(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_thr")
    )
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = c.join(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("_thr")
    )
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        r4(F.sum("c_acctbal"), 4).alias("totacctbal"),
    )


@register(
    "tpch_q8",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type LIKE '%ECO%'
    )
    SELECT o_year,
           round(1e-9 + sum(CASE WHEN supp_nation = 'NATION_1'
                                 THEN volume ELSE 0 END) / sum(volume), 4)
             AS mkt_share
    FROM vol GROUP BY o_year
    """,
    tags=("agg", "tpch", "join"),
)
def tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_1's share of ASIA's
    ECO-part order volume per year. The deepest join tree in the suite
    (7 tables, two nation roles); forced hints only on the bounded
    dims (region, both nation roles) — customer/orders/supplier/the
    LIKE-filtered part ride AQE, per the r7 size-safe hint policy."""
    p = load(spark, sf, "part").filter(F.col("p_type").like("%ECO%")).select(
        "p_partkey"
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
            0.0
        )
    ) / F.sum("volume")
    return vol.groupBy("o_year").agg(r4(share, 4).alias("mkt_share"))


@register(
    "tpch_q12",
    oracle="""
    SELECT l.l_linestatus AS shipmode,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("agg", "tpch", "join"),
)
def tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), fixture
    adaptation: no l_shipmode/commitdate/receiptdate, so l_linestatus
    stands in for the mode and the ship-year window for the
    late-delivery predicate — the SHAPE is Q12's point: fact⋈fact
    join with conditional (priority-class) counts, date predicates
    pushed to the lineitem scan, no forced hints."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q17",
    oracle="""
    SELECT round(1e-9 + sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS threshold
          FROM lineitem GROUP BY 1) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.threshold
    """,
    tags=("agg", "tpch", "join", "subquery"),
)
def tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue; 0.5·avg threshold —
    the spec's 0.2 keeps no fixture rows): the correlated per-part AVG
    subquery becomes ONE keyed aggregation joined back on partkey —
    never a per-row recompute. The per-part threshold table is
    fact-derived and SF-linear, so no forced hint; the brand filter
    prunes the probe side first."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load(spark, sf, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    thr = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("threshold")
    )
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("threshold"))
    )
    return j.agg(
        r4(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
             s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n  ON n.n_nationkey = s.s_nationkey
      JOIN region r  ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT round(1e-9 + eu.s_acctbal, 4) AS s_acctbal,
           eu.s_name, eu.n_name, p.p_partkey,
           round(1e-9 + eu.ps_supplycost, 4) AS supplycost
    FROM eu
    JOIN part p ON p.p_partkey = eu.ps_partkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'ECONOMY'
      AND eu.ps_supplycost = (
        SELECT min(e2.ps_supplycost) FROM eu e2
        WHERE e2.ps_partkey = eu.ps_partkey)
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("agg", "tpch", "join", "subquery"),
)
def tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), fixture adaptation: there is
    no partsupp table, so the supply relation is DERIVED from lineitem
    — supplier s supplies part p iff a lineitem pairs them, at unit
    cost min(l_extendedprice / l_quantity). The correlated MIN
    subquery (cheapest regional supplier per part) becomes one keyed
    re-aggregation of the SAME derived frame joined back on partkey —
    computed once, never per probe row. The min-cost equality is safe
    cross-engine: both sides select an actual element of an
    IEEE-deterministic per-row quotient set (no accumulated sums).
    Hints only on the bounded dims (nation, region); the derived
    supply relation is SF-proportional so AQE picks its strategy."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        )
    )
    s = load(spark, sf, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal", "s_name"
    )
    n = load(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    eu = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    minc = eu.groupBy("l_partkey").agg(
        F.min("ps_supplycost").alias("_min_cost")
    )
    p = (
        load(spark, sf, "part")
        .filter(
            F.col("p_size").between(10, 20) & (F.col("p_type") == "ECONOMY")
        )
        .select("p_partkey")
    )
    return (
        eu.join(minc, "l_partkey")
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            r4(F.col("s_acctbal"), 4).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            r4(F.col("ps_supplycost"), 4).alias("supplycost"),
            F.col("s_acctbal").alias("_raw_bal"),
        )
        .orderBy(
            F.col("_raw_bal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
        .drop("_raw_bal")
    )


@register(
    "tpch_q11",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey AS ps_partkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region rg ON rg.r_regionkey = n.n_regionkey
      WHERE rg.r_name = 'EUROPE'
      GROUP BY 1
    )
    SELECT ps_partkey, value FROM pv
    WHERE value > (SELECT sum(value) * 0.001 FROM pv)
    ORDER BY value DESC, ps_partkey
    """,
    tags=("agg", "tpch", "join", "subquery"),
)
def tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), fixture adaptation:
    no partsupp, so per-part "stock value" is the EXACT total quantity
    (integral doubles cast to bigint — order-independent sums, so the
    HAVING threshold compares identically in both engines) shipped by
    EUROPE suppliers. The scalar total-value subquery is a one-row
    aggregate broadcast to the filter — the fraction-of-total HAVING
    shape is Q11's point. Region/nation are the only forced hints."""
    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    rg = load(spark, sf, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    pv = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("value"))
    )
    thr = pv.agg((F.sum("value") * 0.001).alias("_thr"))
    return (
        pv.join(F.broadcast(thr))
        .filter(F.col("value") > F.col("_thr"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@register(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("agg", "tpch", "join", "anti"),
)
def tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), fixture adaptation: the
    supply relation is the DISTINCT (partkey, suppkey) pairs of
    lineitem, and "customer complaints" are suppliers with negative
    account balance (no comment text in the fixture). NOT IN becomes a
    LEFT ANTI join (keys are non-null, so the semantics coincide);
    the complaint list is tiny but supplier-proportional, so AQE
    chooses the build side. countDistinct per brand/type/size bucket
    is integer-exact — no float canon needed."""
    pairs = (
        load(spark, sf, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    bad = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = (
        load(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(bad, pairs.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(p, pairs.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20",
    oracle="""
    WITH qty AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    pavg AS (SELECT l_partkey, avg(qty) AS avg_qty FROM qty GROUP BY 1),
    qual AS (
      SELECT DISTINCT q.l_suppkey FROM qty q
      JOIN pavg a ON a.l_partkey = q.l_partkey
      JOIN part p ON p.p_partkey = q.l_partkey
      WHERE p.p_type = 'ECONOMY' AND q.qty > 1.5 * a.avg_qty
    )
    SELECT s.s_name, round(1e-9 + s.s_acctbal, 4) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region rg ON rg.r_regionkey = n.n_regionkey
    WHERE rg.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s.s_name
    """,
    tags=("agg", "tpch", "join", "semi", "subquery"),
)
def tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), fixture adaptation: no
    partsupp availqty, so a supplier "has excess stock" of an ECONOMY
    part when its 1996 shipped quantity exceeds 1.5x the per-part
    average across suppliers (the spec's 0.5x-of-own-shipments
    threshold needs availqty). The nested IN subqueries become LEFT
    SEMI joins — the qualified-supplier set never widens the supplier
    rows. Quantity sums are exact integers, so the 1.5x-avg comparison
    (exact sum / exact count) is bit-identical cross-engine. The date
    predicate is pushed to the lineitem scan; only region/nation carry
    forced hints."""
    li = (
        load(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty")
    )
    pavg = qty.groupBy("l_partkey").agg(F.avg("qty").alias("avg_qty"))
    eco = load(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    qual = (
        qty.join(pavg, "l_partkey")
        .join(eco, F.col("l_partkey") == eco.p_partkey, "left_semi")
        .filter(F.col("qty") > 1.5 * F.col("avg_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf, "supplier").select(
        "s_suppkey", "s_nationkey", "s_name", "s_acctbal"
    )
    n = load(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    rg = load(spark, sf, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey)
        .join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name", r4(F.col("s_acctbal"), 4).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "tpch_q21",
    oracle="""
    WITH ls AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS late
      FROM lineitem GROUP BY 1, 2
    ),
    ord AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
      FROM ls GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM ls JOIN ord USING (l_orderkey)
    JOIN orders o ON o.o_orderkey = ls.l_orderkey
    JOIN supplier s ON s.s_suppkey = ls.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region rg ON rg.r_regionkey = n.n_regionkey
    WHERE ls.late = 1 AND ord.n_supp >= 2 AND ord.n_late = 1
      AND o.o_orderstatus = 'F' AND rg.r_name = 'AFRICA'
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("agg", "tpch", "join", "exists"),
)
def tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), fixture
    adaptation: no commit/receipt dates, so a supplier "failed" an
    order when any of its lines carries l_returnflag = 'R'. The spec's
    EXISTS (another supplier on the order) AND NOT EXISTS (another
    FAILING supplier) pair collapses into ONE per-order aggregate —
    n_supp >= 2 AND n_late = 1 — probed by the per-(order, supplier)
    frame: two keyed aggs instead of two correlated-subquery rescans
    of the fact. Everything downstream is integer counting; the
    o_orderstatus filter is pushed to the orders scan."""
    ls = (
        load(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("late")
        )
    )
    ordagg = ls.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    o = load(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey", "s_name")
    n = load(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    rg = load(spark, sf, "region").filter(F.col("r_name") == "AFRICA").select(
        "r_regionkey"
    )
    return (
        ls.filter(F.col("late") == 1)
        .join(ordagg, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
