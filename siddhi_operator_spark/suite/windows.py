"""Suite: window family (SURVEY.md §3.3 —
`[core] query/processor/stream/window/*WindowProcessor.java`).
Batch/analytics-mode semantics; streaming twins in
``siddhi_operator_spark.streaming`` with tests under tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import windows as W
from ..fpround import r4
from .registry import register


@register(
    "window_timebatch",
    oracle="""
    SELECT date_trunc('hour', ts)      AS window_start,
           event_type,
           round(1e-9 + sum(value), 4)        AS sum_value,
           count(*)                    AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "timeBatch"),
)
def window_timebatch(spark: SparkSession, sf: str) -> DataFrame:
    """`events#window.timeBatch(1 hour)` + group by event_type
    (`TimeBatchWindowProcessor.java`). The flagship tumbling agg."""
    e = load(spark, sf, "events")
    out = W.time_batch(
        e,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            r4(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return out.select("window_start", "event_type", "sum_value", "n")


@register(
    "window_externaltimebatch",
    oracle="""
    SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS window_start,
           l_returnflag,
           round(1e-9 + sum(l_extendedprice), 4) AS revenue,
           count(*)                       AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("window", "externalTimeBatch"),
)
def window_externaltimebatch(spark: SparkSession, sf: str) -> DataFrame:
    """`externalTimeBatch(l_shipdate, 1 day)`
    (`ExternalTimeBatchWindowProcessor.java`) — event-time-attribute
    tumbling window; in our event-time-first engine identical machinery
    to timeBatch, driven by a payload timestamp."""
    li = load(spark, sf, "lineitem")
    out = W.time_batch(
        li,
        "l_shipdate",
        "1 day",
        keys=["l_returnflag"],
        aggs=[
            r4(F.sum("l_extendedprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return out.select("window_start", "l_returnflag", "revenue", "n")


@register(
    "window_sliding_time",
    oracle="""
    SELECT event_id, user_id, ts,
           count(*) OVER w             AS n_5m,
           round(1e-9 + sum(value) OVER w, 4) AS sum_5m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 5 MINUTES PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "time"),
)
def window_sliding_time(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding `time(5 min)` per user (`TimeWindowProcessor.java`):
    each event sees the trailing 5 minutes."""
    e = load(spark, sf, "events")
    out = W.sliding_time(
        e,
        "ts",
        300,
        keys=["user_id"],
        aggs={"n_5m": F.count(F.lit(1)), "sum_5m_raw": F.sum("value")},
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "n_5m",
        r4(F.col("sum_5m_raw"), 4).alias("sum_5m"),
    )


@register(
    "window_length",
    oracle="""
    SELECT event_id, user_id,
           round(1e-9 + avg(value) OVER w, 4) AS avg_3,
           count(*)   OVER w           AS n_3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "length"),
)
def window_length(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding count window `length(3)` per user
    (`LengthWindowProcessor.java`)."""
    e = load(spark, sf, "events")
    out = W.length(
        e,
        3,
        keys=["user_id"],
        order=[F.col("ts"), F.col("event_id")],
        aggs={"avg_3_raw": F.avg("value"), "n_3": F.count(F.lit(1))},
    )
    return out.select(
        "event_id",
        "user_id",
        r4(F.col("avg_3_raw"), 4).alias("avg_3"),
        "n_3",
    )


@register(
    "window_lengthbatch",
    oracle="""
    WITH numbered AS (
      SELECT *, CAST(floor((row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) - 1) / 5) AS BIGINT) AS batch_id
      FROM events
    )
    SELECT user_id, batch_id,
           count(*)             AS n,
           round(1e-9 + sum(value), 4) AS sum_value,
           min(ts)              AS first_ts,
           max(ts)              AS last_ts
    FROM numbered
    GROUP BY user_id, batch_id
    """,
    tags=("window", "lengthBatch"),
)
def window_lengthbatch(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling count window `lengthBatch(5)` per user
    (`LengthBatchWindowProcessor.java`)."""
    e = load(spark, sf, "events")
    batched = W.length_batch(e, 5, keys=["user_id"], order=[F.col("ts"), F.col("event_id")])
    return batched.groupBy("user_id", "batch_id").agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.sum("value"), 4).alias("sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "window_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTES
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL 30 MINUTES    AS session_end,
           count(*)                         AS n,
           round(1e-9 + sum(value), 4)             AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window", "session"),
)
def window_session(spark: SparkSession, sf: str) -> DataFrame:
    """`session(30 min, user_id)` (`SessionWindowProcessor.java`).
    Oracle reconstructs sessions with lag+cumsum (events merge when the
    gap is < 30 min; session_end = last event + gap).

    r15: the structured (op, col, alias) agg form routes through the
    PREFIX-SUM tier (`operators/windows.py::session_prefix`) — two
    window passes, zero aggregate operators; the ×1000 profile showed
    the gap-island tier's partial+final HashAggregate pair was +8.7 s
    of a 24 s wall at ~45 M (key, session) groups.  Row-identity vs
    the Column-aggs tier is pinned by
    `tests/test_operators_batch.py::test_session_prefix_tier_matches_agg_tier`;
    this row keeps the tier under the DuckDB value-hash gate."""
    e = load(spark, sf, "events")
    out = W.session(
        e,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[("count", None, "n"), ("sum", "value", "sv_raw")],
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n",
        r4(F.col("sv_raw"), 4).alias("sum_value"),
    )


@register(
    "window_sort_topk",
    oracle="""
    SELECT event_type, event_id, value, _rn
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS _rn
      FROM events
    ) WHERE _rn <= 10
    """,
    tags=("window", "sort", "topk"),
)
def window_sort_topk(spark: SparkSession, sf: str) -> DataFrame:
    """`sort(10, value, 'desc')` / `extrema:topK`
    (`SortWindowProcessor.java`): retained top-10 by value per
    event_type. Catalyst plans a per-key TopK (WindowGroupLimit) — no
    global sort at scale."""
    e = load(spark, sf, "events")
    out = W.sort_topk(
        e, 10, keys=["event_type"], order=[F.desc("value"), F.asc("event_id")]
    )
    return out.select("event_type", "event_id", "value", "_rn")


@register(
    "window_frequent",
    oracle="""
    SELECT event_type, user_id, freq, _rn
    FROM (
      SELECT event_type, user_id, count(*) AS freq,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, user_id) AS _rn
      FROM events GROUP BY event_type, user_id
    ) WHERE _rn <= 5
    """,
    tags=("window", "frequent"),
)
def window_frequent(spark: SparkSession, sf: str) -> DataFrame:
    """`frequent(5, user_id)` (`FrequentWindowProcessor.java`,
    Misra-Gries): 5 most frequent users per event_type — batch mode
    computes the exact fixed point of the sketch."""
    e = load(spark, sf, "events")
    out = W.frequent(e, 5, keys=["event_type"], group_cols=["user_id"])
    return out.select("event_type", "user_id", "freq", "_rn")


@register(
    "window_unique_last",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("window", "unique"),
)
def window_unique_last(spark: SparkSession, sf: str) -> DataFrame:
    """`unique:last(user_id)` (`[ext:unique]`): latest event per user —
    order-defined, unlike dropDuplicates."""
    e = load(spark, sf, "events")
    out = W.unique_last(e, keys=["user_id"], order=[F.desc("ts"), F.desc("event_id")])
    return out.select("user_id", "event_id", "event_type", "value", "ts")


@register(
    "window_timelength",
    oracle="""
    WITH framed AS (
      SELECT event_id, user_id,
             count(*) OVER wr AS cnt_range,
             round(1e-9 + sum(value) OVER wr, 4) AS sum_range,
             round(1e-9 + sum(value) OVER wn, 4) AS sum_n
      FROM events
      WINDOW wr AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           least(cnt_range, 10) AS n_tl,
           CASE WHEN cnt_range <= 10 THEN sum_range ELSE sum_n END AS sum_tl
    FROM framed
    """,
    tags=("window", "timeLength"),
)
def window_timelength(spark: SparkSession, sf: str) -> DataFrame:
    """`timeLength(10 min, 10)` (`TimeLengthWindowProcessor.java`):
    whichever bound evicts first. Both the time-set and the count-set
    are suffixes of the per-key ordered stream, so their intersection is
    the smaller suffix — composable from a RANGE frame and a ROWS frame
    with a per-row pick, no custom state needed in batch mode."""
    e = load(spark, sf, "events")
    # RANGE frame must order by the same axis the interval measures.
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-600, 0)
    )
    wn = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(wr).alias("cnt_range"),
        r4(F.sum("value").over(wr), 4).alias("sum_range"),
        r4(F.sum("value").over(wn), 4).alias("sum_n"),
    ).select(
        "event_id",
        "user_id",
        F.least(F.col("cnt_range"), F.lit(10)).alias("n_tl"),
        F.when(F.col("cnt_range") <= 10, F.col("sum_range"))
        .otherwise(F.col("sum_n"))
        .alias("sum_tl"),
    )


@register(
    "window_delay",
    oracle="""
    SELECT event_id, ts + INTERVAL 15 SECONDS AS ts, user_id
    FROM events
    """,
    tags=("window", "delay"),
)
def window_delay(spark: SparkSession, sf: str) -> DataFrame:
    """`delay(15 sec)` (`DelayWindowProcessor.java`) — event-time
    shift."""
    e = load(spark, sf, "events")
    return W.delay(e, "ts", "15 SECONDS").select("event_id", "ts", "user_id")


@register(
    "named_window_fanout",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             round(1e-9 + sum(value), 4) AS sum_value, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT 'hot'  AS consumer, window_start, event_type, sum_value, n
    FROM hourly WHERE sum_value > 500
    UNION ALL
    SELECT 'busy' AS consumer, window_start, event_type, sum_value, n
    FROM hourly WHERE n > 15
    """,
    tags=("window", "named"),
)
def named_window_fanout(spark: SparkSession, sf: str) -> DataFrame:
    """`define window W ... output all events` consumed by two queries
    (`[core] window/Window.java`): the windowed relation is computed
    once and fanned out; consumers apply their own predicates."""
    e = load(spark, sf, "events")
    hourly = W.time_batch(
        e,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            r4(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    ).select("window_start", "event_type", "sum_value", "n")
    hot = hourly.filter(F.col("sum_value") > 500).withColumn("consumer", F.lit("hot"))
    busy = hourly.filter(F.col("n") > 15).withColumn("consumer", F.lit("busy"))
    return hot.unionByName(busy).select(
        "consumer", "window_start", "event_type", "sum_value", "n"
    )


@register(
    "window_lossy_frequent",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id, count(*) AS freq
      FROM events GROUP BY 1, 2
    ), totals AS (
      SELECT event_type, count(*) AS total FROM events GROUP BY 1
    )
    SELECT c.event_type, c.user_id, c.freq
    FROM counts c JOIN totals t ON c.event_type = t.event_type
    WHERE c.freq >= 0.008 * t.total
    """,
    tags=("window", "frequent"),
)
def window_lossy_frequent(spark: SparkSession, sf: str) -> DataFrame:
    """`lossyFrequent(support, error)` (`LossyFrequentWindowProcessor
    .java`): every item with frequency ≥ support × N. Batch mode is the
    exact fixed point the lossy-counting sketch approximates."""
    e = load(spark, sf, "events")
    return W.lossy_frequent(
        e, support=0.008, keys=["event_type"], group_cols=["user_id"]
    ).select("event_type", "user_id", "freq")


@register(
    "window_expression_batch",
    oracle="""
    SELECT event_id, user_id, ts, value FROM (
      SELECT event_id, user_id, ts, value,
             sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS run
      FROM events
    ) WHERE run <= 100
    """,
    tags=("window", "expression"),
)
def window_expression_batch(spark: SparkSession, sf: str) -> DataFrame:
    """`expressionBatch('sum(value) <= 100')`
    (`ExpressionBatchWindowProcessor.java`): dynamic retain-while
    window — per user, the maximal suffix of newest events whose
    value-sum stays within budget."""
    e = load(spark, sf, "events")
    out = W.expression_batch(
        e,
        keys=["user_id"],
        order=[F.col("ts"), F.col("event_id")],
        budget_col="value",
        limit=100.0,
    )
    return out.select("event_id", "user_id", "ts", "value")


@register(
    "window_unique_first",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("window", "unique"),
)
def window_unique_first(spark: SparkSession, sf: str) -> DataFrame:
    """`unique:first(user_id)` (`[ext:unique]`): first event per key.
    Streaming twin: `dropDuplicates([key])` keeps the first arrival
    (dropDuplicatesWithinWatermark bounds the state — tests cover it)."""
    e = load(spark, sf, "events")
    out = W.unique_last(e, keys=["user_id"], order=[F.asc("ts"), F.asc("event_id")])
    return out.select("user_id", "event_id", "event_type", "value", "ts")


@register(
    "window_extrema_by_time",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           arg_max(event_id, printf('%017.4f|%010d', value, event_id)) AS max_event,
           round(1e-9 + max(value), 4) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "extrema"),
)
def window_extrema_by_time(spark: SparkSession, sf: str) -> DataFrame:
    """`extrema:maxByTime`-style window (`[ext:extrema]`): the event
    holding the max value within each tumbling time window — min_by/
    max_by composed with the native window bucket, one keyed agg."""
    e = load(spark, sf, "events")
    key = F.format_string("%017.4f|%010d", F.col("value"), F.col("event_id"))
    out = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.max_by("event_id", key).alias("max_event"),
        r4(F.max("value"), 4).alias("max_value"),
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "max_event",
        "max_value",
    )


@register(
    "window_expression",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts, value,
             CAST(round(value * 100) AS BIGINT) AS b,
             CAST(sum(CAST(round(value * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS cum,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id, a.ts, a.value,
           count(*) AS win_n,
           round(1e-9 + sum(k.value), 4) AS win_sum
    FROM base a JOIN base k
      ON k.user_id = a.user_id AND k.rn <= a.rn
     AND a.cum - (k.cum - k.b) <= 100000
    GROUP BY a.user_id, a.event_id, a.ts, a.value
    """,
    tags=("window", "expression"),
)
def window_expression(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding `expression('sum(value) <= 1000')` per user
    (`ExpressionWindowProcessor.java`): each event sees the maximal
    trailing suffix whose value-sum stays within budget. Integer
    cent-scaled prefix sums keep the membership test exact on both
    engines."""
    e = load(spark, sf, "events").select("user_id", "event_id", "ts", "value")
    out = W.expression_sliding(
        e,
        keys=["user_id"],
        order=["ts", "event_id"],
        budget_col=F.round(F.col("value") * 100).cast("long"),
        limit=100000,
        aggs={
            "win_n": F.count(F.lit(1)),
            "win_sum": r4(F.sum("value_w"), 4),
        },
    )
    return out.select("user_id", "event_id", "ts", "value", "win_n", "win_sum")


@register(
    "window_cron",
    oracle="""
    SELECT time_bucket(INTERVAL 4 HOURS, ts - INTERVAL 30 MINUTES)
             + INTERVAL 4 HOURS + INTERVAL 30 MINUTES AS emission,
           event_type,
           count(*) AS n,
           round(1e-9 + sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "cron"),
)
def window_cron(spark: SparkSession, sf: str) -> DataFrame:
    """`events#window.cron('0 30 */4 * * ?')` + group by event_type
    (`CronWindowProcessor.java`): flush at :30 past every 4th hour;
    each emission carries the events since the previous fire. The
    oracle is the closed form of that schedule (fire = next
    4h-aligned :30 after the event)."""
    e = load(spark, sf, "events")
    out = W.cron_window(
        e,
        "ts",
        "0 30 */4 * * ?",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            r4(F.sum("value"), 4).alias("sum_value"),
        ],
    )
    return out.select("emission", "event_type", "n", "sum_value")


@register(
    "window_unique_timebatch",
    oracle="""
    SELECT bucket, user_id, event_id, ts, value
    FROM (
      SELECT time_bucket(INTERVAL 6 HOURS, ts) AS bucket,
             user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY time_bucket(INTERVAL 6 HOURS, ts), user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("window", "unique"),
)
def window_unique_timebatch(spark: SparkSession, sf: str) -> DataFrame:
    """`unique:timeBatch(user_id, 6 hours)` (`[ext:unique]`
    `UniqueTimeBatchWindowProcessor.java`): latest event per user per
    tumbling interval."""
    e = load(spark, sf, "events").select("user_id", "event_id", "ts", "value")
    out = W.unique_time_batch(
        e, "ts", "6 hours", unique_keys=["user_id"], tiebreak="event_id"
    )
    return out.select("bucket", "user_id", "event_id", "ts", "value")


@register(
    "window_unique_dedup",
    oracle="""
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ) WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 300000000
    """,
    tags=("window", "unique"),
)
def window_unique_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """`unique:deduplicate(user_id, 5 min)` (`[ext:unique]`
    `DeduplicateWindowProcessor.java`): suppress events arriving within
    5 minutes of the previous same-key arrival (every arrival refreshes
    the guard)."""
    e = load(spark, sf, "events").select("user_id", "event_id", "ts", "value")
    return W.unique_deduplicate(
        e, "ts", unique_keys=["user_id"], within_seconds=300, tiebreak="event_id"
    )


@register(
    "window_extrema_by_length",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(split_part(pk, '|', 2) AS BIGINT) AS max_by_id,
           CAST(split_part(pk, '|', 1) AS DOUBLE) AS max_by_val
    FROM (
      SELECT user_id, event_id, ts,
             max(printf('%017.4f|%010d', value, event_id)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS pk
      FROM events
    )
    """,
    tags=("window", "extrema"),
)
def window_extrema_by_length(spark: SparkSession, sf: str) -> DataFrame:
    """`extrema:maxByLength(value, 5)` per user (`[ext:extrema]`
    `MaxByLengthWindowProcessor.java`): for each event, the
    highest-value event among its last 5 arrivals (fixed-width
    value|id packing for cross-engine arg-max determinism)."""
    e = load(spark, sf, "events").select("user_id", "event_id", "ts", "value")
    out = W.extrema_by_length(
        e,
        5,
        keys=["user_id"],
        order=["ts", "event_id"],
        attr=F.col("value"),
        id_col="event_id",
        mode="max",
    )
    return out.select("user_id", "event_id", "ts", "max_by_id", "max_by_val")


@register(
    "window_topk",
    oracle="""
    SELECT event_type, user_id, freq, rank FROM (
      SELECT event_type, user_id, count(*) AS freq,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, user_id ASC) AS rank
      FROM events GROUP BY event_type, user_id
    ) WHERE rank <= 3
    """,
    tags=("window", "extrema", "topk"),
)
def window_topk(spark: SparkSession, sf: str) -> DataFrame:
    """`extrema:topK(user_id, 3)` per event_type (`[ext:extrema]`
    `TopKStreamProcessor.java`): the 3 most frequent users per type
    with counts."""
    e = load(spark, sf, "events")
    return W.topk_items(e, 3, keys=["event_type"], item_cols=["user_id"]).select(
        "event_type", "user_id", "freq", "rank"
    )


@register(
    "window_batch_chunk",
    oracle="""
    SELECT 0 AS chunk_id, event_type,
           count(*) AS n, round(1e-9 + sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("window", "batch"),
)
def window_batch_chunk(spark: SparkSession, sf: str) -> DataFrame:
    """`events#window.batch()` (`BatchWindowProcessor.java`): the
    window is exactly the current arrival chunk — in batch mode the
    whole input, aggregated per group with no retained state."""
    e = load(spark, sf, "events")
    return W.batch_chunks(
        e,
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            r4(F.sum("value"), 4).alias("sum_value"),
        ],
    )


@register(
    "window_expired_events",
    oracle="""
    SELECT user_id, event_id, ts AS emit_ts, 'current' AS etype
    FROM events
    UNION ALL
    SELECT user_id, event_id, expired_ts AS emit_ts, 'expired' AS etype
    FROM (
      SELECT user_id, event_id,
             lead(ts, 3) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS expired_ts
      FROM events
    ) WHERE expired_ts IS NOT NULL
    """,
    tags=("window", "expired"),
)
def window_expired_events(spark: SparkSession, sf: str) -> DataFrame:
    """`from events#window.length(3) select … insert all events into S`
    (`QuerySelector.java` output event type + `LengthWindowProcessor`
    eviction): the tagged union of current arrivals and window-eviction
    retractions — an expired row appears when its 3rd same-user
    successor arrives, stamped with the eviction time."""
    e = load(spark, sf, "events").select("user_id", "event_id", "ts")
    exp = W.expired_length(
        e, 3, keys=["user_id"], order=["ts", "event_id"], ts="ts"
    )
    out = W.output_event_type(e, exp, ts="ts")
    return out.select("user_id", "event_id", "emit_ts", "etype")
