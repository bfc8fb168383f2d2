"""Suite: output rate limiting (SURVEY.md §3.10 —
`[core] query/output/ratelimit/` time/event/snapshot variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import ratelimit as R
from .registry import register


@register(
    "ratelimit_first",
    oracle="""
    SELECT bucket, user_id, event_id, ts, value
    FROM (
      SELECT time_bucket(INTERVAL 6 HOURS, ts) AS bucket, user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY time_bucket(INTERVAL 6 HOURS, ts), user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("ratelimit", "first"),
)
def ratelimit_first(spark: SparkSession, sf: str) -> DataFrame:
    """`output first every 6 hours` per user
    (`FirstPerTimeOutputRateLimiter.java`)."""
    e = load(spark, sf, "events")
    out = R.first_every(e, "ts", "6 hours", keys=["user_id"], tiebreak="event_id")
    return out.select("bucket", "user_id", "event_id", "ts", "value")


@register(
    "ratelimit_last",
    oracle="""
    SELECT bucket, user_id, event_id, ts, value
    FROM (
      SELECT time_bucket(INTERVAL 6 HOURS, ts) AS bucket, user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY time_bucket(INTERVAL 6 HOURS, ts), user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("ratelimit", "last"),
)
def ratelimit_last(spark: SparkSession, sf: str) -> DataFrame:
    """`output last every 6 hours` per user
    (`LastPerTimeOutputRateLimiter.java` [U])."""
    e = load(spark, sf, "events")
    out = R.last_every(e, "ts", "6 hours", keys=["user_id"], tiebreak="event_id")
    return out.select("bucket", "user_id", "event_id", "ts", "value")


@register(
    "ratelimit_snapshot",
    oracle="""
    WITH latest_per AS (
      SELECT time_bucket(INTERVAL 1 DAY, ts) AS bucket, user_id, value
      FROM (
        SELECT ts, user_id, value,
               row_number() OVER (PARTITION BY time_bucket(INTERVAL 1 DAY, ts), user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), key_range AS (
      SELECT user_id, min(time_bucket(INTERVAL 1 DAY, ts)) AS first_b
      FROM events GROUP BY user_id
    ), scaffold AS (
      SELECT k.user_id,
             unnest(generate_series(k.first_b, g.last_b, INTERVAL 1 DAY)) AS bucket
      FROM key_range k
      CROSS JOIN (SELECT max(time_bucket(INTERVAL 1 DAY, ts)) AS last_b FROM events) g
    )
    SELECT s.bucket, s.user_id,
           last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bucket
             ROWS UNBOUNDED PRECEDING) AS value
    FROM scaffold s
    LEFT JOIN latest_per l ON l.bucket = s.bucket AND l.user_id = s.user_id
    """,
    tags=("ratelimit", "snapshot"),
)
def ratelimit_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    """`output snapshot every 1 day` (`snapshot/` rate limiters): at
    each emission tick, the current value per key — including keys with
    no new events (forward-filled from their last state). Ticks start
    at each key's first-seen bucket (bounded scaffold; no pre-activity
    null rows)."""
    e = load(spark, sf, "events").select("ts", "user_id", "event_id", "value")
    out = R.snapshot_every(e, "ts", "1 day", keys=["user_id"], tiebreak="event_id")
    return out.select("bucket", "user_id", "value")
