"""Output rate limiting — SURVEY.md §3.10
(`[core] query/output/ratelimit/` — `FirstPerTimeOutputRateLimiter`,
`LastPerTimeOutputRateLimiter`, snapshot variants).

Siddhi: `output [all|first|last] every N sec` / `output snapshot every
N sec`. In batch/analytics mode the emission schedule becomes a time
bucket; first/last are order-defined picks within the bucket; snapshot
is the latest state per key at each bucket boundary. The streaming twin
is `Trigger.ProcessingTime` + `foreachBatch` dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucketed(df: DataFrame, ts: str, every: str) -> DataFrame:
    return df.withColumn("bucket", F.window(ts, every)["start"])


def first_every(
    df: DataFrame, ts: str, every: str, keys: Sequence[str], tiebreak: str
) -> DataFrame:
    """`output first every N` — first event per emission interval
    (per key)."""
    b = _bucketed(df, ts, every)
    w = Window.partitionBy("bucket", *keys).orderBy(ts, tiebreak)
    return b.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def last_every(
    df: DataFrame, ts: str, every: str, keys: Sequence[str], tiebreak: str
) -> DataFrame:
    """`output last every N` — last event per emission interval."""
    b = _bucketed(df, ts, every)
    w = Window.partitionBy("bucket", *keys).orderBy(F.desc(ts), F.desc(tiebreak))
    return b.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def snapshot_every(
    df: DataFrame, ts: str, every: str, keys: Sequence[str], tiebreak: str
) -> DataFrame:
    """`output snapshot every N` — at each interval boundary, the
    current (latest-so-far) value per key: latest event per key among
    all events up to the bucket end. Equivalent to last_every when the
    key has events in the bucket; snapshot additionally re-emits keys
    with no new events (forward-filled from their last state).

    Scale: the emission scaffold is each key's ACTIVE range only —
    `sequence()` from the key's first-seen bucket to the stream's last
    bucket — not a full |buckets| × |keys| cross product; a key only
    pays for ticks after it first appears (this also drops the
    pre-first-event null rows an unbounded scaffold would emit). The
    one-row global-max frame joins via broadcast, so the only shuffle
    is the keyed forward-fill window."""
    b = _bucketed(df, ts, every)
    per_key = b.groupBy(*keys).agg(F.min("bucket").alias("_first_b"))
    global_last = b.agg(F.max("bucket").alias("_last_b"))
    scaffold = per_key.crossJoin(F.broadcast(global_last)).select(
        *keys,
        F.explode(
            F.sequence("_first_b", "_last_b", F.expr(f"INTERVAL {every}"))
        ).alias("bucket"),
    )
    latest = last_every(df, ts, every, keys, tiebreak)
    joined = scaffold.join(latest, on=["bucket", *keys], how="left")
    # forward-fill: latest known value per key as of each bucket
    val_cols = [c for c in latest.columns if c not in ("bucket", *keys)]
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in val_cols:
        joined = joined.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return joined
