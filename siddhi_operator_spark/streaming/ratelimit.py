"""Streaming output rate limiting (SURVEY.md §3.10 —
`[core] query/output/ratelimit/` time-based variants).

`output first|last every N` maps to a native watermarked tumbling
aggregation with `min_by`/`max_by` over the full event struct — no
custom state. (`output all every N` is just `Trigger.ProcessingTime`;
snapshot mode is the batch twin `operators.ratelimit.snapshot_every`
applied per micro-batch in `foreachBatch`.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pick_every(
    stream: DataFrame,
    ts: str,
    every: str,
    watermark: str,
    keys: Sequence[str],
    tiebreak: str,
    last: bool,
) -> DataFrame:
    payload = F.struct(*[F.col(c) for c in stream.columns])
    # order within the bucket by (ts, tiebreak): encode as a sortable
    # struct so min_by/max_by pick the first/last event deterministically
    order = F.struct(F.col(ts), F.col(tiebreak))
    pick = F.max_by(payload, order) if last else F.min_by(payload, order)
    out = (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, every).alias("w"), *keys)
        .agg(pick.alias("picked"))
    )
    return out.select(
        F.col("w.start").alias("bucket"), *keys, F.col("picked.*")
    )


def first_every_stream(
    stream: DataFrame,
    ts: str,
    every: str,
    watermark: str,
    keys: Sequence[str] = (),
    tiebreak: str = "event_id",
) -> DataFrame:
    """`output first every N` (`FirstPerTimeOutputRateLimiter.java`)."""
    return _pick_every(stream, ts, every, watermark, keys, tiebreak, last=False)


def last_every_stream(
    stream: DataFrame,
    ts: str,
    every: str,
    watermark: str,
    keys: Sequence[str] = (),
    tiebreak: str = "event_id",
) -> DataFrame:
    """`output last every N` (`LastPerTimeOutputRateLimiter.java` [U])."""
    return _pick_every(stream, ts, every, watermark, keys, tiebreak, last=True)
