"""Streaming output rate limiting (SURVEY.md §3.10 —
`[core] query/output/ratelimit/` time-based variants).

`output first|last every N` maps to a native watermarked tumbling
aggregation with `min_by`/`max_by` over the full event struct — no
custom state. `output all every N` is just `Trigger.ProcessingTime`.
`output snapshot every N` (`snapshot/` rate limiters) is genuinely
stateful — each tick must re-emit keys with NO new events, forward-
filled from their last state — so it runs as a per-key state machine
on `applyInPandasWithState` with EVENT-TIME TIMEOUTS: a key with no
traffic still fires when the watermark passes its next tick boundary
(`snapshot_every_stream`).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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


_EVERY_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}

# per-key snapshot state: the forward-fill value carried from already
# emitted ticks, plus per-UNCLOSED-bucket last events (events can land
# in a bucket before earlier buckets close)
_SNAP_STATE = T.StructType(
    [
        T.StructField("next_bucket", T.LongType()),  # µs; -1 = uninit
        T.StructField("emitted", T.BooleanType()),  # any tick emitted yet
        T.StructField("fill_ts", T.LongType()),
        T.StructField("fill_tb", T.LongType()),
        T.StructField("fill_val", T.DoubleType()),
        T.StructField("has_fill", T.BooleanType()),
        T.StructField("pend_b", T.ArrayType(T.LongType())),
        T.StructField("pend_ts", T.ArrayType(T.LongType())),
        T.StructField("pend_tb", T.ArrayType(T.LongType())),
        T.StructField("pend_val", T.ArrayType(T.DoubleType())),
    ]
)


def snapshot_every_stream(
    stream: DataFrame,
    ts: str,
    every: str,
    watermark: str,
    keys: Sequence[str] = ("user_id",),
    tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """`output snapshot every N` as a resident stream operator
    (`[core] query/output/ratelimit/snapshot/` —
    `AllPerSnapshotOutputRateLimiter` family): at every tick boundary
    the CURRENT value of every key seen so far, including keys with no
    new events since the last tick (forward-filled).

    Mechanics: per-key GroupState holds (carry value, per-open-bucket
    last event); a tick for bucket b emits once the watermark passes
    end(b) — via data arrival or, for idle keys, via the event-time
    TIMEOUT registered at the next tick boundary. That timeout is what
    makes this a true snapshot (idle keys still tick), which no
    windowed aggregation expresses. Per-batch cost is O(new events +
    ticks crossed); state is O(open buckets) per key — both bounded,
    so the operator holds at any key cardinality the state store
    holds.

    Emission completeness contract (same as every watermark twin): a
    tick is emitted iff end(bucket) ≤ final watermark; callers compare
    against a batch oracle only below a closing margin.
    """
    n, unit = every.split()
    every_us = int(n) * _EVERY_UNITS[unit] * 1_000_000

    fields = dict(zip(stream.schema.fieldNames(), stream.schema.fields))
    out_schema = T.StructType(
        [
            T.StructField("bucket", T.TimestampType()),
            *[T.StructField(k, fields[k].dataType) for k in keys],
            T.StructField("value", T.DoubleType()),
        ]
    )
    out_cols = ["bucket", *keys, "value"]

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (nxt, emitted, f_ts, f_tb, f_val, has_fill, pb, pts, ptb, pval) = (
                state.get
            )
            pending = {
                int(b): (int(t), int(e), float(v))
                for b, t, e, v in zip(pb, pts, ptb, pval)
            }
        else:
            nxt, emitted = -1, False
            f_ts, f_tb, f_val, has_fill = 0, 0, 0.0, False
            pending = {}
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ets = (
                    pdf[ts].to_numpy().astype("datetime64[us]").astype("int64")
                )
                tbs = pdf[tiebreak].to_numpy(dtype="int64")
                vals = pdf[value_col].to_numpy(dtype="float64")
                for t, e, v in zip(ets, tbs, vals):
                    b = (int(t) // every_us) * every_us
                    if emitted and b < nxt:
                        # late-but-in-watermark row for an ALREADY
                        # EMITTED tick: fold into the carry so later
                        # ticks forward-fill it (never hit under
                        # ordered replay; out-of-order sources only)
                        if not has_fill or (int(t), int(e)) > (f_ts, f_tb):
                            f_ts, f_tb, f_val = int(t), int(e), float(v)
                            has_fill = True
                        continue
                    # before any emission, an earlier bucket simply
                    # lowers the first-tick anchor — dropping it here
                    # would desync the scaffold from the batch oracle
                    if nxt == -1 or (not emitted and b < nxt):
                        nxt = b if nxt == -1 else min(nxt, b)
                    cur = pending.get(b)
                    if cur is None or (int(t), int(e)) > cur[:2]:
                        pending[b] = (int(t), int(e), float(v))
        if nxt == -1 and pending:
            nxt = min(pending)
        wm_us = state.getCurrentWatermarkMs() * 1000
        out_b, out_v = [], []
        while nxt != -1 and nxt + every_us <= wm_us:
            got = pending.pop(nxt, None)
            if got is not None and (
                not has_fill or got[:2] > (f_ts, f_tb)
            ):
                f_ts, f_tb, f_val = got
                has_fill = True
            if has_fill:  # first tick always has its trigger event
                out_b.append(nxt)
                out_v.append(f_val)
                emitted = True
            nxt += every_us
        if nxt != -1:
            pend_items = sorted(pending.items())
            state.update(
                (
                    nxt,
                    emitted,
                    f_ts,
                    f_tb,
                    f_val,
                    has_fill,
                    [b for b, _ in pend_items],
                    [x[0] for _, x in pend_items],
                    [x[1] for _, x in pend_items],
                    [x[2] for _, x in pend_items],
                )
            )
            # idle-key tick: fire when the watermark passes the next
            # boundary (must be strictly ahead of the current watermark)
            timeout_ms = (nxt + every_us) // 1000
            state.setTimeoutTimestamp(max(timeout_ms, wm_us // 1000 + 1))
        if out_b:
            data = {"bucket": pd.to_datetime(out_b, unit="us")}
            for i, k in enumerate(keys):
                data[k] = [key_tuple[i]] * len(out_b)
            data["value"] = out_v
            yield pd.DataFrame(data, columns=out_cols)

    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            proc,
            out_schema,
            _SNAP_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


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
