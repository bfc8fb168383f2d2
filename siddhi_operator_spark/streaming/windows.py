"""Streaming window operators.

Native event-time windows (tumbling/sliding/session) are thin
watermarked twins of the batch operators. Count-based windows —
`length(n)` / `lengthBatch(n)` (`LengthWindowProcessor.java`,
`LengthBatchWindowProcessor.java`) — have no Spark primitive and run
as per-key state machines on ``applyInPandasWithState``
(SURVEY.md §5 "custom work" item 2).

Scale notes: all state is keyed (the shuffle is hash(key)); count
windows are per-key only — a GLOBAL count window is a deliberate
non-goal in streaming mode (it totally orders the stream; the batch
twin covers global analytics). RocksDB state store (session default)
keeps big keyed state off-heap.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_agg(
    stream: DataFrame,
    ts: str,
    duration: str,
    watermark: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Streaming `timeBatch(t)`: watermark + tumbling window agg.
    Append mode emits each window once, when the watermark passes its
    end — the reference's batch-expiry emission."""
    out = (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, duration).alias("w"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_agg(
    stream: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    watermark: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Streaming sliding `time(t)` approximation at `slide`
    granularity (exact per-event sliding is the batch twin; in
    streaming the reference's per-arrival emission maps to overlapping
    window panes)."""
    out = (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, duration, slide).alias("w"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_agg(
    stream: DataFrame,
    ts: str,
    gap: str,
    watermark: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Streaming `session(gap, key, allowedLatency)`
    (`SessionWindowProcessor.java`): native session_window; the
    watermark delay IS allowedLatency."""
    out = (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(ts, gap).alias("w"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


# --------------------------------------------------------------------
# count windows: applyInPandasWithState
# --------------------------------------------------------------------

_LENGTH_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("n_in_window", T.IntegerType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("avg_value", T.DoubleType()),
    ]
)
# state: parallel arrays of the last-n (event_id, ts_micros, value)
_LENGTH_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def length_window(
    stream: DataFrame,
    n: int,
    key: str,
    ts: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming `length(n)` per key (`LengthWindowProcessor.java`):
    each arriving event emits the aggregate over the last n events of
    its key. State = bounded deque per key (arrays in the state store);
    events are processed in event-time order within each micro-batch
    (cross-batch order is arrival order, exactly the reference's
    arrival-ordered window)."""

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, tss, vals = state.get
            ids, tss, vals = list(ids), list(tss), list(vals)
        else:
            ids, tss, vals = [], [], []
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts, id_col])
            for _, row in pdf.iterrows():
                ids.append(int(row[id_col]))
                tss.append(int(row[ts].value // 1000))
                vals.append(float(row[value_col]))
                ids, tss, vals = ids[-n:], tss[-n:], vals[-n:]
                out_rows.append(
                    (
                        str(key_tuple[0]),
                        int(row[id_col]),
                        row[ts],
                        len(vals),
                        sum(vals),
                        sum(vals) / len(vals),
                    )
                )
        state.update((ids, tss, vals))
        yield pd.DataFrame(
            out_rows,
            columns=[
                "key",
                "event_id",
                "ts",
                "n_in_window",
                "sum_value",
                "avg_value",
            ],
        )

    projected = stream.withColumn("__key", F.col(key).cast("string"))
    return projected.groupBy("__key").applyInPandasWithState(
        proc,
        _LENGTH_OUT,
        _LENGTH_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


_LBATCH_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("batch_seq", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("first_id", T.LongType()),
        T.StructField("last_id", T.LongType()),
    ]
)
_LBATCH_STATE = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def length_batch_window(
    stream: DataFrame,
    n: int,
    key: str,
    ts: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming `lengthBatch(n)` per key
    (`LengthBatchWindowProcessor.java`): buffer events; every n-th
    event flushes one aggregate row. Partial batches persist in state
    across micro-batches."""

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seq, ids, vals = state.get
            ids, vals = list(ids), list(vals)
        else:
            seq, ids, vals = 0, [], []
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts, id_col])
            for _, row in pdf.iterrows():
                ids.append(int(row[id_col]))
                vals.append(float(row[value_col]))
                if len(ids) == n:
                    out_rows.append(
                        (
                            str(key_tuple[0]),
                            seq,
                            n,
                            sum(vals),
                            ids[0],
                            ids[-1],
                        )
                    )
                    seq += 1
                    ids, vals = [], []
        state.update((seq, ids, vals))
        yield pd.DataFrame(
            out_rows,
            columns=["key", "batch_seq", "n", "sum_value", "first_id", "last_id"],
        )

    projected = stream.withColumn("__key", F.col(key).cast("string"))
    return projected.groupBy("__key").applyInPandasWithState(
        proc,
        _LBATCH_OUT,
        _LBATCH_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
