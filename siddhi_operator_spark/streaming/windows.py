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

import numpy as np
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
        # fully vectorized: prior state is prepended to the sorted
        # batch, per-event window sums come from a prefix-sum
        # difference — O(batch) total, no iterrows, no per-event
        # sum(vals) (that pattern measured 10-50x slower in round-1
        # profiling of the CEP NFA; same hoist applied here)
        if state.exists:
            s_ids, s_tss, s_vals = (list(x) for x in state.get)
        else:
            s_ids, s_tss, s_vals = [], [], []
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts, id_col])
            b_ids = pdf[id_col].to_numpy(dtype="int64")
            b_vals = pdf[value_col].to_numpy(dtype="float64")
            b_tss = pdf[ts].to_numpy()
            s = len(s_vals)
            vals = np.concatenate([np.asarray(s_vals, dtype="float64"), b_vals])
            cs = np.concatenate([[0.0], np.cumsum(vals)])
            end = np.arange(s, s + len(b_ids))  # window-end index per event
            lo = np.maximum(0, end + 1 - n)
            counts = end + 1 - lo
            sums = cs[end + 1] - cs[lo]
            outs.append(
                pd.DataFrame(
                    {
                        "key": str(key_tuple[0]),
                        "event_id": b_ids,
                        "ts": b_tss,
                        "n_in_window": counts.astype("int32"),
                        "sum_value": sums,
                        "avg_value": sums / counts,
                    }
                )
            )
            ids = s_ids + [int(i) for i in b_ids]
            ns = b_tss.astype("datetime64[ns]").astype("int64")  # unit-stable
            tss_us = s_tss + [int(t) // 1000 for t in ns]
            s_ids, s_tss = ids[-n:], tss_us[-n:]
            s_vals = [float(v) for v in vals[-n:]]
        state.update((s_ids, s_tss, s_vals))
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                columns=[
                    "key",
                    "event_id",
                    "ts",
                    "n_in_window",
                    "sum_value",
                    "avg_value",
                ]
            )
        )

    projected = stream.withColumn("__key", F.col(key).cast("string"))
    return projected.groupBy("__key").applyInPandasWithState(
        proc,
        _LENGTH_OUT,
        _LENGTH_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# coarse-bucket state: flat parallel arrays over ALL keys in the bucket,
# grouped by key in storage order (each key's segment is its deque)
_LENGTH_BUCKET_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def length_window_bucketed(
    stream: DataFrame,
    n: int,
    key: str,
    n_buckets: int = 128,
    ts: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """`length(n)` per key with COARSE state buckets — identical output
    to `length_window` (pinned by test), different state sharding.

    `applyInPandasWithState` costs ~0.3 ms per (group × micro-batch)
    python call (measured: 100 k user keys × 4 batches = 127 s of pure
    per-group overhead at ×100 — SCALEBENCH round 5), so keying the
    STATE by the semantic key makes high-cardinality count windows
    overhead-bound. Here the state key is `hash(key) % n_buckets`; one
    python call handles every user in the bucket, with the per-key
    windows computed vectorized across key segments (sort by (key,
    state-first arrival order), segment-reset prefix sums). Per-call
    overhead amortizes over |keys|/n_buckets users.

    Trade-off: each batch rewrites the whole bucket's state (read/write
    amplification ~1 for high-churn streams where most keys appear
    every batch — exactly the regime where the per-group overhead
    hurts; for sparse-key streams keep the per-key variant). Size
    n_buckets so one bucket's state (n × keys/bucket rows) fits a
    task comfortably."""

    def _seg_end(keys_s: "np.ndarray") -> "np.ndarray":
        # index of the LAST row of each row's key segment
        m = len(keys_s)
        if not m:
            return np.empty(0, dtype="int64")
        change_next = np.concatenate([keys_s[1:] != keys_s[:-1], [True]])
        ends = np.nonzero(change_next)[0]
        seg_id = np.cumsum(
            np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
        ) - 1
        return ends[seg_id]

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            x = state.get
            # 'U' dtype: numpy sorts fixed-width unicode ~3x faster
            # than object arrays (measured on 2.5M keys)
            st_keys = np.asarray(x[0], dtype=str)
            st_ids = np.asarray(x[1], dtype="int64")
            st_tss = np.asarray(x[2], dtype="int64")
            st_vals = np.asarray(x[3], dtype="float64")
        else:
            st_keys = np.empty(0, dtype=str)
            st_ids = np.empty(0, dtype="int64")
            st_tss = np.empty(0, dtype="int64")
            st_vals = np.empty(0, dtype="float64")
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["__sem_key", ts, id_col])
            b_keys = pdf["__sem_key"].to_numpy(dtype=str)
            b_ids = pdf[id_col].to_numpy(dtype="int64")
            b_ts_ns = pdf[ts].to_numpy().astype("datetime64[ns]").astype("int64")
            b_vals = pdf[value_col].to_numpy(dtype="float64")

            # merge order per key: state rows first (stored order),
            # then batch rows by (ts, id) — the cross-batch arrival
            # order of the per-key variant, reproduced exactly
            keys_all = np.concatenate([st_keys, b_keys])
            ids_all = np.concatenate([st_ids, b_ids])
            tss_all = np.concatenate([st_tss, b_ts_ns // 1000])
            vals_all = np.concatenate([st_vals, b_vals])
            is_new = np.concatenate(
                [np.zeros(len(st_keys), dtype=bool), np.ones(len(b_keys), dtype=bool)]
            )
            # stable sort by key only: state rows precede batch rows of
            # the same key (state indices are smaller), batch rows stay
            # in (ts, id) order from the pre-sort
            sort_idx = np.argsort(keys_all, kind="stable")
            keys_s = keys_all[sort_idx]
            vals_s = vals_all[sort_idx]
            new_s = is_new[sort_idx]

            seg_start = np.zeros(len(keys_s), dtype="int64")
            if len(keys_s):
                change = np.concatenate(
                    [[True], keys_s[1:] != keys_s[:-1]]
                )
                seg_first = np.nonzero(change)[0]
                seg_start = seg_first[np.cumsum(change) - 1]
            pos = np.arange(len(keys_s))
            cs = np.concatenate([[0.0], np.cumsum(vals_s)])
            lo = np.maximum(seg_start, pos + 1 - n)
            sums = cs[pos + 1] - cs[lo]
            counts = (pos + 1 - lo).astype("int32")

            m = new_s
            outs.append(
                pd.DataFrame(
                    {
                        "key": keys_s[m],
                        "event_id": ids_all[sort_idx][m],
                        "ts": (tss_all[sort_idx][m] * 1000).astype(
                            "datetime64[ns]"
                        ),
                        "n_in_window": counts[m],
                        "sum_value": sums[m],
                        "avg_value": sums[m] / counts[m],
                    }
                )
            )
            # new state: last n rows per key segment, in order
            keep = pos >= np.maximum(seg_start, _seg_end(keys_s) + 1 - n)
            st_keys = keys_s[keep]
            st_ids = ids_all[sort_idx][keep]
            st_tss = tss_all[sort_idx][keep]
            st_vals = vals_s[keep]
        state.update(
            (
                [str(k) for k in st_keys],
                [int(i) for i in st_ids],
                [int(t) for t in st_tss],
                [float(v) for v in st_vals],
            )
        )
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                columns=[
                    "key",
                    "event_id",
                    "ts",
                    "n_in_window",
                    "sum_value",
                    "avg_value",
                ]
            )
        )

    projected = stream.withColumn(
        "__sem_key", F.col(key).cast("string")
    ).withColumn("__bucket", F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))
    return projected.groupBy("__bucket").applyInPandasWithState(
        proc,
        _LENGTH_OUT,
        _LENGTH_BUCKET_STATE,
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
        # vectorized: carry-over + sorted batch, reshape complete
        # chunks of n and reduce per row — no iterrows (round-1/2
        # advice; same numpy hoist as length_window above)
        if state.exists:
            seq, s_ids, s_vals = state.get
            s_ids, s_vals = list(s_ids), list(s_vals)
        else:
            seq, s_ids, s_vals = 0, [], []
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts, id_col])
            ids = np.concatenate(
                [np.asarray(s_ids, dtype="int64"), pdf[id_col].to_numpy(dtype="int64")]
            )
            vals = np.concatenate(
                [
                    np.asarray(s_vals, dtype="float64"),
                    pdf[value_col].to_numpy(dtype="float64"),
                ]
            )
            n_complete = len(ids) // n
            if n_complete:
                chunk_ids = ids[: n_complete * n].reshape(n_complete, n)
                chunk_vals = vals[: n_complete * n].reshape(n_complete, n)
                outs.append(
                    pd.DataFrame(
                        {
                            "key": str(key_tuple[0]),
                            "batch_seq": np.arange(seq, seq + n_complete),
                            "n": np.int32(n),
                            "sum_value": chunk_vals.sum(axis=1),
                            "first_id": chunk_ids[:, 0],
                            "last_id": chunk_ids[:, -1],
                        }
                    )
                )
                seq += n_complete
            s_ids = [int(i) for i in ids[n_complete * n :]]
            s_vals = [float(v) for v in vals[n_complete * n :]]
        state.update((seq, s_ids, s_vals))
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                columns=["key", "batch_seq", "n", "sum_value", "first_id", "last_id"]
            )
        )

    projected = stream.withColumn("__key", F.col(key).cast("string"))
    return projected.groupBy("__key").applyInPandasWithState(
        proc,
        _LBATCH_OUT,
        _LBATCH_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


_EXPR_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("win_n", T.IntegerType()),
        T.StructField("win_sum", T.DoubleType()),
    ]
)
# state: the retained suffix as parallel (scaled-budget, value) arrays
_EXPR_STATE = T.StructType(
    [
        T.StructField("bs", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def expression_window(
    stream: DataFrame,
    limit: int,
    key: str,
    budget_scale: int = 100,
    ts: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sliding `expression('sum(value) <= L')` per key
    (`ExpressionWindowProcessor.java` — SURVEY.md §3.3 dynamic
    retain-while window): each arrival joins the window, then the
    window evicts from the FRONT until the retain expression holds
    again; the emission is the per-arrival aggregate over the
    survivors. Budgets are integer-scaled (cents) so the running sum
    is exact — the same contract as the batch twin
    (`operators.windows.expression_sliding`), whose keyed range
    self-join oracle proves this state machine.

    Scale shape: state per key is the retained suffix only (bounded by
    the budget, not the stream); each event appends once and is
    evicted at most once, so per-batch work is O(events) amortized
    regardless of window occupancy."""

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_bs, s_vals = (list(x) for x in state.get)
        else:
            s_bs, s_vals = [], []
        tot = sum(s_bs)
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts, id_col])
            ids = pdf[id_col].to_numpy(dtype="int64")
            tss = pdf[ts].to_numpy()
            vals = pdf[value_col].to_numpy(dtype="float64")
            bs = np.rint(vals * budget_scale).astype("int64")
            win_n = np.empty(len(ids), dtype="int32")
            win_sum = np.empty(len(ids), dtype="float64")
            for i in range(len(ids)):
                s_bs.append(int(bs[i]))
                s_vals.append(float(vals[i]))
                tot += int(bs[i])
                drop = 0
                while tot > limit and drop < len(s_bs) - 1:
                    tot -= s_bs[drop]
                    drop += 1
                if drop:
                    del s_bs[:drop]
                    del s_vals[:drop]
                # an arrival whose own budget busts the limit sees an
                # EMPTY window (batch-twin membership: even k = a fails
                # the test) — emit nothing, but it stays in state as a
                # candidate for later windows
                if tot > limit:
                    win_n[i] = 0
                    win_sum[i] = 0.0
                else:
                    win_n[i] = len(s_bs)
                    # exact: the integer budget total IS the sum at
                    # budget_scale resolution (no FP drift vs batch)
                    win_sum[i] = tot / budget_scale
            outs.append(
                pd.DataFrame(
                    {
                        "key": str(key_tuple[0]),
                        "event_id": ids,
                        "ts": tss,
                        "value": vals,
                        "win_n": win_n,
                        "win_sum": win_sum,
                    }
                )
            )
        state.update((s_bs, s_vals))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    projected = stream.withColumn("__key", F.col(key).cast("string"))
    return projected.groupBy("__key").applyInPandasWithState(
        proc,
        _EXPR_OUT,
        _EXPR_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


_EXPR_BUCKET_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("bs", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
    ]
)


def expression_window_bucketed(
    stream: DataFrame,
    limit: int,
    key: str,
    n_buckets: int = 128,
    budget_scale: int = 100,
    ts: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """`expression('sum(value) <= L')` with COARSE state buckets —
    identical output to `expression_window` (pinned by test), state
    keyed by `hash(key) % n_buckets` so one python call handles every
    key in the bucket (the r5 bucketed-state layout; see
    `length_window_bucketed` for the per-group-constant analysis).

    The bucketed form is also where the retain-while semantics
    VECTORIZE: budgets are non-negative, so the per-key prefix-sum is
    monotone and each event's window start is one
    `np.searchsorted(pre, pre[i+1] - limit)` — the whole bucket's
    windows come from one vectorized binary search instead of the
    per-event eviction loop."""

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            x = state.get
            st_keys = np.asarray(x[0], dtype=str)
            st_bs = np.asarray(x[1], dtype="int64")
            st_vals = np.asarray(x[2], dtype="float64")
            st_ids = np.asarray(x[3], dtype="int64")
            st_tss = np.asarray(x[4], dtype="int64")
        else:
            st_keys = np.empty(0, dtype=str)
            st_bs = np.empty(0, dtype="int64")
            st_vals = np.empty(0, dtype="float64")
            st_ids = np.empty(0, dtype="int64")
            st_tss = np.empty(0, dtype="int64")
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["__sem_key", ts, id_col])
            b_keys = pdf["__sem_key"].to_numpy(dtype=str)
            b_ids = pdf[id_col].to_numpy(dtype="int64")
            b_ts_ns = pdf[ts].to_numpy().astype("datetime64[ns]").astype("int64")
            b_vals = pdf[value_col].to_numpy(dtype="float64")
            b_bs = np.rint(b_vals * budget_scale).astype("int64")

            keys_all = np.concatenate([st_keys, b_keys])
            bs_all = np.concatenate([st_bs, b_bs])
            vals_all = np.concatenate([st_vals, b_vals])
            ids_all = np.concatenate([st_ids, b_ids])
            tss_all = np.concatenate([st_tss, b_ts_ns // 1000])
            is_new = np.concatenate(
                [np.zeros(len(st_keys), dtype=bool), np.ones(len(b_keys), dtype=bool)]
            )
            sort_idx = np.argsort(keys_all, kind="stable")
            keys_s = keys_all[sort_idx]
            bs_s = bs_all[sort_idx]
            m = len(keys_s)
            if not m:
                continue
            change = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
            seg_first = np.nonzero(change)[0]
            seg_id = np.cumsum(change) - 1
            seg_start = seg_first[seg_id]
            change_next = np.concatenate([keys_s[1:] != keys_s[:-1], [True]])
            seg_last = np.nonzero(change_next)[0]
            seg_end = seg_last[seg_id]

            pre = np.concatenate([[0], np.cumsum(bs_s)])
            pos = np.arange(m)
            # minimal j with window sum pre[i+1]-pre[j] <= limit
            j = np.searchsorted(pre, pre[1:] - limit, side="left")
            j = np.maximum(j, seg_start)
            win_n = (pos + 1 - j).astype("int32")  # 0 = own-budget bust
            win_sum = (pre[pos + 1] - pre[j]) / budget_scale
            win_sum[win_n == 0] = 0.0

            nm = is_new[sort_idx]
            outs.append(
                pd.DataFrame(
                    {
                        "key": keys_s[nm],
                        "event_id": ids_all[sort_idx][nm],
                        "ts": (tss_all[sort_idx][nm] * 1000).astype(
                            "datetime64[ns]"
                        ),
                        "value": vals_all[sort_idx][nm],
                        "win_n": win_n[nm],
                        "win_sum": win_sum[nm],
                    }
                )
            )
            # retained suffix per key = segment-end's window start
            # (never drop the last row: an own-budget buster stays
            # resident as a later-window candidate, like the per-key op)
            j_end = np.minimum(j[seg_end], seg_end)
            keep = pos >= j_end
            st_keys = keys_s[keep]
            st_bs = bs_s[keep]
            st_vals = vals_all[sort_idx][keep]
            st_ids = ids_all[sort_idx][keep]
            st_tss = tss_all[sort_idx][keep]
        state.update(
            (
                [str(k) for k in st_keys],
                [int(b) for b in st_bs],
                [float(v) for v in st_vals],
                [int(i) for i in st_ids],
                [int(t) for t in st_tss],
            )
        )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    projected = stream.withColumn(
        "__sem_key", F.col(key).cast("string")
    ).withColumn("__bucket", F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))
    return projected.groupBy("__bucket").applyInPandasWithState(
        proc,
        _EXPR_OUT,
        _EXPR_BUCKET_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
