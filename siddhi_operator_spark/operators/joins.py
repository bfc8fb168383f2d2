"""Join operators — batch/analytics mode.

The reference's only join algorithm is a windowed nested-loop with a
compiled condition (`[core] query/input/stream/join/JoinProcessor.java`,
`util/parser/JoinInputStreamParser.java`; table probes use hash-index
lookups via `table/holder/IndexedEventHolder.java`) — SURVEY.md §3.4.
On Spark we instead *declare* the join and let Catalyst choose
broadcast-hash / sort-merge / shuffle-hash; our job is to keep the
small side broadcastable and the time bound tight so state stays
bounded in the streaming twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_table_join(
    stream: DataFrame,
    table: DataFrame,
    on: Column | Sequence[str],
    how: str = "inner",
    broadcast_table: bool = True,
) -> DataFrame:
    """Stream ⋈ table: each event probes the table
    (`IndexOperator`/`CollectionOperator`, SURVEY.md §3.4).

    The reference's `@PrimaryKey` hash-index lookup ≡ a broadcast hash
    join: ship the dimension to every executor, probe per row, no
    shuffle of the 100 TB fact side. Set ``broadcast_table=False`` for
    dimensions too big to broadcast (falls back to AQE's choice,
    typically sort-merge with the dimension shuffled).
    """
    t = F.broadcast(table) if broadcast_table else table
    return stream.join(t, on=on, how=how)


def in_table(
    stream: DataFrame,
    table: DataFrame,
    on: Column | Sequence[str],
    negate: bool = False,
    broadcast_table: bool = True,
) -> DataFrame:
    """Membership: Siddhi `expr in TableName`
    (`[core] executor/condition/InConditionExpressionExecutor.java`).

    left-semi (or left-anti for the absent-from-table variant the
    reference writes as `not ... in`). Broadcast keeps it shuffle-free.
    """
    t = F.broadcast(table) if broadcast_table else table
    return stream.join(t, on=on, how="left_anti" if negate else "left_semi")


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    equi_keys: Sequence[tuple[str, str]],
    within_seconds: float,
    extra_cond: Column | None = None,
    how: str = "inner",
    unidirectional: bool = False,
) -> DataFrame:
    """Stream ⋈ stream over time windows: Siddhi
    `from S1#window.time(t) join S2#window.time(t) on cond`
    (`JoinProcessor.java`): each arrival probes the other side's last-t
    window, i.e. matches satisfy |ts_l − ts_r| ≤ t plus the condition.

    Batch mapping: equi-join on keys + time-range residual. The equi
    keys make it a hash/sort-merge join (NOT a cartesian range probe);
    the range is a cheap post-filter. The streaming twin adds
    `withWatermark` on both sides so state is evicted at `t` — exactly
    the reference's window eviction.
    """
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = None
    for lk, rk in equi_keys:
        c = F.col(f"l.{lk}") == F.col(f"r.{rk}")
        cond = c if cond is None else (cond & c)
    if unidirectional:
        # only the LEFT side triggers output (grammar keyword
        # `unidirectional`; `JoinProcessor` trigger flags): a pair
        # exists iff the right event was already in the window when the
        # left event arrived → r.ts ∈ [l.ts − t, l.ts]
        rng = (rts >= lts - F.expr(f"INTERVAL {within_seconds} SECONDS")) & (
            rts <= lts
        )
    else:
        rng = (rts >= lts - F.expr(f"INTERVAL {within_seconds} SECONDS")) & (
            rts <= lts + F.expr(f"INTERVAL {within_seconds} SECONDS")
        )
    cond = rng if cond is None else (cond & rng)
    if extra_cond is not None:
        cond = cond & extra_cond
    return left.alias("l").join(right.alias("r"), on=cond, how=how)


def join_aggregation(
    stream: DataFrame,
    rollup: DataFrame,
    on: Column | Sequence[str],
    start: Column | str | None = None,
    end: Column | str | None = None,
    bucket_col: str = "bucket_start",
    how: str = "inner",
) -> DataFrame:
    """Stream ⋈ incremental aggregation: Siddhi
    `join AggName on cond within <range> per <granularity>`
    (`[core] aggregation/IncrementalAggregateCompileCondition.java`).

    ``rollup`` is one granularity table from
    ``operators.incremental.rollup_cascade``; `within` becomes a
    partition-prunable range filter on the bucket column *before* the
    join, so only the needed rollup slices are scanned.
    """
    if start is not None:
        rollup = rollup.filter(F.col(bucket_col) >= start)
    if end is not None:
        rollup = rollup.filter(F.col(bucket_col) < end)
    return stream.join(F.broadcast(rollup), on=on, how=how)
