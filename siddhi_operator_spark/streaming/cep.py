"""Streaming CEP: pattern / sequence NFA on ``applyInPandasWithState``.

The reference's CEP core (`[core] query/input/stream/state/` —
`StreamPreStateProcessor`, `StreamPostStateProcessor`,
`LogicalPreStateProcessor`, `CountPreStateProcessor`,
`AbsentStreamPreStateProcessor`; parser
`util/parser/StateInputStreamParser.java`) chains pre/post state
processors holding partial matches per pattern position. Spark has no
CEP primitive (SURVEY.md §5 custom-work item 1) — this module is the
NFA equivalent:

- keyed by the partition attribute → the shuffle distributes keys, the
  NFA runs per key inside `applyInPandasWithState`;
- events are event-time sorted within each micro-batch; cross-batch
  ordering relies on the watermark having dropped later-than-allowed
  events upstream (document: in-batch reordering is handled, regression
  across batch boundaries follows arrival order, like the reference);
- partial matches live in the state store as parallel arrays (Arrow-
  serializable — no pickled objects, so state survives restarts with
  a stable schema);
- `within` enforces the match deadline; `every` controls restart;
  `strict` turns followed-by into contiguous sequence semantics
  (`CountPreStateProcessor`'s contiguity);
- absence (`not X for t`) is a separate timer-based operator using
  event-time timeouts (`AbsentStreamPreStateProcessor`'s scheduler).

Patterns are specified as ordered steps; each step's predicate is a
boolean SQL expression string evaluated against the input columns
(compiled ONCE into the stream before the stateful operator — so
predicate evaluation stays in Catalyst codegen; the Python NFA only
reads precomputed boolean flags).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _match_out_schema(n_steps: int) -> T.StructType:
    fields = [T.StructField("key", T.StringType())]
    for i in range(1, n_steps + 1):
        fields.append(T.StructField(f"e{i}_id", T.LongType()))
        fields.append(T.StructField(f"e{i}_ts", T.TimestampType()))
    return T.StructType(fields)


# partial matches: one row per (slot, position): arrays of
# match-id / step-index / event ids+ts flattened
_NFA_STATE = T.StructType(
    [
        T.StructField("next_step", T.ArrayType(T.IntegerType())),
        T.StructField("start_us", T.ArrayType(T.LongType())),
        # matched event ids/timestamps per partial, '|'-joined strings
        # (variable-length per partial; arrays-of-arrays are avoided for
        # state-store schema stability)
        T.StructField("ids_csv", T.ArrayType(T.StringType())),
        T.StructField("tss_csv", T.ArrayType(T.StringType())),
    ]
)


def pattern_nfa(
    stream: DataFrame,
    key: str,
    step_predicates: Sequence[str],
    ts: str = "ts",
    id_col: str = "event_id",
    within_seconds: float | None = None,
    every: bool = True,
    strict: bool = False,
) -> DataFrame:
    """`from every e1=S[p1] -> e2=S[p2] … within t` (or, with
    ``strict=True``, the contiguous sequence form `e1=S[p1], e2=S[p2]`).

    Emits one row per completed match: key, e1_id, e1_ts, …, eN_id,
    eN_ts. First-completion per armed partial; ``every`` re-arms on
    every step-1 match (the reference's `every` quantifier).
    """
    n_steps = len(step_predicates)
    out_schema = _match_out_schema(n_steps)
    within_us = int(within_seconds * 1_000_000) if within_seconds else None

    # compile predicates in Catalyst: one boolean flag column per step
    flagged = stream.select(
        F.col(key).cast("string").alias("__key"),
        F.col(id_col).alias("__id"),
        F.col(ts).alias("__ts"),
        *[F.expr(p).cast("boolean").alias(f"__p{i}") for i, p in enumerate(step_predicates)],
    )

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            next_step, start_us, ids_csv, tss_csv = (
                list(x) for x in state.get
            )
        else:
            next_step, start_us, ids_csv, tss_csv = [], [], [], []
        matches = []

        def try_advance(ev_id: int, ev_us: int, flags) -> None:
            nonlocal next_step, start_us, ids_csv, tss_csv
            keep = ([], [], [], [])
            advanced_any = False
            for step, st, ics, tcs in zip(next_step, start_us, ids_csv, tss_csv):
                # expire partials past their deadline
                if within_us is not None and ev_us - st > within_us:
                    continue
                if flags[step]:
                    ics = f"{ics}|{ev_id}" if ics else str(ev_id)
                    tcs = f"{tcs}|{ev_us}" if tcs else str(ev_us)
                    if step + 1 == n_steps:
                        matches.append((ics, tcs))
                        advanced_any = True
                        continue  # completed: drop the partial
                    keep[0].append(step + 1)
                    keep[1].append(st)
                    keep[2].append(ics)
                    keep[3].append(tcs)
                    advanced_any = True
                elif strict:
                    continue  # contiguity broken: kill the partial
                else:
                    keep[0].append(step)
                    keep[1].append(st)
                    keep[2].append(ics)
                    keep[3].append(tcs)
            next_step, start_us, ids_csv, tss_csv = keep
            # arm a new partial on a step-0 match ('every' => always;
            # otherwise only when no partial is currently armed)
            if flags[0] and (every or not next_step):
                if n_steps == 1:
                    matches.append((str(ev_id), str(ev_us)))
                else:
                    next_step.append(1)
                    start_us.append(ev_us)
                    ids_csv.append(str(ev_id))
                    tss_csv.append(str(ev_us))

        for pdf in pdfs:
            pdf = pdf.sort_values(["__ts", "__id"])
            flag_cols = [pdf[f"__p{i}"].fillna(False).to_numpy() for i in range(n_steps)]
            ids = pdf["__id"].to_numpy()
            tss = pdf["__ts"].astype("int64").to_numpy()  # ns
            for r in range(len(pdf)):
                # an event that matches step k of an existing partial
                # must not ALSO seed/advance using itself twice: the
                # reference advances all partials with the current
                # event once, then considers arming — same here.
                try_advance(int(ids[r]), int(tss[r] // 1000), [fc[r] for fc in flag_cols])

        state.update((next_step, start_us, ids_csv, tss_csv))
        rows = []
        for ics, tcs in matches:
            out_row = [str(key_tuple[0])]
            for i_s, t_s in zip(ics.split("|"), tcs.split("|")):
                out_row.append(int(i_s))
                out_row.append(pd.Timestamp(int(t_s) * 1000))
            rows.append(tuple(out_row))
        cols = ["key"]
        for i in range(1, n_steps + 1):
            cols += [f"e{i}_id", f"e{i}_ts"]
        yield pd.DataFrame(rows, columns=cols)

    return flagged.groupBy("__key").applyInPandasWithState(
        proc,
        out_schema,
        _NFA_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------
# absence: e1=S[p1] -> not S[p2] for t   (event-time timers)
# --------------------------------------------------------------------

_ABSENCE_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("e1_id", T.LongType()),
        T.StructField("e1_ts", T.TimestampType()),
    ]
)
_ABSENCE_STATE = T.StructType(
    [
        T.StructField("armed_ids", T.ArrayType(T.LongType())),
        T.StructField("armed_us", T.ArrayType(T.LongType())),
    ]
)


def absence_nfa(
    stream: DataFrame,
    key: str,
    arm_predicate: str,
    absent_predicate: str,
    for_seconds: float,
    ts: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """`e1=S[p1] -> not S[p2] for t`
    (`AbsentStreamPreStateProcessor.java`): arm a timer on p1; a p2
    event within t disarms; firing emits (key, e1). The reference uses
    its scheduler — here the event-time timeout of the state API (the
    watermark drives time forward)."""
    for_us = int(for_seconds * 1_000_000)

    flagged = stream.withWatermark(ts, watermark).select(
        F.col(key).cast("string").alias("__key"),
        F.col(id_col).alias("__id"),
        F.col(ts).alias("__ts"),
        F.expr(arm_predicate).cast("boolean").alias("__arm"),
        F.expr(absent_predicate).cast("boolean").alias("__dis"),
    )

    def proc(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        armed_ids, armed_us = (list(x) for x in state.get) if state.exists else ([], [])
        fired = []

        if state.hasTimedOut:
            # watermark passed the earliest deadline: fire every armed
            # timer whose deadline ≤ watermark
            wm_us = state.getCurrentWatermarkMs() * 1000
            keep_i, keep_u = [], []
            for i, u in zip(armed_ids, armed_us):
                if u + for_us <= wm_us:
                    fired.append((i, u))
                else:
                    keep_i.append(i)
                    keep_u.append(u)
            armed_ids, armed_us = keep_i, keep_u
        else:
            for pdf in pdfs:
                pdf = pdf.sort_values(["__ts", "__id"])
                for _, row in pdf.iterrows():
                    ev_us = int(row["__ts"].value // 1000)
                    if bool(row["__dis"]):
                        # disarm timers still inside their window
                        keep_i, keep_u = [], []
                        for i, u in zip(armed_ids, armed_us):
                            if ev_us - u > for_us:
                                fired.append((i, u))  # already survived
                            # else: disarmed, drop
                        armed_ids, armed_us = keep_i, keep_u
                    if bool(row["__arm"]):
                        armed_ids.append(int(row["__id"]))
                        armed_us.append(ev_us)

        if armed_ids:
            state.update((armed_ids, armed_us))
            deadline_ms = (min(armed_us) + for_us) // 1000
            state.setTimeoutTimestamp(deadline_ms)
        else:
            state.update(([], []))

        yield pd.DataFrame(
            [
                (str(key_tuple[0]), i, pd.Timestamp(u * 1000))
                for i, u in fired
            ],
            columns=["key", "e1_id", "e1_ts"],
        )

    return flagged.groupBy("__key").applyInPandasWithState(
        proc,
        _ABSENCE_OUT,
        _ABSENCE_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
