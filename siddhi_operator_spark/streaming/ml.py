"""streamingml: namespace — online classification
(SURVEY.md §3.9 — `[ext:streamingml]
io.siddhi.extension.execution.streamingml.classification.perceptron.
PerceptronClassifierUpdaterStreamProcessor` /
`PerceptronClassifierStreamProcessor`).

Online perceptron learning is inherently sequential (each update
depends on every prior one), so the operator is a single-group
`applyInPandasWithState` — the model IS the state, events stream
through in event-time order, and each event is scored BEFORE it
updates the weights (prequential evaluation, the reference's
update-then-emit contract). This mirrors the reference exactly: its
updater is likewise a single-instance stateful processor, not a
distributed trainer. For distributed training use a proper parameter
server / Spark MLlib — out of scope per SURVEY §8.5.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_PERCEPTRON_OUT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("true_label", T.IntegerType()),
        T.StructField("pred_label", T.IntegerType()),
        T.StructField("correct", T.BooleanType()),
    ]
)
_PERCEPTRON_STATE = T.StructType(
    [
        T.StructField("weights", T.ArrayType(T.DoubleType())),
        T.StructField("bias", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def perceptron_online(
    stream: DataFrame,
    features_col: str,
    label_col: str,
    eta: float = 0.1,
    id_col: str = "event_id",
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """`streamingml:updatePerceptronClassifier(model, label, f...)`:
    binary online perceptron. Each event is predicted with the
    pre-update weights, then (if misclassified) updates them:
    w += eta·(y − ŷ)·x, b += eta·(y − ŷ). Emits the prequential
    (true, predicted, correct) per event."""

    flagged = stream.withWatermark(ts, watermark).select(
        F.lit("model").alias("__m"),
        stream[id_col].alias("__id"),
        stream[ts].alias("__ts"),
        stream[features_col].cast("array<double>").alias("__x"),
        stream[label_col].cast("int").alias("__y"),
    )

    def proc(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeouts used
            yield pd.DataFrame(columns=[f.name for f in _PERCEPTRON_OUT])
            return
        w, b, n = (
            (list(state.get[0]), float(state.get[1]), int(state.get[2]))
            if state.exists
            else (None, 0.0, 0)
        )
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["__ts", "__id"])
            ids = pdf["__id"].to_numpy()
            tss = pdf["__ts"]
            xs = pdf["__x"]
            ys = pdf["__y"].to_numpy()
            for i in range(len(pdf)):
                x = [float(v) for v in xs.iat[i]]
                if w is None:
                    w = [0.0] * len(x)
                y = 1 if int(ys[i]) > 0 else 0
                score = b + sum(wi * xi for wi, xi in zip(w, x))
                pred = 1 if score >= 0.0 else 0
                rows.append((int(ids[i]), tss.iat[i], y, pred, pred == y))
                if pred != y:
                    d = eta * (y - pred)
                    w = [wi + d * xi for wi, xi in zip(w, x)]
                    b += d
                n += 1
        state.update((w or [], b, n))
        yield pd.DataFrame(
            rows, columns=[f.name for f in _PERCEPTRON_OUT]
        )

    return flagged.groupBy("__m").applyInPandasWithState(
        proc,
        _PERCEPTRON_OUT,
        _PERCEPTRON_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
