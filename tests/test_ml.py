"""streamingml: operators — k-means clustering + online perceptron."""

from __future__ import annotations

import tempfile
import uuid

import pyspark.sql.functions as F


def test_kmeans_separates_obvious_clusters(spark):
    """Two well-separated blobs: 2 Lloyd iterations from lowest-id
    seeds must put each point with its blob."""
    from siddhi_operator_spark.operators.ml import kmeans_lloyd

    pts = [
        (0, [0.0, 0.0]), (1, [10.0, 10.0]),  # seeds: one per blob
        (2, [0.5, -0.5]), (3, [0.2, 0.1]),
        (4, [10.5, 9.5]), (5, [9.8, 10.2]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_lloyd(spark, df, k=2, iters=2).collect()
    }
    assert out[0] == out[2] == out[3] == 0
    assert out[1] == out[4] == out[5] == 1


def test_perceptron_learns_linearly_separable(spark):
    """Prequential online perceptron over a replayed stream: after the
    first mistakes it must classify the tail of a linearly separable
    sequence correctly, and every event must be scored exactly once."""
    from siddhi_operator_spark.streaming import ml as SML
    from siddhi_operator_spark.streaming import sources as SRC

    rows = []
    for i in range(40):
        y = i % 2
        x = [1.0, 2.0] if y else [-1.0, -2.0]
        rows.append((i, f"2024-01-01 00:00:{i:02d}", x, y))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, embedding array<double>, y int"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    d = tempfile.mkdtemp(prefix="replay_ml_test_")
    SRC.replay_dir(df, d, "ts", 2)
    s = SRC.file_stream(spark, d, df.schema, max_files_per_trigger=1)
    out = SML.perceptron_online(s, features_col="embedding", label_col="y")
    name = f"ml_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["event_id"]: (r["true_label"], r["pred_label"], r["correct"])
        for r in spark.table(name).collect()
    }
    assert len(got) == 40  # each event scored exactly once
    # replicate the prequential fold exactly
    w, b = [0.0, 0.0], 0.0
    for i in range(40):
        y = i % 2
        x = [1.0, 2.0] if y else [-1.0, -2.0]
        score = b + sum(wi * xi for wi, xi in zip(w, x))
        pred = 1 if score >= 0 else 0
        assert got[i] == (y, pred, pred == y), i
        if pred != y:
            d_ = 0.1 * (y - pred)
            w = [wi + d_ * xi for wi, xi in zip(w, x)]
            b += d_
    # the model converges: the last 10 events are all correct
    assert all(got[i][2] for i in range(30, 40))
