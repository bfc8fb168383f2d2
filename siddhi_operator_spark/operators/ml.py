"""streamingml: namespace — clustering
(SURVEY.md §3.9 — `[ext:streamingml]
io.siddhi.extension.execution.streamingml.clustering.kmeans.
KMeansIncrementalStreamProcessor` / `KMeansMiniBatchStreamProcessor`).

Spark-first shape: the model state (k centroids × dim) is
contractually tiny, so each Lloyd iteration is

  assignment: crossJoin(broadcast(centroids)) + argmin — pure
              Catalyst array expressions (zip_with/aggregate fold),
              no Python in the hot path, one keyed agg per point;
  update:     posexplode → groupBy(cluster, dim) avg — k·dim result
              rows, partial-aggregated map-side, then collected as
              the next iteration's broadcast literals (model state,
              same small-by-contract collect as the ANN query matrix).

At 100 TB the per-iteration cost is one broadcast join + one
partial agg over k·dim keys — no all-pairs work, no growing state.

Determinism contract (what makes the DuckDB oracle exact): init =
the k lowest ids; centroid components are epsilon-bias rounded to 6
decimals each iteration (absorbs partial-sum association differences
between engines); distances fold left-to-right over the array; argmin
ties break on the lower centroid id via lexicographic (dist, cid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _sq_dist(v: Column, c: Column) -> Column:
    """Σ (v_i − c_i)² as a left-to-right fold (fixed association, so
    the oracle can reproduce the exact double)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_lloyd(
    spark: SparkSession,
    points: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`streamingml:kMeansMiniBatch(k, ...)` batch twin: Lloyd's
    algorithm with deterministic init (the k lowest ids) and a fixed
    iteration count. Returns (id, cluster, dist) — dist rounded 4dp."""
    e = points.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    e.cache()

    # deterministic init: the k lowest-id vectors ARE the seed
    # centroids (the reference seeds from first-arrival order; lowest
    # id is that, made order-independent)
    seed = (
        e.orderBy("_id")
        .limit(k)
        .select(F.col("_id").alias("cid"), F.col("v").alias("cv"))
    )
    centroids = [(int(r["cid"]), list(r["cv"])) for r in seed.collect()]

    def assign(cdf: DataFrame) -> DataFrame:
        scored = e.crossJoin(F.broadcast(cdf)).withColumn(
            "dist", _sq_dist(F.col("v"), F.col("cv"))
        )
        best = F.min(F.struct("dist", "cid"))  # lexicographic: tie → lower cid
        return scored.groupBy("_id").agg(
            best.getField("cid").alias("cluster"),
            best.getField("dist").alias("dist"),
            F.first("v").alias("v"),
        )

    for _ in range(iters - 1):
        cdf = spark.createDataFrame(centroids, "cid int, cv array<double>")
        assigned = assign(cdf)
        # update: elementwise mean per cluster — k·dim rows out of the
        # agg; 1e-9-bias 6dp rounding pins the exact double across
        # engines/partitionings
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x") + F.lit(1e-9), 6).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster",
                F.transform("pm", lambda s: s.getField("m")).alias("cv"),
            )
        )
        centroids = [
            (int(r["cluster"]), list(r["cv"])) for r in means.collect()
        ]

    cdf = spark.createDataFrame(centroids, "cid int, cv array<double>")
    out = assign(cdf).select(
        F.col("_id").alias(id_col),
        "cluster",
        F.round(F.col("dist") + F.lit(1e-9), 4).alias("dist"),
    )
    e.unpersist()
    return out
