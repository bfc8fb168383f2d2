"""End-to-end ANN serving example — the embedding-retrieval lifecycle
composed from the engine's similarity tiers, in the order a real
deployment runs them:

  1. index build     (IVFADC: sample-seeded coarse cells + PQ codes —
                      the corpus persists PARTITIONED BY CELL, 8 bytes
                      of payload per vector + two bounded quantizer
                      artifacts)
  2. serving probe   (queries rank the broadcast centroids, dynamic
                      partition pruning skips to their nprobe cell
                      directories, ADC lookup sums score the codes)
  3. accuracy audit  (recall@k of the served results vs the exact
                      brute-force tier on a query sample — the number
                      that licenses the approximation)

Run: python examples/ann_serving.py [sf_dir]   (default sf0.01)

Every step is a Catalyst plan; the quantizer artifacts are the only
bounded collects. At 100 TB the same composition holds: the encode
pass is a one-off corpus job, the index directory tree IS the IVF
structure (a probe reads nprobe directories), and the recall audit
runs on a sampled query set against the exact tier's cogroup path.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from siddhi_operator_spark.catalog import load  # noqa: E402
from siddhi_operator_spark.pipeline import similarity as S  # noqa: E402
from siddhi_operator_spark.session import build_session  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings")

    # 1. build + persist the cell-partitioned IVFADC index
    path = tempfile.mkdtemp(prefix="ann_index_")
    S.ivfpq_index_write(emb, path, n_cells=8, dims=64, m=8, n_codes=16)
    n_cells = spark.read.parquet(f"{path}/codes").select("cell").distinct().count()
    print(f"index at {path}: {n_cells} cell partitions")

    # 2. serve a query batch from the on-disk layout
    queries = emb.filter(F.col("vec_id") < 8)
    served = S.ivfpq_index_topk(spark, path, queries, nprobe=2, k=3)
    print("served top-3 (first rows):")
    for r in served.orderBy("query_id", "rank").limit(6).collect():
        print(f"  q={r.query_id} -> {r.neighbor_id}  adc={r.approx_dot}")

    # 3. recall audit vs the exact tier
    exact = S.brute_force_topk(emb, queries, k=3).select(
        "query_id", "neighbor_id"
    )
    hit = exact.join(
        served.select(
            F.col("query_id").alias("sq"), F.col("neighbor_id").alias("sn")
        ),
        (exact.query_id == F.col("sq")) & (exact.neighbor_id == F.col("sn")),
        "left",
    )
    rec = hit.groupBy("query_id").agg(
        (F.count("sn") / F.lit(3.0)).alias("recall_at_3")
    )
    mean_recall = rec.agg(F.avg("recall_at_3")).collect()[0][0]
    print(f"mean recall@3 vs exact-cosine tier: {mean_recall:.3f}")
    print("(ADC approximates DOT order; see similarity_ivfpq_recall "
          "for the exact-dot contract the driver checks)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
