"""Round-8 decade check for the MIPS tiers at embeddings x1000
(500 k vectors): exact broadcast-pair tier vs the norm-augmented
multi-band LSH ANN tier, small and large query sides.
Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r8_mips_scale.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import similarity as S
    from siddhi_operator_spark.session import build_session
    from tools.scalebench_pipeline import ensure_embeddings

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    edir = ensure_embeddings(spark, 1000)
    emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
        f"{edir}/embeddings.parquet"
    )
    emb.write.format("noop").mode("overwrite").save()  # warm cache

    def timed(label, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.monotonic() - t0:.2f} s", flush=True)

    q5 = emb.filter(F.col("vec_id") < 5)
    q5k = emb.filter(F.col("vec_id") % 100 == 0)  # ~5 000 queries
    timed("mips_exact   q=5    x1000", S.mips_topk(emb, q5, k=3))
    timed("mips_ann 4x4 q=5    x1000", S.mips_ann_topk(emb, q5, k=3))
    # large query set wants FINER buckets: at 4 bits the in-bucket
    # candidate stream is ~620 M pairs (measured: leg killed after
    # 25 min of interpreted dot products); 8 bits/band cuts it ~16x —
    # bucket bits scale with corpus like IVF cell counts do
    timed(
        "mips_ann 8x4 q=5000 x1000",
        S.mips_ann_topk(emb, q5k, k=3, n_bits=8, n_bands=4),
    )
    # composed IVFADC: 64 cells / 4 probes at this scale (the sf-gate
    # geometry of 8/2 would leave ~8k-vector cells; scale the cell
    # count with the corpus like a real deployment does)
    timed(
        "ivfpq 64c/4p q=5    x1000",
        S.ivfpq_topk(emb, n_cells=64, nprobe=4, k=3, max_query_id=5),
    )
    timed(
        "ivfpq 64c/4p q=5000 x1000",
        S.ivfpq_topk(emb, n_cells=64, nprobe=4, k=3, max_query_id=5000),
    )


if __name__ == "__main__":
    main()
