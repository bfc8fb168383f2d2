"""Round-7 decade checks for the NEW pipeline ops: the hashing-trick
classifier and span removal at docs x100/x1000, int8 quantization at
embeddings x1000. Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r7_newops_scale.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.pipeline import similarity as S
    from siddhi_operator_spark.pipeline import text as X
    from siddhi_operator_spark.session import build_session
    from tools.scalebench_pipeline import ensure_docs, ensure_embeddings

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.monotonic() - t0:.2f} s", flush=True)

    for scale in (100, 1000):
        ddir = ensure_docs(spark, scale)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{ddir}/documents.parquet"
        )
        timed(f"classifier_score x{scale}", X.classifier_score(docs))
        timed(f"remove_repeated_spans x{scale}", C.remove_repeated_spans(docs))

    edir = ensure_embeddings(spark, 1000)
    emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
        f"{edir}/embeddings.parquet"
    )
    timed("quantize_int8 emb x1000", S.quantize_embeddings_int8(emb))


if __name__ == "__main__":
    main()
