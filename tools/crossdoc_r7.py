"""Round-7 re-measure: cross_doc_repeats after the array-native winnow
rewrite (no per-doc Window exchange+sort, no corpus-wide pair
DISTINCT — one fp-agg shuffle total). r6 baseline: 4.42 s at x100,
65.0 s at x1000 = 14.7x/decade with ~6 GB/partition shuffle spill.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/crossdoc_r7.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.session import build_session
    from tools.scalebench_pipeline import ensure_docs

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    for scale in (100, 1000):
        ddir = ensure_docs(spark, scale)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{ddir}/documents.parquet"
        )
        t0 = time.monotonic()
        C.cross_doc_repeats(docs).write.format("noop").mode("overwrite").save()
        print(f"cross-doc repeats x{scale}: {time.monotonic() - t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
