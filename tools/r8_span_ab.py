"""Round-8 A/B: remove_repeated_spans probe (r7 shape, de-hinted) vs
fused (single fp-partitioned exchange, winnow computed once), plus the
de-hinted dedup_lines no-regression check (r8 task 1/8).
Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r8_span_ab.py [scales...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.pipeline import text as X
    from siddhi_operator_spark.session import build_session
    from tools.scalebench_pipeline import ensure_docs

    scales = [int(a) for a in sys.argv[1:]] or [100, 1000]
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.monotonic() - t0:.2f} s", flush=True)

    for scale in scales:
        ddir = ensure_docs(spark, scale)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{ddir}/documents.parquet"
        )
        # warm page cache once (bench.py warm_page_cache rationale)
        docs.write.format("noop").mode("overwrite").save()
        timed(f"spans_probe   x{scale}", C.remove_repeated_spans(docs, impl="probe"))
        timed(f"spans_fused   x{scale}", C.remove_repeated_spans(docs, impl="fused"))
        timed(f"dedup_lines   x{scale}", X.dedup_lines(docs))


if __name__ == "__main__":
    main()
