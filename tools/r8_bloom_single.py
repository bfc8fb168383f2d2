"""One fresh-process leg of the bloom A/B (r8): eliminates the
long-lived-JVM and run-order confounds the combined runner showed
(allshared probe 501 s vs its own 226 s steady state — leg order, not
code). Usage:
  python tools/r8_bloom_single.py {mixed|allshared} {none|bloom} [scale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale")


def main() -> None:
    variant, prefilter = sys.argv[1], sys.argv[2]
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    sub = "docs_mixed" if variant == "mixed" else "docs"
    docs = spark.read.schema(SCHEMAS["documents"]).parquet(
        f"{BASE}/{sub}_x{scale}/documents.parquet"
    )
    docs.write.format("noop").mode("overwrite").save()  # warm page cache
    t0 = time.monotonic()
    C.remove_repeated_spans(docs, impl="probe", prefilter=prefilter).write.format(
        "noop"
    ).mode("overwrite").save()
    print(
        f"{variant} prefilter={prefilter} x{scale}: "
        f"{time.monotonic() - t0:.2f} s",
        flush=True,
    )


if __name__ == "__main__":
    main()
