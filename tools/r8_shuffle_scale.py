"""Round-8 decade check for `curation.deterministic_shuffle` at docs
×100 / ×1000 (500 k / 5 M rows): the two-pass bucketed rank must stay
sub-linear per decade — the corpus-side work is one keyed window over
~65 536-row buckets plus a broadcast offsets join; nothing global.
Usage: python tools/r8_shuffle_scale.py [100|1000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.schema(SCHEMAS["documents"]).parquet(
        f"{BASE}/docs_x{scale}/documents.parquet"
    ).select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()  # warm page cache
    t0 = time.monotonic()
    C.deterministic_shuffle(docs, id_col="doc_id", seed=0).write.format(
        "noop"
    ).mode("overwrite").save()
    print(
        f"deterministic_shuffle x{scale}: {time.monotonic() - t0:.2f} s",
        flush=True,
    )


if __name__ == "__main__":
    main()
