"""Round-8 A/B: remove_repeated_spans bloom pre-filter vs plain probe.

Two workloads, both at docs ×N (default 100 and 1000):

- **mixed** (the regime the bloom targets): 30 % of base docs fan out
  into 50 distinct site "variants" × N/50 verbatim replicas each —
  every variant's windows are shared by its replicas, and the DISTINCT
  shared-fp tail is ~50× the base corpus's fp count (big enough that
  AQE cannot broadcast the exact rows and the probe genuinely
  shuffles). The other 70 % of docs are salted per-replica (every 3rd
  token carries the replica id, so every k=3-gram is poisoned and no
  window is ever shared) — those positions are pure bloom-prunable
  noise.
- **allshared** (the shipped decade fixture's worst case): every
  replica shares every window; the bloom passes everything and should
  measure as pure overhead. Run it to size that overhead honestly.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r8_bloom_ab.py [scales...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = os.environ.get("SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale")


def ensure_docs_mixed(spark, scale: int, variants: int = 50) -> str:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS

    out = f"{BASE}/docs_mixed_x{scale}"
    if not os.path.exists(f"{out}/_READY"):
        os.makedirs(out, exist_ok=True)
        d = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{SF_DIR}/documents.parquet"
        )
        k = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("k")
        shared_family = (F.col("doc_id") % 10) < 3  # 30 % of base docs
        # shared docs: variant id v = k % variants, salt tokens with v
        # (consistent across the N/variants replicas of that variant ->
        # every window shared by >= min_docs docs, and the DISTINCT
        # shared tail grows ~variants x base-fp-count)
        v = (F.col("k") % variants).cast("string")
        # non-shared docs: salt with the replica id itself (unique ->
        # every k-gram poisoned per replica, no window ever shared)
        salt = F.when(shared_family, v).otherwise(F.col("k").cast("string"))
        toks = F.split(F.col("text"), r"\s+")
        salted = F.array_join(
            F.transform(
                toks,
                lambda t, i: F.when(
                    i % 3 == 0, F.concat(t, F.lit("q"), salt)
                ).otherwise(t),
            ),
            " ",
        )
        (
            d.select("*", k)
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("k").cast("long") * F.lit(10**9),
            )
            .withColumn("text", salted)
            .drop("k")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/documents.parquet")
        )
        open(f"{out}/_READY", "w").write("ok")
    return out


def main() -> None:
    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import curation as C
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
        mdir = ensure_docs_mixed(spark, scale)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{mdir}/documents.parquet"
        )
        docs.write.format("noop").mode("overwrite").save()  # warm cache
        timed(
            f"mixed probe       x{scale}",
            C.remove_repeated_spans(docs, impl="probe"),
        )
        timed(
            f"mixed probe+bloom x{scale}",
            C.remove_repeated_spans(docs, impl="probe", prefilter="bloom"),
        )
        adir = ensure_docs(spark, scale)
        adocs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{adir}/documents.parquet"
        )
        adocs.write.format("noop").mode("overwrite").save()
        timed(
            f"allshared probe       x{scale}",
            C.remove_repeated_spans(adocs, impl="probe"),
        )
        timed(
            f"allshared probe+bloom x{scale}",
            C.remove_repeated_spans(adocs, impl="probe", prefilter="bloom"),
        )


if __name__ == "__main__":
    main()
