"""Round-9 decade checks, one leg per process (the r8 A/B lesson:
in-process sequential legs inherit JVM/cache state and fake wins —
ONE FRESH PROCESS PER LEG, warm pass inside).

Legs:
  mips_ann_default  embeddings ×1000 (500 k vecs), 5 k queries through
                    mips_ann_topk with NO explicit geometry — the
                    derived n_bits (8 at 500 k) must complete in the
                    band the explicit 8×4 run documented (SCALEBENCH
                    r8: 838 s; the old fixed 4-bit default was killed
                    at 25 min / ~620 M re-rank pairs)
  span_auto | span_none | span_bloom
                    remove_repeated_spans at docs-mixed ×1000 (the
                    regime the bloom targets) with the given
                    prefilter; auto must match-or-beat the best
                    manual leg and report what it picked

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r9_scale.py <leg> [scale]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.session import build_session

    leg = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.monotonic() - t0:.2f} s", flush=True)

    if leg == "mips_ann_default":
        from siddhi_operator_spark.pipeline import similarity as S
        from tools.scalebench_pipeline import ensure_embeddings

        edir = ensure_embeddings(spark, scale)
        emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{edir}/embeddings.parquet"
        )
        emb.write.format("noop").mode("overwrite").save()  # warm
        n = emb.count()
        bits = S.mips_ann_bits(n)
        print(f"corpus={n} derived n_bits={bits}", flush=True)
        q5k = emb.filter(F.col("vec_id") % 100 == 0)  # ~5 000 queries
        timed(
            f"mips_ann DEFAULT(q=5k) x{scale}",
            S.mips_ann_topk(emb, q5k, k=3),  # no explicit geometry
        )
        return

    if leg.startswith("span_"):
        from siddhi_operator_spark.pipeline import curation as C
        from tools.r8_bloom_ab import ensure_docs_mixed

        pf = leg.split("_", 1)[1]
        mdir = ensure_docs_mixed(spark, scale)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{mdir}/documents.parquet"
        )
        docs.write.format("noop").mode("overwrite").save()  # warm
        timed(
            f"spans prefilter={pf} x{scale}",
            C.remove_repeated_spans(docs, prefilter=pf),
        )
        if pf == "auto":
            print(f"auto picked: {C.LAST_SPAN_PREFILTER}", flush=True)
        return

    raise SystemExit(f"unknown leg {leg!r}")


if __name__ == "__main__":
    main()
