"""Decade-check the PIPELINE tier (dedup / similarity) — the analytics
suite has its ×1000 check in SCALEBENCH.md; this script scales the
dedup and ANN paths:

- documents ×N (default 100 → 500k docs from sf0.1's 5 000; each
  replica token-prefixed so copies are near-dups, not byte-identical,
  and template clusters grow ×N — the degenerate-bucket direction):
  minhash signatures → capped LSH candidate pairs (auto cap) →
  strong pairs → connected components.
- embeddings ×M (default 1000 → 2 M vectors): arrow brute-force
  top-k (small query side), IVF top-k, and the cogroup block-matmul
  tier with a 1%-of-corpus query side (the large-query workload the
  broadcast tier refuses).

Usage: python tools/scalebench_pipeline.py [docs_scale] [emb_scale]
Prints one wall-clock line per stage; append results to SCALEBENCH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = os.environ.get("SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale")


def _timed(label: str, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.2f} s  ({out})", flush=True)
    return dt, out


def ensure_docs(spark, scale: int) -> str:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS

    out = f"{BASE}/docs_x{scale}"
    if not os.path.exists(f"{out}/_READY"):
        os.makedirs(out, exist_ok=True)
        d = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{SF_DIR}/documents.parquet"
        )
        k = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("k")
        (
            d.select("*", k)
            .withColumn("doc_id", F.col("doc_id") + F.col("k").cast("long") * F.lit(10**9))
            # replica-token prefix: near-dup, not byte-identical
            .withColumn("text", F.concat(F.format_string("r%d ", F.col("k")), F.col("text")))
            .drop("k")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/documents.parquet")
        )
        open(f"{out}/_READY", "w").write("ok")
    return out


def ensure_embeddings(spark, scale: int) -> str:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS

    out = f"{BASE}/emb_x{scale}"
    if not os.path.exists(f"{out}/_READY"):
        os.makedirs(out, exist_ok=True)
        em = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{SF_DIR}/embeddings.parquet"
        )
        k = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("k")
        # perturb one dimension per replica so vectors are distinct
        (
            em.select("*", k)
            .withColumn("vec_id", F.col("vec_id") + F.col("k").cast("long") * F.lit(10**9))
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + F.when(
                            i == 0, (F.col("k") % 97).cast("float") / 1000.0
                        ).otherwise(F.lit(0.0))
                    ).cast("float"),
                ),
            )
            .drop("k")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/embeddings.parquet")
        )
        open(f"{out}/_READY", "w").write("ok")
    return out


def main() -> None:
    docs_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    emb_scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.pipeline import similarity as S
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    if docs_scale == 0:  # 0 skips the docs tier (embeddings-only run)
        _run_embeddings(spark, emb_scale)
        spark.stop()
        return

    print(f"== documents x{docs_scale} ==", flush=True)
    ddir = ensure_docs(spark, docs_scale)
    docs = spark.read.schema(SCHEMAS["documents"]).parquet(
        f"{ddir}/documents.parquet"
    )
    _timed("doc count", docs.count)
    if os.environ.get("SPARK_GRAFT_SB_SKIP_DEDUP", "0") != "1":
        sigs = D.minhash_signature(docs, n_hashes=32)
        pairs = D.lsh_candidate_pairs(sigs, n_hashes=32, band_size=8)  # auto cap
        _timed("capped LSH pairs (auto)", pairs.count)
        strong = pairs.filter(F.col("n_sig_match") >= 30)
        _timed(
            "connected components (disk ckpt)",
            lambda: D.connected_components(
                strong, checkpoint_dir=f"{BASE}/cc_ckpt"
            ).count(),
        )

    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.pipeline import text as X

    _timed(
        "bloom decontamination (k=4, 2^20 bits)",
        lambda: C.decontaminate_bloom(docs, n=3, eval_mod=97).count(),
    )
    _timed(
        "exact-broadcast decontamination (baseline)",
        lambda: C.decontaminate(docs, n=3, eval_mod=97).count(),
    )
    _timed(
        "BM25 top-20 (3-term query)",
        lambda: X.bm25_topk(docs, ["spark", "join", "window"], top_k=20).count(),
    )

    if emb_scale > 0:
        _run_embeddings(spark, emb_scale)
    spark.stop()


def _run_embeddings(spark, emb_scale: int) -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import similarity as S

    print(f"== embeddings x{emb_scale} ==", flush=True)
    edir = ensure_embeddings(spark, emb_scale)
    emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
        f"{edir}/embeddings.parquet"
    )
    n = emb.count()
    print(f"vectors: {n}", flush=True)
    small_q = emb.filter(F.col("vec_id") < 5)
    _timed(
        "brute-force arrow top-3 (5 queries)",
        lambda: S.brute_force_topk(emb, small_q, k=3, impl="arrow").count(),
    )
    _timed(
        "IVF top-3 (5 queries)",
        lambda: S.ivf_topk(emb, n_cells=8, nprobe=2, k=3, max_query_id=5).count(),
    )
    _timed(
        "PQ encode+ADC top-3 catalyst (5 queries, m=8, 16 codes)",
        lambda: S.pq_topk(
            emb, dims=64, m=8, n_codes=16, k=3, max_query_id=5
        ).count(),
    )
    _timed(
        "PQ encode+ADC top-3 arrow (5 queries, m=8, 16 codes)",
        lambda: S.pq_topk(
            emb, dims=64, m=8, n_codes=16, k=3, max_query_id=5, impl="arrow"
        ).count(),
    )
    if os.environ.get("SPARK_GRAFT_SB_SKIP_COGROUP", "0") == "1":
        return
    big_q = emb.filter(F.pmod(F.hash("vec_id"), F.lit(100)) == 0)  # ~1%
    nq = big_q.count()
    print(f"cogroup query side: {nq}", flush=True)
    _timed(
        f"cogroup block top-3 ({nq} queries)",
        lambda: S.brute_force_topk(emb, big_q, k=3, impl="cogroup").count(),
    )


if __name__ == "__main__":
    main()
