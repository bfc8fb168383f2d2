"""r15 OPT — decade-scale check of the text/BPE/DSIR family
(OPTIMIZATION_r15.md "Not yet optimized" #3).

Fixture: documents ×N with DISJOINT tokens per replica (every token of
replica k is prefixed ``r<k>``), so cross-replica shingles/pairs never
match and the corpus is N independent copies of sf0.1 — output
structure scales exactly ×N and any time ratio beyond ~N is an
algorithmic defect (quadratic-in-corpus work, exploding join, serial
stage), not output growth. Built once, idempotent (_READY flag).

For each operator: warm-up + median-of-REPS noop-sink timing at sf0.1
and at ×N, printing the scaling ratio. The interesting column is
``xN/х1 vs N``: ≲N = linear (fine), ≫N = investigate.

Usage: python tools/r15_text_decade.py [N] [reps] [only_csv]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = os.environ.get("SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale")


def ensure_docs_disjoint(spark, scale: int) -> str:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS

    out = f"{BASE}/docs_disjoint_x{scale}"
    if not os.path.exists(f"{out}/_READY"):
        os.makedirs(out, exist_ok=True)
        d = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{SF_DIR}/documents.parquet"
        )
        k = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("k")
        pfx = F.concat(F.lit("r"), F.col("k").cast("string"))
        (
            d.select("*", k)
            .withColumn(
                "doc_id", F.col("doc_id") + F.col("k").cast("long") * F.lit(10**9)
            )
            # disjoint tokens: prefix EVERY token with the replica id so
            # no shingle/band/line ever matches across replicas
            .withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(pfx, t),
                    ),
                    " ",
                ),
            )
            .drop("k")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/documents.parquet")
        )
        open(f"{out}/_READY", "w").close()
    return out


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.pipeline import text as X
    from siddhi_operator_spark.session import build_session

    spark = build_session("r15-text-decade")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = ensure_docs_disjoint(spark, N)
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docsN = spark.read.parquet(f"{big_dir}/documents.parquet")
    docs1.write.format("noop").mode("overwrite").save()
    docsN.write.format("noop").mode("overwrite").save()

    cands = {
        "dsir_logweight": lambda d: X.dsir_logweight(
            d, target_pred=F.col("lang") == "en", cache=False
        ),
        "word_lm_score": lambda d: X.word_lm_score(d, cache=False),
        "char_lm_score": lambda d: X.char_lm_score(d, cache=False),
        "classifier_train": lambda d: X.classifier_train(
            d, n_buckets=4096, eta=1.0, iters=2, label_min_tokens=50
        ),
        "shingle_stats": lambda d: X.shingle_stats(d, k=3),
        "remove_repeated_spans": lambda d: C.remove_repeated_spans(
            d, k=3, w=4, min_docs=2
        ),
        "remove_spans_bloom": lambda d: C.remove_repeated_spans(
            d, k=3, w=4, min_docs=2, prefilter="bloom"
        ),
        "token_jaccard": lambda d: D.token_jaccard_pairs(d, min_jaccard=0.5),
        "winnow_fingerprints": lambda d: C.winnow_fingerprints(d, k=3, w=4),
        "dedup_lines": lambda d: X.dedup_lines(d),
        "bpe_train3": lambda d: X.bpe_train(d, merges=3),
        "minhash_lsh_pairs": lambda d: D.lsh_candidate_pairs(
            D.minhash_signature(d, 32), n_hashes=32, band_size=8
        ),
    }

    for name, build in cands.items():
        if ONLY and name not in ONLY:
            continue
        t = {}
        for label, src in (("x1", docs1), ("xN", docsN)):
            spark.sparkContext.setJobDescription(f"decade:{name}:{label}")
            _noop(build(src))  # warm-up
            t[label] = statistics.median(_noop(build(src)) for _ in range(REPS))
        ratio = t["xN"] / max(t["x1"], 1e-9)
        flag = "  <-- SUPERLINEAR" if ratio > 1.6 * N else ""
        print(
            f"{name:24s} x1 {t['x1']:7.2f}s  x{N} {t['xN']:8.2f}s  "
            f"ratio {ratio:6.2f} (linear={N}){flag}",
            flush=True,
        )


if __name__ == "__main__":
    main()
