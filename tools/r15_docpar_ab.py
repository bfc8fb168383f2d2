"""r15 OPT — document-pipeline input-parallelism A/B.

The registry timing sweep (plans/r15/timing_sweep_sf01.jsonl) put ten
non-bench pipeline rows at 2.3-12.8 s — all consumers of the same
1-row-group documents/embeddings fixtures whose scan is ONE task (the
dedup_minhash_lsh defect, guide §2.5). For each candidate this tool
times the operator as shipped vs the identical call on an input
repartitioned to defaultParallelism, and asserts the two arms return
byte-identical sorted rows.

Usage: python tools/r15_docpar_ab.py [sf_dir] [reps] [only_csv]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.pipeline import similarity as S
    from siddhi_operator_spark.pipeline import text as X
    from siddhi_operator_spark.session import build_session

    spark = build_session("r15-docpar-ab")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs.write.format("noop").mode("overwrite").save()
    emb.write.format("noop").mode("overwrite").save()

    cands = {
        "text_dsir_weight": (
            docs,
            lambda d: X.dsir_logweight(
                d, target_pred=F.col("lang") == "en", cache=False
            ),
        ),
        "text_word_lm": (docs, lambda d: X.word_lm_score(d, cache=False)),
        "text_char_lm_score": (
            docs,
            lambda d: X.char_lm_score(d, cache=False),
        ),
        "text_classifier_train": (
            docs,
            lambda d: X.classifier_train(
                d, n_buckets=4096, eta=1.0, iters=2, label_min_tokens=50
            ),
        ),
        "text_shingles": (docs, lambda d: X.shingle_stats(d, k=3)),
        "text_remove_repeated_spans": (
            docs,
            lambda d: C.remove_repeated_spans(d, k=3, w=4, min_docs=2),
        ),
        "text_remove_spans_bloom": (
            docs,
            lambda d: C.remove_repeated_spans(
                d, k=3, w=4, min_docs=2, prefilter="bloom"
            ),
        ),
        "neardup_token_jaccard": (
            docs,
            lambda d: D.token_jaccard_pairs(d, min_jaccard=0.5),
        ),
        "dedup_semantic_clusters": (
            emb,
            lambda d: D.semantic_dedup_pairs(d, min_cos=0.2, n_cells=8),
        ),
        "similarity_knn_graph": (
            emb,
            lambda d: S.brute_force_topk(d, d, k=3, impl="cogroup"),
        ),
    }

    for name, (src, build) in cands.items():
        if ONLY and name not in ONLY:
            continue
        arms = {"base": src, "par": src.repartition(par)}
        rows = {}
        times = {}
        for arm, inp in arms.items():
            df = build(inp)
            _noop(df)  # warm-up
            times[arm] = statistics.median(
                _noop(build(inp)) for _ in range(REPS)
            )
            rows[arm] = sorted(
                tuple(r) for r in df.collect()
            )
        same = rows["base"] == rows["par"]
        print(
            f"{name:28s} base {times['base']:6.2f}s  par {times['par']:6.2f}s "
            f"x{times['base'] / max(times['par'], 1e-9):5.2f}  "
            f"rows={len(rows['base'])} identical={same}",
            flush=True,
        )
        if not same:
            diff = [
                (a, b)
                for a, b in zip(rows["base"], rows["par"])
                if a != b
            ][:3]
            print(f"  FIRST DIFFS: {diff}", flush=True)


if __name__ == "__main__":
    main()
