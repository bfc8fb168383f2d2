"""r16 — verdict item 1's plan check: no NEW exchanges/Python nodes
may appear in a text-family operator's plan when the corpus scales.
Builds each operator's DataFrame on sf0.1 and on the ×N disjoint
fixture and diffs the plan-shape stats (Exchange count, join
strategies, BatchEvalPython/ArrowEvalPython/MapInPandas nodes).
Plan building only — no jobs run (except the operators' own bounded
stats collects, which are part of plan construction).

Usage: python tools/r16_plan_scale_check.py [N]
"""

from __future__ import annotations

import io
import re
import sys
import contextlib

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def stats(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    return {
        "exchange": len(re.findall(r"\bExchange\b", p)),
        "smj": len(re.findall(r"SortMergeJoin", p)),
        "bhj": len(re.findall(r"BroadcastHashJoin", p)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", p)),
        "py": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", p)
        ),
        "cartesian": len(re.findall(r"CartesianProduct", p)),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import curation as C
    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.pipeline import text as X
    from siddhi_operator_spark.session import build_session

    spark = build_session("r16-plan-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docsN = spark.read.parquet(
        f"/tmp/spark_graft_scale/docs_disjoint_x{N}/documents.parquet"
    )

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
        "token_jaccard": lambda d: D.token_jaccard_pairs(d, min_jaccard=0.5),
        "winnow_fingerprints": lambda d: C.winnow_fingerprints(d, k=3, w=4),
        "dedup_lines": lambda d: X.dedup_lines(d),
        "minhash_lsh_pairs_inline": lambda d: D.lsh_candidate_pairs(
            D.minhash_signature(d, 32), n_hashes=32, band_size=8, inline=True,
            cache=False,
        ),
    }
    bad = 0
    for name, build in cands.items():
        s1 = stats(build(docs1))
        sN = stats(build(docsN))
        drift = {k: (s1[k], sN[k]) for k in s1 if s1[k] != sN[k]}
        flag = f"  DRIFT {drift}" if drift else ""
        if drift:
            bad += 1
        print(f"{name:28s} x1={s1}{flag}")
    print("plans with scale drift:", bad)


if __name__ == "__main__":
    main()
