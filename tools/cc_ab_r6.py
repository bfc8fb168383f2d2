"""Round-6 scale measurements:

1. ×1000 decade fills: cross_doc_repeats and BM25 at 5 M docs
   (SCALEBENCH round-5 table had "—" cells).
2. Connected-components A/B at ×100: min-label propagation vs
   alternating large-star/small-star contraction, both on the
   disk-checkpoint tier. The A/B ran with label as the then-default;
   star won 4.0× and IS the default now (SCALEBENCH.md r6), so the
   label arm pins algo="label" explicitly.

Usage: python tools/cc_ab_r6.py [all|text|cc]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale")


def _timed(label: str, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.2f} s  ({out})", flush=True)
    return dt, out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"

    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS
    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.session import build_session
    from tools.scalebench_pipeline import ensure_docs

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    if mode in ("all", "text"):
        from siddhi_operator_spark.pipeline import curation as C
        from siddhi_operator_spark.pipeline import text as X

        ddir = ensure_docs(spark, 1000)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{ddir}/documents.parquet"
        )
        print("== x1000 docs (5 M) decade fills ==", flush=True)
        # noop-sink materialization (the round-5 probe-note lesson:
        # .count() lets Catalyst prune the expensive columns)
        _timed(
            "cross-doc repeats x1000",
            lambda: C.cross_doc_repeats(docs)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        _timed(
            "BM25 top-20 x1000",
            lambda: X.bm25_topk(docs, ["spark", "join", "window"], top_k=20)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    if mode in ("all", "cc"):
        print("== CC A/B at x100 (strong pairs) ==", flush=True)
        ddir = ensure_docs(spark, 100)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{ddir}/documents.parquet"
        )
        strong_path = f"{BASE}/strong_pairs_x100"
        if not os.path.exists(f"{strong_path}/_SUCCESS"):
            sigs = D.minhash_signature(docs, n_hashes=32)
            pairs = D.lsh_candidate_pairs(sigs, n_hashes=32, band_size=8)
            _timed(
                "materialize strong pairs",
                lambda: pairs.filter(F.col("n_sig_match") >= 30)
                .select("id_a", "id_b")
                .write.mode("overwrite")
                .parquet(strong_path),
            )
        strong = spark.read.parquet(strong_path)
        _timed("edge count", strong.count)
        _timed(
            "CC label (disk ckpt)",
            # explicit algo: the library default flipped to "star" after
            # this A/B — without it both arms would time the same algo
            lambda: D.connected_components(
                strong, checkpoint_dir=f"{BASE}/cc_ab_label", algo="label"
            ).count(),
        )
        _timed(
            "CC star (disk ckpt)",
            lambda: D.connected_components(
                strong, checkpoint_dir=f"{BASE}/cc_ab_star", algo="star"
            ).count(),
        )
    spark.stop()


if __name__ == "__main__":
    main()
