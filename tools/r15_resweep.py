"""Round-15 session-2 re-sweep: re-time the rows the round-start sweep
flagged slow, AFTER the input-parallelism / quantifier fixes, on a quiet
box. build_s = registry fn() call (for streaming rows this includes the
micro-batch run via processAllAvailable); run_s = one noop-sink save of
the returned DataFrame.

Usage: python tools/r15_resweep.py out.jsonl name1 name2 ...
       (no names = the default top-slow list from timing_sweep_sf01)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT = [
    "siddhiql_bucketed_expression_window",
    "streaming_text_dsir",
    "text_bpe_encode",
    "streaming_join_outer",
    "streaming_join_windowed",
    "text_bpe_train",
    "dedup_connected_components",
    "streaming_ivfpq_ingest",
    "siddhiql_reorder_akslack",
    "streaming_incremental_neardup",
    "text_dsir_weight",
    "ml_perceptron_online",
    "streaming_text_remove_spans",
    "similarity_ivfpq_compacted_serve",
    "text_remove_spans_bloom",
    "text_classifier_train",
    "window_sliding_time",
    "text_remove_repeated_spans",
    "neardup_token_jaccard",
    "dedup_semantic_clusters",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/resweep.jsonl"
    names = sys.argv[2:] or DEFAULT
    from siddhi_operator_spark.session import build_session
    from siddhi_operator_spark.suite import REGISTRY

    spark = build_session("r15-resweep")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    with open(out_path, "w") as f:
        for name in names:
            spark.sparkContext.setJobDescription(f"resweep:{name}")
            t0 = time.perf_counter()
            try:
                df = REGISTRY[name].fn(spark, sf)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                rec = {
                    "name": name,
                    "build_s": round(t1 - t0, 3),
                    "run_s": round(t2 - t1, 3),
                }
            except Exception as e:  # noqa: BLE001
                rec = {"name": name, "error": f"{type(e).__name__}: {e}"[:200]}
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)


if __name__ == "__main__":
    main()
