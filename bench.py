"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: median_sec, ...}, "sf": <sf>}

Query set mirrors BASELINE.md §2 (the locally-measurable baseline):
filter+project, tumbling agg, stream-table join, windowed self-join,
TPC-H Q1, top-k, CEP pattern, plus the LLM-pipeline headliners
(minhash LSH dedup, brute-force cosine top-k). Median of 3 timed runs
after 1 warmup (warm JVM + parquet footer cache — what a resident
service would see).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "filter_project",
    "window_timebatch",
    "join_stream_table",
    "join_windowed_self",
    "tpch_q1",
    "window_sort_topk",
    "pattern_followed_by",
    "window_session",
    "incr_agg_day",
    "dedup_minhash_lsh",
    "similarity_bruteforce",
]

N_RUNS = 3


def main() -> None:
    from siddhi_operator_spark.session import build_session
    from siddhi_operator_spark.suite import REGISTRY

    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        # Build the DataFrame once and re-execute it for the timed
        # runs: a resident engine analyzes a continuous query's plan
        # once and runs it forever — per-run Python plan reconstruction
        # is driver overhead, not query cost. Each .save() is still a
        # full optimize+execute cycle over the data.
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm caches
        times = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "suite_median_wall_sec_total",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
