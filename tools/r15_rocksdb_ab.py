"""Round-15 A/B: RocksDB changelog checkpointing on the state-heavy
streaming rows.

Without changelog checkpointing Spark uploads a FULL RocksDB snapshot
per store per micro-batch commit, so commit cost is O(state size) every
batch; with it the commit writes only the batch's changelog (snapshots
are amortised in a background maintenance thread) — the production
setting when state ≫ batch delta (guide §1.2 order: this is a
config-tier change, taken only after the plan-shape work of Parts I/II).

One fresh process per invocation (the session config is immutable once
built). Prints per-row wall seconds, the summed state commitTimeMs from
the streaming progress events, and an order-independent result
fingerprint (count + sum(xxhash64(*cols))) so arms can be diffed for
row identity.

Usage: SPARK_GRAFT_ROCKSDB_CHANGELOG=false python tools/r15_rocksdb_ab.py out.jsonl [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

DEFAULT = [
    "streaming_join_outer",
    "streaming_join_windowed",
    "streaming_text_dsir",
    "streaming_incremental_neardup",
    "streaming_ivfpq_ingest",
    "siddhiql_bucketed_expression_window",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rocksdb_ab.jsonl"
    names = sys.argv[2:] or DEFAULT
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session
    from siddhi_operator_spark.suite import REGISTRY
    import siddhi_operator_spark.suite.streaming_suite as SS

    mode = os.environ.get("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true")
    spark = build_session("r15-rocksdb-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # capture per-batch progress without changing run semantics
    progress: list = []
    orig = SS._materialize

    def patched(stream, mode_, expect_single_batch=False):
        name = f"mq_{uuid.uuid4().hex[:10]}"
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode_)
            .start()
        )
        q.processAllAvailable()
        progress.extend(q.recentProgress)
        q.stop()
        return name

    SS._materialize = patched
    sf = "/root/testdata/sf0.1"
    with open(out_path, "a") as f:
        for name in names:
            progress.clear()
            spark.sparkContext.setJobDescription(f"rocksdb-ab:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf)
            t1 = time.perf_counter()
            agg = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast(
                        "decimal(38,0)"
                    )
                ).alias("fp"),
            ).first()
            commit_ms = sum(
                s.get("commitTimeMs", 0)
                for p in progress
                for s in p.get("stateOperators", [])
            )
            rec = {
                "changelog": mode,
                "name": name,
                "build_s": round(t1 - t0, 2),
                "rows": agg["n"],
                "fp": str(agg["fp"]),
                "state_commit_ms": commit_ms,
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)
    SS._materialize = orig


if __name__ == "__main__":
    main()
