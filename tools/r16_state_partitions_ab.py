"""r16 OPT — derived state-partition pick A/B (r15 verdict item 6).

One fresh process per invocation; the arm is selected by
`SPARK_GRAFT_STATE_ROWS_PER_STORE` (unset/65536 = derivation ON,
`0` = derivation OFF → session default 32 partitions). Alternate
invocations A/B/A/B per the r15 state-row protocol (cross-session
absolutes for RocksDB rows are not comparable; within-session
ordering drifts — so: fresh process, alternated arms, ≥3 reps).

Per row: wall seconds, summed state commitTimeMs, state partition
count from the last progress, and the order-independent result
fingerprint (count + sum(xxhash64(*cols))) — fingerprints MUST match
across arms.

Usage: python tools/r16_state_partitions_ab.py out.jsonl [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

DEFAULT = [
    "streaming_join_windowed",
    "streaming_join_windowed_bucket",
    "streaming_join_unidirectional",
    "streaming_join_outer",
    "streaming_join_full_outer",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/state_partitions_ab.jsonl"
    names = sys.argv[2:] or DEFAULT
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session
    from siddhi_operator_spark.suite import REGISTRY
    import siddhi_operator_spark.suite.streaming_suite as SS

    arm = os.environ.get("SPARK_GRAFT_STATE_ROWS_PER_STORE", "65536")
    spark = build_session("r16-statepart-ab")
    spark.sparkContext.setLogLevel("ERROR")

    progress: list = []
    orig = SS._materialize

    def patched(stream, mode_, expect_single_batch=False, state_partitions=None):
        name = orig(
            stream, mode_, expect_single_batch, state_partitions=state_partitions
        )
        # orig stops the query; capture progress via the active-query
        # hook below instead
        return name

    # capture progress without changing semantics: wrap processAllAvailable
    from pyspark.sql.streaming import StreamingQuery

    orig_paa = StreamingQuery.processAllAvailable

    def paa(self):
        orig_paa(self)
        try:
            progress.extend(self.recentProgress)
        except Exception:
            pass

    StreamingQuery.processAllAvailable = paa

    sf = "/root/testdata/sf0.1"
    with open(out_path, "a") as f:
        for name in names:
            progress.clear()
            spark.sparkContext.setJobDescription(f"statepart-ab:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf)
            agg = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
            ).first()
            wall = time.perf_counter() - t0
            commit_ms = 0
            parts = None
            for p in progress:
                for op in p.get("stateOperators", []):
                    commit_ms += op.get("commitTimeMs", 0) or 0
                    parts = op.get("numStateStoreInstances", parts)
            rec = {
                "arm": arm,
                "row": name,
                "wall_s": round(wall, 2),
                "commit_ms": commit_ms,
                "state_store_instances": parts,
                "fp": [agg.n, str(agg.h)],
            }
            print(json.dumps(rec))
            f.write(json.dumps(rec) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
