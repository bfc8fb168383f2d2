"""Streaming incremental aggregation — the `define aggregation`
runtime path (SURVEY.md §3.5: `[core] aggregation/IncrementalExecutor
.java`, `IncrementalAggregationProcessor.java`).

Each micro-batch is aggregated to composable state (cnt/sum/sum²/min/
max per bucket×keys) and MERGED — by addition, not replacement — into
a parquet state table. Out-of-order events within the watermark simply
land in their (already existing) bucket and merge-add correctly:
composable state is order-free, which is exactly why the reference
stores it. Coarser granularities re-derive from the base state table
(`rollup_up`), never from raw events.

Scale: the merge touches only buckets present in the micro-batch
(broadcast the batch aggregate against the state table when small);
the state table is date-partitioned in production
(`operators.incremental.materialize_cascade`) so retention is
partition deletion and retrieval prunes.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.incremental import base_rollup

_STATE_COLS = ("cnt", "sum_v", "sum_sq", "min_v", "max_v")


class IncrementalStateTable:
    """Parquet-backed composable-state table keyed by
    (bucket_start, *keys), stored as versioned snapshots
    ``path/v=<epoch>`` with only COMMITTED (``_SUCCESS``-marked)
    versions readable.

    Exactly-once under at-least-once foreachBatch replay (r7 audit —
    the pre-r7 high-water-mark file had a crash window between the
    state overwrite and the marker write, after which a replayed
    epoch merge-ADDED a second time and doubled every sum): epoch N's
    merge reads the latest committed version STRICTLY BELOW N and
    overwrites ``v=N`` — a replay recomputes byte-identical state from
    the same inputs, a torn first attempt carries no ``_SUCCESS`` and
    is invisible. Same layout discipline as the near-dup band store
    (streaming/dedup.py) and ParquetUpsertTable."""

    _KEEP_VERSIONS = 3

    def __init__(
        self, spark: SparkSession, path: str, keys: Sequence[str]
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.path)
            if d.startswith("v=")
            and os.path.exists(os.path.join(self.path, d, "_SUCCESS"))
        )

    def current(self, below: int | None = None) -> DataFrame | None:
        """Latest committed snapshot (lazy). Snapshot-lifetime
        contract — same as Delta/Iceberg VACUUM retention: the
        returned frame reads its pinned version directory, which the
        retention pruner deletes after ``_KEEP_VERSIONS`` further
        epochs commit. Materialize (collect/write) promptly, or raise
        ``_KEEP_VERSIONS`` for long-lived readers."""
        vs = self._versions()
        if below is not None:
            vs = [v for v in vs if v < below]
        if not vs:
            return None
        return self.spark.read.parquet(f"{self.path}/v={vs[-1]}")

    def merge_batch(self, batch_state: DataFrame, epoch_id: int) -> None:
        """Merge-ADD a batch's composable state into the table:
        matching buckets combine (sum/sum/sum/min/max), new buckets
        append — the `IncrementalExecutor` bucket-accumulator update,
        expressed as one keyed aggregation over old ∪ new."""
        if epoch_id in self._versions():
            return  # replayed epoch whose state write already committed
        cur = self.current(below=epoch_id)
        combined = batch_state if cur is None else cur.unionByName(batch_state)
        merged = combined.groupBy("bucket_start", *self.keys).agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sum_sq").alias("sum_sq"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        merged.write.mode("overwrite").parquet(f"{self.path}/v={epoch_id}")
        # retention: checkpoint replay only ever revisits the last
        # uncommitted epoch, so anything older than a few versions is
        # unreachable — prune it (delete only AFTER the new commit)
        for v in self._versions()[: -self._KEEP_VERSIONS]:
            shutil.rmtree(f"{self.path}/v={v}", ignore_errors=True)


def incremental_agg_sink(
    stream: DataFrame,
    state: IncrementalStateTable,
    ts: str,
    value: str,
    gran: str,
    checkpoint: str,
) -> StreamingQuery:
    """`define aggregation` streaming runtime: per micro-batch, roll
    the batch up to the base granularity's composable state and merge
    into the state table."""

    def _merge(batch: DataFrame, epoch_id: int) -> None:
        bstate = base_rollup(batch, ts, value, tuple(state.keys), gran)
        state.merge_batch(bstate, epoch_id)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
