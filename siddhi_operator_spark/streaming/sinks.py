"""Stream sinks (SURVEY.md §3.1, §3.2 —
`[core] stream/output/sink/Sink.java` SPI, `LogSink`, table callbacks).

- log sink              → `format("console")`
- inMemory sink         → `format("memory")` (test transport)
- file sink             → parquet append with checkpoint
- table upsert sink     → `foreachBatch` keyed MERGE into a parquet
  table (`UpdateOrInsertTableCallback.java`): last-writer-wins per key
  within the batch, then anti-join + union against the current table
  snapshot. With Delta/Iceberg on the classpath this becomes a real
  MERGE INTO; the parquet implementation keeps the same contract
  (idempotent per epoch → exactly-once with checkpointing).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def memory_sink(stream: DataFrame, name: str, output_mode: str = "append") -> StreamingQuery:
    return (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def console_sink(stream: DataFrame, output_mode: str = "append") -> StreamingQuery:
    return stream.writeStream.format("console").outputMode(output_mode).start()


def parquet_sink(
    stream: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    return (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def dead_letter_foreach_batch(process, dead_letter_path: str):
    """`@OnError(action='STREAM')` analog (SURVEY.md §3.10 —
    `StreamJunction` fault-stream side channel): wrap a foreachBatch
    body; if it throws, the whole batch lands in the dead-letter
    location (parquet, with an epoch column) instead of killing the
    query — the `!failedStream` consumers read that path."""

    def wrapped(batch: DataFrame, epoch_id: int) -> None:
        try:
            process(batch, epoch_id)
        except Exception:
            # per-epoch subdir + overwrite, NOT a flat append: foreachBatch
            # is at-least-once, and a replayed failed epoch would
            # double-append its rows into the dead-letter set (r7 state-
            # idempotence audit; same layout as streaming/dedup.py state)
            (
                batch.withColumn("_epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .parquet(f"{dead_letter_path}/epoch={epoch_id}")
            )

    return wrapped


class ParquetUpsertTable:
    """Keyed mutable table backed by parquet — the engine's
    `define table` + `@PrimaryKey` store (`InMemoryTable.java` /
    `@store` analog, durable). Readers get the latest snapshot;
    `upsert_batch` is the foreachBatch target.

    Snapshot layout: versioned directories (v=N) with only the latest
    read — a poor-man's Delta commit log; swap for Delta/Iceberg when
    the jars are available (same API)."""

    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str]):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        os.makedirs(path, exist_ok=True)

    def _versions(self) -> list[int]:
        # only COMMITTED versions (carrying _SUCCESS): a crash mid-write
        # leaves a torn v=N dir that snapshot() must never read — the
        # replayed epoch overwrites it (r7 state-idempotence audit)
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.path)
            if d.startswith("v=")
            and os.path.exists(os.path.join(self.path, d, "_SUCCESS"))
        )

    def snapshot(self) -> DataFrame | None:
        vs = self._versions()
        if not vs:
            return None
        return self.spark.read.parquet(f"{self.path}/v={vs[-1]}")

    def upsert_batch(self, batch: DataFrame, epoch_id: int, order_col: str) -> None:
        """MERGE: dedupe the batch per key (last writer by order_col),
        then new-snapshot = batch ∪ (current ∖ batch-keys). Writing to
        a fresh v=N dir keeps the operation idempotent per epoch."""
        from pyspark.sql.window import Window

        w = Window.partitionBy(*self.keys).orderBy(F.desc(order_col))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        cur = self.snapshot()
        if cur is not None:
            keep = cur.join(
                F.broadcast(latest.select(*self.keys).distinct()),
                on=self.keys,
                how="left_anti",
            )
            merged = keep.unionByName(latest)
        else:
            merged = latest
        next_v = (self._versions()[-1] + 1) if self._versions() else 0
        merged.write.mode("overwrite").parquet(f"{self.path}/v={next_v}")

    def changes(
        self, from_version: int = 0, to_version: int | None = None
    ) -> DataFrame | None:
        """Change feed over the version history — the engine's
        `[ext:io-cdc] CDCSource` analog (reference: Debezium rows with
        op + before/after images). Emits Delta-CDF-shaped rows: table
        columns + `_change_type` ('insert' | 'update_preimage' |
        'update_postimage' | 'delete') + `_commit_version`, derived by
        keyed full-outer diff of consecutive snapshots. With Delta on
        the classpath this becomes `table_changes(...)` reading the
        commit log instead of diffing; the contract is identical.

        Scale: each version pair is ONE keyed full-outer join (shuffle
        on the primary key) — no cross-version state; at 100 TB the
        snapshots are key-bucketed so the join is co-partitioned."""
        vs = self._versions()
        if not vs or to_version == from_version:
            return None
        to_version = vs[-1] if to_version is None else to_version
        chain = [v for v in vs if from_version <= v <= to_version]
        out = None
        for v_prev, v_next in zip(chain, chain[1:]):
            prev = self.spark.read.parquet(f"{self.path}/v={v_prev}")
            nxt = self.spark.read.parquet(f"{self.path}/v={v_next}")
            val_cols = [c for c in nxt.columns if c not in self.keys]
            n = nxt.withColumn("_pn", F.lit(True)).alias("n")
            p = prev.withColumn("_pp", F.lit(True)).alias("p")
            j = n.join(p, on=self.keys, how="full_outer")
            changed = None
            for c in val_cols:
                neq = ~F.col(f"n.{c}").eqNullSafe(F.col(f"p.{c}"))
                changed = neq if changed is None else (changed | neq)
            is_insert = F.col("_pp").isNull()
            is_delete = F.col("_pn").isNull()

            def _img(side: str, ctype: str, cond) -> DataFrame:
                return j.filter(cond).select(
                    *self.keys,
                    *[F.col(f"{side}.{c}").alias(c) for c in val_cols],
                    F.lit(ctype).alias("_change_type"),
                    F.lit(v_next).alias("_commit_version"),
                )

            is_update = ~is_insert & ~is_delete & changed
            ins = _img("n", "insert", is_insert)
            dels = _img("p", "delete", is_delete)
            upd_post = _img("n", "update_postimage", is_update)
            upd_pre = _img("p", "update_preimage", is_update)
            step = ins.unionByName(dels).unionByName(upd_post).unionByName(upd_pre)
            out = step if out is None else out.unionByName(step)
        return out

    def sink(
        self, stream: DataFrame, checkpoint: str, order_col: str
    ) -> StreamingQuery:
        return (
            stream.writeStream.foreachBatch(
                lambda df, eid: self.upsert_batch(df, eid, order_col)
            )
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )


def store_sink(
    stream: DataFrame,
    stream_def,
    checkpoint: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """Stream → `@store`-bound external table (`[ext:store-rdbms]`
    RDBMSTable sink et al.): each micro-batch appends through the
    standard DataSource writer resolved from the `@store` annotation
    (JDBC/Mongo/parquet — `sources.stores.store_options`).

    foreachBatch + checkpointing gives at-least-once into stores
    without transactional writers (JDBC appends are not idempotent on
    replay; exactly-once needs a store-side MERGE keyed by an event id
    — the same caveat the reference's RDBMS sink carries)."""
    from ..sources.stores import write_store

    def _write(batch: DataFrame, epoch_id: int) -> None:
        write_store(batch, stream_def, mode="append")

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )
