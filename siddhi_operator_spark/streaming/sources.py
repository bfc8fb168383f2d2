"""Stream sources (SURVEY.md §3.1 —
`[core] stream/input/source/Source.java` SPI + `[ext:io-*]`).

The reference's connector zoo maps to Spark's native sources; the
engine-level contract is just "unbounded DataFrame with a declared
schema and an event-time column":

- file/dir tail (`[ext:io-file] FileSource`)  → ``readStream`` over a
  directory (parquet/json/csv/text), `maxFilesPerTrigger` for paced
  replay;
- kafka (`[ext:io-kafka]`)                    → `format("kafka")` (jar
  not in this container — gated);
- timer/cron triggers (`PeriodicTrigger`)     → `format("rate")`;
- inMemory test transport (`InMemoryBroker`)  → file-replay harness
  (`replay_dir`) + memory sink, which is also how tests drive
  deterministic multi-batch sequences.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Directory-watching source (the `file` connector). Schema is
    mandatory — streams never infer (SURVEY.md §2.2)."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Timer source (`PeriodicTrigger`): synthetic (timestamp, value)
    rows — the trigger-stream analog."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def kafka_stream(
    spark: SparkSession, bootstrap: str, topic: str, schema: T.StructType
) -> DataFrame:
    """Kafka source (`[ext:io-kafka] KafkaSource`). Requires the
    spark-sql-kafka jar on the classpath; raises a clear error here
    since this container ships without it."""
    try:
        from pyspark.sql import functions as F

        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .load()
        )
        return raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("v")
        ).select("v.*")
    except Exception as e:  # pragma: no cover - no kafka jar in container
        raise NotImplementedError(
            "kafka source requires the spark-sql-kafka package on the "
            "classpath"
        ) from e


def replay_dir(
    df: DataFrame, out_dir: str, split_col: str, n_splits: int
) -> str:
    """Test/replay harness (the inMemory-transport analog): write a
    bounded DataFrame as ``n_splits`` single parquet files with
    increasing mtimes (the file source orders by mtime), so
    ``file_stream(..., max_files_per_trigger=1)`` replays it as a
    deterministic multi-batch sequence in ``split_col`` order."""
    import glob
    import shutil
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    os.makedirs(out_dir, exist_ok=True)
    w = Window.orderBy(split_col)
    ranked = df.withColumn("_rk", F.ntile(n_splits).over(w))
    now = time.time()
    # ONE partitioned write instead of n_splits filter+write jobs (r15
    # OPT, guide §2.4): the old loop re-ran the global ntile sort once
    # per split (measured: the 3-split replay of sf0.1 events cost
    # ~2.5 s/split, serially, in EVERY streaming row's setup). A
    # single-task dynamic-partition write pays the sort once and emits
    # the same one-file-per-split layout (partitionBy drops _rk from
    # the files, same as the old .drop); per-file row order is the
    # same split_col window order either way.
    tmp = f"{out_dir}/_stage_all"
    ranked.coalesce(1).write.partitionBy("_rk").mode("overwrite").parquet(tmp)
    for i in range(1, n_splits + 1):
        (src,) = glob.glob(f"{tmp}/_rk={i}/part-*.parquet")
        dst = f"{out_dir}/batch_{i:04d}.parquet"
        shutil.move(src, dst)
        os.utime(dst, (now + i, now + i))
    shutil.rmtree(tmp)
    return out_dir
