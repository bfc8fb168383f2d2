"""Shared named-window fan-out in STREAMING mode.

The reference keeps ONE window instance per `define window` and lets
every query read it (`[core] window/Window.java` — one instance, many
readers; batch analog: `suite/windows.py` `named_window_fanout`).
Structured Streaming has no shared-operator primitive — attaching two
sinks to one DataFrame lineage starts two independent queries, each
re-executing the source.

``SharedStreamHop`` is the streaming fixed point: materialize the
windowed stream ONCE into a parquet hop (exactly-once via the hop's
checkpoint), and hand every consumer a file-stream reader over the hop
directory. The source executes in exactly one query — consumers tail
the hop files, never the source.

Scale notes: the hop is an append-only columnar log partitioned by the
sink's micro-batches; N consumers add zero load on the source and read
the hop in parallel. On a cluster the hop path lives on shared storage
(object store / HDFS) — same layout, no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


class SharedStreamHop:
    """Materialize ``stream`` once; fan out N readers.

    ``stream`` is typically `define window W` applied to a source —
    filters/windowed projections whose result several queries share.
    """

    def __init__(self, stream: DataFrame, path: str):
        self.path = path
        self.schema = stream.schema
        os.makedirs(path, exist_ok=True)
        self._query: StreamingQuery = (
            stream.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", os.path.join(path, "_checkpoint"))
            .outputMode("append")
            .start()
        )

    @property
    def query(self) -> StreamingQuery:
        """The single materializing query (the only source execution)."""
        return self._query

    def consumer(self, spark: SparkSession) -> DataFrame:
        """A new unbounded reader over the hop — start as many as
        needed; none touches the source."""
        return (
            spark.readStream.schema(self.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(self.path)
        )

    def process_available(self) -> None:
        """Drain the source into the hop (test/replay convenience)."""
        self._query.processAllAvailable()

    def stop(self) -> None:
        self._query.stop()
