"""Suite: CDC change feed (`[ext:io-cdc] CDCSource` analog — SURVEY.md
§3.1). The keyed versioned table produces Delta-CDF-shaped change rows
(insert / update_pre/postimage / delete + commit version) by keyed
snapshot diff; the oracle recomputes the same diff relationally from
the raw events.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register

_CUTOFF = "2024-01-15 00:00:00"


@register(
    "table_cdc_feed",
    oracle=f"""
    WITH v0 AS (
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_CUTOFF}'
      ) WHERE rn = 1
    ), v1 AS (
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT v1.user_id, v1.event_id, v1.value,
           'insert' AS _change_type, 1 AS _commit_version
    FROM v1 LEFT JOIN v0 ON v1.user_id = v0.user_id
    WHERE v0.user_id IS NULL
    UNION ALL
    SELECT v1.user_id, v1.event_id, v1.value,
           'update_postimage', 1
    FROM v1 JOIN v0 ON v1.user_id = v0.user_id
    WHERE v1.event_id != v0.event_id OR v1.value != v0.value
    UNION ALL
    SELECT v0.user_id, v0.event_id, v0.value,
           'update_preimage', 1
    FROM v1 JOIN v0 ON v1.user_id = v0.user_id
    WHERE v1.event_id != v0.event_id OR v1.value != v0.value
    """,
    tags=("cdc", "table"),
)
def table_cdc_feed(spark: SparkSession, sf: str) -> DataFrame:
    """Two commits into the keyed table (events before the cutoff, then
    the rest), then the change feed between them: new users surface as
    inserts, changed latest-rows as update pre/post images (upserts
    never delete, so the delete branch stays empty — asserted in
    tests/test_streaming.py with explicit deletions)."""
    from ..streaming.sinks import ParquetUpsertTable

    e = load(spark, sf, "events").select("user_id", "event_id", "ts", "value")
    d = tempfile.mkdtemp(prefix="cdc_suite_")
    out_dir = tempfile.mkdtemp(prefix="cdc_feed_")
    try:
        table = ParquetUpsertTable(spark, d, keys=["user_id"])
        table.upsert_batch(e.filter(F.col("ts") < _CUTOFF), 0, order_col="ts")
        table.upsert_batch(e, 1, order_col="ts")
        feed = table.changes(0, 1)
        # drop ts (the oracle derives rows positionally; value+event_id
        # identify them), then persist the feed to a stable parquet hop
        # before the table dir vanishes — executor-side write, never a
        # driver collect (the feed is O(changed keys), which at scale
        # can dwarf driver memory)
        feed.select(
            "user_id", "event_id", "value", "_change_type", "_commit_version"
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)
