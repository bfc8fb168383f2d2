"""Inbound CDC ingestion (`[ext:io-cdc] CDCSource` — SURVEY.md §3.1).

The reference's CDCSource tails a database (via Debezium embedded) and
emits one event per row change. The Spark-native decomposition keeps
the two halves separate and swappable:

- TRANSPORT: wherever the change log arrives — a kafka topic (Spark's
  kafka reader), a file directory of change-log lines (file source),
  or any frame with a `value` column. That is the existing §3.1
  connector layer; nothing CDC-specific about it.
- DECODE + APPLY (this module): `parse_debezium` turns Debezium
  envelope JSON into typed change rows (declared schema + `op` +
  `ts_ms`), and `apply_cdc` folds a change stream into the current
  table state (last-writer-wins per key, delete tombstones) — the
  same materialization a `define table` fed by a CDC source holds in
  the reference.

Both steps are pure Catalyst (`get_json_object` / window or keyed
agg), so they run identically over `spark.read` (backfill from an
archived change log) and `readStream` (tailing) — and at 100 TB the
apply step is one keyed shuffle, with the per-key `max_by` reduction
doing partial aggregation map-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import _SIDDHI_TO_SPARK

#: Debezium `op` codes → reference CDC `operation` values
_OPS = {"c": "insert", "u": "update", "d": "delete", "r": "read"}


def parse_debezium(raw: DataFrame, stream_def, envelope: bool = True) -> DataFrame:
    """Debezium change-event JSON (`value` column, string or binary) →
    typed change rows.

    Emits the declared attributes (from `after`, or `before` for
    deletes — the postimage a consumer keys on), plus:

    - ``op``: insert / update / delete / read (Debezium c/u/d/r);
    - ``ts_ms``: the change timestamp (event time for watermarking).

    ``envelope=True`` expects the full Kafka-Connect envelope
    (`{"payload": {"op": …, "before": …, "after": …, "ts_ms": …}}`);
    False expects the unwrapped payload object. JSONPath projection
    via `get_json_object` — schema drift in the source DB cannot
    poison the typed columns (unknown fields are simply never read).
    """
    val = F.col("value").cast("string")
    p = "$.payload" if envelope else "$"
    op_raw = F.get_json_object(val, f"{p}.op")
    op = F.element_at(
        F.create_map(
            *[x for kv in _OPS.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        ),
        op_raw,
    )
    cols = []
    for name, styp in stream_def.attributes:
        # deletes carry only `before`; everything else reads `after`
        cols.append(
            F.coalesce(
                F.get_json_object(val, f"{p}.after.{name}"),
                F.get_json_object(val, f"{p}.before.{name}"),
            )
            .cast(_SIDDHI_TO_SPARK[styp.lower()])
            .alias(name)
        )
    return raw.select(
        *cols,
        op.alias("op"),
        F.get_json_object(val, f"{p}.ts_ms").cast("long").alias("ts_ms"),
    )


def apply_cdc(
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str] = ("ts_ms",),
) -> DataFrame:
    """Fold a change stream into the CURRENT table state: for each key,
    the latest change wins (ordered by ``order_cols``); keys whose
    latest change is a delete are absent from the result.

    One keyed aggregation (`max_by` over the packed change struct) —
    partial-aggregated map-side, single shuffle on the table key; no
    global sort, no window over the whole log. Works identically as a
    batch fold (backfill) and under `foreachBatch` against
    `ParquetUpsertTable` (tailing).
    """
    ord_key = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(
        *[F.col(c) for c in changes.columns if c not in keys]
    )
    latest = changes.groupBy(*keys).agg(
        F.max_by(payload, ord_key).alias("_last")
    )
    out = latest.select(*keys, "_last.*")
    # `op` is CDC metadata, consumed by the tombstone filter; the
    # change timestamp and every payload column stay (callers project)
    return out.filter(F.col("op") != "delete").drop("op")
