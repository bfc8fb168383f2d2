"""Table DML from streams — SURVEY.md §3.2
(`[core] query/output/callback/{UpdateTableCallback,
DeleteTableCallback,UpdateOrInsertTableCallback}.java`;
`table/InMemoryTable.java` + `holder/IndexedEventHolder.java`).

Siddhi tables are keyed, mutable relations mutated per event. On Spark
the table is a keyed parquet (or Delta) location; mutation streams are
applied either per micro-batch (`foreachBatch` MERGE — streaming twin
in ``..streaming.sinks``) or, in batch/analytics mode, as the *fixed
point* of replaying the whole mutation stream — the formulations here.
Fixed points are pure joins/aggregations, so they scale as ordinary
keyed shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import unique_last


def upsert_replay(
    mutations: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """`update or insert into T on T.k == e.k` replayed over the whole
    stream (`UpdateOrInsertTableCallback.java`): last writer per key
    wins. ``order`` must sort newest-first (event time desc + tiebreak
    desc)."""
    return unique_last(mutations, keys=keys, order=list(order))


def update_add_replay(
    table: DataFrame,
    mutations: DataFrame,
    key: str,
    mut_key: str,
    target_col: str,
    delta_col: str,
) -> DataFrame:
    """`update T set T.x = T.x + e.delta on T.k == e.k` replayed
    (`UpdateTableCallback.java`): addition commutes, so the fixed point
    is base + sum(deltas) per key — one broadcastable agg + join."""
    deltas = mutations.groupBy(F.col(mut_key).alias("_k")).agg(
        F.sum(delta_col).alias("_delta")
    )
    joined = table.join(F.broadcast(deltas), table[key] == F.col("_k"), "left")
    return joined.withColumn(
        target_col, F.col(target_col) + F.coalesce(F.col("_delta"), F.lit(0.0))
    ).drop("_k", "_delta")


def delete_replay(
    table: DataFrame,
    mutations: DataFrame,
    key: str,
    mut_key: str,
) -> DataFrame:
    """`delete T on T.k == e.k` replayed (`DeleteTableCallback.java`):
    any matching mutation deletes the row — left-anti join."""
    return table.join(
        F.broadcast(mutations.select(F.col(mut_key).alias(key)).distinct()),
        on=key,
        how="left_anti",
    )
