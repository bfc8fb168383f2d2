"""Suite: table DML + on-demand queries (SURVEY.md §3.2, §4.3 —
`UpdateTableCallback`/`DeleteTableCallback`/`UpdateOrInsertTableCallback`,
`OnDemandQueryParser`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register_views
from ..operators import tables as T
from ..fpround import r4
from .registry import register


@register(
    "table_upsert",
    oracle="""
    SELECT user_id, value AS last_value, ts AS last_ts, event_type AS last_type
    FROM (
      SELECT user_id, value, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("table", "upsert"),
)
def table_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """`update or insert into UserState on UserState.user_id ==
    e.user_id` replayed over the stream — final state is
    last-writer-wins per key (`UpdateOrInsertTableCallback.java`)."""
    e = load(spark, sf, "events")
    state = T.upsert_replay(
        e, keys=["user_id"], order=[F.col("ts").desc(), F.col("event_id").desc()]
    )
    return state.select(
        "user_id",
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
    )


@register(
    "table_update_add",
    oracle="""
    SELECT c.c_custkey,
           round(1e-9 + c.c_acctbal + coalesce(p.total, 0), 4) AS new_bal
    FROM customer c
    LEFT JOIN (
      SELECT user_id, sum(value) AS total
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ) p ON p.user_id = c.c_custkey
    """,
    tags=("table", "update"),
)
def table_update_add(spark: SparkSession, sf: str) -> DataFrame:
    """`update Customer set c_acctbal = c_acctbal + e.value on
    c_custkey == e.user_id` replayed over purchases
    (`UpdateTableCallback.java`) — addition commutes, fixed point =
    base + sum(deltas)."""
    c = load(spark, sf, "customer")
    purchases = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    out = T.update_add_replay(
        c, purchases, key="c_custkey", mut_key="user_id",
        target_col="c_acctbal", delta_col="value",
    )
    return out.select(
        "c_custkey", r4(F.col("c_acctbal"), 4).alias("new_bal")
    )


@register(
    "table_delete",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    """,
    tags=("table", "delete"),
)
def table_delete(spark: SparkSession, sf: str) -> DataFrame:
    """`delete Customer on c_custkey == e.user_id` for error events
    (`DeleteTableCallback.java`) — anti-join fixed point."""
    c = load(spark, sf, "customer")
    errs = load(spark, sf, "events").filter(F.col("event_type") == "error")
    return T.delete_replay(c, errs, key="c_custkey", mut_key="user_id").select(
        "c_custkey", "c_name"
    )


@register(
    "ondemand_sql",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_orders,
           round(1e-9 + sum(o.o_totalprice), 4) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY 1
    """,
    tags=("ondemand", "sql"),
)
def ondemand_sql(spark: SparkSession, sf: str) -> DataFrame:
    """On-demand (store) query — entry point C (SURVEY.md §4.3,
    `OnDemandQueryParser`): ad-hoc SQL over the engine's registered
    state tables via spark.sql — our engine's strict superset of the
    reference's pull-query surface."""
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT n.n_name AS nation, count(*) AS n_orders,
               round(1e-9 + sum(o.o_totalprice), 4) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY n.n_name
        """
    )
