"""Suite: map:/list: collection namespaces (SURVEY.md §3.9 —
`[ext:map]`, `[ext:list]`). The reference smuggles collections through
OBJECT-typed attributes; here they are first-class ArrayType/MapType
columns with native Catalyst functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import register


@register(
    "list_fns",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks)                                   AS n,
           list_contains(toks, 'data')                 AS has_data,
           array_to_string(list_sort(list_distinct(toks[1:5])), ',') AS head_sorted,
           toks[1]                                     AS first_tok,
           toks[-1]                                    AS last_tok
    FROM t
    """,
    tags=("functions", "list"),
)
def list_fns(spark: SparkSession, sf: str) -> DataFrame:
    """list:create/size/contains/sort/distinct/get
    (`[ext:list]` — `io.siddhi.extension.execution.list.*`)."""
    d = load(spark, sf, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.array_sort(F.array_distinct(F.slice(toks, 1, 5))), ",").alias(
            "head_sorted"
        ),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
    )


@register(
    "map_fns",
    oracle="""
    SELECT event_id,
           2                                        AS m_size,
           CAST(user_id AS VARCHAR)                 AS m_user,
           event_type                               AS m_type,
           TRUE                                     AS has_user_key
    FROM events
    """,
    tags=("functions", "map"),
)
def map_fns(spark: SparkSession, sf: str) -> DataFrame:
    """map:create/put/get/size/containsKey (`[ext:map]`): build a map
    column from event attributes and read it back — the oracle checks
    the round-trip results (DuckDB's MAP type differs; the *values*
    must agree)."""
    e = load(spark, sf, "events")
    m = F.create_map(
        F.lit("user"), F.col("user_id").cast("string"),
        F.lit("type"), F.col("event_type"),
    )
    return e.select(
        "event_id",
        F.size(m).alias("m_size"),
        F.element_at(m, "user").alias("m_user"),
        F.element_at(m, "type").alias("m_type"),
        F.array_contains(F.map_keys(m), "user").alias("has_user_key"),
    )
