"""Suite: filter / projection / scalar-function layer (SURVEY.md §3.2,
§3.9). Reference parity: `FilterProcessor.java`, `QuerySelector.java`,
`executor/math/*`, `executor/condition/*`, `executor/function/*`, and
the str:/math:/time:/json:/regex: extension namespaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..fpround import r4
from .registry import register


@register(
    "filter_project",
    oracle="""
    SELECT event_id, value
    FROM events
    WHERE value > 100
    """,
    tags=("filter", "projection"),
)
def filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """`from events[value > 100] select event_id, value` —
    `FilterProcessor.java`. Predicate + projection push down to the
    parquet scan (verify: PushedFilters in .explain)."""
    return load(spark, sf, "events").filter(F.col("value") > 100).select("event_id", "value")


@register(
    "filter_compound",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (event_type IN ('click','purchase') AND value >= 50 AND value < 500
           AND NOT (user_id % 7 = 0)) OR props IS NULL
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf: str) -> DataFrame:
    """Compound and/or/not + is-null + in-list —
    `{And,Or,Not}ConditionExpressionExecutor.java`,
    `IsNullConditionExpressionExecutor.java`."""
    e = load(spark, sf, "events")
    return e.filter(
        (
            F.col("event_type").isin("click", "purchase")
            & (F.col("value") >= 50)
            & (F.col("value") < 500)
            & ~(F.col("user_id") % 7 == 0)
        )
        | F.col("props").isNull()
    ).select("event_id", "user_id", "event_type", "value")


@register(
    "scalar_str",
    oracle="""
    SELECT doc_id,
           upper(lang)                    AS lang_u,
           length(text)                   AS txt_len,
           substring(text, 1, 12)         AS prefix,
           concat(source, '#', lang)      AS tagged,
           reverse(lang)                  AS lang_rev,
           contains(text, 'the')          AS has_the
    FROM documents
    """,
    tags=("functions", "str"),
)
def scalar_str(spark: SparkSession, sf: str) -> DataFrame:
    """str: namespace — upper/length/substr/concat/reverse/contains
    (`[ext:string]`)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.length("text").alias("txt_len"),
        F.substring("text", 1, 12).alias("prefix"),
        F.concat("source", F.lit("#"), "lang").alias("tagged"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        F.col("text").contains("the").alias("has_the"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(1e-9 + abs(l_extendedprice * (1 - l_discount)), 4) AS net,
           round(1e-9 + sqrt(l_quantity), 4)                        AS q_sqrt,
           CAST(ceil(l_quantity) AS BIGINT)                  AS q_ceil,
           CAST(floor(l_tax * 100) AS BIGINT)                AS tax_pct,
           round(1e-9 + ln(l_extendedprice + 1), 4)                 AS price_ln,
           round(1e-9 + pow(l_discount, 2), 4)                      AS disc_sq
    FROM lineitem
    """,
    tags=("functions", "math"),
)
def scalar_math(spark: SparkSession, sf: str) -> DataFrame:
    """math: namespace — abs/sqrt/ceil/floor/ln/power (`[ext:math]`)."""
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.abs(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("net"),
        r4(F.sqrt("l_quantity"), 4).alias("q_sqrt"),
        F.ceil("l_quantity").alias("q_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct"),
        r4(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        r4(F.pow("l_discount", F.lit(2)), 4).alias("disc_sq"),
    )


@register(
    "scalar_time",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')        AS od_str,
           year(o_orderdate)                         AS od_year,
           month(o_orderdate)                        AS od_month,
           dayofweek(o_orderdate) + 1                AS od_dow,
           o_orderdate + INTERVAL 30 DAY             AS due_ts,
           datediff('day', o_orderdate,
                    TIMESTAMP '2024-06-01 00:00:00') AS days_to_jun
    FROM orders
    """,
    tags=("functions", "time"),
)
def scalar_time(spark: SparkSession, sf: str) -> DataFrame:
    """time: namespace — dateFormat/extract/dateAdd/dateDiff
    (`[ext:time]`). Spark dayofweek is 1=Sunday; DuckDB is 0=Sunday —
    oracle compensates."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od_str"),
        F.year("o_orderdate").alias("od_year"),
        F.month("o_orderdate").alias("od_month"),
        F.dayofweek("o_orderdate").alias("od_dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.datediff(F.lit("2024-06-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_jun"
        ),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER) AS k_int,
           (props->>'$.k') IS NOT NULL    AS k_exists
    FROM events
    """,
    tags=("functions", "json"),
)
def scalar_json(spark: SparkSession, sf: str) -> DataFrame:
    """json: namespace — getInt/isExists over the `props` JSON column
    (`[ext:execution-json] JsonSourceMapper`-style access)."""
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.k").isNotNull().alias("k_exists"),
    )


@register(
    "conditional_fns",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000 THEN 'high'
                WHEN c_acctbal > 0    THEN 'mid'
                ELSE 'low' END                       AS tier,
           coalesce(c_mktsegment, 'UNKNOWN')          AS seg,
           greatest(c_acctbal, 0.0)                   AS bal_pos,
           least(CAST(c_nationkey AS BIGINT), c_custkey) AS small_key
    FROM customer
    """,
    tags=("functions", "core"),
)
def conditional_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Core executors: ifThenElse / coalesce / maximum / minimum
    (`IfThenElseFunctionExecutor.java`, `CoalesceFunctionExecutor.java`,
    `MaximumFunctionExecutor.java`)."""
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "high")
        .when(F.col("c_acctbal") > 0, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("seg"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_pos"),
        F.least(F.col("c_nationkey").cast("long"), F.col("c_custkey")).alias("small_key"),
    )


@register(
    "cast_convert",
    oracle="""
    SELECT event_id,
           CAST(trunc(value) AS BIGINT)          AS value_long,
           CAST(user_id AS VARCHAR)              AS uid_str,
           CAST(CAST(trunc(value) AS INTEGER) AS DOUBLE) AS value_roundtrip
    FROM events
    """,
    tags=("functions", "core"),
)
def cast_convert(spark: SparkSession, sf: str) -> DataFrame:
    """cast/convert (`CastFunctionExecutor.java`,
    `ConvertFunctionExecutor.java`). Spark double→integral casts
    truncate toward zero while DuckDB CAST rounds — the oracle applies
    trunc() first so both sides express the same (Siddhi/Java) cast."""
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.col("value").cast("long").alias("value_long"),
        F.col("user_id").cast("string").alias("uid_str"),
        F.col("value").cast("int").cast("double").alias("value_roundtrip"),
    )


@register(
    "regex_fns",
    oracle="""
    SELECT doc_id,
           regexp_matches(text, 'data')                    AS has_data,
           regexp_extract(text, '([a-z]+)ing', 1)          AS ing_stem,
           regexp_replace(substring(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled
    FROM documents
    """,
    tags=("functions", "regex"),
)
def regex_fns(spark: SparkSession, sf: str) -> DataFrame:
    """regex: namespace — find/group/replaceAll (`[ext:regex]`)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.col("text").rlike("data").alias("has_data"),
        F.regexp_extract("text", "([a-z]+)ing", 1).alias("ing_stem"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "union_streams",
    oracle="""
    SELECT event_id, user_id, 'big_click' AS tag FROM events
    WHERE event_type = 'click' AND value > 200
    UNION ALL
    SELECT event_id, user_id, 'any_error' AS tag FROM events
    WHERE event_type = 'error'
    """,
    tags=("routing",),
)
def union_streams(spark: SparkSession, sf: str) -> DataFrame:
    """Stream routing: two queries `insert into` one shared stream
    (`InsertIntoStreamCallback.java`) ≡ unionByName of producers."""
    e = load(spark, sf, "events")
    a = (
        e.filter((F.col("event_type") == "click") & (F.col("value") > 200))
        .select("event_id", "user_id")
        .withColumn("tag", F.lit("big_click"))
    )
    b = (
        e.filter(F.col("event_type") == "error")
        .select("event_id", "user_id")
        .withColumn("tag", F.lit("any_error"))
    )
    return a.unionByName(b)


@register(
    "setops_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("setops",),
)
def setops_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Set ops (absent as syntax in the reference — SURVEY.md §3.8 —
    exposed as a Spark-native extension): clickers ∩ purchasers."""
    e = load(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "scalar_pol2cart",
    oracle="""
    SELECT event_id,
           round(1e-9 + value * cos(CAST(user_id AS DOUBLE) / 10.0), 4) AS x,
           round(1e-9 + value * sin(CAST(user_id AS DOUBLE) / 10.0), 4) AS y
    FROM events
    """,
    tags=("scalar", "math"),
)
def scalar_pol2cart(spark: SparkSession, sf: str) -> DataFrame:
    """`pol2Cart(theta, rho)` stream function
    (`[core] query/processor/stream/function/Pol2CartStreamProcessor.java`):
    polar → cartesian, pure Catalyst trig."""
    e = load(spark, sf, "events")
    theta = F.col("user_id").cast("double") / 10.0
    rho = F.col("value")
    return e.select(
        "event_id",
        r4(rho * F.cos(theta), 4).alias("x"),
        r4(rho * F.sin(theta), 4).alias("y"),
    )


@register(
    "partition_range_agg",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 200 THEN 'mid'
                ELSE 'high' END AS bucket,
           event_type,
           count(*)                      AS cnt,
           round(1e-9 + sum(value), 4)   AS sum_v
    FROM events
    GROUP BY 1, 2
    """,
    tags=("partition",),
)
def partition_range_agg(spark: SparkSession, sf: str) -> DataFrame:
    """`partition with (value < 50 as 'low' or value < 200 as 'mid'
    … of events)` (`RangePartitionExecutor.java`): range partitions are
    a CASE WHEN bucket column used as the shuffle key — per-partition
    query groups become one keyed aggregation."""
    from ..operators.partitions import range_partition

    e = load(spark, sf, "events")
    bucket = range_partition(
        F.col("value"), [(50.0, "low"), (200.0, "mid")], "high"
    )
    return (
        e.withColumn("bucket", bucket)
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r4(F.sum("value"), 4).alias("sum_v"),
        )
    )


@register(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, t.token, t.pos
    FROM (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS token,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      FROM documents
      WHERE doc_id < 50
    ) t
    WHERE length(t.token) > 0
    """,
    tags=("functions", "udtf", "string"),
)
def udtf_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """`str:tokenize` — the canonical 1→N stream function
    (`StreamFunctionProcessor`, SURVEY.md §3.11: UDTF surface): one row
    per token with its position. `posexplode` is the Spark-native
    schema-adding row expander; stays in codegen, no Python."""
    d = load(spark, sf, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"\s+")).alias("pos0", "token"),
        )
        .filter(F.length("token") > 0)
        .select("doc_id", "token", (F.col("pos0") + 1).alias("pos"))
    )


@register(
    "json_struct_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER)                  AS k_val,
           '{"k":' || (props->>'$.k') || ',"t":"' || event_type || '"}'
             AS packed
    FROM events
    """,
    tags=("functions", "json"),
)
def json_struct_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """`json:toObject` + `json:setElement` + `json:toString`
    (`[ext:execution-json]`): parse the JSON payload into a typed
    struct (from_json — schema-on-read at the edge, per §2.2's mapper
    contract), enrich it, serialize back (to_json)."""
    e = load(spark, sf, "events")
    parsed = F.from_json("props", "k INT")
    packed = F.to_json(
        F.struct(parsed["k"].alias("k"), F.col("event_type").alias("t"))
    )
    return e.select(
        "event_id",
        parsed["k"].alias("k_val"),
        packed.alias("packed"),
    )


@register(
    "scalar_str_extra",
    oracle="""
    SELECT doc_id,
           substr(source, 2, 1)                          AS char_at_2,
           CASE WHEN source < lang THEN -1
                WHEN source = lang THEN 0 ELSE 1 END     AS cmp,
           hex(encode(substr(source, 1, 2)))             AS hex2,
           reverse(source)                               AS rev,
           printf('%s/%s#%d', source, lang, doc_id)      AS templ
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("functions", "string"),
)
def scalar_str_extra(spark: SparkSession, sf: str) -> DataFrame:
    """str: extras — charAt/strcmp/hex/reverse/fillTemplate
    (`[ext:string]`): all JVM-side Catalyst builtins."""
    d = load(spark, sf, "documents").filter(F.col("doc_id") < 200)
    cmp = (
        F.when(F.col("source") < F.col("lang"), -1)
        .when(F.col("source") == F.col("lang"), 0)
        .otherwise(1)
    )
    return d.select(
        "doc_id",
        F.substring("source", 2, 1).alias("char_at_2"),
        cmp.alias("cmp"),
        F.hex(F.substring("source", 1, 2)).alias("hex2"),
        F.reverse("source").alias("rev"),
        F.format_string("%s/%s#%d", "source", "lang", "doc_id").alias("templ"),
    )


@register(
    "scalar_udf_registered",
    oracle="""
    SELECT doc_id,
           regexp_replace(lower(source), '[^a-z0-9]+', '-', 'g') AS slug,
           upper(lang) AS lang_uc
    FROM documents
    """,
    tags=("scalar", "udf", "spi"),
)
def scalar_udf_registered(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar UDF SPI end-to-end (§3.11 — the reference's
    `FunctionExecutor` extension point): a user-registered scalar
    (`custom:slug`, expression tier) runs inside an ordinary
    projection and hash-matches the relational oracle. The expression
    tier means the "UDF" compiles to pure Catalyst — zero Python rows
    at runtime, same plan as a built-in."""
    from ..functions import udf

    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        udf("custom:slug")(F.col("source")).alias("slug"),
        F.upper("lang").alias("lang_uc"),
    )
