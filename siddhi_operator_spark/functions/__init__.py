"""Scalar function namespaces — SURVEY.md §3.9.

Maps the reference's function surface (core executors in
`[core] executor/function/` plus the `str:`/`math:`/`time:`/`json:`/
`map:`/`list:`/`regex:` extension namespaces) onto native Catalyst
expressions. Everything here is a thin Column-builder — JVM-side,
codegen-friendly, no Python UDFs — so using a "Siddhi function" costs
exactly what the underlying Spark builtin costs.

Registry keys use the reference's `namespace:name` convention
(core functions have no namespace).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- core
# `[core] executor/function/*FunctionExecutor.java`

def if_then_else(cond: Column, a: Column, b: Column) -> Column:
    return F.when(cond, a).otherwise(b)


def default(x: Column, d) -> Column:
    return F.coalesce(x, F.lit(d))


CORE: dict[str, Callable[..., Column]] = {
    "cast": lambda x, t: x.cast(t),
    "convert": lambda x, t: x.cast(t),  # lenient convert ≡ try-cast semantics
    "coalesce": F.coalesce,
    "ifThenElse": if_then_else,
    "maximum": F.greatest,
    "minimum": F.least,
    "UUID": lambda: F.expr("uuid()"),
    "currentTimeMillis": lambda: F.unix_millis(F.current_timestamp()),
    "eventTimestamp": lambda ts_col="ts": F.unix_millis(F.col(ts_col)),
    "default": default,
    "createSet": F.collect_set,
    "sizeOfSet": F.size,
    # instanceOf*: runtime type checks (`InstanceOf*FunctionExecutor`).
    # Mostly moot in a statically-typed engine (SURVEY §3.9) but kept
    # for parity — `typeof` resolves at plan time, so the comparison
    # constant-folds to a literal boolean.
    "instanceOfString": lambda x: F.typeof(x) == "string",
    "instanceOfInteger": lambda x: F.typeof(x) == "int",
    "instanceOfLong": lambda x: F.typeof(x) == "bigint",
    "instanceOfFloat": lambda x: F.typeof(x) == "float",
    "instanceOfDouble": lambda x: F.typeof(x) == "double",
    "instanceOfBoolean": lambda x: F.typeof(x) == "boolean",
}

# ---------------------------------------------------------------- str:
# `[ext:string]` io.siddhi.extension.execution.string.*
STR: dict[str, Callable[..., Column]] = {
    "str:concat": F.concat,
    "str:length": F.length,
    "str:lower": F.lower,
    "str:upper": F.upper,
    "str:trim": F.trim,
    "str:strcmp": lambda a, b: F.when(a < b, -1).when(a > b, 1).otherwise(0),
    "str:contains": lambda s, sub: s.contains(sub),
    "str:startsWith": lambda s, p: s.startswith(p),
    "str:substr": lambda s, pos, ln: F.substring(s, pos, ln),
    "str:split": F.split,
    "str:coalesce": F.coalesce,
    "str:replaceAll": F.regexp_replace,
    "str:regexp": lambda s, pat: s.rlike(pat),
    "str:charAt": lambda s, i: F.substring(s, i + 1, 1),
    "str:hex": F.hex,
    "str:unhex": F.unhex,
    "str:reverse": F.reverse,
    "str:fillTemplate": F.format_string,
    "str:groupConcat": lambda c, sep=",": F.array_join(
        F.sort_array(F.collect_list(c)), sep
    ),
    # replaceFirst: anchor at ^ with a lazy prefix group — the whole regex
    # can then match at most once, so regexp_replace replaces only the
    # first occurrence of `pat`.
    "str:replaceFirst": lambda s, pat, rep: F.regexp_replace(
        s, f"(?s)^(.*?)(?:{pat})", rf"$1{rep}"
    ),
}

# --------------------------------------------------------------- math:
# `[ext:math]` — 1:1 with pyspark.sql.functions
MATH: dict[str, Callable[..., Column]] = {
    "math:abs": F.abs,
    "math:ceil": F.ceil,
    "math:floor": F.floor,
    "math:round": F.round,
    "math:sqrt": F.sqrt,
    "math:cbrt": F.cbrt,
    "math:power": F.pow,
    "math:exp": F.exp,
    "math:ln": F.log,
    "math:log": lambda base, x: F.log(base, x),
    "math:log2": F.log2,
    "math:log10": F.log10,
    "math:sin": F.sin,
    "math:cos": F.cos,
    "math:tan": F.tan,
    "math:asin": F.asin,
    "math:acos": F.acos,
    "math:atan": F.atan,
    "math:sinh": F.sinh,
    "math:cosh": F.cosh,
    "math:tanh": F.tanh,
    "math:toDegrees": F.degrees,
    "math:toRadians": F.radians,
    "math:rand": F.rand,
    "math:e": lambda: F.lit(2.718281828459045),
    "math:pi": lambda: F.lit(3.141592653589793),
    "math:signum": F.signum,
    "math:conv": F.conv,
    "math:bin": F.bin,
    "math:oct": lambda x: F.conv(x.cast("string"), 10, 8),
    "math:hex": F.hex,
    "math:parseInt": lambda s: s.cast("int"),
    "math:parseLong": lambda s: s.cast("long"),
    "math:parseFloat": lambda s: s.cast("float"),
    "math:parseDouble": lambda s: s.cast("double"),
    "math:getExponent": lambda x: F.floor(F.log2(F.abs(x))),
    "math:copySign": lambda m, s: F.abs(m) * F.signum(s),
}

# --------------------------------------------------------------- time:
# `[ext:time]` — epoch-millis-centric in the reference; TimestampType here
TIME: dict[str, Callable[..., Column]] = {
    "time:currentDate": F.current_date,
    # reference returns the wall-clock time as "HH:mm:ss"
    "time:currentTime": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
    "time:currentTimestamp": F.current_timestamp,
    "time:utcTimestamp": F.current_timestamp,  # session TZ pinned to UTC
    "time:date": F.to_date,
    "time:dateAdd": lambda ts, n, unit: ts + F.expr(f"INTERVAL {n} {unit}"),
    "time:dateSub": lambda ts, n, unit: ts - F.expr(f"INTERVAL {n} {unit}"),
    "time:dateDiff": F.datediff,
    "time:dateFormat": F.date_format,
    "time:dayOfWeek": F.dayofweek,
    "time:extract": lambda unit, ts: F.expr(f"extract({unit} FROM {ts})"),
    "time:timestampInMilliseconds": F.unix_millis,
}

# --------------------------------------------------------------- json:
# `[ext:execution-json]`
JSON: dict[str, Callable[..., Column]] = {
    "json:getString": F.get_json_object,
    "json:getInt": lambda j, p: F.get_json_object(j, p).cast("int"),
    "json:getLong": lambda j, p: F.get_json_object(j, p).cast("long"),
    "json:getDouble": lambda j, p: F.get_json_object(j, p).cast("double"),
    "json:getBool": lambda j, p: F.get_json_object(j, p).cast("boolean"),
    "json:isExists": lambda j, p: F.get_json_object(j, p).isNotNull(),
    "json:toObject": F.from_json,
    "json:toString": F.to_json,
    # getObject returns the raw JSON text of the sub-tree (the reference
    # returns an opaque OBJECT; downstream fns re-parse it)
    "json:getObject": F.get_json_object,
    # setElement/group: reference mutates a JSON tree
    # (`[ext:execution-json] SetElementJSONFunctionExtension`). Catalyst
    # has no JSON-pointer writer, so setElement supports top-level keys
    # ('$.key') via a parse->map_concat->re-serialize round trip, which
    # is the dominant real-world use; deeper paths need json:toObject +
    # struct surgery.
    "json:setElement": lambda j, key, v: F.to_json(
        F.map_concat(
            F.map_filter(
                F.from_json(j, "map<string,string>"), lambda k, _: k != key
            ),
            F.create_map(key, v.cast("string")),
        )
    ),
    # group (aggregation): concatenate JSON values into one JSON array
    "json:group": lambda j: F.concat(
        F.lit("["), F.array_join(F.collect_list(j), ","), F.lit("]")
    ),
}

# --------------------------------------------------- map: / list: / regex:
MAP: dict[str, Callable[..., Column]] = {
    "map:create": F.create_map,
    # put/putAll OVERWRITE existing keys (reference java.util.Map
    # semantics); map_concat alone throws on duplicates under Spark's
    # default EXCEPTION dedup policy, so drop the incoming keys first.
    "map:put": lambda m, k, v: F.map_concat(
        F.map_filter(m, lambda mk, mv: mk != k), F.create_map(k, v)
    ),
    "map:get": F.element_at,
    "map:containsKey": lambda m, k: F.array_contains(F.map_keys(m), k),
    "map:keys": F.map_keys,
    "map:values": F.map_values,
    "map:size": F.size,
    "map:combine": F.map_concat,
    "map:toJSON": F.to_json,
    "map:putAll": lambda m, other: F.map_concat(
        F.map_filter(m, lambda k, v: ~F.array_contains(F.map_keys(other), k)),
        other,
    ),
    "map:remove": lambda m, key: F.map_filter(m, lambda k, v: k != key),
    "map:containsValue": lambda m, v: F.array_contains(F.map_values(m), v),
    "map:clone": lambda m: m,  # Columns are immutable values — clone is identity
    # collect (aggregation): rows of (k, v) -> one map
    "map:collect": lambda k, v: F.map_from_entries(
        F.collect_list(F.struct(k, v))
    ),
}
LIST: dict[str, Callable[..., Column]] = {
    "list:create": F.array,
    "list:add": F.array_append,
    "list:get": F.element_at,
    "list:remove": F.array_remove,
    "list:size": F.size,
    "list:contains": F.array_contains,
    "list:indexOf": F.array_position,
    "list:sort": F.array_sort,
    "list:distinct": F.array_distinct,
    "list:addAll": F.concat,
    "list:collect": F.collect_list,
}
REGEX: dict[str, Callable[..., Column]] = {
    "regex:find": lambda s, pat: s.rlike(pat),
    "regex:matches": lambda s, pat: s.rlike(f"^(?:{pat})$"),
    "regex:group": lambda s, pat, i: F.regexp_extract(s, pat, i),
    "regex:lookingAt": lambda s, pat: s.rlike(f"^(?:{pat})"),
}

REGISTRY: dict[str, Callable[..., Column]] = {
    **CORE,
    **STR,
    **MATH,
    **TIME,
    **JSON,
    **MAP,
    **LIST,
    **REGEX,
}


def fn(name: str) -> Callable[..., Column]:
    """Look up a reference function by `namespace:name`."""
    return REGISTRY[name]


# ---------------------------------------------------------------- UDAF
# `[core] query/selector/attribute/aggregator/AttributeAggregatorExecutor
# .java` — the user-defined aggregator SPI. The reference's contract is
# an accumulator object with processAdd/processRemove/getResult; the
# Spark-native equivalent is a pandas GROUPED_AGG UDF: the engine hands
# the whole group to the function as an Arrow-backed pandas Series (or
# several, for multi-arg aggregators) and the return scalar becomes the
# aggregate value. Catalyst still does the shuffle/partial-agg planning;
# only the final reduce runs in Python, Arrow-batched per group.
#
# Registered UDAFs are usable exactly like built-in aggregators:
#   udaf("custom:geomean")(F.col("value"))  inside  df.groupBy(...).agg(...)

# name → (python reducer, return type). The pandas_udf wrap is LAZY —
# pyspark materializes the UDF against the active SparkSession, so
# wrapping at import time would demand a session before one exists.
UDAF_REGISTRY: dict[str, tuple[Callable, str]] = {}


def register_udaf(name: str, return_type: str = "double"):
    """Register a user-defined aggregator under `namespace:name`.

    The decorated function takes one or more ``pandas.Series``
    (one per aggregated argument, each holding a full group) and
    returns a scalar of ``return_type``. Example — the worked
    geometric-mean aggregator the reference would write as an
    `AttributeAggregatorExecutor` subclass::

        @register_udaf("custom:geomean")
        def geomean(v: pd.Series) -> float:
            import numpy as np
            return float(np.exp(np.log(v[v > 0]).mean()))

    Scale note: GROUPED_AGG UDFs skip map-side partial aggregation
    (the whole group must reach one task), so a skewed group key is
    the caller's to salt; for algebraic aggregates prefer composing
    Catalyst builtins (see `operators/incremental.py` for the
    sum/count decomposition pattern).

    Spark constraint: one `agg()` can hold EITHER pandas aggregators
    OR JVM builtins, not both ([INVALID_PANDAS_UDF_PLACEMENT]) —
    compute them in separate aggs over the same keys and join.
    """

    def deco(f):
        UDAF_REGISTRY[name] = (f, return_type)
        return f

    return deco


def udaf(name: str) -> Callable[..., Column]:
    """Look up a registered user-defined aggregator by name. The
    pandas GROUPED_AGG wrap happens PER CALL, never cached at module
    level: a wrapped UserDefinedFunction pins its JVM handle to the
    SparkSession it first runs under, so a cached wrapper would break
    after a session restart (same reason `udf` below doesn't cache)."""
    from pyspark.sql.functions import pandas_udf

    f, rtype = UDAF_REGISTRY[name]
    return pandas_udf(f, rtype)


def _geomean(v: "pd.Series") -> float:
    """Geometric mean — the canonical UDAF the built-in set lacks.
    exp(mean(ln(x))) over the positive values of the group."""
    import numpy as np

    pos = v[v > 0]
    return float(np.exp(np.log(pos).mean())) if len(pos) else float("nan")


def _wavg(v: "pd.Series", w: "pd.Series") -> float:
    """Weighted average — multi-argument UDAF shape (value, weight)."""
    den = float(w.sum())
    return float((v * w).sum() / den) if den else float("nan")


import pandas as pd  # noqa: E402  (type hints drive pandas_udf inference)

register_udaf("custom:geomean")(_geomean)
register_udaf("custom:wavg")(_wavg)


# --------------------------------------------------------------------
# Scalar UDF SPI — the reference's `FunctionExecutor` extension point
# (`@Extension` scalar functions, SURVEY.md §3.11). Two tiers:
#   - EXPRESSION tier (preferred): the "UDF" is a Column-builder
#     closure — pure Catalyst, codegen'd, zero Python at runtime.
#     Everything in this module's namespaces is this tier.
#   - PANDAS tier: Arrow-batched `pandas_udf` for logic Catalyst
#     cannot express. Registered lazily like the UDAF SPI.
# --------------------------------------------------------------------

UDF_REGISTRY: dict[str, tuple[Callable, str, bool]] = {}


def register_udf(name: str, return_type: str = "string", pandas: bool = False):
    """Register a user-defined scalar under `namespace:name`.

    ``pandas=False`` (default): ``f`` takes Column(s) and returns a
    Column — the expression tier, fully codegen'd. ``pandas=True``:
    ``f`` takes ``pandas.Series`` and returns a Series of
    ``return_type`` — the Arrow tier, for semantics Catalyst lacks.
    """

    def deco(f):
        UDF_REGISTRY[name] = (f, return_type, pandas)
        return f

    return deco


def udf(name: str) -> Callable[..., Column]:
    """Look up a registered scalar by name. Expression-tier functions
    return as-is (pure Column builders, session-free); pandas-tier
    functions wrap PER CALL — a cached UserDefinedFunction would pin a
    dead JVM handle across a session restart (see `udaf`)."""
    f, rtype, is_pandas = UDF_REGISTRY[name]
    if is_pandas:
        from pyspark.sql.functions import pandas_udf

        return pandas_udf(f, rtype)
    return f


@register_udf("custom:slug")
def _slug(c: Column) -> Column:
    """Canonical expression-tier scalar: lowercase, non-alnum runs →
    '-' (the URL-slug normalizer) — registered like a reference
    `FunctionExecutor`, compiled to pure Catalyst."""
    return F.regexp_replace(F.lower(c), "[^a-z0-9]+", "-")
