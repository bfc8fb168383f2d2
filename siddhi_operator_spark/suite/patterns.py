"""Suite: CEP pattern/sequence matching — batch formulations
(SURVEY.md §3.10; `[core] query/input/stream/state/` —
`StreamPreStateProcessor`, `LogicalPreStateProcessor`,
`CountPreStateProcessor`, `AbsentStreamPreStateProcessor`).
The streaming NFA twin lives in ``..streaming.cep``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import patterns as P
from .registry import register


@register(
    "pattern_followed_by",
    oracle="""
    SELECT user_id, e1_id AS signup_id, e1_ts AS signup_ts,
           e2_id AS purchase_id, e2_ts AS purchase_ts
    FROM (
      SELECT a.user_id, a.event_id AS e1_id, a.ts AS e1_ts,
             b.event_id AS e2_id, b.ts AS e2_ts,
             row_number() OVER (PARTITION BY a.event_id
                                ORDER BY b.ts, b.event_id) AS rn
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'signup' AND b.event_type = 'purchase'
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    ) WHERE rn = 1
    """,
    tags=("pattern", "followed-by"),
)
def pattern_followed_by(spark: SparkSession, sf: str) -> DataFrame:
    """`from every e1=events[signup] -> e2=events[purchase] within 1h`
    per user (`StreamPreStateProcessor.java`): every signup arms a
    state machine; first completing purchase emits."""
    e = load(spark, sf, "events")
    out = P.followed_by(
        e,
        key="user_id",
        ts="ts",
        first_pred=F.col("event_type") == "signup",
        second_pred=F.col("event_type") == "purchase",
        within_seconds=3600,
    )
    return out.select(
        "user_id",
        F.col("e1_id").alias("signup_id"),
        F.col("e1_ts").alias("signup_ts"),
        F.col("e2_id").alias("purchase_id"),
        F.col("e2_ts").alias("purchase_ts"),
    )


@register(
    "pattern_absence",
    oracle="""
    SELECT a.user_id, a.event_id AS signup_id, a.ts AS signup_ts
    FROM events a
    WHERE a.event_type = 'signup'
      AND NOT EXISTS (
        SELECT 1 FROM events b
        WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
      )
    """,
    tags=("pattern", "absence"),
)
def pattern_absence(spark: SparkSession, sf: str) -> DataFrame:
    """Absence: `e1=events[signup] -> not events[purchase] for 1h`
    (`AbsentStreamPreStateProcessor.java`) — signups with no purchase
    inside the budget; time-bounded anti-join."""
    e = load(spark, sf, "events")
    out = P.absence(
        e,
        key="user_id",
        ts="ts",
        first_pred=F.col("event_type") == "signup",
        absent_pred=F.col("event_type") == "purchase",
        within_seconds=3600,
    )
    return out.select(
        "user_id",
        F.col("e1_id").alias("signup_id"),
        F.col("e1_ts").alias("signup_ts"),
    )


@register(
    "pattern_sequence_adjacent",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             lead(event_type, 1) OVER w AS e2_event_type,
             lead(event_id, 1)  OVER w AS e2_event_id,
             lead(ts, 1)        OVER w AS e2_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS e1_id, ts AS e1_ts,
           e2_event_id AS e2_id, e2_ts
    FROM ordered
    WHERE event_type = 'click' AND e2_event_type = 'error'
    """,
    tags=("sequence",),
)
def pattern_sequence_adjacent(spark: SparkSession, sf: str) -> DataFrame:
    """Contiguous sequence `from e1=events[click], e2=events[error]` —
    the *very next* event per user must match (strict contiguity,
    SURVEY.md §3.10). lead() chain, one keyed sort, no join."""
    e = load(spark, sf, "events")
    out = P.sequence_adjacent(
        e,
        key="user_id",
        ts="ts",
        order_tiebreak="event_id",
        preds=[
            ("e1", F.col("e1_event_type") == "click"),
            ("e2", F.col("e2_event_type") == "error"),
        ],
    )
    return out.select(
        "user_id",
        F.col("e1_event_id").alias("e1_id"),
        F.col("e1_ts").alias("e1_ts"),
        F.col("e2_event_id").alias("e2_id"),
        F.col("e2_ts").alias("e2_ts"),
    )


@register(
    "pattern_count_quantifier",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3,
             lead(event_id, 2)  OVER w AS id3,
             lead(ts, 2)        OVER w AS ts3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS first_id, ts AS first_ts,
           id3 AS last_id, ts3 AS last_ts
    FROM ordered
    WHERE event_type = 'click' AND t2 = 'click' AND t3 = 'click'
    """,
    tags=("sequence", "count"),
)
def pattern_count_quantifier(spark: SparkSession, sf: str) -> DataFrame:
    """Count quantifier `e=events[click]<3>` — exactly 3 contiguous
    clicks (`CountPreStateProcessor.java`); lead-chain formulation."""
    e = load(spark, sf, "events")
    out = P.sequence_adjacent(
        e,
        key="user_id",
        ts="ts",
        order_tiebreak="event_id",
        preds=[
            ("e1", F.col("e1_event_type") == "click"),
            ("e2", F.col("e2_event_type") == "click"),
            ("e3", F.col("e3_event_type") == "click"),
        ],
    )
    return out.select(
        "user_id",
        F.col("e1_event_id").alias("first_id"),
        F.col("e1_ts").alias("first_ts"),
        F.col("e3_event_id").alias("last_id"),
        F.col("e3_ts").alias("last_ts"),
    )


@register(
    "pattern_logical_and",
    oracle="""
    SELECT user_id, a_id AS error_id, a_ts AS error_ts,
           b_id AS purchase_id, b_ts AS purchase_ts
    FROM (
      SELECT a.user_id, a.event_id AS a_id, a.ts AS a_ts,
             b.event_id AS b_id, b.ts AS b_ts,
             row_number() OVER (
               PARTITION BY a.event_id
               ORDER BY abs(epoch_us(b.ts) - epoch_us(a.ts)), b.event_id) AS rn
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'error' AND b.event_type = 'purchase'
       AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 600000000
    ) WHERE rn = 1
    """,
    tags=("pattern", "logical"),
)
def pattern_logical_and(spark: SparkSession, sf: str) -> DataFrame:
    """Logical pattern `e1=events[error] and e2=events[purchase]`
    within ±10 min (`LogicalPreStateProcessor.java`): both present in
    either order; each error pairs with its nearest purchase."""
    e = load(spark, sf, "events")
    out = P.logical_and_pattern(
        e,
        key="user_id",
        ts="ts",
        pred_a=F.col("event_type") == "error",
        pred_b=F.col("event_type") == "purchase",
        within_seconds=600,
    )
    return out.select(
        "user_id",
        F.col("a_id").alias("error_id"),
        F.col("a_ts").alias("error_ts"),
        F.col("b_id").alias("purchase_id"),
        F.col("b_ts").alias("purchase_ts"),
    )


@register(
    "pattern_first_match",
    oracle="""
    SELECT user_id, e1_id, e1_ts, e2_id, e2_ts
    FROM (
      SELECT a.user_id, a.event_id AS e1_id, a.ts AS e1_ts,
             b.event_id AS e2_id, b.ts AS e2_ts,
             row_number() OVER (PARTITION BY a.user_id
                                ORDER BY a.ts, a.event_id, b.ts, b.event_id) AS rn
      FROM (SELECT user_id, event_id, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS srn
            FROM events WHERE event_type = 'signup') a
      JOIN events b
        ON a.user_id = b.user_id AND b.event_type = 'purchase'
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 DAY
      WHERE a.srn = 1
    ) WHERE rn = 1
    """,
    tags=("pattern", "non-every"),
)
def pattern_first_match(spark: SparkSession, sf: str) -> DataFrame:
    """Without `every`: only the FIRST signup per user arms the machine
    (pattern runs once — `StreamPreStateProcessor` non-every mode)."""
    e = load(spark, sf, "events")
    out = P.followed_by(
        e,
        key="user_id",
        ts="ts",
        first_pred=F.col("event_type") == "signup",
        second_pred=F.col("event_type") == "purchase",
        within_seconds=86400,
        every=False,
    )
    return out.select("user_id", "e1_id", "e1_ts", "e2_id", "e2_ts")


@register(
    "pattern_absence_logical",
    oracle="""
    SELECT e2.user_id AS k, e2.ts AS e2_ts, e2.event_id AS e2_id
    FROM events e2
    WHERE e2.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events a
        WHERE a.user_id = e2.user_id
          AND a.event_type = 'error'
          AND a.ts < e2.ts
          AND a.ts >= e2.ts - INTERVAL 1 HOUR
      )
    """,
    tags=("pattern", "absence", "cep"),
)
def pattern_absence_logical(spark: SparkSession, sf: str) -> DataFrame:
    """Logical absence `from not events[error] and e2=events[purchase]`
    (`AbsentLogicalPreStateProcessor.java`): purchases with no error
    for that user in the preceding hour — backward-looking
    time-bounded anti-join."""
    e = load(spark, sf, "events")
    return P.absence_logical(
        e,
        key="user_id",
        ts="ts",
        present_pred=F.col("event_type") == "purchase",
        absent_pred=F.col("event_type") == "error",
        within_seconds=3600,
    )


@register(
    "pattern_logical_or",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN event_type = 'error' THEN 'e1' ELSE 'e2' END AS branch
    FROM events
    WHERE event_type = 'error' OR value > 400
    """,
    tags=("pattern", "logical", "cep"),
)
def pattern_logical_or(spark: SparkSession, sf: str) -> DataFrame:
    """`from e1=events[error] or e2=events[value > 400]`
    (`LogicalPreStateProcessor.java` OR): either branch matches;
    events satisfying both take the first-declared branch."""
    e = load(spark, sf, "events")
    out = P.logical_or_pattern(
        e,
        pred_a=F.col("event_type") == "error",
        pred_b=F.col("value") > 400,
    )
    return out.select("event_id", "user_id", "ts", "branch")


@register(
    "pattern_followed_by_scan",
    oracle="""
    SELECT user_id, e1_id AS signup_id, e1_ts AS signup_ts,
           e2_id AS purchase_id, e2_ts AS purchase_ts
    FROM (
      SELECT a.user_id, a.event_id AS e1_id, a.ts AS e1_ts,
             b.event_id AS e2_id, b.ts AS e2_ts,
             row_number() OVER (PARTITION BY a.event_id
                                ORDER BY b.ts, b.event_id) AS rn
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'signup' AND b.event_type = 'purchase'
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    ) WHERE rn = 1
    """,
    tags=("pattern", "followed-by", "scan-tier"),
)
def pattern_followed_by_scan(spark: SparkSession, sf: str) -> DataFrame:
    """The r12 ``impl="scan"`` tier of :func:`pattern_followed_by` —
    the fanout-free single-shuffle nearest-probe pass
    (`operators/patterns.py::_nearest_probe_scan`), driven through the
    driver gate against the SAME relational oracle as the join tier
    (row-identity is additionally pinned by
    `tests/test_operators_batch.py::test_pattern_scan_tier_row_identical`).
    The join stays the shipped default (×1000 A/B, SCALEBENCH r12);
    this row keeps the hot-key-insurance tier oracle-proven — the
    same gap class the r11 verdict flagged for bucketed kslack."""
    e = load(spark, sf, "events")
    out = P.followed_by(
        e,
        key="user_id",
        ts="ts",
        first_pred=F.col("event_type") == "signup",
        second_pred=F.col("event_type") == "purchase",
        within_seconds=3600,
        impl="scan",
    )
    return out.select(
        "user_id",
        F.col("e1_id").alias("signup_id"),
        F.col("e1_ts").alias("signup_ts"),
        F.col("e2_id").alias("purchase_id"),
        F.col("e2_ts").alias("purchase_ts"),
    )


@register(
    "pattern_absence_scan",
    oracle="""
    SELECT a.user_id, a.event_id AS signup_id, a.ts AS signup_ts
    FROM events a
    WHERE a.event_type = 'signup'
      AND NOT EXISTS (
        SELECT 1 FROM events b
        WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
      )
    """,
    tags=("pattern", "absence", "scan-tier"),
)
def pattern_absence_scan(spark: SparkSession, sf: str) -> DataFrame:
    """The r12 ``impl="scan"`` tier of :func:`pattern_absence` —
    "no purchase within the budget" IS "the nearest later purchase is
    absent or past it" — against the join tier's relational oracle."""
    e = load(spark, sf, "events")
    out = P.absence(
        e,
        key="user_id",
        ts="ts",
        first_pred=F.col("event_type") == "signup",
        absent_pred=F.col("event_type") == "purchase",
        within_seconds=3600,
        impl="scan",
    )
    return out.select(
        "user_id",
        F.col("e1_id").alias("signup_id"),
        F.col("e1_ts").alias("signup_ts"),
    )


@register(
    "pattern_followed_by_auto",
    oracle="""
    SELECT user_id, e1_id AS signup_id, e1_ts AS signup_ts,
           e2_id AS purchase_id, e2_ts AS purchase_ts
    FROM (
      SELECT a.user_id, a.event_id AS e1_id, a.ts AS e1_ts,
             b.event_id AS e2_id, b.ts AS e2_ts,
             row_number() OVER (PARTITION BY a.event_id
                                ORDER BY b.ts, b.event_id) AS rn
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'signup' AND b.event_type = 'purchase'
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    ) WHERE rn = 1
    """,
    tags=("pattern", "followed-by", "auto-tier"),
)
def pattern_followed_by_auto(spark: SparkSession, sf: str) -> DataFrame:
    """The r13 ``impl="auto"`` tier of :func:`pattern_followed_by`:
    the join-vs-scan regime pick is DERIVED from measured key density
    (`operators/patterns.py::choose_pattern_impl` — one stats job,
    max per-key armxprobe pair production vs max(total/4, 1e6)),
    closing the r12 verdict's "one remaining hand knob". On the
    constant-density fixtures it resolves to the join tier (the
    measured-faster regime); the hot-key auto-pick is unit-pinned in
    `tests/test_operators_batch.py::test_pattern_impl_auto_derives_regime`.
    Driver-gated against the same relational oracle as both explicit
    tiers, so whichever plan the stats pick must match DuckDB."""
    e = load(spark, sf, "events")
    out = P.followed_by(
        e,
        key="user_id",
        ts="ts",
        first_pred=F.col("event_type") == "signup",
        second_pred=F.col("event_type") == "purchase",
        within_seconds=3600,
        impl="auto",
    )
    return out.select(
        "user_id",
        F.col("e1_id").alias("signup_id"),
        F.col("e1_ts").alias("signup_ts"),
        F.col("e2_id").alias("purchase_id"),
        F.col("e2_ts").alias("purchase_ts"),
    )


@register(
    "pattern_scan_null_keys",
    oracle="""
    SELECT k AS bucket_key, e1_id AS signup_id
    FROM (
      SELECT nullif(a.user_id % 10, 0) AS k, a.event_id AS e1_id
      FROM events a
      WHERE a.event_type = 'signup'
        AND NOT EXISTS (
          SELECT 1 FROM events b
          WHERE nullif(b.user_id % 10, 0) = nullif(a.user_id % 10, 0)
            AND b.event_type = 'purchase'
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        )
    )
    """,
    tags=("pattern", "absence", "scan-tier", "null-keys"),
)
def pattern_scan_null_keys(spark: SparkSession, sf: str) -> DataFrame:
    """r15 (r14 advice, medium): NULL pattern keys must behave
    identically across tiers.  SQL equality never matches NULL
    (`k = k2` is null), but `Window.partitionBy` groups all NULLs
    into one partition — so the scan tier drops NULL-key PROBE rows,
    making NULL-key arm events behave exactly as in the join tier
    (absence KEEPS them — no purchase can ever match a NULL key).
    This row derives a null-heavy key (`nullif(user_id % 10, 0)` —
    ~10 % of arms NULL) and runs the SCAN tier against the plain
    relational NOT EXISTS oracle, where NULL-no-match is native SQL
    semantics; a regression to NULL∼NULL matching shows up as
    missing arm rows."""
    e = load(spark, sf, "events").withColumn(
        "bucket_key", F.expr("nullif(user_id % 10, 0)")
    )
    out = P.absence(
        e,
        key="bucket_key",
        ts="ts",
        first_pred=F.col("event_type") == "signup",
        absent_pred=F.col("event_type") == "purchase",
        within_seconds=3600,
        impl="scan",
    )
    return out.select(
        "bucket_key",
        F.col("e1_id").alias("signup_id"),
    )
