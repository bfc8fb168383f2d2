"""Round-15 scale legs — resolving the ×1000 hold-the-line miss
(r14 verdict #1): the gate read 0.854 median over 9 reps vs the 0.85
bar, attributed to Spark-side absolutes on `window_session` (the
largest miss-carrier, historical 11–28 s band on identical plans).
r14 closed the FORMULATION question (gap-island is the fastest known
Spark shape; native session_window measured 1.52× worse on 4.1.2) —
what's left is WindowExec THROUGHPUT and partition geometry, measured
here before the round commits to recover-vs-re-specify.

Per-key geometry at ×1000: 100 M events over 1.5 M keys = ~67
rows/key, so WindowExec's per-GROUP buffers never near the 4096
in-memory threshold — the spill-threshold family is a non-lever by
arithmetic; the candidate levers are the per-pass operator overhead
(two non-codegen WindowExecs) and the AQE-coalesced partition count
(advisory 64 MB over ~2 GB of shuffle bytes → ~32 reduce tasks on 32
cores = ONE wave, so any straggler serializes the tail).

Legs (one fresh process per leg — measurement-protocol rule):

  session_profile   stage-wise attribution at ×1000: exchange+sort
                    only → +lag pass → +running-sum pass → full
                    session+agg, medians of 3, interleaved.
  session_conf_ab   full gap-island arm, baseline conf vs a candidate
                    conf set (comma-separated k=v argv), alternating
                    b,c,c,b,b,c in one process.

Usage: python tools/r15_scale.py <leg> [args]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

X1000 = "/tmp/spark_graft_scale/x1000/events.parquet"


def _spark():
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def session_profile() -> None:
    """Where do the ×1000 window_session seconds go?  Four nested
    prefixes of the gap-island plan share the same scan + ONE
    exchange + ONE sort; each adds one operator.  The deltas
    attribute the wall to sort vs WindowExec#1 (lag) vs
    WindowExec#2 (running sum) vs the final aggregate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = _spark()
    ev = spark.read.parquet(X1000).select("user_id", "ts", "value")
    ev.write.format("noop").mode("overwrite").save()  # warm page cache

    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = 30 * 60 * 1_000_000

    def sort_only():
        # row_number is the cheapest window fn — forces the same
        # exchange+sort, near-zero frame work
        return ev.withColumn("_rn", F.row_number().over(w))

    def lag_pass():
        prev = F.lag(F.col("ts")).over(w)
        return ev.withColumn(
            "_new_s",
            F.when(
                prev.isNull()
                | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > gap_us),
                1,
            ).otherwise(0),
        )

    def sid_pass():
        return lag_pass().withColumn("_sid", F.sum("_new_s").over(run))

    def full():
        from siddhi_operator_spark.operators.windows import session

        return session(
            ev, "ts", "30 minutes", keys=["user_id"],
            aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
        )

    arms = {"sort": sort_only, "lag": lag_pass, "sid": sid_pass, "full": full}
    walls: dict[str, list[float]] = {k: [] for k in arms}
    order = list(arms) + list(reversed(arms)) + list(arms)
    for name in order:
        walls[name].append(_noop(arms[name]()))
        print(f"{name}[{len(walls[name])-1}]: {walls[name][-1]:.1f}s", flush=True)
    meds = {k: statistics.median(v) for k, v in walls.items()}
    print("medians:", {k: round(v, 1) for k, v in meds.items()}, flush=True)
    print(
        f"deltas: sort={meds['sort']:.1f} "
        f"+lag={meds['lag']-meds['sort']:+.1f} "
        f"+sid={meds['sid']-meds['lag']:+.1f} "
        f"+agg={meds['full']-meds['sid']:+.1f}",
        flush=True,
    )


def session_conf_ab(confs: dict[str, str]) -> None:
    """Full gap-island session arm at ×1000, baseline vs candidate
    conf set, alternating in one fresh process (runtime-settable
    SQLConfs only)."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.operators.windows import session

    spark = _spark()
    ev = spark.read.parquet(X1000).select("user_id", "ts", "value")
    ev.write.format("noop").mode("overwrite").save()

    def arm():
        return session(
            ev, "ts", "30 minutes", keys=["user_id"],
            aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
        )

    baseline = {k: spark.conf.get(k, None) for k in confs}
    walls = {"b": [], "c": []}
    for tag in ("b", "c", "c", "b", "b", "c"):
        if tag == "c":
            for k, v in confs.items():
                spark.conf.set(k, v)
        else:
            for k, v in baseline.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        walls[tag].append(_noop(arm()))
        print(f"{tag}[{len(walls[tag])-1}]: {walls[tag][-1]:.1f}s", flush=True)
    mb, mc = statistics.median(walls["b"]), statistics.median(walls["c"])
    print(
        f"medians: baseline={mb:.1f}s conf={mc:.1f}s conf/base={mc/mb:.3f} "
        f"({confs})",
        flush=True,
    )


def session_prefix_ab(path: str = X1000, reps: int = 3) -> None:
    """Gap-island (hash-agg) vs prefix-sum session tier at ×1000 —
    the r15 candidate recovery for the gate miss: the profile leg
    attributed +8.7 s of the 24 s wall to the redundant
    partial+final HashAggregate; the prefix tier deletes it.
    Alternating a,p,p,a,a,p in one fresh process + a row-count and
    sample-equality cross-check.  ``path`` overrides the fixture
    (the ×10000 leg passes the 1 B-event dir); ``reps`` trims the
    alternation for the decade leg."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.operators.windows import session

    spark = _spark()
    ev = spark.read.parquet(path).select("user_id", "ts", "value")
    ev.write.format("noop").mode("overwrite").save()

    def agg_arm():
        return session(
            ev, "ts", "30 minutes", keys=["user_id"],
            aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
        )

    def prefix_arm():
        return session(
            ev, "ts", "30 minutes", keys=["user_id"],
            aggs=[("count", None, "n"), ("sum", "value", "sv")],
        )

    if reps >= 3:
        ca, cp = agg_arm().count(), prefix_arm().count()
        print(f"counts: agg={ca} prefix={cp} equal={ca == cp}", flush=True)
    # value-level spot check on a deterministic key slice — sums
    # compared at 6 dp: difference-of-prefix-sums deviates from the
    # direct sum in the last float bits (measured max 4.4e-13 on this
    # slice), absorbed by the suite's 1e-9-epsilon 4 dp rounding
    def slc(df):
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n,
             round(r.sv, 6))
            for r in df.filter("user_id % 100000 = 7").collect()
        )

    if reps >= 3:
        sa, sp = slc(agg_arm()), slc(prefix_arm())
        print(f"slice rows: {len(sa)} identical@6dp={sa == sp}", flush=True)
    walls = {"a": [], "p": []}
    plan = ("a", "p", "p", "a", "a", "p")[: 2 * reps]
    for tag in plan:
        walls[tag].append(_noop(agg_arm() if tag == "a" else prefix_arm()))
        print(f"{tag}[{len(walls[tag])-1}]: {walls[tag][-1]:.1f}s", flush=True)
    ma, mp = statistics.median(walls["a"]), statistics.median(walls["p"])
    print(
        f"medians: agg={ma:.1f}s prefix={mp:.1f}s prefix/agg={mp/ma:.3f}",
        flush=True,
    )


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    leg = sys.argv[1]
    if leg == "session_profile":
        session_profile()
        return
    if leg == "session_conf_ab":
        kvs = dict(kv.split("=", 1) for kv in sys.argv[2].split(","))
        session_conf_ab(kvs)
        return
    if leg == "session_prefix_ab":
        path = sys.argv[2] if len(sys.argv) > 2 else X1000
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        session_prefix_ab(path, reps)
        return
    raise SystemExit(f"unknown leg {leg!r}")


if __name__ == "__main__":
    main()
