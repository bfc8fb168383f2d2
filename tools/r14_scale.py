"""Round-14 scale checks — the STREAMING twin's hot-key behavior
(r13 verdict #3): what does a pathologically dense key do to a
watermarked stream-stream join's state probes, and does the r14
`bucket=True` tier (epoch-widened join keys,
`streaming.joins.stream_stream_join`) fix it the way the batch tier
does?

Why a dense key degrades the STREAMING join too: Spark's
StreamingSymmetricHashJoinExec keys both state stores by the join's
equi keys; each arriving row probes EVERY state row under its key and
post-filters the time-range condition.  Watermark eviction bounds the
per-key state to (watermark delay + range span) × key density — but
within one micro-batch the whole batch's rows coexist, so a replay /
backfill burst (few large batches, exactly the availableNow shape)
degrades to |L_k| × |R_k| pair enumeration per key per batch: the
batch blowup.  The epoch keys split the hot key's state list into
`within`-wide epochs, bounding the enumeration to adjacent epochs —
the same insurance, now in the streaming plan.

Legs (one fresh process per leg — measurement protocol; the A/B
alternates arms INSIDE the process like r13's jws_ab):

  ss_hotkey_eq [hot_total=8000]
      plain == bucket row-set equality (count + order-independent
      checksum via foreachBatch) on a TRUNCATED hot key, multi-batch
      replay (maxFilesPerTrigger=2 over 20 ts-ordered chunk files).
  ss_hotkey_ab [hot_total=20000]
      alternating b,p,p,b,b,p timed replays on a truncated hot key
      both arms can finish; prints per-rep walls, medians, and each
      arm's peak state rows (stateOperators numRowsTotal).
  ss_hotkey_full [hot_total=400000]
      the full 400 k-event key: derived pick sanity (batch stats on
      the same parquet choose the coarsened tier), bucket arm timed
      3 reps; the plain arm gets ONE attempt under
      SPARK_GRAFT_SS_PLAIN_CAP seconds (default 480) and is recorded
      as DNF if the cap fires — mirroring r13's jws_hotkey protocol
      (plain's per-batch pair enumeration on the key is ~(n/40)^2 —
      40 k^2 ≈ 1.6e9 per batch at the default chunking).

Fixture: `/tmp/spark_graft_scale/ss_hotkey_<hot_total>` — sf0.1
events (1 M rows background, real key distribution) + ONE user_id=-1
key with hot_total events over 10 days (the r12 hot-key recipe),
written as 20 ts-ordered chunk files so the replay is genuinely
multi-batch with an advancing watermark.

Usage: python -u tools/r14_scale.py <leg> [hot_total]
(write output to a file; run long legs in background.)
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_BASE = "/tmp/spark_graft_scale"
WITHIN_S = 300  # the jws geometry: all pairs within ±5 min
WATERMARK = "10 minutes"
N_CHUNKS = 20


def _build_fixture(spark, hot_total: int) -> str:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import load

    out = f"{SCALE_BASE}/ss_hotkey_{hot_total}"
    if os.path.exists(f"{out}/_READY"):
        return out
    ev = load(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    span_s = 10 * 86_400
    hot = spark.range(hot_total).select(
        (F.lit(2 * 10**15) + F.col("id")).alias("event_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(
                secs=F.col("id") * F.lit(span_s) / F.lit(float(hot_total))
            )
        ).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.when(F.col("id") % 2 == 0, F.lit("signup"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
    )
    allev = ev.unionByName(hot)
    # ts-ordered chunk files, written SEQUENTIALLY so file mtimes (the
    # FileStreamSource admission order) follow event time and the
    # watermark advances batch over batch
    bounds = list(
        allev.select(
            F.percentile_approx(
                "ts", [i / N_CHUNKS for i in range(1, N_CHUNKS)], 10000
            )
        ).first()[0]
    )
    lo = None
    os.makedirs(f"{out}/events", exist_ok=True)
    for i, hi in enumerate([*bounds, None]):
        chunk = allev
        if lo is not None:
            chunk = chunk.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col("ts") <= F.lit(hi))
        chunk.coalesce(1).write.mode("append").parquet(f"{out}/events")
        lo = hi
    with open(f"{out}/_READY", "w") as fh:
        fh.write("ok")
    return out


def _run_stream(spark, fdir: str, bucket: bool, collect_checksum: bool = False):
    """One availableNow replay; returns (wall_s, peak_state_rows,
    n_pairs, checksum|None)."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.streaming.joins import stream_stream_join

    schema = spark.read.parquet(f"{fdir}/events").schema
    acc = {"n": 0, "sum": 0}

    def mk_side(pred):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(f"{fdir}/events")
            .filter(F.col("event_type") == pred)
        )

    joined = stream_stream_join(
        mk_side("signup"),
        mk_side("purchase"),
        left_ts="ts",
        right_ts="ts",
        equi_keys=[("user_id", "user_id")],
        within_seconds=WITHIN_S,
        watermark=WATERMARK,
        bucket=bucket,
    ).select(
        F.col("l.event_id").alias("sig_id"), F.col("r.event_id").alias("pur_id")
    )

    def sink(batch_df, _bid):
        row = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("sig_id") % 1_000_003) * 31 + F.col("pur_id") % 1_000_003
            ).alias("s"),
        ).first()
        acc["n"] += row["n"] or 0
        acc["sum"] += row["s"] or 0

    t0 = time.monotonic()
    if collect_checksum:
        q = joined.writeStream.foreachBatch(sink).trigger(availableNow=True)
        q = q.option(
            "checkpointLocation", f"{fdir}/ckpt_{bucket}_{time.time_ns()}"
        ).start()
    else:
        q = (
            joined.writeStream.format("noop")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", f"{fdir}/ckpt_{bucket}_{time.time_ns()}"
            )
            .start()
        )
    q.awaitTermination()
    wall = time.monotonic() - t0
    peak = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators") or []:
            peak = max(peak, so.get("numRowsTotal") or 0)
    return wall, peak, acc["n"], acc["sum"] if collect_checksum else None


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    leg = sys.argv[1]
    if leg == "session_ab":
        session_ab()
        return
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    if leg == "ss_hotkey_eq":
        hot_total = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
        fdir = _build_fixture(spark, hot_total)
        wp, sp, np_, cp = _run_stream(spark, fdir, False, collect_checksum=True)
        wb, sb, nb, cb = _run_stream(spark, fdir, True, collect_checksum=True)
        print(
            f"plain:  {np_} pairs checksum={cp} wall={wp:.1f}s peak_state={sp}",
            flush=True,
        )
        print(
            f"bucket: {nb} pairs checksum={cb} wall={wb:.1f}s peak_state={sb}",
            flush=True,
        )
        if (np_, cp) != (nb, cb):
            raise SystemExit("plain != bucket on truncated streaming hot key")
        print("row-set equality: True", flush=True)
        return

    if leg == "ss_hotkey_ab":
        hot_total = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
        fdir = _build_fixture(spark, hot_total)
        walls = {"plain": [], "bucket": []}
        peaks = {"plain": 0, "bucket": 0}
        for arm in ("bucket", "plain", "plain", "bucket", "bucket", "plain"):
            w, s, n, _ = _run_stream(spark, fdir, arm == "bucket")
            walls[arm].append(w)
            peaks[arm] = max(peaks[arm], s)
            print(f"{arm}[{len(walls[arm])-1}]: {w:.1f}s pairs={n} peak_state={s}", flush=True)
        mp = statistics.median(walls["plain"])
        mb = statistics.median(walls["bucket"])
        print(
            f"medians: plain={mp:.1f}s bucket={mb:.1f}s ratio={mp/mb:.2f} "
            f"peak_state plain={peaks['plain']} bucket={peaks['bucket']}",
            flush=True,
        )
        return

    if leg == "ss_hotkey_full":
        hot_total = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
        cap = int(os.environ.get("SPARK_GRAFT_SS_PLAIN_CAP", "480"))
        fdir = _build_fixture(spark, hot_total)
        # derived-pick sanity on the SAME bytes (batch stats): the
        # regime pick a user would derive offline chooses the tier
        # that survives — bucket='auto' itself is (guarded) batch-only
        from siddhi_operator_spark.operators.joins import derive_join_bucket

        ev = spark.read.parquet(f"{fdir}/events")
        pick = derive_join_bucket(
            ev.filter(F.col("event_type") == "signup"),
            ev.filter(F.col("event_type") == "purchase"),
            [("user_id", "user_id")],
        )
        print(f"derive_join_bucket(batch sample) -> {pick}", flush=True)
        if not pick:
            raise SystemExit("derived pick failed to choose bucket on hot key")
        for rep in range(3):
            w, s, n, _ = _run_stream(spark, fdir, True)
            print(f"bucket-full[{rep}]: {w:.1f}s pairs={n} peak_state={s}", flush=True)
        # one capped plain attempt, in a daemon thread so the cap can
        # actually fire (awaitTermination(timeout) then stop())
        from pyspark.sql import functions as _F  # noqa: F401

        from siddhi_operator_spark.streaming.joins import stream_stream_join

        schema = spark.read.parquet(f"{fdir}/events").schema

        def mk_side(pred):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(f"{fdir}/events")
                .filter(F.col("event_type") == pred)
            )

        joined = stream_stream_join(
            mk_side("signup"), mk_side("purchase"), "ts", "ts",
            [("user_id", "user_id")], WITHIN_S, WATERMARK,
        ).select(F.col("l.event_id"), F.col("r.event_id"))
        t0 = time.monotonic()
        q = (
            joined.writeStream.format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{fdir}/ckpt_plain_{time.time_ns()}")
            .start()
        )
        done = q.awaitTermination(cap)
        if done:
            print(f"plain-full: {time.monotonic()-t0:.1f}s", flush=True)
        else:
            q.stop()
            print(
                f"plain-full: DNF (>{cap}s cap) — per-batch pair "
                "enumeration on the hot key is quadratic in its batch "
                "slice, the batch blowup in streaming clothes",
                flush=True,
            )
        return

    raise SystemExit(f"unknown leg {leg!r}")


def session_ab() -> None:
    """Gap-island vs native session_window at ×1000 (100 M events) —
    re-run of the r4 A/B that picked gap-island (2× faster then, on
    the Spark-3-era measurement): window_session is ~half the ×1000
    suite and the r14 gate missed by 0.2 %, so the alternative gets
    re-measured on Spark 4.1.2 before the plan ships another round.
    Alternating g,n,n,g,g,n in one fresh process, noop sink, plus a
    row-count cross-check (full row equality at 954 M output rows is
    its own leg's cost; count + the sf0.1 oracle row pin semantics)."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.operators.windows import session as gap_island
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet("/tmp/spark_graft_scale/x1000/events.parquet")
    ev.write.format("noop").mode("overwrite").save()  # warm

    def gap():
        return gap_island(
            ev, "ts", "30 minutes", keys=["user_id"],
            aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
        )

    def native():
        return (
            ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
            .select(
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "user_id", "n", "sv",
            )
        )

    cg, cn = gap().count(), native().count()
    print(f"counts: gap_island={cg} native={cn} equal={cg == cn}", flush=True)
    walls = {"g": [], "n": []}
    for arm in ("g", "n", "n", "g", "g", "n"):
        t0 = time.monotonic()
        (gap() if arm == "g" else native()).write.format("noop").mode(
            "overwrite"
        ).save()
        walls[arm].append(time.monotonic() - t0)
        print(f"{arm}[{len(walls[arm])-1}]: {walls[arm][-1]:.1f}s", flush=True)
    mg, mn = statistics.median(walls["g"]), statistics.median(walls["n"])
    print(f"medians: gap_island={mg:.1f}s native={mn:.1f}s "
          f"native/gap={mn/mg:.2f}", flush=True)


if __name__ == "__main__":
    main()
