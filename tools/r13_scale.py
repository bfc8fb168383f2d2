"""Round-13 decade checks, one leg per process (measurement protocol:
ONE FRESH PROCESS PER LEG, warm pass inside the process, medians of 3
alternating reps per arm — in-process sequential legs inherit
JVM/cache state and fake wins).

Legs (default scale ×10000 — the 1 B-event fixture bench.py's
ensure_scaled leaves at /tmp/spark_graft_scale/x10000_events):

  jws_ab        join_windowed_self re-adjudication (r12 verdict #1: it
                crossed the ledger's 3× re-open threshold at ×10000 —
                3.10× on 32 s absolutes, and no structural A/B has
                ever run at this scale). Arms: the SHIPPED plan
                (keyed SMJ + time-range residual) vs the
                EPOCH-COARSENED join (`bucket=True` — coarsen ts into
                `within`-wide epochs, join on (user_id, epoch ∈
                {b−1,b,b+1}), range-filter after; bounds per-key pair
                production before materialization). Alternating
                p,b,b,p,p,b; noop-sink writes so the numbers are
                BENCH-comparable; row equality asserted on the base
                (first-replica) user slice — the full 1 B-row output
                exceptAll is the leg's own cost, the bounded slice is
                exact on 1/scale of the keys.
  pattern_ab    pattern_followed_by scan-vs-join at ×10000 (r12
                verdict #2: 2.39× with the ×1000 A/B predating the
                AQE initialPartitionNum fix, which helps sorts — the
                scan tier is sort-bound). Alternating s,j,j,s,s,j,
                noop-sink writes, bounded row equality, plus the r13
                derived regime pick (`choose_pattern_impl`) measured
                at full scale — both its decision and its cost.
  hotkey_eq     r12 verdict #6: the hot-key leg could not verify row
                equality at decade scale because the join arm never
                finishes (the point of the leg). This leg asserts
                scan==join on a TRUNCATED input (hot key's signups
                capped so join pair production is ~1.7e6 and the arm
                finishes), then times the scan on the FULL fixture —
                the decade leg now carries its own correctness check.
                Also asserts the derived pick chooses 'scan' here and
                'join' on the constant-density fixture.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python -u tools/r13_scale.py <leg> [scale]
(write raw output to a file; foreground shells cap at 10 min — run in
background.)
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_BASE = "/tmp/spark_graft_scale"


def _events_dir(scale: int) -> str:
    d = f"{SCALE_BASE}/x{scale}_events"
    if not os.path.exists(f"{d}/_READY"):
        raise SystemExit(
            f"{d} not built — run bench.py with SPARK_GRAFT_BENCH_SCALE="
            f"{scale} SPARK_GRAFT_BENCH_SCALE_TABLES=events "
            "SPARK_GRAFT_BENCH_ONLY=<events queries> first"
        )
    return d


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    leg = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    if leg == "jws_ab":
        from siddhi_operator_spark.catalog import load
        from siddhi_operator_spark.operators import joins as J

        sdir = _events_dir(scale)
        ev = load(spark, sdir, "events")
        ev.write.format("noop").mode("overwrite").save()  # warm cache
        print(f"events={ev.count()} x{scale}", flush=True)
        # base-replica user bound for the bounded equality slice: the
        # scaled builder shifts user_id by k*(max_base+1), so
        # user_id <= max_base is exactly the first replica
        base_max = int(
            load(spark, "/root/testdata/sf0.1", "events")
            .agg(F.max("user_id"))
            .first()[0]
        )

        def plan(bucket: bool):
            clicks = ev.filter(F.col("event_type") == "click")
            views = ev.filter(F.col("event_type") == "view")
            j = J.windowed_stream_join(
                clicks, views, left_ts="ts", right_ts="ts",
                equi_keys=[("user_id", "user_id")],
                within_seconds=300, bucket=bucket,
            )
            return j.select(
                F.col("l.user_id").alias("user_id"),
                F.col("l.event_id").alias("click_id"),
                F.col("r.event_id").alias("view_id"),
                F.col("l.ts").alias("click_ts"),
                F.col("r.ts").alias("view_ts"),
            )

        plans = {"plain": lambda: plan(False), "bucket": lambda: plan(True)}
        walls: dict[str, list[float]] = {"plain": [], "bucket": []}
        for name in ("plain", "bucket"):  # one warm pass per arm
            w = _noop(plans[name]())
            print(f"warm {name}: {w:.1f} s", flush=True)
        for rep, name in enumerate(
            ("plain", "bucket", "bucket", "plain", "plain", "bucket")
        ):
            w = _noop(plans[name]())
            walls[name].append(w)
            print(f"jws[{rep}] {name}: {w:.1f} s", flush=True)
        med = {k: statistics.median(v) for k, v in walls.items()}
        print(
            f"medians of 3: plain={med['plain']:.1f} s "
            f"bucket={med['bucket']:.1f} s "
            f"bucket/plain={med['bucket'] / med['plain']:.2f}x",
            flush=True,
        )
        a = plans["plain"]().filter(F.col("user_id") <= base_max)
        b = plans["bucket"]().filter(F.col("user_id") <= base_max)
        ca, cb = a.count(), b.count()
        eq = ca == cb and a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        print(
            f"bounded equality (user_id<=base, {ca} vs {cb} rows): {eq}",
            flush=True,
        )
        if not eq:
            raise SystemExit("row-set mismatch between arms")
        return

    if leg == "jws_shj":
        # Third structural arm for the re-adjudication: SHUFFLE_HASH
        # instead of sort-merge.  The r7/r8 SHJ A/Bs were negative at
        # <=x1000 where the SMJ sorts were cheap; at 1 B rows the two
        # O(n log n) sorts dominate the join, and per-partition hash
        # builds (~1 M rows/partition under the 1024 initial
        # partitions) fit executor memory.  Alternating p,s,s,p,p,s.
        from siddhi_operator_spark.catalog import load
        from siddhi_operator_spark.operators import joins as J

        sdir = _events_dir(scale)
        ev = load(spark, sdir, "events")
        ev.write.format("noop").mode("overwrite").save()  # warm cache
        print(f"events={ev.count()} x{scale}", flush=True)
        base_max = int(
            load(spark, "/root/testdata/sf0.1", "events")
            .agg(F.max("user_id"))
            .first()[0]
        )

        def plan(shj: bool):
            clicks = ev.filter(F.col("event_type") == "click")
            views = ev.filter(F.col("event_type") == "view")
            if shj:
                views = views.hint("SHUFFLE_HASH")
            j = J.windowed_stream_join(
                clicks, views, left_ts="ts", right_ts="ts",
                equi_keys=[("user_id", "user_id")],
                within_seconds=300,
            )
            return j.select(
                F.col("l.user_id").alias("user_id"),
                F.col("l.event_id").alias("click_id"),
                F.col("r.event_id").alias("view_id"),
                F.col("l.ts").alias("click_ts"),
                F.col("r.ts").alias("view_ts"),
            )

        # prove the hint actually flips the physical plan
        shj_plan = plan(True)._jdf.queryExecution().executedPlan().toString()
        if "ShuffledHashJoin" not in shj_plan:
            raise SystemExit("SHUFFLE_HASH hint did not take")
        plans = {"plain": lambda: plan(False), "shj": lambda: plan(True)}
        walls: dict[str, list[float]] = {"plain": [], "shj": []}
        for name in ("plain", "shj"):
            w = _noop(plans[name]())
            print(f"warm {name}: {w:.1f} s", flush=True)
        for rep, name in enumerate(
            ("plain", "shj", "shj", "plain", "plain", "shj")
        ):
            w = _noop(plans[name]())
            walls[name].append(w)
            print(f"jws[{rep}] {name}: {w:.1f} s", flush=True)
        med = {k: statistics.median(v) for k, v in walls.items()}
        print(
            f"medians of 3: plain={med['plain']:.1f} s "
            f"shj={med['shj']:.1f} s "
            f"shj/plain={med['shj'] / med['plain']:.2f}x",
            flush=True,
        )
        a = plans["plain"]().filter(F.col("user_id") <= base_max)
        b = plans["shj"]().filter(F.col("user_id") <= base_max)
        ca, cb = a.count(), b.count()
        eq = ca == cb and a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        print(
            f"bounded equality (user_id<=base, {ca} vs {cb} rows): {eq}",
            flush=True,
        )
        if not eq:
            raise SystemExit("row-set mismatch between arms")
        return

    if leg == "pattern_ab":
        from siddhi_operator_spark.catalog import load
        from siddhi_operator_spark.operators import patterns as P

        sdir = _events_dir(scale)
        ev = load(spark, sdir, "events")
        ev.write.format("noop").mode("overwrite").save()  # warm cache
        print(f"events={ev.count()} x{scale}", flush=True)
        base_max = int(
            load(spark, "/root/testdata/sf0.1", "events")
            .agg(F.max("user_id"))
            .first()[0]
        )
        sig = F.col("event_type") == "signup"
        pur = F.col("event_type") == "purchase"

        # the r13 derived regime pick, measured at full scale: its
        # decision AND what deciding costs on 1 B rows
        t0 = time.monotonic()
        pick = P.choose_pattern_impl(ev, "user_id", sig, pur)
        print(
            f"choose_pattern_impl -> {pick!r} in {time.monotonic()-t0:.1f} s",
            flush=True,
        )

        def plan(impl):
            def run():
                return P.followed_by(
                    ev, key="user_id", ts="ts",
                    first_pred=sig, second_pred=pur,
                    within_seconds=3600, impl=impl,
                )
            return run

        plans = {"scan": plan("scan"), "join": plan("join")}
        walls = {"scan": [], "join": []}
        for name in ("scan", "join"):
            w = _noop(plans[name]())
            print(f"warm {name}: {w:.1f} s", flush=True)
        for rep, name in enumerate(
            ("scan", "join", "join", "scan", "scan", "join")
        ):
            w = _noop(plans[name]())
            walls[name].append(w)
            print(f"followed_by[{rep}] {name}: {w:.1f} s", flush=True)
        med = {k: statistics.median(v) for k, v in walls.items()}
        print(
            f"medians of 3: scan={med['scan']:.1f} s "
            f"join={med['join']:.1f} s "
            f"join/scan={med['join'] / med['scan']:.2f}x",
            flush=True,
        )
        a = plans["scan"]().filter(F.col("user_id") <= base_max)
        b = plans["join"]().filter(F.col("user_id") <= base_max)
        ca, cb = a.count(), b.count()
        eq = ca == cb and a.exceptAll(b).isEmpty()
        print(
            f"bounded equality (user_id<=base, {ca} vs {cb} rows): {eq}",
            flush=True,
        )
        if not eq:
            raise SystemExit("row-set mismatch between tiers")
        return

    if leg == "hotkey_eq":
        from siddhi_operator_spark.operators import patterns as P

        hot_n = int(os.environ.get("SPARK_GRAFT_HOTKEY_N", "400000"))
        arm_cap = int(os.environ.get("SPARK_GRAFT_HOTKEY_ARM_CAP", "2000"))
        hdir = f"{SCALE_BASE}/events_hotkey_{scale}_{hot_n}"
        if not os.path.exists(f"{hdir}/_READY"):
            raise SystemExit(
                f"{hdir} not built — run tools/r12_scale.py "
                f"pattern_hotkey_ab {scale} once to build it"
            )
        ev = spark.read.parquet(f"{hdir}/events.parquet")
        ev.write.format("noop").mode("overwrite").save()  # warm
        sig = F.col("event_type") == "signup"
        pur = F.col("event_type") == "purchase"
        print(f"events={ev.count()} (hot key {hot_n})", flush=True)

        # derived regime pick must choose the scan here
        pick = P.choose_pattern_impl(ev, "user_id", sig, pur)
        print(f"choose_pattern_impl(hot fixture) -> {pick!r}", flush=True)
        if pick != "scan":
            raise SystemExit("derived pick failed to choose scan on hot key")

        # bounded row-equality: cap the hot key's SIGNUPS (the arm
        # side) to the first `arm_cap` by event_id — join pair
        # production on the hot key drops to ~arm_cap × 833 and the
        # join arm finishes; every other row (background + hot
        # purchases) is untouched, so the scan still walks the full
        # 400 k-event key state
        hot_sig_ids = (
            ev.filter((F.col("user_id") == -1) & sig)
            .select("event_id")
            .orderBy("event_id")
            .limit(arm_cap)
        )
        cutoff = hot_sig_ids.agg(F.max("event_id")).first()[0]
        trunc = ev.filter(
            (F.col("user_id") != -1)
            | ~sig
            | (F.col("event_id") <= F.lit(cutoff))
        )
        kw = dict(
            key="user_id", ts="ts", first_pred=sig, second_pred=pur,
            within_seconds=3600,
        )
        t0 = time.monotonic()
        a = P.followed_by(trunc, impl="scan", **kw)
        b = P.followed_by(trunc, impl="join", **kw)
        ca, cb = a.count(), b.count()
        eq = ca == cb and a.exceptAll(b).isEmpty()
        print(
            f"truncated-arm equality (cap={arm_cap}, {ca} vs {cb} rows): "
            f"{eq} in {time.monotonic()-t0:.1f} s",
            flush=True,
        )
        if not eq:
            raise SystemExit("row-set mismatch on truncated hot key")

        # and the decade wall the leg exists for: scan on the FULL key
        walls = []
        for rep in range(3):
            t0 = time.monotonic()
            P.followed_by(ev, impl="scan", **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.monotonic() - t0)
            print(f"scan-full[{rep}]: {walls[-1]:.1f} s", flush=True)
        print(f"scan-full median of 3: {statistics.median(walls):.1f} s",
              flush=True)
        return

    if leg == "jws_hotkey":
        # The windowed JOIN's hot-key regime (r13): same fixture as
        # hotkey_eq, but the operator is windowed_stream_join (all
        # pairs within ±5 min), the shape `join_windowed_self` ships.
        # The plain keyed join's pre-filter pair production on the
        # 400 k-event key is ~4e10 — it cannot finish (the pattern
        # twin bounded the same blow-up at >=120x in r12) — so the
        # leg measures: (a) the derived pick chooses the coarsened
        # tier here; (b) plain == bucket row-for-row on a TRUNCATED
        # input (hot signups capped so plain's pair production is
        # ~4e8 and it finishes); (c) the bucket tier's wall on the
        # FULL fixture, 3 reps — the plan that survives the key.
        from siddhi_operator_spark.operators import joins as J

        hot_n = int(os.environ.get("SPARK_GRAFT_HOTKEY_N", "400000"))
        arm_cap = int(os.environ.get("SPARK_GRAFT_HOTKEY_ARM_CAP", "2000"))
        hdir = f"{SCALE_BASE}/events_hotkey_{scale}_{hot_n}"
        if not os.path.exists(f"{hdir}/_READY"):
            raise SystemExit(
                f"{hdir} not built — run tools/r12_scale.py "
                f"pattern_hotkey_ab {scale} once to build it"
            )
        ev = spark.read.parquet(f"{hdir}/events.parquet")
        ev.write.format("noop").mode("overwrite").save()  # warm
        sig = ev.filter(F.col("event_type") == "signup")
        pur = ev.filter(F.col("event_type") == "purchase")
        keys = [("user_id", "user_id")]
        print(f"events={ev.count()} (hot key {hot_n})", flush=True)

        t0 = time.monotonic()
        pick = J.derive_join_bucket(sig, pur, keys)
        print(
            f"derive_join_bucket(hot fixture) -> {pick} "
            f"in {time.monotonic()-t0:.1f} s",
            flush=True,
        )
        if not pick:
            raise SystemExit("derived pick failed to choose bucket on hot key")

        def plan(left, bucket):
            j = J.windowed_stream_join(
                left, pur, left_ts="ts", right_ts="ts", equi_keys=keys,
                within_seconds=300, bucket=bucket,
            )
            return j.select(
                F.col("l.user_id").alias("user_id"),
                F.col("l.event_id").alias("sig_id"),
                F.col("r.event_id").alias("pur_id"),
            )

        cutoff = (
            sig.filter(F.col("user_id") == -1)
            .select("event_id")
            .orderBy("event_id")
            .limit(arm_cap)
            .agg(F.max("event_id"))
            .first()[0]
        )
        sig_t = sig.filter(
            (F.col("user_id") != -1) | (F.col("event_id") <= F.lit(cutoff))
        )
        t0 = time.monotonic()
        a = plan(sig_t, False)
        b = plan(sig_t, True)
        ca, cb = a.count(), b.count()
        eq = ca == cb and a.exceptAll(b).isEmpty()
        tp = time.monotonic() - t0
        print(
            f"truncated-arm equality (cap={arm_cap}, {ca} vs {cb} rows): "
            f"{eq} in {tp:.1f} s",
            flush=True,
        )
        if not eq:
            raise SystemExit("plain != bucket on truncated hot key")

        walls = []
        for rep in range(3):
            t0 = time.monotonic()
            plan(sig, True).write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
            print(f"bucket-full[{rep}]: {walls[-1]:.1f} s", flush=True)
        print(
            f"bucket-full median of 3: {statistics.median(walls):.1f} s "
            f"(plain-full pair production is ~{400000 // 2 // arm_cap}x the "
            "truncated arm's — not attempted; the pattern twin bounded the "
            "same blow-up at >=120x, SCALEBENCH r12)",
            flush=True,
        )
        return

    raise SystemExit(f"unknown leg {leg!r}")


if __name__ == "__main__":
    main()
