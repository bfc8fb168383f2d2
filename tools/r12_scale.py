"""Round-12 decade checks, one leg per process (the r8 A/B lesson:
in-process sequential legs inherit JVM/cache state and fake wins —
ONE FRESH PROCESS PER LEG, warm pass inside).

Legs:
  ivfpq_serve_eo        the r11 serve_compact leg in EXACTLY-ONCE mode
                        with inline compaction armed — the exact
                        configuration `similarity_ivfpq_compacted_serve`
                        ships and the r11 verdict's replay hole lived
                        in: base index from 50 k of the ×1000
                        embeddings (2 M × 64-dim), the rest
                        stream-ingested via staged-rename commits with
                        count-triggered folds (tombstoned since r12),
                        then the CRASH WINDOW replayed on the SAME
                        checkpoint (newest commits/<id> marker erased
                        → Spark re-runs that batch id; the fold
                        consumed its dir, so the tombstone alone must
                        skip it — zero rows re-ingested), then probe
                        1 000 queries off the
                        served layout and assert bit-identity with a
                        full rebuild. Leaves its work dir for the
                        probe legs.
  ivfpq_probe_wide_ab3  the r11 wide-vs-long probe A/B at THREE reps
                        per arm (r11 verdict "what's wrong" #4: the
                        2.9× headline was a median of 2 with the wide
                        arm spanning 3.7× between its own reps) —
                        alternating w,l,l,w,w,l so neither arm owns
                        the warm tail. Run AFTER ivfpq_serve_eo
                        (reuses its served layout).

  pattern_scan_ab       followed_by impl='scan' vs impl='join' on the
                        CONSTANT-DENSITY ×1000 events fixture (the
                        join's regime — it won 1.4× and stays the
                        default).
  pattern_hotkey_ab     the same A/B in the regime the scan tier
                        exists for: one 400 k-event key, hour budget
                        (~1.7e8 join pairs in one SMJ partition) over
                        a ×100 background. Hot-key size via
                        SPARK_GRAFT_HOTKEY_N.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r12_scale.py <leg> [scale]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SERVE_WORK = "/tmp/spark_graft_scale/ivfpq_serve_eo_leg"


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    leg = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    if leg == "ivfpq_serve_eo":
        import shutil

        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import similarity as S
        from siddhi_operator_spark.pipeline.similarity import (
            ivfpq_folded_batches,
            ivfpq_inc_batches,
        )
        from siddhi_operator_spark.streaming.similarity import (
            ivfpq_ingest_sink,
        )
        from tools.scalebench_pipeline import ensure_embeddings

        edir = ensure_embeddings(spark, scale)
        emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{edir}/embeddings.parquet"
        )
        emb.write.format("noop").mode("overwrite").save()  # warm
        n = emb.count()
        head = min(50_000, n // 4)  # ×1000: 50 k; small smoke scales: n/4
        cells = 64  # r10 leg geometry
        shutil.rmtree(SERVE_WORK, ignore_errors=True)
        t0 = time.monotonic()
        S.ivfpq_index_write(
            emb.filter(F.col("vec_id") < head), f"{SERVE_WORK}/live",
            n_cells=cells, dims=64, m=8, n_codes=16,
        )
        print(f"base index ({head} vecs): {time.monotonic()-t0:.1f} s",
              flush=True)
        (
            emb.filter(F.col("vec_id") >= head)
            .repartition(80)
            .write.parquet(f"{SERVE_WORK}/staging")
        )

        def run_stream(ckpt: str) -> tuple[float, int]:
            s = (
                spark.readStream.schema(SCHEMAS["embeddings"])
                .option("maxFilesPerTrigger", 8)
                .parquet(f"{SERVE_WORK}/staging")
            )
            t0 = time.monotonic()
            q = ivfpq_ingest_sink(
                s, f"{SERVE_WORK}/live", checkpoint=f"{SERVE_WORK}/{ckpt}",
                exactly_once=True, max_fragments_per_cell=4,
            )
            q.processAllAvailable()
            wall = time.monotonic() - t0
            fed = len([p for p in q.recentProgress if p["numInputRows"] > 0])
            q.stop()
            q.awaitTermination()  # the crash-window re-run shares ckpt1
            return wall, fed

        wall, fed = run_stream("ckpt1")
        live_b = ivfpq_inc_batches(spark, f"{SERVE_WORK}/live")
        folded = ivfpq_folded_batches(spark, f"{SERVE_WORK}/live")
        rows_after = spark.read.parquet(f"{SERVE_WORK}/live/codes").count()
        print(
            f"exactly-once ingest {n - head} vecs in {fed} batches "
            f"(inline compaction at 4): {wall:.1f} s, "
            f"{(n - head) / wall / 1e3:.1f} k vecs/s; "
            f"folded={len(folded)} live_batches={len(live_b)} "
            f"base_code_rows={rows_after}",
            flush=True,
        )
        # CRASH-WINDOW REPLAY on the SAME checkpoint (r12 review: the
        # manifest is stream-scoped, so a FRESH checkpoint is a new
        # stream and re-ingests by design; the exactly-once window is
        # sink-commit-then-crash-before-offset-commit): delete the
        # newest commits/<id> marker so Spark re-runs that batch with
        # the same batch id — the fold consumed its dir, so the
        # tombstone alone must skip it, zero rows re-ingested
        import glob as _glob

        inc_rows_before = (
            spark.read.option("basePath", f"{SERVE_WORK}/live/codes_inc")
            .parquet(f"{SERVE_WORK}/live/codes_inc")
            .count()
            if live_b
            else 0
        )
        commits = sorted(
            _glob.glob(f"{SERVE_WORK}/ckpt1/commits/[0-9]*"),
            key=lambda f: int(os.path.basename(f)),
        )
        os.remove(commits[-1])
        crc = os.path.join(
            os.path.dirname(commits[-1]),
            f".{os.path.basename(commits[-1])}.crc",
        )
        if os.path.exists(crc):  # LocalFS checksum sibling
            os.remove(crc)
        rwall, rfed = run_stream("ckpt1")
        live_b2 = ivfpq_inc_batches(spark, f"{SERVE_WORK}/live")
        rows_after2 = spark.read.parquet(f"{SERVE_WORK}/live/codes").count()
        inc_rows_after = (
            spark.read.option("basePath", f"{SERVE_WORK}/live/codes_inc")
            .parquet(f"{SERVE_WORK}/live/codes_inc")
            .count()
            if live_b2
            else 0
        )
        dup_free = (
            rows_after2 == rows_after
            and inc_rows_after == inc_rows_before
            and live_b2 == live_b
        )
        print(
            f"crash-window replay (same ckpt, commit marker erased, "
            f"{rfed} replayed batches): "
            f"{rwall:.1f} s; zero re-ingest: {dup_free}",
            flush=True,
        )
        if not dup_free:
            raise SystemExit("replay duplicated rows — tombstone hole")
        queries = emb.filter(F.col("vec_id") % 2000 == 0)  # ~1 000
        t0 = time.monotonic()
        live = S.ivfpq_index_topk(
            spark, f"{SERVE_WORK}/live", queries, nprobe=4, k=3
        ).collect()
        print(f"probe 1000 queries off SERVED layout: "
              f"{time.monotonic()-t0:.1f} s, {len(live)} rows", flush=True)
        t0 = time.monotonic()
        S.ivfpq_index_write(
            emb, f"{SERVE_WORK}/full", n_cells=cells, dims=64, m=8,
            n_codes=16,
        )
        full = S.ivfpq_index_topk(
            spark, f"{SERVE_WORK}/full", queries, nprobe=4, k=3
        ).collect()
        print(f"full rebuild + probe: {time.monotonic()-t0:.1f} s",
              flush=True)
        match = sorted(map(tuple, live)) == sorted(map(tuple, full))
        print(f"eo-served == full rebuild: {match}", flush=True)
        if not match:
            raise SystemExit("bit-identity violated")
        return

    if leg == "ivfpq_probe_wide_ab3":
        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import similarity as S
        from tools.scalebench_pipeline import ensure_embeddings

        edir = ensure_embeddings(spark, scale)
        emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{edir}/embeddings.parquet"
        )
        if not os.path.exists(f"{SERVE_WORK}/live"):
            raise SystemExit("run ivfpq_serve_eo first")
        queries = emb.filter(F.col("vec_id") % 2000 == 0)
        rows = {}
        walls: dict[str, list[float]] = {"wide": [], "long": []}
        for rep, name in enumerate(
            ("wide", "long", "long", "wide", "wide", "long")
        ):
            t0 = time.monotonic()
            got = sorted(
                map(
                    tuple,
                    S.ivfpq_index_topk(
                        spark, f"{SERVE_WORK}/live", queries, nprobe=4,
                        k=3, impl=name,
                    ).collect(),
                )
            )
            w = time.monotonic() - t0
            rows[name] = got
            walls[name].append(w)
            print(f"probe[{rep}] {name}: {w:.1f} s ({len(got)} rows)",
                  flush=True)
        med = {
            k: sorted(v)[len(v) // 2] for k, v in walls.items()
        }
        print(
            f"medians of 3: wide={med['wide']:.1f} s "
            f"long={med['long']:.1f} s ratio={med['long']/med['wide']:.2f}×; "
            f"wide == long: {rows['wide'] == rows['long']}",
            flush=True,
        )
        if rows["wide"] != rows["long"]:
            raise SystemExit("bit-identity violated")
        return

    if leg == "pattern_scan_ab":
        # r12 followed-by re-plan A/B: the opt-in impl='scan'
        # single-shuffle fanout-free pass vs the SHIPPED DEFAULT
        # impl='join' (the join WON this A/B 1.4× and stays the
        # default; the scan is hot-key insurance — SCALEBENCH r12) —
        # alternating s,j,j,s on the ×1000 events fixture, row sets
        # asserted equal.
        from siddhi_operator_spark.operators import patterns as P

        from bench import ensure_scaled

        sdir = ensure_scaled(spark, scale)
        ev = spark.read.parquet(f"{sdir}/events.parquet")
        ev.write.format("noop").mode("overwrite").save()  # warm
        n = ev.count()
        print(f"events={n} x{scale}", flush=True)

        def plan(impl):
            def run():
                return P.followed_by(
                    ev, key="user_id", ts="ts",
                    first_pred=F.col("event_type") == "signup",
                    second_pred=F.col("event_type") == "purchase",
                    within_seconds=3600, impl=impl,
                )
            return run

        plans = {"scan": plan("scan"), "join": plan("join")}
        counts = {}
        for rep, name in enumerate(("scan", "join", "join", "scan")):
            t0 = time.monotonic()
            c = plans[name]().count()
            counts[name] = c
            print(f"followed_by[{rep}] {name}: "
                  f"{time.monotonic()-t0:.1f} s ({c} matches)", flush=True)
        eq = (
            plans["scan"]().exceptAll(plans["join"]()).isEmpty()
            and counts["scan"] == counts["join"]
        )
        print(f"scan == join: {eq}", flush=True)
        if not eq:
            raise SystemExit("row-set mismatch")
        return

    if leg == "pattern_hotkey_ab":
        # The regime the scan tier EXISTS for, measured (the x1000 A/B
        # above has constant per-key density and the join rightly wins
        # there — this leg is the other regime): ONE key holding 400 k
        # events over 10 days with an hour-wide budget. The join's
        # pre-filter pair production on that key is
        # 200 k signups x ~830 in-window purchases ~ 1.7e8 rows,
        # materialized in a single SMJ partition and re-shuffled for
        # the first-match row_number; the scan's cost stays the per-key
        # sort (400 k rows, one task). Normal-density background tier
        # (sf0.1 events x100, 10 M rows) keeps the rest of the plan
        # honest. Alternating s,j,j,s; row sets asserted equal.
        #
        # MEASURED OUTCOME (SCALEBENCH r12): this full protocol cannot
        # complete in reasonable wall — the scan reps read 1.6–4.7 s
        # but the JOIN arm did not finish ONE rep inside a 9.5-minute
        # cap (and a 40-minute s,j,j,s run died inside the join reps),
        # bounding the regime crossover at >=120x. Budget accordingly
        # (or run scan-only and cap the join arm) if you re-run it.
        from siddhi_operator_spark.catalog import load
        from siddhi_operator_spark.operators import patterns as P

        hot_n = int(os.environ.get("SPARK_GRAFT_HOTKEY_N", "400000"))
        hdir = f"/tmp/spark_graft_scale/events_hotkey_{scale}_{hot_n}"
        if not os.path.exists(f"{hdir}/_READY"):
            ev = load(spark, "/root/testdata/sf0.1", "events")
            k = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("k")
            kl = F.col("k").cast("long")
            umax = int(ev.agg(F.max("user_id")).first()[0]) + 1
            base = (
                ev.repartition(32)
                .select("*", k)
                .withColumn("event_id", F.col("event_id") + kl * F.lit(10**12))
                .withColumn("user_id", F.col("user_id") + kl * F.lit(umax))
                .drop("k")
            )
            span_s = 10 * 86_400
            hot = (
                spark.range(hot_n)
                .select(
                    (F.lit(2 * 10**15) + F.col("id")).alias("event_id"),
                    (
                        F.lit("2024-01-01 00:00:00").cast("timestamp")
                        + F.make_interval(
                            secs=F.col("id")
                            * F.lit(span_s)
                            / F.lit(float(hot_n))
                        )
                    ).alias("ts"),
                    F.lit(-1).cast("long").alias("user_id"),
                    F.when(F.col("id") % 2 == 0, F.lit("signup"))
                    .otherwise(F.lit("purchase"))
                    .alias("event_type"),
                    (F.col("id") % 997).cast("double").alias("value"),
                    F.lit("{}").alias("props"),
                )
            )
            base.unionByName(hot).write.mode("overwrite").parquet(
                f"{hdir}/events.parquet"
            )
            with open(f"{hdir}/_READY", "w") as fh:
                fh.write("ok")
        ev = spark.read.parquet(f"{hdir}/events.parquet")
        ev.write.format("noop").mode("overwrite").save()  # warm
        print(f"events={ev.count()} (background x{scale} + hot key "
              f"{hot_n})", flush=True)

        def plan(impl):
            def run():
                return P.followed_by(
                    ev, key="user_id", ts="ts",
                    first_pred=F.col("event_type") == "signup",
                    second_pred=F.col("event_type") == "purchase",
                    within_seconds=3600, impl=impl,
                )
            return run

        plans = {"scan": plan("scan"), "join": plan("join")}
        counts = {}
        walls: dict[str, list[float]] = {"scan": [], "join": []}
        for rep, name in enumerate(("scan", "join", "join", "scan")):
            t0 = time.monotonic()
            c = plans[name]().count()
            w = time.monotonic() - t0
            counts[name] = c
            walls[name].append(w)
            print(f"followed_by[{rep}] {name}: {w:.1f} s ({c} matches)",
                  flush=True)
        # sorted(v)[len(v)//2] on an even-length list is the UPPER
        # middle — for the 2-rep protocol that is the WORSE of the two
        # walls, not a median; label it honestly (ADVICE r12)
        med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
        _lbl = "medians of 3" if len(next(iter(walls.values()))) >= 3 else "worse of 2"
        print(
            f"{_lbl}: scan={med['scan']:.1f} s "
            f"join={med['join']:.1f} s "
            f"ratio={med['join'] / med['scan']:.2f}x",
            flush=True,
        )
        eq = (
            counts["scan"] == counts["join"]
            and plans["scan"]().exceptAll(plans["join"]()).isEmpty()
        )
        print(f"scan == join: {eq}", flush=True)
        if not eq:
            raise SystemExit("row-set mismatch")
        return

    raise SystemExit(f"unknown leg {leg!r}")


if __name__ == "__main__":
    main()
