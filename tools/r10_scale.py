"""Round-10 decade checks, one leg per process (the r8 A/B lesson:
in-process sequential legs inherit JVM/cache state and fake wins —
ONE FRESH PROCESS PER LEG, warm pass inside).

Legs:
  akslack           the streaming adaptive K-slack reorder
                    (`streaming.reorder.akslack`,
                    applyInPandasWithState — the tier whose
                    per-(key × micro-batch) python-call constant is
                    the engine's measured floor) over events ×100
                    (10 M events, ~100 k keys, md5-jittered disorder
                    like the oracle row). Prints wall + events/s so
                    the throughput lands against the measured
                    0.08–0.5 M events/s applyInPandasWithState band
                    (SCALEBENCH r5/r8) and the bucketed-state routing
                    decision can be made on a number.
  akslack_batch     the batch twin (3 keyed windows, 1 shuffle) on the
                    same ×100 fixture — the Catalyst-native cost the
                    state op's constant is judged against.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r10_scale.py <leg> [scale]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


JITTER = (
    "ts - make_interval(0, 0, 0, 0, 0, 0, "
    "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 5), 16, 10) "
    "AS BIGINT) % 86400)"
)


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    leg = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    from bench import ensure_scaled  # fixture cache shared with bench.py

    sdir = ensure_scaled(spark, scale)
    ev = spark.read.parquet(f"{sdir}/events.parquet")
    ev.write.format("noop").mode("overwrite").save()  # warm page cache
    n = ev.count()
    keys = ev.select("user_id").distinct().count()
    print(f"events={n} keys={keys} x{scale}", flush=True)

    if leg == "akslack":
        from siddhi_operator_spark.streaming.reorder import akslack

        s = (
            spark.readStream.schema(ev.schema)
            .parquet(f"{sdir}/events.parquet")
            .select("event_id", "user_id", F.expr(JITTER).alias("ts"))
        )
        out = akslack(s, ts="ts", key="user_id", q_pct=90)
        t0 = time.monotonic()
        q = out.writeStream.format("noop").start()
        q.processAllAvailable()
        wall = time.monotonic() - t0
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        q.stop()
        print(
            f"akslack streaming x{scale}: {wall:.2f} s, "
            f"{n / wall / 1e6:.3f} M events/s, "
            f"{len(batches)} non-empty batches",
            flush=True,
        )
        return

    if leg == "akslack_bucketed":
        from siddhi_operator_spark.streaming.reorder import akslack_bucketed

        s = (
            spark.readStream.schema(ev.schema)
            .parquet(f"{sdir}/events.parquet")
            .select("event_id", "user_id", F.expr(JITTER).alias("ts"))
        )
        out = akslack_bucketed(s, ts="ts", key="user_id", q_pct=90,
                               n_buckets=128)
        t0 = time.monotonic()
        q = out.writeStream.format("noop").start()
        q.processAllAvailable()
        wall = time.monotonic() - t0
        q.stop()
        print(
            f"akslack bucketed(128) x{scale}: {wall:.2f} s, "
            f"{n / wall / 1e6:.3f} M events/s",
            flush=True,
        )
        return

    if leg == "akslack_batch":
        from siddhi_operator_spark.streaming.reorder import akslack_batch

        d = ev.select(
            "event_id", "user_id", F.expr(JITTER).alias("ts")
        )
        out = akslack_batch(d, ts="ts", key="user_id", q_pct=90)
        out.write.format("noop").mode("overwrite").save()  # warm plan
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        print(
            f"akslack batch twin x{scale}: {wall:.2f} s, "
            f"{n / wall / 1e6:.3f} M events/s",
            flush=True,
        )
        return

    raise SystemExit(f"unknown leg {leg!r}")


if __name__ == "__main__":
    main()
