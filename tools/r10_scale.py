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
  akslack_bucketed  the coarse-bucket state layout (hash(key) % 128)
                    shipped from the per-key measurement — 2.7× at
                    ×100 (SCALEBENCH r10).
  spanwin_none | spanwin_bloom | spanwin_auto
                    remove_repeated_spans on the constructed
                    bloom-POSITIVE fixture (small prunable tail —
                    see ensure_docs_bloomwin): the other half of the
                    auto-threshold evidence (the mixed fixture
                    measured the negative route).

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


def ensure_docs_bloomwin(spark, scale: int, variants: int = 32) -> str:
    """The bloom's POSITIVE regime, constructed deliberately (the r10
    mixed-×1000 legs found the mixed fixture's tail saturates any
    bounded bloom — its 'unique' family shares natural cross-doc
    k-grams within a replica because the salt is the replica id).
    Here the unique family salts per (doc, replica) — genuinely
    unshared (every winnow trigram carries a salted token) — and the
    shared family keeps `variants` boilerplate variants, so the
    DISTINCT shared tail is ~base-shared-fps × variants. Sizing is
    empirical: the first cut (sf0.01 base, 8 variants) measured
    n_shared = 24 515 — under the broadcast threshold, so auto
    correctly picked `none` (recorded in SCALEBENCH as another
    correct-route datapoint). This cut uses the sf0.1 base (1500
    shared docs, ~20 winnow fps each) × 32 variants ≈ 1 M fps —
    past AQE's broadcast threshold, comfortably inside a 2^24 bloom
    at ~8 bits/key — and ~70 % of distinct (doc, fp) pairs prunable.
    auto should pick bloom here."""
    import os

    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS

    base = os.environ.get(
        "SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale"
    )
    out = f"{base}/docs_bloomwin_v{variants}_x{scale}"
    if not os.path.exists(f"{out}/_READY"):
        os.makedirs(out, exist_ok=True)
        d = spark.read.schema(SCHEMAS["documents"]).parquet(
            "/root/testdata/sf0.1/documents.parquet"
        )
        k = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("k")
        shared_family = (F.col("doc_id") % 10) < 3
        v = (F.col("k") % variants).cast("string")
        uniq = F.concat(
            F.col("doc_id").cast("string"), F.lit("u"), F.col("k").cast("string")
        )
        salt = F.when(shared_family, v).otherwise(uniq)
        toks = F.split(F.col("text"), r"\s+")
        salted = F.array_join(
            F.transform(
                toks,
                lambda t, i: F.when(
                    i % 3 == 0, F.concat(t, F.lit("q"), salt)
                ).otherwise(t),
            ),
            " ",
        )
        (
            d.select("*", k)
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("k").cast("long") * F.lit(10**9),
            )
            .withColumn("text", salted)
            .drop("k")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/documents.parquet")
        )
        with open(f"{out}/_READY", "w") as fh:
            fh.write("ok")
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    leg = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    if leg.startswith("spanwin_"):
        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import curation as C

        pf = leg.split("_", 1)[1]
        wdir = ensure_docs_bloomwin(spark, scale)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{wdir}/documents.parquet"
        )
        docs.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        C.remove_repeated_spans(docs, prefilter=pf).write.format(
            "noop"
        ).mode("overwrite").save()
        print(
            f"spanwin prefilter={pf} x{scale}: "
            f"{time.monotonic() - t0:.2f} s",
            flush=True,
        )
        if pf == "auto":
            print(f"auto picked: {C.LAST_SPAN_PREFILTER}", flush=True)
        return

    if leg == "ivfpq_serve":
        # the serving loop at the embeddings ×1000 decade (500 k × 64):
        # base index from the first 50 k vectors, the remaining 450 k
        # stream-ingest in 10 micro-batches through ivfpq_ingest_sink,
        # then the probe
        # serves 1 000 queries off the stream-maintained layout and a
        # FULL REBUILD over the union corpus must return bit-identical
        # top-k — the freshness contract, proven at a decade.
        import shutil

        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import similarity as S
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
        head = 50_000
        cells = 64  # the r8 x1000 ivfpq leg geometry — the assign is
        # 64-dim interpreted dots x cells x vecs, the leg's dominant
        # term (a 256-cell first cut paced ~2.5 min/45 k-vec batch:
        # 4x the work, and one staging file per trigger capped the
        # assign at 8 tasks)
        work = "/tmp/spark_graft_scale/ivfpq_serve_leg"
        shutil.rmtree(work, ignore_errors=True)
        t0 = time.monotonic()
        S.ivfpq_index_write(
            emb.filter(F.col("vec_id") < head), f"{work}/live",
            n_cells=cells, dims=64, m=8, n_codes=16,
        )
        print(f"base index ({head} vecs): {time.monotonic()-t0:.1f} s",
              flush=True)
        (
            emb.filter(F.col("vec_id") >= head)
            .repartition(80)
            .write.parquet(f"{work}/staging")
        )
        s = (
            spark.readStream.schema(SCHEMAS["embeddings"])
            .option("maxFilesPerTrigger", 8)
            .parquet(f"{work}/staging")
        )
        t0 = time.monotonic()
        q = ivfpq_ingest_sink(s, f"{work}/live", checkpoint=f"{work}/ckpt")
        q.processAllAvailable()
        wall = time.monotonic() - t0
        fed = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        q.stop()
        print(
            f"stream ingest {n - head} vecs in {fed} batches: "
            f"{wall:.1f} s, {(n - head) / wall / 1e3:.1f} k vecs/s",
            flush=True,
        )
        queries = emb.filter(F.col("vec_id") % 2000 == 0)  # ~1 000 queries
        t0 = time.monotonic()
        # nprobe=4 on 64 cells — the r8-proven probe shape; a 32-probe
        # first cut multiplied the candidate join ~8x and spilled the
        # box's 64 GB of free disk on the 2 M-vector corpus
        live = S.ivfpq_index_topk(
            spark, f"{work}/live", queries, nprobe=4, k=3
        ).collect()
        print(f"probe 1000 queries off served layout: "
              f"{time.monotonic()-t0:.1f} s, {len(live)} rows", flush=True)
        t0 = time.monotonic()
        S.ivfpq_index_write(
            emb, f"{work}/full", n_cells=cells, dims=64, m=8, n_codes=16
        )
        full = S.ivfpq_index_topk(
            spark, f"{work}/full", queries, nprobe=4, k=3
        ).collect()
        print(f"full rebuild + probe: {time.monotonic()-t0:.1f} s",
              flush=True)
        match = sorted(map(tuple, live)) == sorted(map(tuple, full))
        print(f"stream-served == full rebuild: {match}", flush=True)
        assert match
        return

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
