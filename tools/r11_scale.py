"""Round-11 decade checks, one leg per process (the r8 A/B lesson:
in-process sequential legs inherit JVM/cache state and fake wins —
ONE FRESH PROCESS PER LEG, warm pass inside).

Legs:
  ivfpq_serve_compact   r10's ivfpq_serve leg with count-triggered
                        compaction armed (max_fragments_per_cell=4 on
                        the ingest sink): base index from 50 k of the
                        ×1000 embeddings (2 M × 64-dim), the rest
                        stream-ingested, probe 1 000 queries off the
                        COMPACTED served layout, then full rebuild +
                        probe — bit-identity asserted, and the
                        served-layout probe wall is the number r10
                        measured at 550.9 s vs 373.1 s rebuilt
                        (fragmentation tax). Same in-process ordering
                        as r10 (served probe FIRST, rebuild second —
                        the rebuild gets the warmer cache, so a
                        served ≤ rebuilt reading is conservative).
                        Leaves its work dir for ivfpq_probe_guard.
  ivfpq_probe_guard     the r11 candidate-join guard at the decade:
                        the 4 000-query × nprobe=4 probe of the 2 M
                        index estimates 4e9 candidate rows → REFUSED
                        (the un-guarded r10 first cut of this family
                        spilled 64 GB); then ivfpq_index_topk_chunked
                        completes the same shape in derived chunks.
                        Run AFTER ivfpq_serve_compact (reuses its
                        compacted layout).
  akslack_bucketed_derived
                        the bucketed akslack with the r11
                        cardinality-derived bucket count
                        (derive_state_buckets: ~1.5 k keys/bucket) on
                        the events ×1000 fixture (100 M events,
                        1.5 M keys) — r10 measured 0.717 M events/s
                        at the fixed 128 (12 k keys/bucket) vs
                        1.137 M events/s at ×100's 1.2 k keys/bucket;
                        the derived geometry should recover the flat
                        regime.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r11_scale.py <leg> [scale]
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

SERVE_WORK = "/tmp/spark_graft_scale/ivfpq_serve_compact_leg"


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    leg = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    if leg == "ivfpq_serve_compact":
        import shutil

        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import similarity as S
        from siddhi_operator_spark.pipeline.similarity import (
            _cell_fragments,
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
        head = 50_000
        cells = 64  # r10 leg geometry (256 cells 4×'d the assign work)
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
        s = (
            spark.readStream.schema(SCHEMAS["embeddings"])
            .option("maxFilesPerTrigger", 8)
            .parquet(f"{SERVE_WORK}/staging")
        )
        t0 = time.monotonic()
        q = ivfpq_ingest_sink(
            s, f"{SERVE_WORK}/live", checkpoint=f"{SERVE_WORK}/ckpt",
            max_fragments_per_cell=4,
        )
        q.processAllAvailable()
        wall = time.monotonic() - t0
        fed = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        q.stop()
        frags = _cell_fragments(spark, f"{SERVE_WORK}/live")
        print(
            f"stream ingest {n - head} vecs in {fed} batches "
            f"(compaction armed at 4): {wall:.1f} s, "
            f"{(n - head) / wall / 1e3:.1f} k vecs/s; "
            f"fragments/cell max={max(frags.values())} "
            f"total={sum(frags.values())}",
            flush=True,
        )
        queries = emb.filter(F.col("vec_id") % 2000 == 0)  # ~1 000
        t0 = time.monotonic()
        live = S.ivfpq_index_topk(
            spark, f"{SERVE_WORK}/live", queries, nprobe=4, k=3
        ).collect()
        print(f"probe 1000 queries off COMPACTED served layout: "
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
        print(f"compacted-served == full rebuild: {match}", flush=True)
        if not match:
            raise SystemExit("bit-identity violated")
        return

    if leg == "ivfpq_probe_ab":
        # probe-only walls on the COMPACTED-served vs REBUILT layouts
        # (the serve_compact leg lumps rebuild+probe into one number —
        # this isolates the layout effect): alternate orders, 2 reps
        # each, same 1 000 queries, same process.
        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import similarity as S
        from tools.scalebench_pipeline import ensure_embeddings

        edir = ensure_embeddings(spark, scale)
        emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{edir}/embeddings.parquet"
        )
        if not os.path.exists(f"{SERVE_WORK}/full"):
            raise SystemExit("run ivfpq_serve_compact first")
        queries = emb.filter(F.col("vec_id") % 2000 == 0)
        for rep, name in enumerate(
            ("compacted", "rebuilt", "rebuilt", "compacted")
        ):
            sub = "live" if name == "compacted" else "full"
            t0 = time.monotonic()
            n_rows = len(
                S.ivfpq_index_topk(
                    spark, f"{SERVE_WORK}/{sub}", queries, nprobe=4, k=3
                ).collect()
            )
            print(
                f"probe[{rep}] {name}: {time.monotonic()-t0:.1f} s "
                f"({n_rows} rows)",
                flush=True,
            )
        return

    if leg == "ivfpq_probe_wide_ab":
        # the r11 WIDE probe (pivot-to-one-row-per-vector, static
        # cell-list pruning, codegen ADC sum — no 1e9-row groupBy) vs
        # the long path, on the compacted served layout: alternate
        # orders, 2 reps each.
        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import similarity as S
        from tools.scalebench_pipeline import ensure_embeddings

        edir = ensure_embeddings(spark, scale)
        emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{edir}/embeddings.parquet"
        )
        if not os.path.exists(f"{SERVE_WORK}/live"):
            raise SystemExit("run ivfpq_serve_compact first")
        queries = emb.filter(F.col("vec_id") % 2000 == 0)
        rows = {}
        for rep, name in enumerate(("wide", "long", "long", "wide")):
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
            rows[name] = got
            print(
                f"probe[{rep}] {name}: {time.monotonic()-t0:.1f} s "
                f"({len(got)} rows)",
                flush=True,
            )
        print(f"wide == long: {rows['wide'] == rows['long']}", flush=True)
        if rows["wide"] != rows["long"]:
            raise SystemExit("bit-identity violated")
        return

    if leg == "ivfpq_probe_guard":
        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import similarity as S
        from tools.scalebench_pipeline import ensure_embeddings

        edir = ensure_embeddings(spark, scale)
        emb = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{edir}/embeddings.parquet"
        )
        if not os.path.exists(f"{SERVE_WORK}/live"):
            raise SystemExit("run ivfpq_serve_compact first")
        queries = emb.filter(F.col("vec_id") % 500 == 0)  # ~4 000
        nq = queries.count()
        try:
            S.ivfpq_index_topk(
                spark, f"{SERVE_WORK}/live", queries, nprobe=4, k=3
            )
            raise SystemExit("guard did NOT refuse the 4k-query shape")
        except ValueError as e:
            print(f"guard refused ({nq} queries × nprobe=4): {e}",
                  flush=True)
        t0 = time.monotonic()
        out = S.ivfpq_index_topk_chunked(
            spark, f"{SERVE_WORK}/live", queries,
            f"{SERVE_WORK}/guard_out", nprobe=4, k=3,
        )
        rows = out.count()
        print(
            f"chunked alternative ({nq} queries): "
            f"{time.monotonic()-t0:.1f} s, {rows} result rows",
            flush=True,
        )
        return

    if leg == "bloom27":
        # ADVICE r10: the span auto-router may derive bits_log2 up to
        # 27, where bloom_probe's densified filter is one 2^21-slot /
        # 16 MB array row built by a collect_list reduction and
        # broadcast to every task — verify that densify+broadcast
        # path at a decade-sized probe stream (docs ×100 winnow
        # grams) against the 2^20 default. Warm pass then 2 timed
        # reps per size, alternating.
        from siddhi_operator_spark.catalog import SCHEMAS
        from siddhi_operator_spark.pipeline import curation as C
        from tools.scalebench_pipeline import ensure_docs

        ddir = ensure_docs(spark, scale)
        docs = spark.read.schema(SCHEMAS["documents"]).parquet(
            f"{ddir}/documents.parquet"
        )
        docs.write.format("noop").mode("overwrite").save()  # warm
        fps = C.winnow_positions(docs).select(
            "doc_id", F.col("fp").alias("gram")  # binary probes fine
        )
        n = fps.count()
        keys = (
            fps.filter(F.col("doc_id") % 7 == 0)
            .select("gram")
            .distinct()
        )
        nk = keys.count()
        print(f"probe stream={n} rows, bloom keys={nk}", flush=True)
        for rep, bits in enumerate((27, 20, 20, 27)):
            bloom = C.bloom_build(keys, "gram", k=4, bits_log2=bits)
            t0 = time.monotonic()
            hits = C.bloom_probe(
                fps, bloom, "gram", keys=("doc_id",), k=4, bits_log2=bits
            ).count()
            print(
                f"probe[{rep}] bits={bits}: {time.monotonic()-t0:.1f} s "
                f"({hits} hits)",
                flush=True,
            )
        return

    from bench import ensure_scaled  # fixture cache shared with bench.py

    sdir = ensure_scaled(spark, scale)
    ev = spark.read.parquet(f"{sdir}/events.parquet")
    ev.write.format("noop").mode("overwrite").save()  # warm page cache
    n = ev.count()
    keys = ev.select("user_id").distinct().count()
    print(f"events={n} keys={keys} x{scale}", flush=True)

    if leg == "akslack_bucketed_derived":
        from siddhi_operator_spark.streaming.reorder import (
            akslack_bucketed,
            derive_state_buckets,
        )

        buckets = derive_state_buckets(keys)
        print(f"derived n_buckets={buckets} "
              f"(~{keys // buckets} keys/bucket)", flush=True)
        s = (
            spark.readStream.schema(ev.schema)
            .parquet(f"{sdir}/events.parquet")
            .select("event_id", "user_id", F.expr(JITTER).alias("ts"))
        )
        out = akslack_bucketed(
            s, ts="ts", key="user_id", q_pct=90, approx_keys=keys
        )
        t0 = time.monotonic()
        q = out.writeStream.format("noop").start()
        q.processAllAvailable()
        wall = time.monotonic() - t0
        q.stop()
        print(
            f"akslack bucketed(derived {buckets}) x{scale}: {wall:.2f} s, "
            f"{n / wall / 1e6:.3f} M events/s",
            flush=True,
        )
        return

    raise SystemExit(f"unknown leg {leg!r}")


if __name__ == "__main__":
    main()
