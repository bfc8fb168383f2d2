"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: median_sec, ...}, "sf": <sf>}

Since round 9 the DuckDB side-by-side is ON BY DEFAULT (disable with
SPARK_GRAFT_BENCH_DUCKDB=0): each query's oracle SQL is timed on the
same parquet (warm, median of 3, temp-table materialization = the
noop-sink analog) and the line carries per-query "duckdb" and "ratio"
plus "ratio_total" — the r8 verdict's fix for box drift: seven
same-session r8 runs spanned +-25% absolute on identical code, while
the same-box Spark/DuckDB ratio stayed inside 0.82-1.12 across five
rounds. The ratio is the load-invariant gate; the absolute stays for
trend.

The line also carries "job_floor_sec" (median noop-sink of a 1-row
DataFrame — Spark's fixed per-action scheduling cost on this box) and
"floor_bound" (queries finishing under 4x that floor). A floor-bound
query's ratio measures job-launch overhead, not plan quality — at
sf0.1 that is most of the suite, which is exactly why SCALEBENCH runs
x100/x1000; read floor-bound rows there, not here. Since round 10
"ratio_informative" carries ONLY the ratios of rows >= 4x the floor —
the one dict the per-round perf gate (and weak-set adjudication)
reads, so floor-bound rows never need re-arguing.

Query set mirrors BASELINE.md §2 (the locally-measurable baseline):
filter+project, tumbling agg, stream-table join, windowed self-join,
TPC-H Q1, top-k, CEP pattern, plus the LLM-pipeline headliners
(minhash LSH dedup, brute-force cosine top-k). Median of 3 timed runs
after 1 warmup (warm JVM + parquet footer cache — what a resident
service would see).

Scale-proof mode (SCALEBENCH.md): at sf0.1 most queries finish under
Spark's ~0.12 s/action local job floor, so per-query ratios vs DuckDB
measure JVM launch overhead, not plan quality. Set

  SPARK_GRAFT_BENCH_SCALE=10      # synthesize events/lineitem/
                                  # embeddings at 10x into /tmp and
                                  # bench there (other tables symlink)
  SPARK_GRAFT_BENCH_DUCKDB=1      # also time each query's DuckDB
                                  # oracle SQL on the SAME data
                                  # (warm, median of 3, temp-table
                                  # materialization = noop-sink analog)

and the JSON line gains the "scale" field. Replica
synthesis offsets user_id by (max_user+1) per copy — key cardinality
grows with data (horizontal scaling, the 100 TB direction), join
fan-out per key stays constant.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1"))
WITH_DUCKDB = os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") == "1"
SCALE_BASE = os.environ.get(
    "SPARK_GRAFT_BENCH_SCALE_DIR", "/tmp/spark_graft_scale"
)

BENCH_QUERIES = [
    "filter_project",
    "window_timebatch",
    "join_stream_table",
    "join_windowed_self",
    "tpch_q1",
    "window_sort_topk",
    "pattern_followed_by",
    "window_session",
    "incr_agg_day",
    "incr_agg_day_retrieval",
    "dedup_minhash_lsh",
    "similarity_bruteforce",
]

_FULL_BENCH_QUERIES = tuple(BENCH_QUERIES)

# SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to a subset of
# BENCH_QUERIES — the ×10000 leg (SCALEBENCH r12) scales EVENTS alone
# to 1 B rows (lineitem ×10000 = 6 B rows does not fit the box) and
# benches only the events-backed queries there. A typo'd name raises
# rather than silently benching nothing.
_only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
if _only:
    _sel = [s.strip() for s in _only.split(",") if s.strip()]
    _bad = [n for n in _sel if n not in BENCH_QUERIES]
    if _bad:
        raise ValueError(f"SPARK_GRAFT_BENCH_ONLY not in BENCH_QUERIES: {_bad}")
    BENCH_QUERIES = [n for n in BENCH_QUERIES if n in _sel]

N_RUNS = 3

# SPARK_GRAFT_BENCH_SCALE_TABLES=events limits which fact tables the
# ×N replica build materializes (the rest symlink to SF_DIR unscaled —
# only valid together with SPARK_GRAFT_BENCH_ONLY restricted to queries
# that touch the scaled facts). The scaled dir name carries the subset
# so a partial build can never be mistaken for the full one.
_SCALED_TABLES = tuple(
    s.strip()
    for s in os.environ.get(
        "SPARK_GRAFT_BENCH_SCALE_TABLES", "events,lineitem,embeddings"
    ).split(",")
    if s.strip()
)
_unknown_scaled = [
    t for t in _SCALED_TABLES if t not in ("events", "lineitem", "embeddings")
]
if _unknown_scaled:
    raise ValueError(f"SPARK_GRAFT_BENCH_SCALE_TABLES unknown: {_unknown_scaled}")

# Which fact tables each bench query reads (dims are always symlinked
# and irrelevant to scale).  Enforcement (ADVICE r12): with a PROPER
# subset of facts scaled, the other facts symlink to SF_DIR unscaled,
# so a query over them would run at ×1 while the output JSON records
# "scale": N — a silently wrong benchmark row.  That combination now
# requires SPARK_GRAFT_BENCH_ONLY and raises if any selected query
# touches an unscaled fact.  `documents` is never scalable by this
# builder, so its queries are only valid in a full-set build (where
# the output tags them with their true effective scale, below).
_QUERY_FACTS = {
    "filter_project": {"events"},
    "window_timebatch": {"events"},
    "join_stream_table": {"events"},
    "join_windowed_self": {"events"},
    "tpch_q1": {"lineitem"},
    "window_sort_topk": {"events"},
    "pattern_followed_by": {"events"},
    "window_session": {"events"},
    "incr_agg_day": {"events"},
    "incr_agg_day_retrieval": {"events"},
    "dedup_minhash_lsh": {"documents"},
    "similarity_bruteforce": {"embeddings"},
}
# Contract (ADVICE r13): _QUERY_FACTS is only consulted when SCALE > 1,
# so a query added to BENCH_QUERIES without a facts entry would pass
# every ×1 run and die with a bare KeyError at the first scaled run.
# Checked at import time against the FULL list (before the _only
# filter) — must survive `python -O`, so no bare assert.
_missing_facts = sorted(set(_FULL_BENCH_QUERIES) - set(_QUERY_FACTS))
_extra_facts = sorted(set(_QUERY_FACTS) - set(_FULL_BENCH_QUERIES))
if _missing_facts or _extra_facts:
    raise RuntimeError(
        f"_QUERY_FACTS out of sync with BENCH_QUERIES: "
        f"missing={_missing_facts} extra={_extra_facts}"
    )

if SCALE > 1 and set(_SCALED_TABLES) != {"events", "lineitem", "embeddings"}:
    if not _only:
        raise ValueError(
            "SPARK_GRAFT_BENCH_SCALE_TABLES is a subset: set "
            "SPARK_GRAFT_BENCH_ONLY to the queries that touch the "
            "scaled facts"
        )
    _mis = [
        n
        for n in BENCH_QUERIES
        if not _QUERY_FACTS[n] <= set(_SCALED_TABLES)
    ]
    if _mis:
        raise ValueError(
            f"queries {_mis} touch facts outside "
            f"SPARK_GRAFT_BENCH_SCALE_TABLES={','.join(_SCALED_TABLES)} — "
            "they would run at x1 under a x"
            f"{SCALE} label"
        )


def ensure_scaled(spark, scale: int) -> str:
    """Synthesize the scaled dir once (idempotent): fact tables
    replicated ``scale``× with shifted keys, dims symlinked."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import SCHEMAS, TABLES, load

    suffix = (
        ""
        if set(_SCALED_TABLES) == {"events", "lineitem", "embeddings"}
        else "_" + "-".join(_SCALED_TABLES)
    )
    out = f"{SCALE_BASE}/x{scale}{suffix}"
    if os.path.exists(f"{out}/_READY"):
        return out
    os.makedirs(out, exist_ok=True)
    k = F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("k")
    kl = F.col("k").cast("long")

    # catalog.load normalizes ts to TimestampType regardless of the
    # fixture's physical vintage, so the scaled copy is always native.
    # No repartition AFTER the explode (r12): the pre-explode
    # round-robin already balances the 32 output tasks, and a
    # post-explode repartition is a full shuffle of the REPLICATED
    # rows — ~30 GB of shuffle spill at events ×10000 for an
    # identically-shaped layout.
    if "events" in _SCALED_TABLES:
        ev = load(spark, SF_DIR, "events")
        umax = int(ev.agg(F.max("user_id")).first()[0]) + 1
        (
            # repartition BEFORE the explode: the fixture is one file, so
            # without this the xN row production serializes in one task
            # (measured: the x1000 build sat in a single task for minutes)
            ev.repartition(32).select("*", k)
            .withColumn("event_id", F.col("event_id") + kl * F.lit(10**12))
            .withColumn("user_id", F.col("user_id") + kl * F.lit(umax))
            .drop("k")
            .write.mode("overwrite")
            .parquet(f"{out}/events.parquet")
        )
    if "lineitem" in _SCALED_TABLES:
        li = spark.read.schema(SCHEMAS["lineitem"]).parquet(
            f"{SF_DIR}/lineitem.parquet"
        )
        (
            li.repartition(32).select("*", k)
            .withColumn("l_orderkey", F.col("l_orderkey") + kl * F.lit(10**10))
            .drop("k")
            .write.mode("overwrite")
            .parquet(f"{out}/lineitem.parquet")
        )
    if "embeddings" in _SCALED_TABLES:
        em = spark.read.schema(SCHEMAS["embeddings"]).parquet(
            f"{SF_DIR}/embeddings.parquet"
        )
        (
            em.repartition(8).select("*", k)
            .withColumn("vec_id", F.col("vec_id") + kl * F.lit(10**9))
            .drop("k")
            .write.mode("overwrite")
            .parquet(f"{out}/embeddings.parquet")
        )
    for t in TABLES:
        if t not in _SCALED_TABLES:
            dst = f"{out}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{SF_DIR}/{t}.parquet", dst)
    with open(f"{out}/_READY", "w") as f:
        f.write("ok")
    return out


def warm_page_cache(spark, sf_dir: str) -> None:
    """Scale-mode warm-up (SCALEBENCH r7 lesson): the multi-GB scaled
    fixtures fall out of the OS page cache whenever another fixture
    build runs on the box, and the per-query warm-up run then pays the
    whole corpus cold-read INSIDE the suite — r7's `window_session`
    'regression' was a [75, 49, 11, 10] s cold-read ramp that took a
    session of forensics to isolate. One untimed full scan of each
    scaled fact table before the query loop brings the bytes resident,
    so back-to-back suite runs agree within noise and both engines
    (Spark and the DuckDB side-by-side) start from the same warm
    state. A noop-sink write reads every column's pages; a bare
    count() would serve from parquet row-group metadata and warm
    nothing."""
    for t in _SCALED_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()


def duckdb_views(con, sf_dir: str) -> None:
    from siddhi_operator_spark.catalog import TABLES

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table = part-file dir
            path = f"{path}/*.parquet"
        # the scaled copy is written through catalog.load, so events ts
        # is always a native parquet timestamp — one view shape for all
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'"
        )


def main() -> None:
    from siddhi_operator_spark.session import build_session
    from siddhi_operator_spark.suite import REGISTRY

    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Input-split sizing is env-tunable (SCALEBENCH.md measured both):
    # smaller splits put every core on the scan, but in single-JVM
    # local mode the extra tasks cost more in scheduling than the
    # parallelism returns (memory bandwidth is shared either way), so
    # the 128 MB cluster default stays unless overridden.
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if mpb:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", "1m")

    sf_dir = SF_DIR
    if SCALE > 1:
        sf_dir = ensure_scaled(spark, SCALE)
        warm_page_cache(spark, sf_dir)

    con = None
    if WITH_DUCKDB:
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads = {os.cpu_count() or 32}")
        duckdb_views(con, sf_dir)

    # the job floor: what ONE trivial action costs on this box/session
    # — the denominator that tells a reader which per-query ratios are
    # scheduling overhead rather than plan quality
    floor_df = spark.range(1)
    floor_df.write.format("noop").mode("overwrite").save()
    floor_times = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        floor_df.write.format("noop").mode("overwrite").save()
        floor_times.append(time.perf_counter() - t0)
    job_floor = round(statistics.median(floor_times), 4)

    results: dict[str, float] = {}
    duck: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        # Build the DataFrame once and re-execute it for the timed
        # runs: a resident engine analyzes a continuous query's plan
        # once and runs it forever — per-run Python plan reconstruction
        # is driver overhead, not query cost. Each .save() is still a
        # full optimize+execute cycle over the data.
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm caches
        times = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 4)

        if con is not None and REGISTRY[name].oracle:
            sql = REGISTRY[name].oracle
            con.execute(f"CREATE OR REPLACE TEMP TABLE __bench AS {sql}")
            dtimes = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                con.execute(f"CREATE OR REPLACE TEMP TABLE __bench AS {sql}")
                dtimes.append(time.perf_counter() - t0)
            duck[name] = round(statistics.median(dtimes), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "suite_median_wall_sec_total",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "sf": sf_val,
    }
    out["job_floor_sec"] = job_floor
    # a query under 4x the floor is dominated by fixed per-action cost:
    # its ratio is not actionable at this size (see module docstring)
    out["floor_bound"] = [
        n for n in BENCH_QUERIES if results[n] <= 4 * job_floor
    ]
    if SCALE > 1:
        out["scale"] = SCALE
        # per-query truth: a query whose facts aren't all in the
        # scaled set ran at base scale (e.g. documents is never
        # replicated by ensure_scaled) — tag it so no row can read as
        # ×N when its input wasn't (ADVICE r12)
        eff = {
            n: (SCALE if _QUERY_FACTS[n] <= set(_SCALED_TABLES) else 1)
            for n in BENCH_QUERIES
        }
        if any(v != SCALE for v in eff.values()):
            out["query_effective_scale"] = eff
    if duck:
        out["duckdb"] = duck
        out["ratio"] = {
            n: round(results[n] / duck[n], 2) for n in duck if duck[n] > 0
        }
        dtot = sum(duck.values())
        if dtot > 0:
            out["ratio_total"] = round(sum(results.values()) / dtot, 3)
        # the adjudicated per-query gate (r9 verdict ask #6): ratios
        # ONLY for rows whose absolute is >= 4x the job floor — the
        # floor-bound rows' "ratios" measure Spark's multi-stage
        # scheduling minimum on sub-second queries, not plan quality,
        # and re-arguing them each round was manual work this field
        # retires. Weak-set membership reads off this dict directly.
        out["ratio_informative"] = {
            n: out["ratio"][n]
            for n in out["ratio"]
            if results[n] > 4 * job_floor
        }
        # THE sf-gate number (r11, closing r10 "what's wrong" #1):
        # r9's bar was on ratio_total, whose numerator carries ~1 s of
        # Spark job-floor cost on rows DuckDB finishes in ~5 ms — so a
        # single DuckDB-side -11% wobble on the one heavy row
        # (dedup_minhash_lsh, 55% of both totals) breached the round
        # without any Spark regression (r10 measured 1.206 vs the 1.15
        # bar while 8 of 12 Spark rows got FASTER). The gate is now
        # the informative-basis total — floor-bound rows excluded from
        # BOTH sums (r10 restated: 0.95-1.02 across the wobble that
        # broke the old metric). Bar in BASELINE.md §2: <= 1.15 at
        # sf0.1, alongside the decade ratios in SCALEBENCH.md (the
        # load-invariant signal; x100 <= 1.05, x1000 <= 0.85).
        inf = list(out["ratio_informative"])
        dinf = sum(duck[n] for n in inf)
        if dinf > 0:
            out["gate_ratio_informative_total"] = round(
                sum(results[n] for n in inf) / dinf, 3
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
