"""r16 OPT — connected-components round fusion A/B (verdict item 3).

Arms, interleaved in one process, labels asserted identical per rep
(count + xxhash64-sum fingerprint over (node, component)):

  old    r15 star loop: TWO materializations per round (large_star
         checkpointed, then small_star checkpointed)
  new    shipped r16 loop: ONE materialization per round (large_star
         left lazy; its two consumers share the same src-partitioned
         exchange via ReusedExchange)

Measures the loop alone (materialized strong-pair input) and the full
registry row (dedup_connected_components) cold-shape.

Usage: python tools/r16_cc_ab.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = "/root/testdata/sf0.1"


def cc_star_old(edges, _materialize, max_iter=25):
    """The r15 formulation: large_star materialized every round."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    all_nodes = edges.select(F.col("src").alias("node")).distinct()

    def large_star(sym):
        mins = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
        m = F.least(F.col("src"), F.col("_mn"))
        return (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), m.alias("dst"))
            .distinct()
        )

    def small_star(directed):
        mins = directed.groupBy("src").agg(F.min("dst").alias("_mn"))
        m = F.least(F.col("src"), F.col("_mn"))
        hang = directed.join(mins, "src").select(
            F.col("dst").alias("src"), m.alias("dst")
        )
        self_edge = mins.select("src", F.least(F.col("src"), F.col("_mn")).alias("dst"))
        return hang.union(self_edge).filter(F.col("src") != F.col("dst")).distinct()

    cur = edges
    prev_fp = None
    for it in range(max_iter):
        directed = _materialize(large_star(cur))
        obs = Observation(f"cc_fp_old_{it}_{time.monotonic_ns()}")
        stars = _materialize(
            small_star(directed).observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
            )
        )
        fp = (obs.get["n"], obs.get["h"])
        if fp == prev_fp:
            labels = stars.groupBy("src").agg(F.min("dst").alias("component"))
            return _materialize(
                all_nodes.join(labels, all_nodes["node"] == labels["src"], "left")
                .select(
                    "node",
                    F.coalesce(F.col("component"), F.col("node")).alias("component"),
                )
            )
        prev_fp = fp
        cur = stars.union(
            stars.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    raise RuntimeError("no converge")


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.session import build_session

    spark = build_session("r16-cc-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()

    def strong():
        sigs = D.minhash_signature(docs, n_hashes=32, impl="arrow")
        return D.lsh_candidate_pairs(
            sigs, n_hashes=32, band_size=8, max_bucket=None, min_match=30
        )

    def _fp(labels):
        r = labels.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r.n, r.h)

    def _mat(df):
        return df.localCheckpoint(eager=True)

    # loop-only arms over a PRE-materialized symmetric edge frame
    base = _mat(strong().select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    sym = base.union(base.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    fps = {}
    times = {"old": [], "new": []}
    for rep in range(REPS):
        for name in ("old", "new"):
            spark.sparkContext.setJobDescription(f"cc16 {name} rep{rep}")
            t0 = time.monotonic()
            if name == "old":
                labels = cc_star_old(sym, _mat)
            else:
                labels = D._cc_star(sym, _mat, 25)
            fp = _fp(labels)
            times[name].append(time.monotonic() - t0)
            print(f"rep{rep} {name}: {times[name][-1]:.2f}  fp={fp}")
            fps.setdefault(name, fp)
            assert fps[name] == fp
    assert fps["old"] == fps["new"], f"LABEL MISMATCH {fps}"
    for n, ts in times.items():
        print(f"LOOP MEDIAN {n}: {statistics.median(ts):.2f}  {[round(x,2) for x in ts]}")

    # full registry-row shape (cold plan each time, shared session)
    from siddhi_operator_spark.suite.registry import REGISTRY

    row = REGISTRY["dedup_connected_components"]
    for rep in range(2):
        t0 = time.monotonic()
        row.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        print(f"full row rep{rep}: {time.monotonic() - t0:.2f}")


if __name__ == "__main__":
    main()
