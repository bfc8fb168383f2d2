"""Round-15 follow-on — attribute `dedup_minhash_lsh`'s wall.

The fresh ×100 rep this session read the suite gate at 1.033 with
`dedup_minhash_lsh` carrying 3.57 s of the 8.65 s Spark total (41 %)
— and `documents` is NOT among the ×100-scaled facts, so this row is
byte-identical at sf0.1 and ×100: any win lands on BOTH gates.  r9's
micro-experiments established "band self-join + pair DISTINCT
shuffles dominate" for the CATALYST signature tier; the bench row has
since moved to the ARROW kernel and `max_bucket=None`, so the
attribution is re-measured here before touching anything
(measurement-protocol rule: profile before trusting a carried
hypothesis — the r15 session lever was found only after the carried
"WindowExec throughput" hypothesis was falsified).

Leg (one fresh process):

  profile [sf_dir]   nested prefixes: cached-signature materialize →
                     band explode → bucket self-join → pair distinct
                     → full scored pipeline; medians of 3,
                     interleaved, cache cycled per rep for the
                     signature arm.

Usage: python tools/r15_minhash.py profile [/root/testdata/sf0.1]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def profile(sf_dir: str = SF_DIR) -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark import pipeline as P  # noqa: F401
    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()  # warm page cache

    n_hashes, band_size = 32, 8
    sig_cols = [F.col(f"sig_{i}") for i in range(n_hashes)]

    def sig_table():
        return D.minhash_signature(docs, n_hashes=n_hashes, impl="arrow").select(
            F.col("doc_id"), *sig_cols
        )

    def run_rep() -> dict[str, float]:
        """One full nested-prefix pass; the signature cache is built
        fresh (timed) and reused by the later prefixes, exactly as
        `lsh_candidate_pairs(cache=True)` does in production."""
        t: dict[str, float] = {}
        st = sig_table().cache()
        t["sigs_cached"] = _noop(st)
        banded = D.band_table(st, n_hashes=n_hashes, band_size=band_size)
        t["banded"] = _noop(banded)
        pairs_raw = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_hash") == F.col("b.band_hash"),
                    F.col("a.doc_id") < F.col("b.doc_id"),
                ],
            )
            .select(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
        )
        t["pairs_raw"] = _noop(pairs_raw)
        t["pairs_distinct"] = _noop(pairs_raw.distinct())
        full = D.lsh_candidate_pairs(
            D.minhash_signature(docs, n_hashes=n_hashes, impl="arrow"),
            n_hashes=n_hashes,
            band_size=band_size,
            max_bucket=None,
            cache=False,  # st above is already cached; avoid double-cache
        )
        t["full_fresh"] = _noop(full)
        st.unpersist()
        return t

    reps = [run_rep() for _ in range(3)]
    names = list(reps[0])
    meds = {n: statistics.median(r[n] for r in reps) for n in names}
    for n in names:
        print(f"{n:15s} median {meds[n]:6.2f}s  reps "
              f"{[round(r[n], 2) for r in reps]}", flush=True)
    # pair-volume facts for the ledger
    st = sig_table().cache()
    banded = D.band_table(st, n_hashes=n_hashes, band_size=band_size)
    bcount = banded.count()
    bstats = (
        banded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs_pre"),
        )
        .first()
    )
    print(
        f"banded rows={bcount} buckets={bstats['buckets']} "
        f"max_bucket={bstats['max_bucket']} "
        f"raw pairs={int(bstats['pairs_pre'])}",
        flush=True,
    )
    st.unpersist()


def owner_band_ab(sf_dir: str = SF_DIR) -> None:
    """Pair-DISTINCT formulation (pre-r15) vs owner-band dedup
    (shipped): full `dedup_minhash_lsh` row, alternating o,n,n,o,o,n
    in one fresh process, medians of 3.  Row-identity is asserted
    separately (tests + the inline sorted-collect check this session:
    identical at sf0.01 and sf0.1, 2 904 768 pairs)."""
    import statistics as st

    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()

    def new_arm():
        sigs = D.minhash_signature(docs, n_hashes=32, impl="arrow")
        return D.lsh_candidate_pairs(
            sigs, n_hashes=32, band_size=8, max_bucket=None, cache=True
        )

    def old_arm():
        sigs = D.minhash_signature(docs, n_hashes=32, impl="arrow")
        stbl = sigs.select("doc_id", *[f"sig_{i}" for i in range(32)]).cache()
        banded = D.band_table(stbl, n_hashes=32, band_size=8)
        pairs = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_hash") == F.col("b.band_hash"),
                    F.col("a.doc_id") < F.col("b.doc_id"),
                ],
            )
            .select(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
            .distinct()
        )
        nm = sum(
            F.when(F.col(f"sa.sig_{i}") == F.col(f"sb.sig_{i}"), 1).otherwise(0)
            for i in range(32)
        )
        return (
            pairs.join(stbl.alias("sa"), F.col("id_a") == F.col("sa.doc_id"))
            .join(stbl.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
            .select("id_a", "id_b", nm.alias("n_sig_match"))
            .withColumn("jaccard_est", F.col("n_sig_match") / F.lit(32.0))
        )

    walls: dict[str, list[float]] = {"old": [], "new": []}
    for tag in ("old", "new", "new", "old", "old", "new"):
        walls[tag].append(_noop(old_arm() if tag == "old" else new_arm()))
        spark.catalog.clearCache()
        print(f"{tag}[{len(walls[tag])-1}]: {walls[tag][-1]:.2f}s", flush=True)
    mo, mn = st.median(walls["old"]), st.median(walls["new"])
    print(f"medians: old={mo:.2f}s new={mn:.2f}s new/old={mn/mo:.3f}", flush=True)


def build_docs_scale(n: int, out_dir: str) -> None:
    """Docs ×n replica fixture for the owner-band decade check.

    The bench's events/lineitem replicator can't be reused for docs:
    byte-identical replicas COLLIDE in every LSH band, so the
    degenerate buckets merge across replicas and the uncapped pair
    count grows QUADRATICALLY in n — that benches the pathology the
    `max_bucket` cap exists for, not the formulation under test.
    Instead each replica prefixes EVERY word with a replica tag:
    within-replica duplicate structure is preserved exactly
    (identical docs stay identical, near-dups stay near-dups), token
    spaces are disjoint across replicas, buckets never merge, and
    pair volume scales linearly — the horizontal-growth direction a
    100 TB corpus actually has."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    reps = []
    for i in range(n):
        tag = f"r{i}x"
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_docs * 10)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"(^|\s)", f"$1{tag}"
                ).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    print(f"wrote {n_docs * n} docs to {out_dir}/documents.parquet", flush=True)


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in (
        "profile",
        "owner_band_ab",
        "build_docs_scale",
    ):
        raise SystemExit(__doc__)
    if sys.argv[1] == "build_docs_scale":
        build_docs_scale(int(sys.argv[2]), sys.argv[3])
        return
    fn = profile if sys.argv[1] == "profile" else owner_band_ab
    fn(sys.argv[2] if len(sys.argv) > 2 else SF_DIR)


if __name__ == "__main__":
    main()
