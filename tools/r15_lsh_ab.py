"""r15 OPT — dedup_minhash_lsh follow-on A/B.

Arms (all same output, asserted by sorted collect at sf0.01 + sf0.1):

  base      shipped owner-band tier (r15 build)
  par       base + cached sig table repartitioned to defaultParallelism
            when its scan would otherwise be 1 task (584 KB file)
  inline    owner-band filter inlined: the 4-hash band array rides the
            band explode, so the two key_tbl joins disappear
  par+inline  both

Usage: python tools/r15_lsh_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

N_HASHES, BAND_SIZE = 32, 8


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.session import build_session

    spark = build_session("r15-lsh-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()

    sig_cols = [F.col(f"sig_{i}") for i in range(N_HASHES)]
    n_bands = N_HASHES // BAND_SIZE

    def bh_arr():
        return F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"sig_{i}")
                            for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)
                        ],
                    )
                )
                for b in range(n_bands)
            ]
        )

    def sig_table(par: bool):
        st = D.minhash_signature(docs, n_hashes=N_HASHES, impl="arrow").select(
            F.col("doc_id"), *sig_cols
        )
        if par:
            st = st.repartition(sc.defaultParallelism)
        return st.cache()

    def scored(pairs, st):
        n_match = sum(
            F.when(F.col(f"sa.sig_{i}") == F.col(f"sb.sig_{i}"), 1).otherwise(0)
            for i in range(N_HASHES)
        )
        out = (
            pairs.join(st.alias("sa"), F.col("id_a") == F.col("sa.doc_id"))
            .join(st.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
            .select("id_a", "id_b", n_match.alias("n_sig_match"))
        )
        return out.withColumn(
            "jaccard_est", F.col("n_sig_match") / F.lit(float(N_HASHES))
        )

    def arm_base(par: bool):
        st = sig_table(par)
        banded = D.band_table(st, n_hashes=N_HASHES, band_size=BAND_SIZE)
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
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.col("a.band").alias("_band"),
            )
        )
        key_tbl = st.select(F.col("doc_id"), bh_arr().alias("_bhs"))
        first_band = F.lit(None).cast("int")
        for b in range(n_bands - 1, -1, -1):
            first_band = F.when(
                F.col("ba._bhs")[b] == F.col("bb._bhs")[b], F.lit(b)
            ).otherwise(first_band)
        pairs = (
            pairs.join(key_tbl.alias("ba"), F.col("id_a") == F.col("ba.doc_id"))
            .join(key_tbl.alias("bb"), F.col("id_b") == F.col("bb.doc_id"))
            .filter(F.col("_band") == first_band)
            .select("id_a", "id_b")
            .repartition(F.col("id_a"))
        )
        return scored(pairs, st), st

    def arm_inline(par: bool):
        st = sig_table(par)
        with_arr = st.select(F.col("doc_id"), bh_arr().alias("_bhs"))
        banded = with_arr.select(
            "doc_id", "_bhs", F.posexplode("_bhs").alias("band", "band_hash")
        )
        first_band = F.lit(None).cast("int")
        for b in range(n_bands - 1, -1, -1):
            first_band = F.when(
                F.col("a._bhs")[b] == F.col("b._bhs")[b], F.lit(b)
            ).otherwise(first_band)
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
            .filter(F.col("a.band") == first_band)
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .repartition(F.col("id_a"))
        )
        return scored(pairs, st), st

    arms = {
        "base": lambda: arm_base(False),
        "par": lambda: arm_base(True),
        "inline": lambda: arm_inline(False),
        "par+inline": lambda: arm_inline(True),
    }

    # row-identity check at this sf: base vs inline variants
    ref_df, ref_st = arms["base"]()
    ref = sorted(map(tuple, ref_df.collect()))
    for tag in ("inline", "par+inline", "par"):
        df, st2 = arms[tag]()
        got = sorted(map(tuple, df.collect()))
        assert got == ref, f"{tag} output differs: {len(got)} vs {len(ref)} rows"
        st2.unpersist()
        print(f"row-identity ok: {tag} ({len(ref)} pairs)")
    ref_st.unpersist()

    walls: dict[str, list[float]] = {t: [] for t in arms}
    order = ["base", "par", "inline", "par+inline"]
    for rep in range(REPS):
        for tag in order if rep % 2 == 0 else list(reversed(order)):
            df, st = arms[tag]()
            sc.setJobDescription(f"lsh-ab warm {tag}")
            _noop(df)  # warm run materializes the cache
            sc.setJobDescription(f"lsh-ab timed {tag}")
            walls[tag].append(_noop(df))
            st.unpersist()
            sc.setJobDescription(None)
    for tag in order:
        r = [round(x, 2) for x in walls[tag]]
        print(f"{tag:11s} median {statistics.median(walls[tag]):5.2f}s  reps {r}")


if __name__ == "__main__":
    main()
