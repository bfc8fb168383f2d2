"""r16 OPT — profile and cut the INLINE LSH scoring regime's constant
at docs ×10 (r15 verdict item 2: inline measured 56 s vs the attach
regime's 15–18 s at this scale; inline is the 100 TB path, so its
constant matters).

Legs:

  profile   stagewise wall for the shipped inline pipeline at ×10
            (signatures → banding/self-join raw pairs → owner filter →
            scoring), plus the regime auto-pick inputs.
  ab        interleaved A/B of carry/scorer formulations, identical
            pair sets asserted via count + xxhash64-sum fingerprint:
              inline_hex     shipped r15 form (32-char hex strings)
              inline_unhex   sigs+band hashes carried as 16-byte binary
                             (unhex is injective on md5 hex → provably
                             identical n_sig_match)
              inline_concat  ONE concatenated binary sig payload,
                             chunk-compare scorer (codegen substring)
              attach         inline=False reference (broadcast regime)

Usage: python tools/r16_lsh_inline.py {profile|ab} [scale] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

LEG = sys.argv[1] if len(sys.argv) > 1 else "ab"
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 10
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

N_HASHES, BAND_SIZE = 32, 8
N_BANDS = N_HASHES // BAND_SIZE


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def _fp(df):
    """Order-insensitive result fingerprint: count + decimal sum of
    xxhash64 over all columns — nothing collects but two scalars."""
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).first()
    return (r.n, r.h)


def build_variant(sigs, kind: str, max_bucket=None):
    """Re-implement the inline pairing with a pluggable carry/scorer
    encoding (mirrors pipeline.dedup.lsh_candidate_pairs inline arm)."""
    from pyspark.sql import functions as F

    sig_cols = [F.col(f"sig_{i}") for i in range(N_HASHES)]
    sig_table = sigs.select(F.col("doc_id"), *sig_cols).cache()

    def band_hash(b):
        return F.md5(
            F.concat_ws(
                "|",
                *[F.col(f"sig_{i}") for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)],
            )
        )

    key_is_bin = kind in ("concat2",)
    if kind == "hex":
        sig_payload = F.array(*sig_cols)
        bhs = F.array(*[band_hash(b) for b in range(N_BANDS)])
    elif kind == "unhex":
        sig_payload = F.array(*[F.unhex(c) for c in sig_cols])
        bhs = F.array(*[F.unhex(band_hash(b)) for b in range(N_BANDS)])
    elif kind == "concat":
        sig_payload = F.concat(*[F.unhex(c) for c in sig_cols])
        bhs = F.array(*[F.unhex(band_hash(b)) for b in range(N_BANDS)])
    elif kind == "concat2":
        sig_payload = F.concat(*[F.unhex(c) for c in sig_cols])
        bhs = F.concat(*[F.unhex(band_hash(b)) for b in range(N_BANDS)])
    else:
        raise ValueError(kind)

    carry = sig_table.withColumn("_sigs", sig_payload).withColumn("_bhs", bhs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (F.unhex(band_hash(b)) if key_is_bin else band_hash(b)).alias(
                    "band_hash"
                ),
            )
            for b in range(N_BANDS)
        ]
    )
    banded = carry.select(
        "doc_id", "_sigs", "_bhs", F.explode(band_structs).alias("bb")
    ).select("doc_id", F.col("bb.band"), F.col("bb.band_hash"), "_sigs", "_bhs")
    if max_bucket is not None:
        counts = banded.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        banded = (
            banded.join(counts, on=["band", "band_hash"])
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    joined = banded.alias("a").join(
        banded.alias("b"),
        on=[
            F.col("a.band") == F.col("b.band"),
            F.col("a.band_hash") == F.col("b.band_hash"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        ],
    )
    fb = F.lit(None).cast("int")
    for b in range(N_BANDS - 1, -1, -1):
        if kind == "concat2":
            eq = F.substring(F.col("a._bhs"), b * 16 + 1, 16) == F.substring(
                F.col("b._bhs"), b * 16 + 1, 16
            )
        else:
            eq = F.col("a._bhs")[b] == F.col("b._bhs")[b]
        fb = F.when(eq, F.lit(b)).otherwise(fb)
    if kind in ("concat", "concat2"):
        n_match = sum(
            F.when(
                F.substring(F.col("a._sigs"), i * 16 + 1, 16)
                == F.substring(F.col("b._sigs"), i * 16 + 1, 16),
                1,
            ).otherwise(0)
            for i in range(N_HASHES)
        )
    else:
        n_match = F.aggregate(
            F.zip_with(
                F.col("a._sigs"),
                F.col("b._sigs"),
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
    sel = [
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        n_match.alias("n_sig_match"),
    ]
    if max_bucket is not None:
        scored = joined.select(*sel).distinct()
    else:
        scored = joined.filter(F.col("a.band") == fb).select(*sel)
    return sig_table, scored.withColumn(
        "jaccard_est", F.col("n_sig_match") / F.lit(float(N_HASHES))
    )


def main() -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import dedup as D
    from siddhi_operator_spark.session import build_session

    sys.path.insert(0, "/root/repo/tools")
    _argv, sys.argv = sys.argv, [sys.argv[0]]  # r15 tool parses argv on import
    from r15_text_decade import ensure_docs_disjoint

    sys.argv = _argv

    spark = build_session("r16-lsh-inline")
    spark.sparkContext.setLogLevel("ERROR")
    big = ensure_docs_disjoint(spark, SCALE)
    docs = spark.read.parquet(f"{big}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()

    def sigs():
        return D.minhash_signature(docs, n_hashes=N_HASHES, impl="arrow")

    if LEG == "profile":
        est = D._est_size_bytes(
            sigs().select("doc_id", *[f"sig_{i}" for i in range(N_HASHES)])
        )
        thr = D._auto_broadcast_threshold(spark)
        print(f"auto-pick inputs: est={est} thresh={thr} -> "
              f"{'INLINE' if est is None or est > thr else 'ATTACH'}")
        spark.sparkContext.setJobDescription("lsh16: signatures only")
        s = sigs()
        print("signatures:", round(_noop(s), 2))
        # shipped inline pipeline, full
        spark.sparkContext.setJobDescription("lsh16: shipped inline full")
        full = D.lsh_candidate_pairs(
            sigs(), n_hashes=N_HASHES, band_size=BAND_SIZE,
            max_bucket=None, inline=True,
        )
        print("inline full (cold):", round(_noop(full), 2))
        for rep in range(REPS):
            full = D.lsh_candidate_pairs(
                sigs(), n_hashes=N_HASHES, band_size=BAND_SIZE,
                max_bucket=None, inline=True,
            )
            print(f"inline full rep{rep}:", round(_noop(full), 2))
        # stagewise: raw pair stream without scoring / without owner filter
        sig_cols = [F.col(f"sig_{i}") for i in range(N_HASHES)]
        st = sigs().select(F.col("doc_id"), *sig_cols).cache()
        bt = D.band_table(
            st.withColumn("_sigs", F.array(*sig_cols)),
            n_hashes=N_HASHES, band_size=BAND_SIZE, carry_cols=["_sigs"],
        )
        spark.sparkContext.setJobDescription("lsh16: banded only")
        print("banded only:", round(_noop(bt), 2))
        j = bt.alias("a").join(
            bt.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        raw = j.select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        spark.sparkContext.setJobDescription("lsh16: self-join raw ids")
        print("self-join raw id pairs:", round(_noop(raw), 2))
        rawsig = j.select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a._sigs").alias("sa"),
            F.col("b._sigs").alias("sb"),
        )
        spark.sparkContext.setJobDescription("lsh16: self-join + sig payload")
        print("self-join + sig payload out:", round(_noop(rawsig), 2))
        st.unpersist()
        return

    # ---- ab leg ----
    arms: dict[str, object] = {}

    def run(name, build):
        spark.sparkContext.setJobDescription(f"lsh16 ab: {name}")
        sig_table, df = build()
        t = _noop(df)
        sig_table.unpersist(blocking=True)
        return t

    def shipped(inline_flag):
        def b():
            s = sigs()
            sig_table = s.select(
                "doc_id", *[f"sig_{i}" for i in range(N_HASHES)]
            )
            df = D.lsh_candidate_pairs(
                s, n_hashes=N_HASHES, band_size=BAND_SIZE,
                max_bucket=None, inline=inline_flag,
            )
            return sig_table, df
        return b

    def variant(kind):
        return lambda: build_variant(sigs(), kind)

    import os

    sel = os.environ.get("R16_ARMS", "inline_hex,inline_unhex,inline_concat,attach")
    all_builders = {
        "inline_hex": shipped(True),
        "inline_unhex": variant("unhex"),
        "inline_concat": variant("concat"),
        "inline_concat2": variant("concat2"),
        "attach": shipped(False),
    }
    builders = {n: all_builders[n] for n in sel.split(",")}
    # fingerprints once per arm
    fps = {}
    for name, b in builders.items():
        st, df = b()
        fps[name] = _fp(df)
        st.unpersist(blocking=True)
        print(f"fp {name}: {fps[name]}")
    assert len({v for v in fps.values()}) == 1, f"FINGERPRINT MISMATCH: {fps}"
    times = {n: [] for n in builders}
    for rep in range(REPS):
        for name, b in builders.items():
            times[name].append(run(name, b))
            print(f"rep{rep} {name}: {times[name][-1]:.2f}")
    for name, ts in times.items():
        print(f"MEDIAN {name}: {statistics.median(ts):.2f}  {[round(x,2) for x in ts]}")


if __name__ == "__main__":
    main()
