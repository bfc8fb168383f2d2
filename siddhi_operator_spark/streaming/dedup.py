"""Streaming incremental near-dup detection — the minhash/LSH dedup
stack as a RESIDENT service: documents arrive as a stream, each
micro-batch emits exactly the candidate pairs that involve a NEW
document (vs the stored corpus and within the batch), and the
signature/band state grows append-only.

Per-batch cost is new-bands × colliding buckets — never a corpus-wide
recompute. At 100 TB the band store is written bucketed by
(band, band_hash) so the new-vs-stored join prunes to the buckets the
batch actually touches; here it is plain parquet append (same
contract, no pruning at test scale). Replaying a corpus through this
service yields the batch `lsh_candidate_pairs` output exactly — every
pair (a, b) is emitted once, in the batch where its LATER member
arrives — which is what lets the batch DuckDB oracle prove the
streaming path (`suite/streaming_suite.streaming_incremental_neardup`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..pipeline import dedup as D


def incremental_neardup_sink(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    n_hashes: int = 32,
    band_size: int = 8,
    impl: str = "arrow",
) -> StreamingQuery:
    """Attach the incremental near-dup service to a document stream.

    State layout under ``state_dir``: ``sigs/`` (doc_id, sig_*) and
    ``bands/`` (doc_id, band, band_hash) — both append-only parquet;
    emitted candidate pairs append to ``pairs/`` with the same schema
    as `pipeline.dedup.lsh_candidate_pairs` (id_a, id_b, n_sig_match,
    jaccard_est).
    """
    sig_dir = f"{state_dir}/sigs"
    band_dir = f"{state_dir}/bands"
    pairs_dir = f"{state_dir}/pairs"
    sig_names = [f"sig_{i}" for i in range(n_hashes)]

    def _read_or_none(spark, path, schema_like):
        try:
            return spark.read.schema(schema_like.schema).parquet(path)
        except Exception:
            return None

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if not batch.take(1):
            return
        sigs_new = D.minhash_signature(batch, n_hashes, impl=impl).select(
            "doc_id", *sig_names
        )
        sigs_new.persist()
        banded_new = D.band_table(sigs_new, n_hashes=n_hashes, band_size=band_size)
        banded_new.persist()
        stored_bands = _read_or_none(spark, band_dir, banded_new)
        all_bands = (
            banded_new
            if stored_bands is None
            else banded_new.unionByName(stored_bands)
        )
        # pairs where at least one side is NEW: probe side = new bands
        cand = (
            banded_new.alias("a")
            .join(
                all_bands.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_hash") == F.col("b.band_hash"),
                    F.col("a.doc_id") != F.col("b.doc_id"),
                ],
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("id_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
            )
            .distinct()
        )
        stored_sigs = _read_or_none(spark, sig_dir, sigs_new)
        all_sigs = (
            sigs_new if stored_sigs is None else sigs_new.unionByName(stored_sigs)
        )
        n_match = sum(
            F.when(F.col(f"sa.sig_{i}") == F.col(f"sb.sig_{i}"), 1).otherwise(0)
            for i in range(n_hashes)
        )
        pairs = (
            cand.join(all_sigs.alias("sa"), F.col("id_a") == F.col("sa.doc_id"))
            .join(all_sigs.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
            .select("id_a", "id_b", n_match.alias("n_sig_match"))
            .withColumn("jaccard_est", F.col("n_sig_match") / F.lit(float(n_hashes)))
        )
        pairs.write.mode("append").parquet(pairs_dir)
        # commit state AFTER emitting, so a same-batch pair is produced
        # by the banded_new self-part, not double-counted against store
        banded_new.write.mode("append").parquet(band_dir)
        sigs_new.write.mode("append").parquet(sig_dir)
        sigs_new.unpersist()
        banded_new.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
