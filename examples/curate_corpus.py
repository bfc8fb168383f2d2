"""End-to-end corpus curation example — the full training-data path
composed from the engine's pipeline operators, in the order a real
pretraining ingest runs them:

  1. quality gate        (cheap per-row filters: token stats + char-LM;
                          the hashing-trick classifier audits — its
                          stand-in weights don't gate)
  2. PII masking         (typed redaction, audit counts)
  3. exact dedup         (content-hash groups)
  4. near-dup clustering (minhash → capped LSH → star-contraction CC)
  5. span removal        (cross-doc winnow fingerprints → drop shared
                          boilerplate runs from the survivors' text)
  6. decontamination     (bloom-filter n-gram probe vs the eval slice)
  7. semantic dedup      (SemDeDup: embedding cells → in-cell cosine;
                          AFTER decontamination so a keeper can no
                          longer vanish in a later gate)
  8. leakage-safe split  (duplicate groups never straddle train/test)
  9. token-budget cut    (distributed prefix sum to a corpus budget)

Run: python examples/curate_corpus.py [sf_dir]   (default sf0.01)

Every step is a Catalyst plan (the only Python is the Arrow minhash
kernel); nothing collects to the driver except tiny model tables.
The same composition scales to a 1000-executor cluster unchanged —
each stage's 100 TB rationale lives in its operator docstring.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from siddhi_operator_spark.catalog import load  # noqa: E402
from siddhi_operator_spark.pipeline import curation as C  # noqa: E402
from siddhi_operator_spark.pipeline import dedup as D  # noqa: E402
from siddhi_operator_spark.pipeline import text as X  # noqa: E402
from siddhi_operator_spark.session import build_session  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf, "documents")
    n0 = docs.count()

    # 1. quality gate: drop short or junk-scored docs (heuristics).
    #    The hashing-trick classifier runs in AUDIT mode here — its
    #    shipped weights are deterministic stand-ins, so gating on
    #    them would drop ~half the corpus on hash parity; production
    #    swaps in trained weights and turns the semi-join gate on.
    q = X.quality_score(docs).select("doc_id", "quality")
    lm = X.char_lm_score(docs).select("doc_id", "avg_neg_log2p")
    n_clf_flag = X.classifier_score(docs).filter(~F.col("keep")).count()
    kept = (
        docs.join(q, "doc_id")
        .join(lm, "doc_id")
        .filter((F.col("quality") > 0.2) & (F.col("avg_neg_log2p") < 12.0))
        .drop("quality", "avg_neg_log2p")
    )
    n1 = kept.count()

    # 2. PII masking audit (masking itself would rewrite text_col)
    pii = C.pii_mask(kept)
    n_pii = pii.filter(
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone")) > 0
    ).count()

    # 3. exact dedup: keep one doc per content hash
    exact = D.exact_dedup(kept)
    survivors = kept.join(
        exact.select(F.col("canonical_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n2 = survivors.count()

    # 4. near-dup clusters: minhash (arrow tier) → capped LSH → CC;
    #    keep each cluster's canonical (minimum) doc
    sigs = D.minhash_signature(survivors, n_hashes=32, impl="arrow")
    pairs = D.lsh_candidate_pairs(sigs, n_hashes=32, band_size=8)  # auto cap
    strong = pairs.filter(F.col("n_sig_match") >= 30)
    cc = D.connected_components(strong)
    dupes = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    survivors = survivors.join(dupes, "doc_id", "left_anti")
    n3 = survivors.count()

    # 5. span removal: drop the verbatim cross-doc boilerplate runs
    #    (shared winnow fingerprints) from the surviving documents'
    #    text — substring-level dedup after document-level dedup
    cleaned = C.remove_repeated_spans(survivors).filter(
        F.col("text_clean") != ""
    )
    survivors = (
        survivors.drop("text")
        .join(
            cleaned.select("doc_id", F.col("text_clean").alias("text")),
            "doc_id",
        )
    )
    n_spans = cleaned.filter(F.col("n_removed") > 0).count()

    # 6. decontamination: bloom probe against the held-out slice
    contaminated = C.decontaminate_bloom(survivors, n=3, eval_mod=97).select(
        "doc_id"
    )
    survivors = survivors.join(contaminated, "doc_id", "left_anti")
    n4 = survivors.count()

    # 7. semantic dedup (SemDeDup): embeddings cluster into quantizer
    #    cells, in-cell cosine pairs above threshold drop the higher id.
    #    Runs LAST of the drop gates so a drop's keeper cannot vanish in
    #    a later gate ("never drop the last copy of content"); the
    #    quantizer seeds from the FULL embedding corpus (dense ids).
    #    Fixture contract: embeddings.vec_id IS documents.doc_id
    #    (TESTDATA.md row-aligned corpora) — checked below, because a
    #    silently mismatched id space would delete the wrong documents.
    emb = load(spark, sf, "embeddings")
    n_shared = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    ).count()
    assert n_shared == emb.count(), (
        f"embeddings.vec_id is not documents.doc_id ({n_shared} of "
        f"{emb.count()} ids resolve) — semantic dedup needs the id map"
    )
    sem = D.semantic_dedup_pairs(emb, min_cos=0.4, n_cells=8)
    sem_drop = (
        sem.join(
            survivors.select(F.col("doc_id").alias("id_keep")),
            "id_keep",
            "left_semi",
        )
        .select(F.col("id_drop").alias("doc_id"))
        .distinct()
    )
    survivors = survivors.join(sem_drop, "doc_id", "left_anti")
    n3b = survivors.count()

    # 8. leakage-safe split
    split = C.leakage_safe_split(survivors)
    split_counts = {
        r.split: r.n for r in split.groupBy("split").count()
        .withColumnRenamed("count", "n").collect()
    }

    # 9. token-budget cut on the train shard
    train = survivors.join(
        split.filter(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    budget = C.token_budget_sample(train, budget_tokens=2_000)
    n5 = budget.count()

    print(
        f"docs {n0} -> quality {n1} -> exact-dedup {n2} -> "
        f"neardup {n3} -> decontaminated {n4} -> semantic {n3b} "
        f"(pii-flagged {n_pii}; clf-flagged {n_clf_flag}; span-cleaned {n_spans}; "
        f"splits {split_counts}; train@2k-tokens {n5})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
