"""Text analysis operators: token counting, quality scoring,
language-ID heuristic, shingle statistics. All pure Catalyst
expressions — at 100 TB these run inside whole-stage codegen over the
parquet scan with zero shuffles (per-row derivations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import ensure_input_parallelism as _par
from ..fpround import r4

STOPWORDS_EN = ("the", "a", "of", "and", "in", "to", "is")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish proxy
    (chars/4, the standard rough token estimate) and word-ish regex
    tokens."""
    toks = F.split(F.col(text_col), r"\s+")
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        F.ceil(F.length(text_col) / 4).alias("n_bpe_est"),
    )


def pretokenize_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """GPT-2-style BPE PRE-tokenizer segmentation count — the token
    estimate that tracks real BPE vocab sizes far better than the
    chars/4 proxy in :func:`token_stats`: the regex alternation splits
    contraction suffixes ('s 't 're 've 'm 'll 'd), space-prefixed
    letter runs, digit runs and punctuation runs — exactly the
    boundaries a byte-pair vocabulary merges within but never across.
    ASCII classes on purpose: identical semantics under Java regex
    (Spark) and RE2 (DuckDB), so the count is engine-portable. One
    in-row regexp_extract_all — zero shuffle at any corpus size."""
    pat = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
    pre = F.filter(
        F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)),
        lambda t: t.rlike("[^ ]"),
    )
    n_ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    return df.select(
        "doc_id",
        F.size(pre).cast("long").alias("n_pre_tokens"),
        n_ws.cast("long").alias("n_ws_tokens"),
        r4(F.length(text_col) / F.size(pre), 4).alias("chars_per_token"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, mean token length, stopword ratio,
    type-token ratio — the standard cheap pre-filters for training
    corpora."""
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS_EN]))
    )
    mean_tok_len = (F.length(text_col) - (n - 1)) / n  # chars minus spaces
    return df.select(
        "doc_id",
        n.alias("n_tokens"),
        r4(mean_tok_len, 4).alias("mean_tok_len"),
        r4(stop_hits / n, 4).alias("stopword_ratio"),
        r4(uniq / n, 4).alias("type_token_ratio"),
        r4(
            (F.lit(1.0) * (uniq / n))
            * F.when(n >= 20, 1.0).otherwise(n / 20.0),
            4,
        ).alias("quality"),
    )


def langid_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: character-class + stopword voting.
    (On this synthetic corpus every language shares one vocabulary, so
    the classifier output is degenerate — the operator's value is the
    deterministic, portable scoring pipeline, mirrored by the oracle.)"""
    t = F.col(text_col)
    has_cjk = t.rlike(r"[一-鿿]")
    has_accents = t.rlike(r"[áéíóúñüäöß]")
    toks = F.split(t, r"\s+")
    en_hits = F.size(F.filter(toks, lambda x: x.isin(*[F.lit(s) for s in STOPWORDS_EN])))
    return df.select(
        "doc_id",
        "lang",
        F.when(has_cjk, "zh")
        .when(has_accents, "eu")
        .when(en_hits > 0, "en")
        .otherwise("unknown")
        .alias("lang_pred"),
        en_hits.alias("en_stopword_hits"),
    )


def shingle_stats(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """k-token shingle statistics (the input to fingerprinting /
    minhash): number of shingles and distinct shingles per doc, via
    array expressions (sequence + transform + slice), no explode."""
    # narrow-scan guard: the per-row shingle kernel is CPU-heavy
    # (3.02 → 0.41 s at sf0.1, r15 — guide §2.5)
    df = _par(df)
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return df.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(shingles).alias("n_shingles"),
        F.size(F.array_distinct(shingles)).alias("n_distinct_shingles"),
    )


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TF-IDF keyword extraction: the ``top_k`` highest-scoring terms
    per document, score = tf · ln(N / df) with raw term counts and
    document frequency over the corpus.

    Scale design: one explode to (doc, term) pairs → map-side-combined
    counts keyed by (doc, term); document frequency is a second keyed
    agg on term joined back onto the per-doc counts — with NO hard
    broadcast hint, because the dfreq table is vocabulary-sized and a
    web-scale vocabulary is billions of distinct tokens (r7 verdict
    #1): AQE broadcasts it from runtime stats while small, shuffle-
    joins on `term` when not (both sides already keyed by term, so
    the fallback co-partitions with the tf agg). Ranking is a per-doc
    window (partitioned by doc_id — well distributed). No all-pairs,
    no Python.
    """
    from pyspark.sql.window import Window

    n_docs = df.count()  # scalar, one job; at 100 TB read from stats
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_raw").desc(), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            r4(F.col("tfidf_raw")).alias("tfidf"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval: the ``top_k`` best-matching documents for a
    fixed query term set — the ranked-lookup primitive a training-data
    pipeline uses for targeted decontamination and eval-neighbor
    audits (``idf·tf/(tf + k1·(1−b+b·len/avglen))`` with the standard
    Robertson idf ``ln(1 + (N−df+0.5)/(df+0.5))``).

    Scale design — this never builds a corpus-wide posting list:
    per-query-term tf is a pure PROJECTION (``size(filter(tokens, …))``
    per term — |Q| array scans inside codegen, zero shuffle), the
    corpus statistics (N, avg doclen, per-term df) are ONE scalar
    aggregation row that broadcasts back, and the final top-k compiles
    to TakeOrderedAndProject (per-partition heap + driver merge of
    top_k·n_partitions rows, never a global sort). At 100 TB the only
    exchange is the single-row stats agg.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")

    def _tf(q: str) -> Column:
        # NB: a `lambda t, q=q:` default-arg closure would make the
        # higher-order filter pass the array INDEX as the second param
        return F.size(F.filter(toks, lambda t: t == F.lit(q)))

    tf_cols = [
        _tf(q).cast("double").alias(f"_tf{i}") for i, q in enumerate(query_terms)
    ]
    base = df.select(F.col(id_col), F.size(toks).cast("double").alias("_len"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_len").alias("_avglen"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        part = idf * F.col(f"_tf{i}") / (
            F.col(f"_tf{i}")
            + k1 * (1.0 - b + b * F.col("_len") / F.col("_avglen"))
        )
        score = part if score is None else score + part
    scored = scored.select(F.col(id_col), score.alias("_score")).filter(
        F.col("_score") > 0
    )
    # 6-dp epsilon-rounded sort key: engine-portable deterministic
    # order (ln differs ~1e-15 across engines; raw-float ordering
    # would make the top-k cutoff a coin flip on near-ties)
    key = F.round(F.col("_score") + 1e-9, 6)
    return (
        scored.orderBy(key.desc(), F.col(id_col))
        .limit(top_k)
        .select(id_col, r4(F.col("_score")).alias("score"))
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_posting: int = 1000,
) -> DataFrame:
    """Materialize the inverted index (term → sorted posting list +
    document frequency + total tf) — the retrieval-side artifact a
    corpus pipeline persists next to the parquet: BM25/decontamination
    lookups then read one term's row instead of scanning the corpus.

    One explode → one (term, doc) map-combinable count → a term-keyed
    fold for the exact stats, plus a WindowGroupLimit branch for the
    posting arrays. The posting ARRAY is capped at ``max_posting`` ids
    (the lowest doc ids) so a stop-word's row cannot balloon a record —
    past the cap a reader falls back to the scan path; `df`/`total_tf`
    keep the TRUE values either way. The cap is enforced BEFORE the
    fold (row_number ≤ cap compiles to WindowGroupLimit: per-partition
    top-k heaps), so a heavy term ships ≤cap ids per partition into
    the shuffle instead of its whole posting set — the fixed-vocabulary
    worst case (every term's group grows with the corpus) measured
    16×/decade with a collect-then-slice fold and 10×/decade (linear)
    this way. Term is the shuffle key; Zipf skew combines map-side."""
    from pyspark.sql.window import Window

    terms = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = terms.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    w = Window.partitionBy("term").orderBy(F.col(id_col).asc())
    postings = (
        tf.select("term", id_col, F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= max_posting)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("postings"))
    )
    return stats.join(postings, "term").select(
        "term", "df", "total_tf", "postings"
    )


def char_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache: bool = True,
) -> DataFrame:
    """Character-bigram LM quality score — the perplexity-proxy junk
    filter (mojibake, base64 blobs, binary spill score far from the
    corpus distribution): per document, the mean negative log2
    probability of its char bigrams under the corpus's own add-1-
    smoothed bigram model.

    Scale shape: the MODEL is alphabet²-bounded — one (bigram → count)
    aggregation whose output broadcasts back (plus a single scalar
    total/vocab row). The per-doc stream folds to (doc, bigram, count)
    FIRST and is persisted, so the char-level explode runs once and
    both the model build and the scoring read the compacted form
    (~half the rows; measured 26 s → 4.2 s at ×100 docs). Scoring is a
    broadcast-hash lookup + count-weighted per-doc mean — no
    corpus-wide shuffle beyond the (doc, bigram) fold.

    Cache lifecycle (mirrors `lsh_candidate_pairs`): the fold persist
    outlives this call — the returned DataFrame executes later and
    both the model build and the scoring read it. Callers that invoke
    repeatedly (registries, benches) pass ``cache=False`` to trade one
    extra explode pass for zero retained partitions, or unpersist via
    ``spark.catalog.clearCache()`` once the result is materialized.
    """
    c = F.col(text_col)
    # narrow-scan guard: the char-bigram explode otherwise runs in the
    # scan's task count (3.21 → 1.14 s at sf0.1, r15 — guide §2.5)
    df = _par(df)
    bigrams = df.filter(F.length(c) >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - 1),
                lambda i: c.substr(i, F.lit(2)),
            )
        ).alias("bigram"),
    )
    bg = bigrams.groupBy(id_col, "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    if cache:
        bg = bg.persist()  # shared by model build AND scoring
    model = bg.groupBy("bigram").agg(F.sum("cnt").alias("c"))
    stats = model.agg(
        F.sum("c").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    scored = (
        bg.join(F.broadcast(model), "bigram")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "cnt",
            (
                -F.log2((F.col("c") + 1.0) / (F.col("total") + F.col("v")))
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        r4(F.sum(F.col("cnt") * F.col("nll")) / F.sum("cnt"), 4).alias(
            "avg_neg_log2p"
        ),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    doc→training-sample/RAG-passage expansion. stride = chunk_tokens −
    overlap; the final partial chunk is kept (≥1 token).

    Pure projection + one explode: token arrays slice in codegen, no
    shuffle at any scale; (doc_id, chunk_idx) is a stable sample key
    for downstream packing/dedup."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, {chunk_tokens}), got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    out = df.select(
        F.col(id_col),
        n.alias("_n"),
        F.posexplode(
            F.transform(
                starts, lambda s: F.array_join(F.slice(toks, s, chunk_tokens), " ")
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("chunk_idx") * stride
        ).alias("n_tokens"),
    )


def classifier_score(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    threshold: float = 0.5,
) -> DataFrame:
    """FastText-style linear quality classifier over hashing-trick
    token features — the learned-filter stage of a curation pipeline
    (CCNet / Llama-style "looks like reference text" scoring): each
    token hashes to one of ``n_buckets`` feature slots, the model is a
    weight per slot, score = sigmoid(mean slot weight), keep = score
    above threshold.

    Entirely IN-ROW: token→bucket is the engine-portable md5 hash
    (same algebra as the count-min sketch), the weight lookup is pure
    arithmetic on the bucket id — so the "model" needs no join at all
    and the whole scorer is a zero-shuffle projection at any corpus
    size. Production swaps `_slot_weight` for a broadcast weight
    array (`F.lit` over the trained vector — identical plan shape);
    the deterministic Weyl-sequence weights here keep the row
    oracle-checkable without shipping a model artifact.
    """
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")

    def bucket(tok: Column) -> Column:
        return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast(
            "long"
        ) % n_buckets

    def slot_weight(b: Column) -> Column:
        # deterministic stand-in weights in (-0.5, 0.5): the Weyl
        # sequence (b·2654435761 mod n)/n − 0.5 — engine-portable
        # integer arithmetic, same spirit as the domain-mix hash gate
        return ((b * F.lit(2654435761)) % n_buckets) / F.lit(
            float(n_buckets)
        ) - F.lit(0.5)

    mean_w = F.aggregate(
        F.transform(F.col("_ws"), lambda t: slot_weight(bucket(t))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("_ws")
    return (
        df.select("doc_id", ws.alias("_ws"))
        .filter(F.size("_ws") > 0)
        .select(
            "doc_id",
            F.size("_ws").cast("long").alias("n_tokens"),
            r4(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(8.0) * mean_w)), 4).alias(
                "score"
            ),
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(8.0) * mean_w))
                > threshold
            ).alias("keep"),
        )
    )


def classifier_train(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    eta: float = 1.0,
    iters: int = 2,
    label_min_tokens: int = 50,
) -> DataFrame:
    """Train the hashing-trick quality classifier `classifier_score`
    scores with: full-batch logistic-regression gradient descent over
    the md5-slot token features (x_{doc,slot} = slot count / doc
    tokens — each doc's feature mass sums to exactly 1). The label is
    a deterministic heuristic (doc has ≥ ``label_min_tokens`` tokens)
    so the whole run is engine-reproducible; swap in a labeled frame
    by pre-computing the same (doc, slot, x, y) contract.

    Distributed the way iterative ML on Spark should be: the sparse
    feature matrix builds ONCE (explode → one (doc, slot) keyed agg),
    persists MEMORY_AND_DISK (corpus-proportional but disk-spillable —
    the MLlib cache-the-training-set pattern; it is consumed
    2·iters−1 times), and each iteration is two keyed aggregations —
    per-doc margin (slot-keyed weight join, AQE broadcasts the ≤
    ``n_buckets``-row weight table), per-slot gradient (doc-keyed
    probability join). The weight state between iterations is a
    DataFrame of ≤ ``n_buckets`` rows, never a driver-side vector.

    Determinism contract (the `ml_kmeans` convention): margins,
    probabilities, gradients and weights all epsilon-round at 6 dp
    each step, so float reduction order never leaks into the
    fixed-iteration unrolled DuckDB oracle; output weights at 4 dp."""
    from pyspark.storagelevel import StorageLevel

    # narrow-scan guard: the feature explode + slot hashing otherwise
    # run in the scan's task count (5.24 → 3.23 s at sf0.1, r15)
    df = _par(df)
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    slot = F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10).cast(
        "long"
    ) % n_buckets
    feat = (
        df.select("doc_id", ws.alias("_ws"))
        .filter(F.size("_ws") > 0)
        .select(
            "doc_id",
            F.size("_ws").alias("_n"),
            (F.size("_ws") >= label_min_tokens).cast("double").alias("_y"),
            F.explode("_ws").alias("_tok"),
        )
        .select("doc_id", "_n", "_y", slot.alias("slot"))
        .groupBy("doc_id", "slot")
        .agg(
            (F.count(F.lit(1)) / F.any_value("_n")).alias("x"),
            F.any_value("_y").alias("y"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # iteration 1 from w=0 in closed form: every margin is 0, every
    # p is 0.5 — no weight join exists yet to shuffle
    g = feat.groupBy("slot").agg(
        r4(F.sum((F.lit(0.5) - F.col("y")) * F.col("x")), 6).alias("_g")
    )
    w = g.select("slot", r4(-F.lit(eta) * F.col("_g"), 6).alias("w"))
    for _ in range(1, iters):
        m = (
            feat.join(w, "slot", "left")
            .groupBy("doc_id")
            .agg(
                r4(
                    F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))), 6
                ).alias("_m"),
                F.any_value("y").alias("y"),
            )
        )
        p = m.select(
            "doc_id",
            r4(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))), 6).alias("_p"),
            "y",
        )
        g = (
            feat.join(p.select("doc_id", "_p"), "doc_id")
            .groupBy("slot")
            .agg(
                r4(
                    F.sum((F.col("_p") - F.col("y")) * F.col("x")), 6
                ).alias("_g")
            )
        )
        w = (
            g.join(w, "slot", "left")
            .select(
                "slot",
                r4(
                    F.coalesce(F.col("w"), F.lit(0.0))
                    - F.lit(eta) * F.col("_g"),
                    6,
                ).alias("w"),
            )
        )
    return w.select("slot", r4(F.col("w"), 4).alias("weight"))


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    min_docs: int = 2,
    min_line_tokens: int = 3,
) -> DataFrame:
    """Line-level exact dedup (RefinedWeb/Falcon-style): a LINE that
    appears verbatim in ≥``min_docs`` documents is boilerplate
    (navigation chrome, cookie banners, signatures) and is dropped
    from every document; unique lines survive untouched. The
    complement of :func:`..curation.remove_repeated_spans` — exact
    line identity here, fuzzy winnowed runs there.

    Lines shorter than ``min_line_tokens`` tokens — including blank
    lines — are exempt (never counted, never dropped): one-word lines
    like headings repeat naturally, and blank lines carry paragraph
    structure, so a document with no shared lines round-trips
    byte-identically.

    Shape: explode lines → md5-keyed count (map-side combinable, the
    only corpus-sized shuffle) → semi-join of the shared tail back
    onto the per-doc line explode → per-doc ordered refold. The
    shared tail carries NO hard broadcast hint: in a web corpus every
    site contributes its own chrome, so the tail grows ~linearly with
    the corpus and a forced broadcast is the sf100 driver OOM the r6
    TPC-H audit flagged — AQE broadcasts it from runtime stats while
    it is small and falls back to a shuffle join when it is not
    (r7 verdict #1). Emits (doc_id, n_lines, n_removed, text_clean)."""
    # blank lines are KEPT (they are never eligible, so never dropped):
    # filtering them out silently rewrote every multi-paragraph doc's
    # structure even when nothing was shared (r7 review) — the operator
    # must be a no-op on documents with no shared lines
    base = df.select(
        "doc_id", F.split(F.col(text_col), r"\n").alias("_lines")
    )
    eligible = eligible_line_positions(df, text_col, min_line_tokens)
    shared = (
        eligible.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("h")
    )
    drops = (
        eligible.join(shared, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("_drop"))
    )
    return refold_dropped_lines(base, drops)


def eligible_line_positions(
    df: DataFrame, text_col: str = "text", min_line_tokens: int = 3
) -> DataFrame:
    """The (doc_id, idx, h) position explode `dedup_lines` counts and
    probes — exposed so the STREAMING twin
    (`streaming.dedup.incremental_line_dedup_sink`) shares the exact
    eligibility/hash semantics with the batch operator (a drifted
    tokenizer would silently break the batch≡stream contract)."""
    exploded = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("idx", "line"),
    )
    return exploded.filter(
        F.size(F.filter(F.split(F.col("line"), r"\s+"), lambda t: t != ""))
        >= min_line_tokens
    ).select("doc_id", "idx", F.md5("line").alias("h"))


def refold_dropped_lines(base: DataFrame, drops: DataFrame) -> DataFrame:
    """Per-doc ordered refold: ``base`` is (doc_id, _lines),
    ``drops`` is (doc_id, _drop: array<int> of line indexes to
    remove). Shared by the batch operator and the streaming read
    face. Emits (doc_id, n_lines, n_removed, text_clean)."""
    joined = base.join(drops, "doc_id", "left").withColumn(
        "_drop",
        F.coalesce(F.col("_drop"), F.array().cast("array<int>")),
    )
    # sequence(0, -1) on an empty array yields [0, -1] (Spark sequence
    # is bidirectional) and element_at then throws — guard the empty
    # case explicitly (r7 review; empty/whitespace docs are routine in
    # the web corpora this targets)
    idx = F.when(
        F.size("_lines") > 0,
        F.sequence(F.lit(0), F.size("_lines") - 1),
    ).otherwise(F.array().cast("array<int>"))
    kept = F.transform(
        F.array_except(idx, F.col("_drop")),
        lambda i: F.element_at("_lines", i + 1),
    )
    return joined.select(
        "doc_id",
        F.size("_lines").cast("long").alias("n_lines"),
        F.size("_drop").cast("long").alias("n_removed"),
        F.concat_ws("\n", kept).alias("text_clean"),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 3,
    passes: int = 3,
) -> DataFrame:
    """BPE tokenizer TRAINING — learn the first ``merges`` byte-pair
    merges from a corpus (the missing half of the tokenizer story:
    :func:`pretokenize_stats` counts with a FIXED vocab; a training
    pipeline also has to BUILD one from its own bytes).

    Classic BPE (Sennrich et al. 2016, public alg.): start from
    characters, repeatedly (1) count adjacent token pairs across the
    corpus, (2) merge the most frequent pair, K times.  The Spark
    shape is the iterative-algorithm pattern (same class as
    `operators/ml.py` kmeans): the WORD-FREQUENCY table is the state
    — vocabulary-bounded, NOT corpus-bounded, so at 100 TB the loop
    aggregates the corpus once into |vocab| rows and iterates on
    that — and each merge round is ONE keyed aggregation (explode
    adjacent pairs weighted by word count → sum → 1-row argmax) plus
    a per-row string rewrite.  K driver-side 1-row `.first()` reads,
    K fixed and data-independent (the adjudicated exception class —
    same as the derived regime picks).

    Determinism: words are lowercase ASCII letter runs; the argmax
    tie-break is (count DESC, left ASC, right ASC); merge application
    is non-overlapping left-to-right `replace` on a '|'-separator
    encoding, applied ``passes`` times (a single pass misses
    same-pair runs that share a separator — ' a a a a ' leaves
    ' aa a a ' — so the bounded fix-point covers runs ≤ 2^passes;
    the DuckDB oracle unrolls the SAME replace chain, so the two
    engines agree by construction even on that corner).

    Returns (merge_rank, left_tok, right_tok, pair_count) — one row
    per learned merge, rank 1-based in learn order."""
    spark = df.sparkSession
    # narrow-scan guard (r15 OPT, guide §2.5): the corpus-wide word
    # explode+count otherwise runs in the fixture scan's single task
    # (measured 5.0 s cold → 0.5 s at sf0.1)
    df = _par(df)
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # '|h|e|l|l|o|' — every token wrapped in separators so a merge is
    # one literal replace of '|a|b|' with '|ab|'
    enc = words.select(
        F.concat(
            F.lit("|"), F.regexp_replace(F.col("w"), "(.)", "$1|")
        ).alias("toks"),
        "cnt",
    )
    # the word-frequency state is small (vocab-bounded) and hit K+1
    # times — persist ONE partition: the per-merge argmax jobs
    # otherwise launch shuffle.partitions near-empty tasks per round
    # over a vocab-bounded table (r15 OPT, guide §2.2 fewer/larger)
    enc = enc.coalesce(1).persist()
    learned: list[tuple[int, str, str, int]] = []
    cur = enc
    for rank in range(1, merges + 1):
        pairs = (
            cur.select(
                F.expr(
                    "filter(split(toks, '\\\\|'), x -> x != '')"
                ).alias("t"),
                "cnt",
            )
            # guard: Spark sequence(1, 0) steps DOWNWARD ([1, 0]) —
            # single-char words must contribute no pairs
            .filter(F.size("t") > 1)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1), i -> "
                        "struct(element_at(t, i) AS a, "
                        "element_at(t, i + 1) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(
            F.desc("c"), F.asc("a"), F.asc("b")
        ).first()
        if best is None:
            break
        a, b, c = best["a"], best["b"], int(best["c"])
        learned.append((rank, a, b, c))
        col = F.col("toks")
        for _ in range(passes):
            col = F.replace(
                col, F.lit(f"|{a}|{b}|"), F.lit(f"|{a}{b}|")
            )
        cur = cur.select(col.alias("toks"), "cnt")
    enc.unpersist()
    return spark.createDataFrame(
        learned,
        "merge_rank int, left_tok string, right_tok string, pair_count bigint",
    )


def bpe_encode_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    passes: int = 3,
) -> DataFrame:
    """BPE ENCODE with a learned merge table → per-document REAL
    token counts (closing the tokenizer loop: :func:`bpe_train`
    learns the merges, this applies them — the per-doc count a
    packing/budgeting pipeline needs is the post-merge one, which the
    chars/4 proxy and the fixed-vocab pre-tokenizer both misestimate).

    Single in-row expression per document — zero shuffle at any
    corpus size: the document's words are '|'-encoded in place
    (words separated by a space TOKEN, which no letter-only merge
    pair can ever match across), each merge is the same
    bounded-fixpoint separator replace as training, and the count is
    the number of letter segments left.  ``merges`` is the tiny
    driver-side list collected from :func:`bpe_train`'s output —
    vocab-bounded, never corpus-bounded."""
    s = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "))
    toks = F.concat(F.lit("|"), F.regexp_replace(s, "(.)", "$1|"))
    for a, b in merges:
        for _ in range(passes):
            toks = F.replace(toks, F.lit(f"|{a}|{b}|"), F.lit(f"|{a}{b}|"))
    n = F.size(
        F.filter(
            F.split(toks, r"\|"), lambda x: x.rlike("^[a-z]+$")
        )
    )
    return df.select("doc_id", n.alias("n_bpe_tokens"))


def word_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1024,
    cache: bool = True,
) -> DataFrame:
    """Word-bigram LM perplexity score — the CCNet-style quality
    filter (Wenzek et al. 2020, public alg.: score each document's
    perplexity under an LM trained on the corpus's own distribution;
    high perplexity = boilerplate/gibberish/keyword-stuffing that the
    char tier in :func:`char_lm_score` cannot see because its
    CHARACTER statistics are normal). KenLM's 5-gram is approximated
    by an add-1-smoothed word BIGRAM over a top-``vocab_size``
    vocabulary with ``<unk>``, which keeps every model artifact
    SQL-expressible (the oracle re-derives the identical model) and
    vocab-bounded.

    Scale shape: the per-doc stream folds to (doc, left, right,
    count) FIRST — one keyed shuffle, persisted, shared by the model
    build and the scoring (the :func:`char_lm_score` lifecycle). The
    VOCAB (top-V by corpus count, ties broken by word ASC) is ≤ V
    rows and the BIGRAM MODEL is ≤ V²-bounded (in practice bounded
    by observed bigrams): both broadcast by construction —
    vocab-bounded, never corpus-bounded, so the broadcasts are legal
    at any corpus size. OOV words map to ``<unk>`` via two
    vocab-sized left joins; P(r|l) = (c(l,r)+1)/(ctx(l)+V_eff) with
    ctx(l) = Σ_r c(l,r) and V_eff = |vocab|+1.

    Output: (id, n_bigrams, avg_neg_log2p), docs with ≥ 2 letter
    words only — epsilon-bias rounded like every float row."""
    c = F.col(text_col)
    # the empty-token filter is load-bearing: a letterless doc splits
    # to [''] and would otherwise put '' INTO the vocab (caught by the
    # property cross-check; the oracle filters '' explicitly)
    arr = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), "[^a-z]+", " ")), " "),
        lambda x: x != "",
    )
    # narrow-scan guard (1.70 → 1.38 s at sf0.1, r15 — guide §2.5)
    df = _par(df)
    words = df.select(F.col(id_col), arr.alias("_w")).filter(
        F.size(F.col("_w")) >= 1
    )
    bg = (
        words.filter(F.size(F.col("_w")) >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(F.col("_w")) - 2),
                    lambda i: F.struct(
                        F.col("_w")[i].alias("l"),
                        F.col("_w")[i + 1].alias("r"),
                    ),
                )
            ).alias("_b"),
        )
        .select(F.col(id_col), F.col("_b.l").alias("l"), F.col("_b.r").alias("r"))
        .groupBy(id_col, "l", "r")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if cache:
        bg = bg.persist()  # shared by the model build AND the scoring
    vocab = (
        words.select(F.explode(F.col("_w")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), F.asc("w"))
        .limit(vocab_size)
        .select("w")
    )
    unk = F.lit("<unk>")  # non-letter chars: can never collide
    mapped = (
        bg.join(
            F.broadcast(vocab.select(F.col("w").alias("_vl"))),
            F.col("l") == F.col("_vl"),
            "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("w").alias("_vr"))),
            F.col("r") == F.col("_vr"),
            "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("_vl"), unk).alias("lv"),
            F.coalesce(F.col("_vr"), unk).alias("rv"),
            "cnt",
        )
    )
    model = mapped.groupBy("lv", "rv").agg(F.sum("cnt").alias("c"))
    ctx = model.groupBy("lv").agg(F.sum("c").alias("cl"))
    veff = vocab.agg((F.count(F.lit(1)) + 1).cast("double").alias("v"))
    nll = -F.log2((F.col("c") + 1.0) / (F.col("cl") + F.col("v")))
    scored = (
        mapped.join(F.broadcast(model), on=["lv", "rv"])
        .join(F.broadcast(ctx), on=["lv"])
        .crossJoin(F.broadcast(veff))
        .select(id_col, "cnt", nll.alias("_nll"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        r4(F.sum(F.col("cnt") * F.col("_nll")) / F.sum("cnt"), 4).alias(
            "avg_neg_log2p"
        ),
    )


def dsir_logweight(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    cache: bool = True,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weight (Xie et al. 2023,
    public alg.: Data Selection with Importance Resampling) — score
    every document by how much more likely its content is under a
    TARGET domain's distribution than under the raw corpus's, using
    hashed n-gram bucket models. The standard recipe for "give me
    more documents like this high-quality subset" at corpus scale:
    rank/sample by the returned log weight.

    Model: unigram + bigram features, hashed into 256 buckets by md5
    hex prefix (the repo's engine-portable hash idiom —
    `sample_hash_split`); bucket distributions are add-``alpha``
    smoothed. ``log2 w(doc) = Σ_f cnt_f · log2( p_target(f) /
    p_raw(f) )`` with ``p(f) = (c_f + α) / (C + 256α)``.

    Scale shape: the per-doc stream folds to (doc, bucket, cnt) once
    — ONE keyed shuffle, persisted, shared by both model builds and
    the scoring (the :func:`char_lm_score` lifecycle). Both models
    are 256-row broadcasts BY CONSTRUCTION (bucket-count-bounded,
    never corpus-bounded). The target subset is a filter of the same
    fold — no second pass over the corpus.

    Output: (id, n_feats, dsir_logweight) — docs with ≥ 1 letter
    word; positive = more target-like."""
    feats = _dsir_feat_array(text_col)
    # narrow-scan guard: the unigram+bigram feature explode is the
    # heaviest per-row kernel in the text family (10.13 → 1.92 s at
    # sf0.1, r15 — guide §2.5)
    df = _par(df)
    fold = (
        df.withColumn("_t", target_pred)
        .select(F.col(id_col), F.col("_t"), F.explode(feats).alias("b"))
        .groupBy(id_col, "_t", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if cache:
        fold = fold.persist()  # shared by both model builds + scoring
    raw = fold.groupBy("b").agg(F.sum("cnt").alias("rc"))
    tgt = (
        fold.filter(F.col("_t"))
        .groupBy("b")
        .agg(F.sum("cnt").alias("tc"))
    )
    totals = raw.crossJoin(tgt.select(F.sum("tc").alias("T"))).agg(
        F.sum("rc").cast("double").alias("R"),
        # T = 0.0 (not NULL) when the target pool contributes zero
        # features (e.g. every flagged doc is empty) — sum() over an
        # empty table is NULL in SQL but dsir_model and the reference
        # recipe compute with T = 0; without the coalesce every
        # weight in that regime silently went NULL (r16 fix)
        F.coalesce(F.first("T").cast("double"), F.lit(0.0)).alias("T"),
    )
    lw = F.col("cnt") * (
        F.log2(
            (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
            / (F.col("T") + F.lit(256 * alpha))
        )
        - F.log2(
            (F.col("rc") + F.lit(alpha)) / (F.col("R") + F.lit(256 * alpha))
        )
    )
    scored = (
        fold.join(F.broadcast(raw), on="b")
        .join(F.broadcast(tgt), on="b", how="left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, "cnt", lw.alias("_lw"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_feats"),
        r4(F.sum("_lw"), 4).alias("dsir_logweight"),
    )


def _dsir_feat_array(text_col: str) -> Column:
    """Hashed uni+bigram bucket array for one document — the shared
    feature definition of :func:`dsir_logweight` / :func:`dsir_apply`
    (md5 hex-prefix 256 buckets).

    r15 OPT (guide §1.2 per-task work): the word array is LET-BOUND via
    a single-element ``transform`` so every inner reference is a cheap
    lambda-variable lookup. Spelled inline, ``arr[i]``/``arr[i+1]``
    inside the bigram lambda each re-embed the whole
    split(trim(regexp_replace(lower(text)))) pipeline, and interpreted
    HOF evaluation re-runs it PER BIGRAM ELEMENT — O(words²) per
    document (the optimized plan carried 18 regexp_replace copies).
    Measured at sf0.1, 32 cores: 0.66 → 0.15 s for the bare feature
    projection, byte-identical output."""
    c = F.col(text_col)
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), "[^a-z]+", " ")), " "),
        lambda x: x != "",
    )

    def body(arr: Column) -> Column:
        uni = F.transform(arr, lambda w: F.substring(F.md5(w), 1, 2))
        big = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(arr) - 2, F.lit(-1))),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", arr[i], arr[i + 1])), 1, 2
            ),
        )
        return F.when(F.size(arr) >= 2, F.concat(uni, big)).otherwise(uni)

    return F.transform(F.array(words), body)[0]


def dsir_model(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    alpha: float = 0.5,
) -> dict:
    """Derive the frozen DSIR bucket model offline — the
    derive-once/serve-forever half of the DSIR story: two 256-row
    bucket-count tables (raw corpus, target subset) + totals,
    collected driver-side (bucket-count-BOUNDED — 256 rows regardless
    of corpus size, the legal collect class). Feed the result to
    :func:`dsir_apply` to score any batch OR stream without touching
    the training corpus again."""
    # narrow-scan guard: same feature-explode kernel as dsir_logweight
    df = _par(df)
    fold = (
        df.withColumn("_t", target_pred)
        .select(F.col("_t"), F.explode(_dsir_feat_array(text_col)).alias("b"))
        .groupBy("_t", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    for r in fold:
        raw[r.b] = raw.get(r.b, 0) + r.cnt
        if r._t:
            tgt[r.b] = tgt.get(r.b, 0) + r.cnt
    return {
        "raw": raw,
        "tgt": tgt,
        "R": float(sum(raw.values())),
        "T": float(sum(tgt.values())),
        "alpha": alpha,
    }


def dsir_apply(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a FROZEN DSIR model from
    :func:`dsir_model` — pure per-row expressions, STATELESS, so the
    same call scores a batch frame or a Structured Streaming frame
    (the serving deployment: derive the model once offline, score the
    ingest stream forever; no shuffle, no state store). Per-bucket
    log-ratios are precomputed driver-side into a 256-entry map
    literal; buckets unseen at train time fall back to the
    zero-count ratio. The in-row aggregate is a higher-order function
    (interpreted — the r15 mega-stage lesson), which is the right
    trade here: the alternative explode+groupBy re-shuffles every
    scored batch, while this stays a map-only stage."""
    import math

    a, R, T = model["alpha"], model["R"], model["T"]

    def lr(b: str) -> float:
        return math.log2((model["tgt"].get(b, 0) + a) / (T + 256 * a)) - math.log2(
            (model["raw"].get(b, 0) + a) / (R + 256 * a)
        )

    default_lr = math.log2(a / (T + 256 * a)) - math.log2(a / (R + 256 * a))
    entries: list[Column] = []
    for b in sorted(model["raw"]):
        entries.append(F.lit(b))
        entries.append(F.lit(lr(b)))
    lrmap = F.create_map(*entries) if entries else F.create_map()
    bkts = _dsir_feat_array(text_col)
    w = F.aggregate(
        bkts,
        F.lit(0.0),
        lambda acc, b: acc
        + F.coalesce(F.element_at(lrmap, b), F.lit(default_lr)),
    )
    return (
        df.select(F.col(id_col), bkts.alias("_bk"), w.alias("_w"))
        .filter(F.size(F.col("_bk")) >= 1)
        .select(
            id_col,
            F.size(F.col("_bk")).cast("long").alias("n_feats"),
            r4(F.col("_w"), 4).alias("dsir_logweight"),
        )
    )
