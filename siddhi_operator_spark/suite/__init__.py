"""The registered query suite — one entry per implemented operator from
SURVEY.md §3, each with (where SQL-expressible) a DuckDB oracle.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry. Importing this package registers everything.
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# registration side effects
from . import core  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import aggs  # noqa: E402,F401
from . import patterns  # noqa: E402,F401
from . import ratelimit  # noqa: E402,F401
from . import incremental  # noqa: E402,F401
from . import tables  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import streaming_suite  # noqa: E402,F401
from . import siddhiql_suite  # noqa: E402,F401
from . import collections  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import cdc  # noqa: E402,F401
from . import ml_suite  # noqa: E402,F401
from . import sources_suite  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window rotation, round 10.  The per-round correctness gate
# records only the FIRST 50 registry entries in registration order.
# This window executes the r9-pre-staged plan exactly: (1) r9 reds —
# there were none; (2) `ml_perceptron_online`, the single r4-stale
# row (5 rounds; independently re-verified green in r9); (3) every
# row ADDED in round 10 (never-checked): the streaming IVFADC
# serving-loop row (foreachBatch append + probe-after-ingest) and
# the two QL stateBuckets rows (bucketed CEP pattern, bucketed
# expression window — `_route_streaming_expression` is new surface);
# (4) rows whose EXECUTED PLAN changed in round 10: the two
# span-removal rows (prefilter validation + the Observation-based
# same-basis auto decision sit under both), the ivfpq index + append
# rows (code-versioned cache key re-proves a fresh layout), the
# akslack row (integer-DIV quantile + the single-batch assert), and
# the ivfpq ingest row (_materialize signature change); (5) the
# r5-stale backlog in registry order — 40 of the 50 rows last
# checked r5 fit (filter_project … siddhiql_table_upsert); the ten
# displaced (siddhiql_partition_range, siddhiql_join_aggregation,
# siddhiql_count_quantifier, siddhiql_absence_pattern,
# siddhiql_logical_and_pattern, siddhiql_file_source,
# siddhiql_logical_or_pattern, source_file_csv_mapper,
# source_kafka_json_value, source_cdc_debezium) stay at staleness 5
# and lead the r11 plan below.  After this window: never-checked =
# 0, r5-stale = 10, max staleness = 5.
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # (2) the single r4 row — oldest in the ledger
    "ml_perceptron_online",
    # (3) new in r10 — never checked
    "similarity_ivfpq_stream_serve",  # foreachBatch serving loop
    "siddhiql_bucketed_pattern",  # @app:stateBuckets -> bucketed NFA
    "siddhiql_bucketed_expression_window",  # new QL routing surface
    # (4) executed plan changed in r10
    "text_remove_repeated_spans",  # prefilter validation + observe
    "text_remove_spans_bloom",  # unconditional tail release
    "similarity_ivfpq_index",  # code-versioned layout cache key
    "similarity_ivfpq_append",  # same (fresh layout re-proves)
    "streaming_reorder_akslack",  # integer-DIV quantile + batch assert
    # (3b) added mid-round from the ask-#8 measurement: the bucketed
    # akslack row displaces `streaming_ivfpq_ingest` per the
    # displacement rule (newest-checked tier; its only r10 delta is a
    # default-arg added to _materialize, which five other in-window
    # streaming rows exercise — including both akslack rows, which
    # pass expect_single_batch explicitly)
    "streaming_reorder_akslack_bucketed",
    # (5) r5-stale backlog, registry order (40 of 50)
    "filter_project",
    "named_window_fanout",
    "agg_basic",
    "agg_forever_extrema",
    "agg_unionset",
    "agg_bool",
    "agg_having_orderby_limit",
    "agg_multikey",
    "agg_rollup_cube",
    "tpch_q1",
    "agg_group_concat",
    "tpch_q6",
    "tpch_q3",
    "tpch_q5",
    "agg_udaf_custom",
    "pattern_followed_by",
    "pattern_absence",
    "pattern_sequence_adjacent",
    "pattern_count_quantifier",
    "pattern_logical_and",
    "pattern_absence_logical",
    "pattern_logical_or",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "similarity_bruteforce",
    "similarity_knn_graph",
    "similarity_lsh",
    "similarity_ivf",
    "text_chunk_dedup_ratio",
    "corpus_token_budget",
    "siddhiql_filter",
    "siddhiql_timebatch_agg",
    "siddhiql_pattern",
    "siddhiql_join",
    "siddhiql_partition",
    "siddhiql_sequence",
    "siddhiql_output_rate_last",
    "siddhiql_named_window",
    "siddhiql_define_aggregation",
    "siddhiql_table_upsert",
)
_R3_MODULES: tuple[str, ...] = ()

# Round-11 rotation, pre-staged: lead with any r10 reds, then
# `siddhiql_reorder_akslack` (added late in r10 after the window
# filled — local-oracle-green, the only never-checked row), then the
# TEN r5-stale rows this window displaced (siddhiql_partition_range,
# siddhiql_join_aggregation, siddhiql_count_quantifier,
# siddhiql_absence_pattern, siddhiql_logical_and_pattern,
# siddhiql_file_source, siddhiql_logical_or_pattern,
# source_file_csv_mapper, source_kafka_json_value,
# source_cdc_debezium — they become the oldest ledger tail at 6
# rounds stale in r11), then every row added in round 11
# (never-checked), then rows whose code changes in r11, then the
# r6-stale backlog in registry order (48 rows last checked r6) with
# the balance of 50.  New registry rows displace the NEWEST-checked
# tail entries, never the stale/never-checked groups.
#
# (Archive) Round-10 rotation as pre-staged in r9: lead with any r9
# reds, then `ml_perceptron_online` (the single remaining r4 row),
# then every row added in round 10 (never-checked), then rows whose
# code changed in r10, then the r5-stale backlog in registry order
# with the balance of 50 — EXECUTED EXACTLY by the window above.

# Round-8 rotation, pre-staged: lead with any r7 reds (there were
# none), then the FIVE never-driver-checked r7 tail rows (tpch_q8,
# tpch_q12, tpch_q17, similarity_int8_recall, similarity_mips —
# local-green, added after the window filled), then every row added in
# round 8 (never-checked), then the REMAINING r3-stale rows —
# the twelve displaced from this window by r7's new rows
# (similarity_ann_recall, pii_mask, quality_repetition,
# decontaminate_ngram, domain_mix_sample, sample_hash_split,
# window_topk, window_batch_chunk, set_ops, agg_extrema_min_max_by,
# analytic_window_fns, dedup_simhash) plus seq_pack_bins,
# text_winnow_fingerprint, corpus_weighted_sample,
# text_tfidf_top_terms, embedding_centroids, siddhiql_star_quantifier,
# list_fns, map_fns, approx_distinct_bound, sketch_count_min,
# approx_percentile_bound — then the oldest r4 rows (window family,
# join family, ratelimit trio, streaming CEP) with the balance of 50.
# New registry rows displace the NEWEST-checked tail entries, never
# the stale/never-checked groups.
#
# Round-9 rotation, pre-staged: lead with any r8 reds, then every row
# added in round 9 (never-checked — ALL twelve r8 additions made this
# window, so r9 starts with zero never-checked backlog), then any rows
# whose code changes in r9, then the TWELVE r4 fillers this window
# displaced (window_expired_events, join_stream_table,
# join_windowed_self, join_asof, join_unidirectional, ratelimit_first,
# ratelimit_last, window_cron, window_delay, window_timelength,
# window_sort_topk, window_sliding_time — they become the oldest
# ledger tail at 5 rounds stale), then balance to the oldest-checked
# remaining rows in registry order.


def _rotate_for_driver_window() -> None:
    # the driver records ONLY the first 50 — a 51st front name silently
    # falls out of the window (bit round 4: named_window_fanout), and a
    # typo'd name silently rotates nothing in.
    if len(_FRONT_NAMES) > 50:  # contract checks — must survive python -O
        raise RuntimeError(f"{len(_FRONT_NAMES)} front names > 50")
    unknown = [n for n in _FRONT_NAMES if n not in REGISTRY]
    if unknown:
        raise RuntimeError(f"front names not in REGISTRY: {unknown}")

    def rank(item):
        name, spec = item
        if name in _FRONT_NAMES:
            return (0, _FRONT_NAMES.index(name), 0)
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        if mod in _R3_MODULES:
            return (1, _R3_MODULES.index(mod), 0)
        return (2, 0, 0)

    ordered = sorted(REGISTRY.items(), key=rank)  # stable: keeps in-module order
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_for_driver_window()
