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
# Driver-window rotation, round 9.  The per-round correctness gate
# records only the FIRST 50 registry entries in registration order.
# This window executes the r8-pre-staged plan: (1) r8 reds — there
# were none; (2) every row ADDED in round 9 (never-checked): the
# akslack reorder row, the QL bucketed-length row, and the IVFADC
# incremental pair (append + streaming ingest); (3) rows whose
# EXECUTED PLAN changed in round 9 — the two span-removal rows (the
# persisted-tail release + fp_counts refactor sits under both) and
# the ivfpq index row (deterministic reused layout) — green last
# round, but the code under them is new, so they re-prove.
# (mips_ann_recall and corpus_shuffle_order also saw module edits,
# but their rows pin EXPLICIT geometry / gained only an input
# assert — plans untouched, so they hold their r8 green.)
# (4) the TWELVE r4 fillers the r8 window displaced (the oldest
# ledger tail); (5) the balance of the r4-stale backlog in registry
# order — 43 of the 44 r4 rows fit; `ml_perceptron_online` is the
# one row left at r4 (re-verified locally this session, leads the
# r10 plan below).  After this window: never-checked = 0, r4-stale
# = 1, max staleness ≤ 5 (the single perceptron row).
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # (2) new in r9 — never checked
    "streaming_reorder_akslack",  # adaptive K-slack, md5-jittered replay
    "siddhiql_bucketed_length_window",  # @app:stateBuckets via QL text
    "similarity_ivfpq_append",  # frozen-quantizer incremental index
    "streaming_ivfpq_ingest",  # cell-assign + PQ-encode on ingest
    # (3) executed plan changed in r9
    "text_remove_repeated_spans",  # fp_counts refactor under the probe
    "text_remove_spans_bloom",  # persisted-tail release + cache registry
    "similarity_ivfpq_index",  # deterministic reused index layout
    # (4) the twelve r4 fillers displaced by r8's additions
    "window_expired_events",
    "join_stream_table",
    "join_windowed_self",
    "join_asof",
    "join_unidirectional",
    "ratelimit_first",
    "ratelimit_last",
    "window_cron",
    "window_delay",
    "window_timelength",
    "window_sort_topk",
    "window_sliding_time",
    # (5) balance of the r4-stale backlog, registry order
    "window_externaltimebatch",
    "window_frequent",
    "window_unique_last",
    "window_lossy_frequent",
    "window_expression_batch",
    "window_unique_first",
    "window_extrema_by_time",
    "window_expression",
    "window_unique_timebatch",
    "window_unique_dedup",
    "window_extrema_by_length",
    "join_outer_stream_table",
    "join_theta_residual",
    "join_stream_aggregation",
    "join_range_interval",
    "agg_ts_regress_forecast",
    "ratelimit_snapshot",
    "incr_agg_day_retrieval",
    "multimodal_features",
    "streaming_timebatch",
    "streaming_cep_followed_by",
    "streaming_length_window",
    "streaming_session_window",
    "streaming_cep_absence",
    "streaming_cep_count_quantifier",
    "streaming_cep_logical_and",
    "streaming_join_windowed",
    "pattern_optional_step",
    "siddhiql_trigger",
    "table_cdc_feed",
    "ml_kmeans",
)
_R3_MODULES: tuple[str, ...] = ()

# Round-10 rotation, pre-staged: lead with any r9 reds, then
# `ml_perceptron_online` (the single remaining r4 row — locally green
# this session), then every row added in round 10 (never-checked),
# then rows whose code changes in r10, then the r5-stale backlog in
# registry order (50 rows last checked r5: the agg family, the batch
# pattern family, the siddhiql core rows, the similarity ivf/lsh/knn
# trio, tpch q1/q3/q5/q6, dedup_minhash_lsh — they become the oldest
# tail at 5 rounds stale in r10), with the balance of 50.  New
# registry rows displace the NEWEST-checked tail entries, never the
# stale/never-checked groups.

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
    assert len(_FRONT_NAMES) <= 50, f"{len(_FRONT_NAMES)} front names > 50"
    unknown = [n for n in _FRONT_NAMES if n not in REGISTRY]
    assert not unknown, f"front names not in REGISTRY: {unknown}"

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
