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
# Driver-window rotation, round 14.  The per-round correctness gate
# records only the FIRST 50 registry entries in registration order.
# This window executes the r13-pre-staged plan exactly: (1) r13 reds
# — there were none; (2) the THIRTY-TWO r8-stale rows the r13 window
# displaced (tpch tail, similarity/MIPS tail, decontaminate /
# domain-mix / curation rows, streaming text twins, collections and
# sketch-bound rows — the oldest ledger tail at 6 rounds); (3) every
# row ADDED in round 14 (never-checked): the QL front-door routing of
# the derived regime picks (`siddhiql_pattern_auto`,
# `siddhiql_join_windowed_auto` — r13 verdict #1: `@plan(impl=...)`
# / `@plan(bucket=...)` now reach `choose_pattern_impl` /
# `derive_join_bucket` from entry A) and the streaming hot-key
# insurance tier (`streaming_join_windowed_bucket` — epoch-widened
# join keys bound per-key state probes; r13 verdict #3); (4) rows
# whose EXECUTED CODE changed in r14: `choose_pattern_impl` /
# `derive_join_bucket` grew the decision memo + null-key filter +
# streaming guard (→ the two r13 auto rows), `_nearest_probe_scan`
# grew the id_col parameter (→ the two scan-tier rows),
# `streaming.joins.stream_stream_join` grew the bucket passthrough
# (→ `streaming_join_windowed`), and `siddhiql/builder.py`'s
# `_run_join` / `_run_pattern_simple` grew the `@plan` hint routing
# (→ every QL row that executes them: the join pair and the
# simple/or-chain/special pattern rows not already in group 2);
# (5) the r9-stale backlog in registry order — 1 of the 41 fits.
# After this window: never-checked = 0, r8-stale = 0, r9-stale = 40,
# max staleness = 5.
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # (2) the thirty-two r8-stale rows (oldest ledger tail)
    "tpch_q11",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    "dedup_simhash",
    "similarity_ivfpq",
    "sample_hash_split",
    "similarity_ann_recall",
    "pii_mask",
    "quality_repetition",
    "decontaminate_ngram",
    "domain_mix_sample",
    "seq_pack_bins",
    "text_winnow_fingerprint",
    "corpus_weighted_sample",
    "text_tfidf_top_terms",
    "embedding_centroids",
    "text_pretokenize_bpe",
    "text_classifier_train",
    "text_dedup_lines",
    "similarity_int8_recall",
    "similarity_mips",
    "similarity_mips_ann_recall",
    "streaming_incr_agg_replay",
    "streaming_text_dedup_lines",
    "streaming_text_remove_spans",
    "siddhiql_star_quantifier",
    "list_fns",
    "map_fns",
    "approx_distinct_bound",
    "sketch_count_min",
    "approx_percentile_bound",
    # (3) new in r14 — never checked
    "siddhiql_pattern_auto",
    "siddhiql_join_windowed_auto",
    "streaming_join_windowed_bucket",
    "siddhiql_absence_auto",
    "siddhiql_streaming_join_bucket",
    # (4) executed code changed in r14
    "pattern_followed_by_auto",
    "join_windowed_self_auto",
    "pattern_followed_by_scan",
    "pattern_absence_scan",
    "streaming_join_windowed",
    "siddhiql_join",
    "siddhiql_join_aggregation",
    "siddhiql_pattern",
    "siddhiql_sequence",
    "siddhiql_logical_or_pattern",
    "siddhiql_absence_pattern",
    "siddhiql_logical_and_pattern",
    # (5) r9-stale backlog, registry order (1 of 41 — the other two
    # filler slots went to `siddhiql_absence_auto` and
    # `siddhiql_streaming_join_bucket`, added mid-round)
    "window_externaltimebatch",
)
_R3_MODULES: tuple[str, ...] = ()

# Round-15 rotation, pre-staged: lead with any r14 reds, then the
# FORTY remaining r9-stale rows this window displaced, in registry
# order (window_sliding_time, window_sort_topk, window_frequent,
# window_unique_last,
# window_timelength, window_delay, window_lossy_frequent,
# window_expression_batch, window_unique_first,
# window_extrema_by_time, window_expression, window_cron,
# window_unique_timebatch, window_unique_dedup,
# window_extrema_by_length, window_expired_events,
# join_stream_table, join_outer_stream_table, join_theta_residual,
# join_stream_aggregation, join_asof, join_range_interval,
# agg_ts_regress_forecast, ratelimit_first, ratelimit_last,
# ratelimit_snapshot, incr_agg_day_retrieval, multimodal_features,
# streaming_timebatch, streaming_cep_followed_by,
# streaming_length_window, streaming_session_window,
# streaming_cep_absence, streaming_cep_count_quantifier,
# streaming_cep_logical_and, pattern_optional_step,
# siddhiql_trigger, siddhiql_bucketed_length_window, table_cdc_feed,
# ml_kmeans — re-verify by folding CORRECTNESS_r01..r14 against the
# registry before staging), then every
# row added in round 15 (never-checked), then rows whose code changes
# in r15, then the r10-stale backlog in registry order (43 rows last
# checked r10) with the balance of 50.  New registry rows displace
# the NEWEST-checked tail entries, never the stale/never-checked
# groups.
#
# (Archive) Round-13 rotation as executed: (1) no r12 reds; (2) the
# twenty-seven r7-stale rows (multimodal quartet, text tail,
# streaming join/ratelimit/approx tail, siddhiql
# plugin/playback/CR rows); (3) r13 additions
# (`pattern_followed_by_auto`, `join_windowed_self_auto`); (4)
# changed-code rows (five operator-tier pattern rows + three
# `windowed_stream_join` callers); (5) the r8-stale backlog balance
# (window_timebatch … tpch_q2).  Left r8-stale = 32, max staleness 6
# — retired by the r14 window above.
#
# (Archive) Round-13 rotation as pre-staged in r12: lead with any r12
# reds, then the TWENTY-SEVEN r7-stale rows (multimodal quartet,
# streaming tail, siddhiql plugin/playback/CR, text rows), then rows
# added in r13, then changed-code rows, then the r8-stale backlog
# with the balance of 50 — EXECUTED EXACTLY by the window above.
#
# (Archive) Round-12 rotation as executed: (1) no r11 reds; (2) the
# seventeen r6-stale rows (text/streaming tail + wire-codec source
# family); (3) r12 additions (bucketed-kslack pair, scan-tier pair);
# (4) changed-code rows (six ivfpq + csv mapper + corpus shuffle);
# (5) r7-stale backlog balance (scalar_math …
# dedup_connected_components, text_token_stats).  Left r7-stale = 27,
# max staleness 6 — retired by the r13 window above.
#
# (Archive) Round-12 rotation as pre-staged in r11: lead with any r11
# reds, then the SEVENTEEN r6-stale rows (text/streaming/source
# tail), then rows added in r12, then changed-code rows, then the
# r7-stale backlog with the balance of 50 — EXECUTED EXACTLY by the
# window above.
#
# (Archive) Round-11 rotation as pre-staged in r10: lead with any r10
# reds, then `siddhiql_reorder_akslack` (the only never-checked row),
# then the TEN r5-stale rows (siddhiql pattern/source tail +
# source_* trio), then rows added in r11, then changed-code rows,
# then the r6-stale backlog with the balance of 50 — EXECUTED EXACTLY
# by the window above.
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
