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
# Driver-window rotation, round 13.  The per-round correctness gate
# records only the FIRST 50 registry entries in registration order.
# This window executes the r12-pre-staged plan exactly: (1) r12 reds
# — there were none; (2) the TWENTY-SEVEN r7-stale rows the r12
# window displaced (multimodal quartet, text tail, streaming
# join/ratelimit/approx tail, siddhiql plugin/playback/CR rows — the
# oldest ledger tail at 6 rounds); (3) every row ADDED in round 13
# (never-checked): `pattern_followed_by_auto` and
# `join_windowed_self_auto` — the derived regime picks
# (`operators/patterns.py::choose_pattern_impl`,
# `operators/joins.py::derive_join_bucket`), closing the r12
# verdict's "one remaining hand knob" and extending the same
# discipline to the join family's hot-key insurance tier; (4) rows
# whose EXECUTED CODE changed in r13: the five operator-tier pattern
# rows (`followed_by`/`absence`/`absence_logical` grew the
# `impl="auto"` branch and the widened impl validation; the QL
# pattern rows build their joins inline in `siddhiql/builder.py` and
# are unchanged) and the three `windowed_stream_join` callers not
# already in group (2) (`join_windowed_self`, `join_unidirectional`,
# `streaming_join_windowed` — the function grew the bucket='auto'
# branch); (5) the r8-stale backlog
# in registry order — 13 of the 45 rows last checked r8 fit
# (window_timebatch … tpch_q2).  After this window: never-checked
# = 0, r7-stale = 0, r8-stale = 32, max staleness = 6 (the r8 tail
# displaced to r14).
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # (2) the twenty-seven r7-stale rows (oldest ledger tail)
    "text_quality",
    "text_langid",
    "text_shingles",
    "multimodal_meta",
    "multimodal_frame_sample",
    "multimodal_decode_real",
    "text_inverted_index",
    "embedding_normalize",
    "dedup_semantic_clusters",
    "embedding_quantize_int8",
    "text_quality_classifier",
    "streaming_join_unidirectional",
    "streaming_ratelimit_snapshot",
    "streaming_expression_window",
    "streaming_join_table_probe",
    "streaming_approx_distinct",
    "streaming_approx_percentile",
    "streaming_sliding_panes",
    "streaming_reorder_kslack",
    "streaming_join_full_outer",
    "streaming_incr_agg_state",
    "siddhiql_cr_process",
    "siddhiql_streaming_filter_agg",
    "siddhiql_custom_window_plugin",
    "siddhiql_custom_source_plugin",
    "siddhiql_playback",
    "sink_http_json_roundtrip",
    # (3) new in r13 — never checked
    "pattern_followed_by_auto",
    "join_windowed_self_auto",
    # (4) executed code changed in r13 (impl='auto' branch + widened
    # validation in operators/patterns.py; bucket='auto' branch in
    # operators/joins.py::windowed_stream_join — every row that calls
    # it rotates in: the three below plus streaming_join_outer /
    # _unidirectional / _full_outer already in group (2))
    "pattern_followed_by",
    "pattern_absence",
    "pattern_absence_logical",
    "pattern_followed_by_scan",
    "pattern_absence_scan",
    "join_windowed_self",
    "join_unidirectional",
    "streaming_join_windowed",
    # (5) r8-stale backlog, registry order (13 of 45)
    "window_timebatch",
    "window_length",
    "window_lengthbatch",
    "window_session",
    "window_topk",
    "window_batch_chunk",
    "agg_extrema_min_max_by",
    "analytic_window_fns",
    "set_ops",
    "tpch_q8",
    "tpch_q12",
    "tpch_q17",
    "tpch_q2",
)
_R3_MODULES: tuple[str, ...] = ()

# Round-14 rotation, pre-staged: lead with any r13 reds, then the
# THIRTY-TWO remaining r8-stale rows this window displaced
# (tpch_q11, tpch_q16, tpch_q20, tpch_q21, dedup_simhash,
# similarity_ivfpq, sample_hash_split,
# similarity_ann_recall, pii_mask, quality_repetition,
# decontaminate_ngram, domain_mix_sample, seq_pack_bins,
# text_winnow_fingerprint, corpus_weighted_sample,
# text_tfidf_top_terms, embedding_centroids, text_pretokenize_bpe,
# text_classifier_train, text_dedup_lines, similarity_int8_recall,
# similarity_mips, similarity_mips_ann_recall,
# streaming_incr_agg_replay, streaming_text_dedup_lines,
# streaming_text_remove_spans, siddhiql_star_quantifier, list_fns,
# map_fns, approx_distinct_bound, sketch_count_min,
# approx_percentile_bound — the oldest ledger tail at 6 rounds stale
# in r14), then every row added in round 14 (never-checked), then
# rows whose code changes in r14, then the r9-stale backlog in
# registry order (44 rows last checked r9) with the balance of 50.
# New registry rows displace the NEWEST-checked tail entries, never
# the stale/never-checked groups.
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
