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
# Driver-window rotation, round 8.  The per-round correctness gate records
# only the FIRST 50 registry entries in registration order.  This window
# executes the r7-pre-staged plan: (1) r7 reds — there were none;
# (2) the FIVE never-driver-checked r7 tail rows; (3) every row ADDED
# in round 8 (never-checked); (4) the three text rows whose CODE
# changed this round (broadcast hints dropped / refold refactor) —
# green last round, but the plan under them is new, so they re-prove;
# (5) the 22 remaining r3-stale rows (5 rounds — the oldest tail);
# (6) balance to the oldest r4 rows in registry order (window family,
# join family, ratelimit trio).  New r8 rows added after this window
# fills displace the NEWEST-checked r4 fillers at the END of the
# tuple, never groups (2)-(5).  After this window: never-checked = 0,
# r3-stale = 0, max staleness ≤ 4 rounds.  Iteration order of a dict
# is insertion order, so rebuilding REGISTRY re-ranks entries without
# touching registration sites.
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # (2) never driver-checked r7 tail rows
    "tpch_q8",
    "tpch_q12",
    "tpch_q17",
    "similarity_int8_recall",
    "similarity_mips",
    # (3) new r8 rows — never checked
    "similarity_mips_ann_recall",  # norm-augmented multi-band LSH MIPS tier
    "streaming_incr_agg_replay",  # crash-replay exactly-once contract
    "streaming_text_dedup_lines",  # streaming twin of line dedup
    "streaming_text_remove_spans",  # streaming twin of span removal
    "tpch_q2",  # TPC-H completion batch (22/22): correlated-min supplier
    "tpch_q11",  # fraction-of-total HAVING
    "tpch_q16",  # anti-join + countDistinct buckets
    "tpch_q20",  # nested-semi-join qualification
    "tpch_q21",  # per-order EXISTS/NOT-EXISTS collapse
    "text_remove_spans_bloom",  # bloom pre-filter tier, same oracle
    "corpus_shuffle_order",  # deterministic epoch shuffle, two-pass rank
    "similarity_ivfpq",  # IVFADC composed: cell-pruned ADC scoring
    "similarity_ivfpq_recall",  # its accuracy contract vs exact dot
    "text_classifier_train",  # logistic-GD trainer, unrolled oracle
    "similarity_ivfpq_index",  # partitioned-by-cell layout round-trip
    "text_pretokenize_bpe",  # GPT-2-style pre-tokenizer count
    # (4) code changed in r8 — de-hinted broadcasts / shared refold
    "text_dedup_lines",
    "text_remove_repeated_spans",
    "text_tfidf_top_terms",  # also r3-stale
    # (5) r3-stale rows — the oldest ledger tail
    "agg_extrema_min_max_by",
    "analytic_window_fns",
    "approx_distinct_bound",
    "approx_percentile_bound",
    "corpus_weighted_sample",
    "decontaminate_ngram",
    "dedup_simhash",
    "domain_mix_sample",
    "embedding_centroids",
    "list_fns",
    "map_fns",
    "pii_mask",
    "quality_repetition",
    "sample_hash_split",
    "seq_pack_bins",
    "set_ops",
    "siddhiql_star_quantifier",
    "similarity_ann_recall",
    "sketch_count_min",
    "text_winnow_fingerprint",
    "window_batch_chunk",
    "window_topk",
    # (6) balance: oldest r4 rows, registry order — displaceable tail
    "window_timebatch",
    "window_length",
    "window_lengthbatch",
    "window_session",
    # (the twelve newest-checked r4 fillers — window_expired_events,
    # join_stream_table, join_windowed_self, join_asof,
    # join_unidirectional, ratelimit_first, ratelimit_last,
    # window_cron, window_delay, window_timelength, window_sort_topk,
    # window_sliding_time — were displaced by the r8 TPC-H completion
    # batch, the bloom-tier row, the epoch-shuffle row, the IVFADC
    # trio (in-memory, recall, partitioned index), the classifier
    # trainer and the BPE pre-tokenizer row, per the displace-the-END
    # rule above)
)
_R3_MODULES: tuple[str, ...] = ()

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
# added in round 9 (never-checked — ALL ten r8 additions made this
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
