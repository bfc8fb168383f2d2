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
# Driver-window rotation, round 5.  The per-round correctness gate records
# only the FIRST 50 registry entries in registration order.  This round:
# (1) the two round-4 hash-reds, freshly CAST-fixed, go first so the fix is
# driver-proven; (2) the four never-driver-checked entries; (3) the four
# NEW round-5 rows (source/mapper layer, UDAF, kNN-graph cogroup tier);
# (4) 40 of the 76 queries whose latest driver row is r1/r2, prioritized to
# the paths that CHANGED since they were last checked -- the whole siddhiql
# family (builder touched r3/r4/r5), batch patterns + aggs (events-reading,
# last verified pre-ts-fix), similarity (tiering changed r5), and
# dedup_minhash_lsh (cap default changed r5).  The remaining 36 r1/r2-stale
# rows (scalar/text/multimodal/table/dedup-exact families) rotate in r6.
# Iteration order of a dict is insertion order, so rebuilding REGISTRY
# re-ranks entries without touching any registration site.
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # (1) round-4 hash-reds, oracle CAST-fixed this round
    "text_chunk_dedup_ratio",
    "corpus_token_budget",
    # (2) never driver-checked
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "dedup_minhash_lsh_capped",
    # (3) new round-5 rows
    "source_file_csv_mapper",
    "source_kafka_json_value",
    "source_cdc_debezium",
    "agg_udaf_custom",
    "similarity_knn_graph",
    # (4a) siddhiql family -- front end changed since its r1 driver rows
    "siddhiql_filter",
    "siddhiql_timebatch_agg",
    "siddhiql_join",
    "siddhiql_join_aggregation",
    "siddhiql_pattern",
    "siddhiql_sequence",
    "siddhiql_absence_pattern",
    "siddhiql_logical_and_pattern",
    "siddhiql_logical_or_pattern",
    "siddhiql_count_quantifier",
    "siddhiql_named_window",
    "siddhiql_partition",
    "siddhiql_partition_range",
    "siddhiql_table_upsert",
    "siddhiql_output_rate_last",
    "siddhiql_define_aggregation",
    "siddhiql_file_source",
    # (4b) batch CEP patterns -- events-reading, r1-only rows
    "pattern_followed_by",
    "pattern_sequence_adjacent",
    "pattern_absence",
    "pattern_absence_logical",
    "pattern_logical_and",
    "pattern_logical_or",
    "pattern_count_quantifier",
    # (4c) aggregation family -- events-reading, r1-only rows
    "agg_basic",
    "agg_bool",
    "agg_forever_extrema",
    "agg_group_concat",
    "agg_having_orderby_limit",
    "agg_multikey",
    "agg_rollup_cube",
    "agg_unionset",
    # (4d) similarity tiering + LSH cap-default changed this round
    "similarity_bruteforce",
    "similarity_lsh",
    "similarity_ivf",
    "dedup_minhash_lsh",
    # (4e) singles: carried over from the r4 window miss + verdict asks
    "named_window_fanout",
    "filter_project",
    "tpch_q1",
)
_R3_MODULES: tuple[str, ...] = ()

# Round-6 rotation TODO: the remaining 36 r1/r2-stale rows -- scalar_*
# (6), cast_convert, conditional_fns, json_struct_roundtrip, regex_fns,
# text_* (4), multimodal_* (3), table_* (3), join_in/not_in/multiway,
# udtf_tokenize, union_streams, setops_intersect, partition_range_agg,
# ondemand_sql, incr_agg_day/hour_slice/month, dedup_exact/fingerprint/
# embedding_cosine, neardup_token_jaccard, filter_compound,
# pattern_first_match (displaced by source_cdc_debezium this round) —
# plus the r5-late never-checked rows source_file_xml_mapper,
# source_file_keyvalue_mapper, source_avro_wire_roundtrip,
# source_onerror_fault_split, siddhiql_define_function — and the
# round-5 second-session additions decontaminate_bloom, text_bm25_topk,
# streaming_dedup_watermark, similarity_pq, domain_mix_temperature,
# sample_leakage_safe_split, text_inverted_index, text_char_lm_score,
# text_cross_doc_repeats, sample_stratified_quota, embedding_normalize,
# streaming_ann_cell_ingest, text_chunk_documents,
# streaming_incremental_neardup, agg_distinct_count_salted, tpch_q14,
# tpch_q10, streaming_join_outer (all locally oracle-green, never
# driver-checked).


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
