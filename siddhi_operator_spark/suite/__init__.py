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
# Driver-window rotation, round 6.  The per-round correctness gate records
# only the FIRST 50 registry entries in registration order.  Round 5 left
# 27 registry entries that had NEVER seen a driver row (wire codecs, the
# http/xml/keyvalue sources, the round-5 text/curation/PQ/bloom tier, the
# streaming twins) and 37 rows last driver-checked in r1/r2.  This window
# is exactly: all 27 never-checked entries + the 17 remaining r1-stale
# rows + 6 r2-stale rows (the dedup-exact family, ondemand_sql,
# pattern_first_match) = 50, driving the never-checked count to ZERO and
# the stale tail down to the 14 rows pre-staged for round 7 below.
# Iteration order of a dict is insertion order, so rebuilding REGISTRY
# re-ranks entries without touching any registration site.
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # (1) never driver-checked: sources / mappers / wire codecs
    "source_http_json_stream",
    "source_avro_wire_roundtrip",
    "source_protobuf_wire_roundtrip",
    "source_binary_wire_roundtrip",
    "source_file_xml_mapper",
    "source_file_keyvalue_mapper",
    "source_onerror_fault_split",
    "sink_file_csv_roundtrip",
    "siddhiql_define_function",
    # (2) never driver-checked: aggregates / TPC-H / ANN
    "agg_distinct_count_salted",
    "tpch_q10",
    "tpch_q14",
    "similarity_pq",
    "embedding_normalize",
    # (3) never driver-checked: round-5 text / curation tier
    "sample_leakage_safe_split",
    "sample_stratified_quota",
    "decontaminate_bloom",
    "domain_mix_temperature",
    "text_bm25_topk",
    "text_inverted_index",
    "text_char_lm_score",
    "text_cross_doc_repeats",
    "text_chunk_documents",
    # (4) never driver-checked: streaming twins
    "streaming_dedup_watermark",
    "streaming_ann_cell_ingest",
    "streaming_incremental_neardup",
    "streaming_join_outer",
    # (5) r1-stale: scalar / expression family
    "cast_convert",
    "conditional_fns",
    "filter_compound",
    "json_struct_roundtrip",
    "regex_fns",
    "scalar_json",
    "scalar_pol2cart",
    "scalar_str",
    "scalar_str_extra",
    "scalar_time",
    # (6) r1-stale: joins / set ops / routing
    "join_in_table",
    "join_not_in_table",
    "join_multiway_dims",
    "setops_intersect",
    "union_streams",
    "udtf_tokenize",
    "partition_range_agg",
    # (7) r2-stale: dedup family + singles
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_embedding_cosine",
    "neardup_token_jaccard",
    "ondemand_sql",
    "pattern_first_match",
)
_R3_MODULES: tuple[str, ...] = ()

# Round-7 rotation, pre-staged (verdict r5 task 2): after this window the
# ONLY rows >4 rounds stale are these 14 r2-rows — scalar_math,
# incr_agg_day, incr_agg_hour_slice, incr_agg_month,
# multimodal_decode_real, multimodal_frame_sample, multimodal_meta,
# table_delete, table_update_add, table_upsert, text_langid,
# text_quality, text_shingles, text_token_stats — which MUST lead the r7
# window, followed by the rows newly added in round 6 (never-checked):
# streaming_join_unidirectional, streaming_ratelimit_snapshot, tpch_q4,
# tpch_q7, tpch_q13, tpch_q15, tpch_q18, agg_percentile,
# streaming_expression_window, dedup_semantic_clusters,
# siddhiql_cr_process, streaming_join_table_probe,
# streaming_approx_distinct, siddhiql_streaming_filter_agg,
# scalar_udf_registered, join_bucketed_colocated, tpch_q9, tpch_q19,
# tpch_q22, streaming_approx_percentile, streaming_sliding_panes —
# with the balance of the 50
# going to the oldest r3/r4 rows.


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
