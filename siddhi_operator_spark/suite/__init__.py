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
# Driver-window rotation, round 4.  The per-round correctness gate records
# only the FIRST 50 registry entries in registration order.  Round 3's 26
# non-green rows all traced to the events ts-ingest misread (fixed this
# round in catalog.py); they go FIRST so the fix is proven by the driver,
# not just locally.  Then the new r4 row (streaming absence NFA), then 23
# of the 49 queries whose only driver row is from round 1 — prioritized to
# the events-reading ones, which were last verified against the OLD fixture
# vintage and therefore exercise the new footer-sniffing read path.
# Iteration order of a dict is insertion order, so rebuilding REGISTRY
# re-ranks entries without touching any registration site.
# ---------------------------------------------------------------------------
_FRONT_NAMES = (
    # the 26 round-3 non-green rows (24 ts-ingest reds + 2 oracle=None errs,
    # both of which gain oracles this round)
    "ratelimit_first",
    "ratelimit_last",
    "ratelimit_snapshot",
    "streaming_timebatch",
    "streaming_cep_followed_by",
    "streaming_length_window",
    "streaming_session_window",
    "streaming_cep_count_quantifier",
    "streaming_cep_logical_and",
    "streaming_join_windowed",
    "window_expression",
    "window_cron",
    "window_unique_timebatch",
    "window_unique_dedup",
    "window_extrema_by_length",
    "window_expired_events",
    "agg_ts_regress_forecast",
    "table_cdc_feed",
    "multimodal_features",
    "pattern_optional_step",
    "siddhiql_trigger",
    "incr_agg_day_retrieval",
    "text_chunk_dedup_ratio",
    "join_asof",
    "join_range_interval",
    "corpus_token_budget",
    # new round-4 rows
    "streaming_cep_absence",
    "ml_kmeans",
    "ml_perceptron_online",
    # longest-unchecked (r1-only driver rows), events-reading first
    "window_length",
    "window_lengthbatch",
    "window_sliding_time",
    "window_timebatch",
    "window_timelength",
    "window_delay",
    "window_session",
    "window_externaltimebatch",
    "window_frequent",
    "window_lossy_frequent",
    "window_sort_topk",
    "window_extrema_by_time",
    "window_expression_batch",
    "window_unique_first",
    "window_unique_last",
    "join_windowed_self",
    "join_stream_table",
    "join_stream_aggregation",
    "join_outer_stream_table",
    "join_unidirectional",
    "join_theta_residual",
    "named_window_fanout",
)
# Everything registered by a round-3 module (new operators) also belongs in
# the window: rank = (0, front-pos) | (1, r3-module order) | (2, green tail).
_R3_MODULES: tuple[str, ...] = ()

# Round-5 rotation TODO: promote the r4-late additions that have no
# driver row yet (tpch_q3, tpch_q6, dedup_minhash_lsh_capped) plus the
# remaining r1-only tail (filter_project, tpch_q1, scalar_* family,
# agg_* family, json/regex fns, partition/setops/udtf rows —
# see CORRECTNESS_r01 ∖ (r02 ∪ r03 ∪ r04)).


def _rotate_for_driver_window() -> None:
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
