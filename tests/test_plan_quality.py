"""Plan-quality assertions: the physical plan, not just the answer.

These encode the 100 TB design contract: filters reach the parquet scan,
projections prune columns, small dimensions broadcast, pipelines stay inside
whole-stage codegen, and top-k never globally sorts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_spark.plans.queries import REGISTRY


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_time_range_filter_pushed_to_scan(spark, sf_dir):
    df = REGISTRY["recent_events_scan"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters:" in plan
    # the ns->us conversion wraps ts, but the event_id/batch pruning still
    # applies; the scan must not read props for this projection
    assert "props" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_projection_prunes_columns(spark, sf_dir):
    df = REGISTRY["topk_events_by_value"].spark(spark, sf_dir)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "event_type" not in read_schema and "props" not in read_schema
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_q1_filter_pushdown_and_partial_agg(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial + final (map-side combine); AQE hides codegen ids pre-execution
    assert plan.count("HashAggregate") >= 2


def test_revenue_join_broadcasts_dims(spark, sf_dir):
    df = REGISTRY["revenue_by_nation"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # customer/nation never shuffle lineitem


def test_semi_anti_join_strategies(spark, sf_dir):
    semi = REGISTRY["customer_order_activity"].spark(spark, sf_dir)
    anti = REGISTRY["customers_without_orders"].spark(spark, sf_dir)
    assert "LeftSemi" in plan_of(semi)
    assert "LeftAnti" in plan_of(anti)


def test_window_chain_single_exchange(spark, sf_dir):
    # all per-user windows share one hash partitioning: exactly one exchange
    # on user_id in the lag plan
    df = REGISTRY["lag_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(user_id") == 1


def test_feature_pipeline_no_unbounded_following(spark, sf_dir):
    # regression guard for the O(n^2) shrinking-frame trap: the pipeline plan
    # must not contain an UNBOUNDED FOLLOWING window frame
    from weather_data_pipeline_spark.plans import features as FP

    df = FP.full_feature_pipeline(FP.events_as_weather(spark, sf_dir))
    plan = plan_of(df)
    assert "unboundedfollowing$()" not in plan.lower().replace(" ", "")


def test_label_encode_apply_is_join_free(spark, sf_dir):
    # E1 apply is a map-literal projection over a driver-collected vocab
    # (bounded like standardize()'s stats row): no join of any kind and no
    # exchange on the fact side — the lookup fuses into the scan's codegen
    # stage (r7: the old per-column broadcast-join shape cost the feature
    # pipeline three extra AQE stage materializations)
    df = REGISTRY["label_encode_event_type"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_band_join_broadcast_nested_loop(spark, sf_dir):
    # non-equi join against the O(10)-row band dim must broadcast the dim and
    # stream the fact side — never shuffle or cartesian both sides
    df = REGISTRY["band_join_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q4_semi_join_with_residual(spark, sf_dir):
    # EXISTS compiles to a left-semi hash join on the equi key; the date
    # filter is pushed to the orders scan so pruning happens before shuffle
    df = REGISTRY["q4_late_shipping_priority"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "LeftSemi" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_q5_broadcasts_small_dims(spark, sf_dir):
    # supplier/nation⋈region broadcast; only the two facts shuffle
    df = REGISTRY["q5_local_supplier_volume"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 2


def test_ranking_windows_share_one_exchange(spark, sf_dir):
    # all five rank functions share one (user_id) partitioning: one shuffle,
    # one Window operator evaluating the whole family
    df = REGISTRY["ranking_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    import re

    assert plan.count("hashpartitioning(user_id") == 1
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1


def test_gapfill_spine_is_broadcast_side(spark, sf_dir):
    # the generated hour spine is tiny; the hourly rollup must not be
    # re-shuffled into a sort-merge join against it
    df = REGISTRY["time_bucket_gapfill_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "SortMergeJoin" not in plan


def test_q6_all_filters_pushed_no_shuffle(spark, sf_dir):
    # pure scan-filter-agg: every predicate reaches the parquet reader and
    # only the 1-row partials cross the wire (single final agg, no data shuffle)
    df = REGISTRY["q6_forecast_revenue"].spark(spark, sf_dir)
    plan = plan_of(df)
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # 4-column projection pruned


def test_q19_extracts_equi_key_not_cartesian(spark, sf_dir):
    # the OR-of-ANDs join keeps p_partkey = l_partkey as the hash key with a
    # residual — it must never degrade to a cartesian/nested-loop product
    df = REGISTRY["q19_disjunctive_brand_revenue"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q22_anti_join_with_pruned_build(spark, sf_dir):
    # NOT EXISTS → LeftAnti; the orders date filter must push to the scan so
    # the anti build side shrinks before the join
    df = REGISTRY["q22_idle_balance_customers"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q17_decorrelated_avg_broadcasts(spark, sf_dir):
    # the hand-decorrelated per-part average joins back by broadcast —
    # lineitem itself is never shuffled for the threshold comparison
    df = REGISTRY["q17_small_quantity_revenue"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 2


def test_chunk_documents_no_hash_shuffle(spark, sf_dir):
    # chunking is a pure map-side explode: chunks never leave the producing
    # partition — the only exchange allowed is the presentation orderBy
    df = REGISTRY["chunk_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "hashpartitioning" not in plan
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "source" not in read_schema and "lang" not in read_schema


def test_hash_split_partial_agg(spark, sf_dir):
    # split assignment is a pure map; only 3 partial rows per task cross the
    # wire (map-side combine), never the documents themselves
    df = REGISTRY["hash_split_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" not in read_schema  # hash is over doc_id only


def test_stratified_sample_prunes_text(spark, sf_dir):
    # the 30% sample reads only the 3 projected columns — never the text
    # payload, which dominates bytes at corpus scale
    df = REGISTRY["stratified_sample_documents"].spark(spark, sf_dir)
    read_schema = plan_of(df).split("ReadSchema: ")[1].splitlines()[0]
    assert "text" not in read_schema


def test_label_centroids_partial_agg_collapses_explode(spark, sf_dir):
    # posexplode multiplies rows 64x, but map-side partial sums reduce to
    # n_labels x 64 before the single shuffle
    df = REGISTRY["label_centroids_embeddings"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2
    assert "Generate" in plan  # the explode stayed in-plan (no UDF)


def test_q7_broadcasts_nation_lookups_pushes_daterange(spark, sf_dir):
    # both nation-name lookups ride broadcast joins; the 2-year shipdate
    # range reaches the lineitem scan so pruning happens before any shuffle
    df = REGISTRY["q7_volume_shipping"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_q8_share_single_agg_no_self_join(spark, sf_dir):
    # numerator and denominator are one conditional aggregate over the same
    # rows — the fact tables are scanned once, never self-joined
    df = REGISTRY["q8_market_share"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Scan parquet") == plan.count("Scan parquet")  # sanity
    assert plan.count("lineitem.parquet") <= 1
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_q9_part_filter_semi_prunes_lineitem(spark, sf_dir):
    # the ECONOMY part filter reduces lineitem via broadcast semi-join
    # before the big orders join
    df = REGISTRY["q9_product_profit_by_nation"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "LeftSemi" in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_q21_single_orderkey_exchange_no_self_join(spark, sf_dir):
    # the double EXISTS/NOT-EXISTS collapses to one groupBy + one window on
    # the same l_orderkey partitioning: lineitem is scanned once and its
    # rows cross the wire once — never self-joined
    df = REGISTRY["q21_waiting_supplier"].spark(spark, sf_dir)
    plan = plan_of(df)
    import re

    assert plan.count("lineitem.parquet") == 1
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1
    # at scale the join's l_orderkey exchange is reused by both the agg
    # (grouping-subset rule) and the window; no third lineitem-sized shuffle
    assert plan.count("hashpartitioning(l_orderkey") <= 2


def test_q16_anti_and_part_filters_broadcast(spark, sf_dir):
    # exclusion list rides a broadcast anti-join, part attrs a broadcast
    # inner join — the only all-to-all shuffle is the distinct-count agg
    df = REGISTRY["q16_supplier_part_variety"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q2_lineitem_shuffles_once(spark, sf_dir):
    # decorrelated min: one scan + one shuffle of lineitem; the l_partkey
    # window exchange only moves per-(part,supplier) aggregates
    df = REGISTRY["q2_min_cost_supplier"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("lineitem.parquet") == 1
    assert "SortMergeJoin" not in plan


def test_q11_lineitem_aggregated_once(spark, sf_dir):
    # the scalar total is derived from the per-part rollup, not a second
    # scan: lineitem appears once and the threshold side is a broadcast
    df = REGISTRY["q11_revenue_concentration"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final part rollup


def test_bigram_window_over_aggregated_counts(spark, sf_dir):
    # the bigram explosion is map-side; the only shuffle of exploded data is
    # the partial-combined count agg, and the P(w2|w1) window runs over the
    # aggregated (w1,w2) rows — never over raw bigrams
    df = REGISTRY["bigram_lm_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    import re

    assert plan.count("HashAggregate") >= 2  # partial + final count
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1
    assert "Generate" in plan  # explode stayed JVM-side (no UDF)


def test_int8_quantize_stays_map_side(spark, sf_dir):
    # array-HOF quantization: no explode, no shuffle (bar the presentation
    # sort), no Python — the whole pass is JVM map-side
    df = REGISTRY["int8_quantize_embeddings"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "hashpartitioning" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan


def test_nearest_centroid_assignment_is_map_side(spark, sf_dir):
    # r11: the centroids are collected (n_labels x 64 values, bounded) and
    # embedded as foldable array literals, so the assignment pass needs NO
    # join of any kind and no per-vector window — the former broadcast-join
    # + 64x posexplode + row_number shape is gone; the only shuffle left is
    # the tiny confusion-count aggregation
    df = REGISTRY["nearest_centroid_confusion"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "Join" not in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_per_source_cap_single_exchange(spark, sf_dir):
    # one hash exchange on source for the rank; nothing else moves
    df = REGISTRY["per_source_cap_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(source") == 1


def test_ewma_single_exchange_no_python(spark, sf_dir):
    # the 20-tap EWMA shares the one per-user exchange and stays JVM-side:
    # array HOFs, not a Pandas UDF
    df = REGISTRY["ewma_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(user_id") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_melt_single_scan_with_pushdown(spark, sf_dir):
    # native unpivot: ONE lineitem scan (the UNION-ALL dual costs four) and
    # the orderkey filter reaches that scan before the 4x row expansion
    df = REGISTRY["melt_lineitem_measures"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("lineitem.parquet") == 1
    assert "LessThan(l_orderkey,100)" in plan.replace(" ", "").replace("[", "").replace("]", "") or "l_orderkey" in plan.split("PushedFilters: ")[1].splitlines()[0]


def test_reconciliation_aggregates_before_outer_join(spark, sf_dir):
    # both calendars collapse to day-counts before the full-outer shuffle:
    # partial+final agg on each side, and the join inputs are aggregates
    df = REGISTRY["daily_order_vs_ship_reconciliation"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "FullOuter" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per side


def test_first_last_nth_single_exchange(spark, sf_dir):
    df = REGISTRY["first_last_nth_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(user_id") == 1


def test_pareto_windows_over_rollup_only(spark, sf_dir):
    # rank/cumsum/total are windows over per-customer aggregates; orders
    # scans and shuffles exactly once
    df = REGISTRY["pareto_customers"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("orders.parquet") == 1
    assert plan.count("HashAggregate") >= 2


def test_funnel_single_scan_single_exchange(spark, sf_dir):
    # single-pass funnel: events scans ONCE and the three chained
    # conditional window mins share one user_id exchange
    df = REGISTRY["funnel_stages_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("events.parquet") == 1
    assert plan.count("hashpartitioning(user_id") == 1


def test_ohlc_windows_and_agg_share_one_exchange(spark, sf_dir):
    # both row_number specs AND the final group agg use the same
    # (event_type, hour) keys: one hash exchange end-to-end (the only other
    # exchange is the global sort of the tiny hourly output)
    df = REGISTRY["ohlc_hourly_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(event_type") == 1
    assert plan.count("events.parquet") == 1


def test_cooccurrence_expands_pairs_map_side(spark, sf_dir):
    # the pair expansion is array algebra after the per-user collect_set —
    # no self-join: one scan, no SortMergeJoin/BroadcastHashJoin anywhere
    df = REGISTRY["event_type_cooccurrence"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan


def test_zscore_single_window_single_exchange(spark, sf_dir):
    # the three rolling primitives (count, sum, sum-of-squares) must land in
    # ONE Window node over ONE user_id exchange — no duplicated frames
    df = REGISTRY["zscore_anomaly_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(user_id") == 1
    assert plan.count(") Window") == 1


def test_rolling_corr_shares_lag_exchange(spark, sf_dir):
    # the lag window and the five rolling-moment windows reuse the same
    # user_id partitioning: one exchange for the whole bivariate stat
    df = REGISTRY["rolling_corr_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(user_id") == 1


def test_cusum_single_user_exchange(spark, sf_dir):
    # running sum, whole-partition mean, and the argmax row_number all hash
    # by user_id once
    df = REGISTRY["cusum_changepoint_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("hashpartitioning(user_id") == 1


def test_zipf_topk_not_global_window(spark, sf_dir):
    # the top-1000 cut must be TakeOrderedAndProject (per-partition heaps),
    # never a row_number window funneling the whole vocab to one partition
    df = REGISTRY["zipf_slope_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # map-side combined word counts


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    # the benchmark gram set is tiny vs the corpus: it must ride a broadcast
    # join; the train side's exploded grams never sort-merge
    df = REGISTRY["decontaminate_3gram_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_est_error_no_cartesian(spark, sf_dir):
    # candidate pairs come from the banded-LSH bucket groupBy; the true-
    # Jaccard rejoin is hash-based — nothing may degrade to a cross product
    df = REGISTRY["minhash_est_error_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_frame_sample_stays_jvm_side_and_prunes_payload(spark, sf_dir):
    # frame fan-out is explode(sequence(...)) in the JVM; the opaque payload
    # column must never be read (parquet column pruning)
    df = REGISTRY["multimodal_frame_sample"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "Generate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" not in read_schema  # payload source column pruned away


def _tree(plan: str) -> str:
    # formatted explain = operator tree, blank line, then per-op details
    # (each "Scan parquet" therefore appears twice in the full string)
    return plan.split("\n\n")[0]


def test_char_entropy_zero_shuffle_single_scan(spark, sf_dir):
    plan = plan_of(REGISTRY["char_entropy_documents"].spark(spark, sf_dir))
    assert "Exchange" not in plan  # 27 replace-counts: pure map-side codegen
    assert _tree(plan).count("Scan parquet") == 1
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_passage_dedup_one_chunk_shuffle_no_join(spark, sf_dir):
    plan = plan_of(REGISTRY["passage_dedup_documents"].spark(spark, sf_dir))
    # global chunk frequency via a window over ONE md5-keyed exchange plus
    # the groupBy back on doc_id — and NO self-join anywhere
    assert _tree(plan).count("Scan parquet") == 1
    assert "Join" not in plan
    assert _tree(plan).count("Exchange") == 2
    assert "hashpartitioning" in plan  # both are hash exchanges, no global sort


def test_psi_broadcasts_midpoint_and_prunes(spark, sf_dir):
    plan = plan_of(REGISTRY["psi_value_drift_events"].spark(spark, sf_dir))
    assert "BroadcastExchange" in plan  # 1-row min/max bounds, never shuffled
    assert "CartesianProduct" not in plan
    # the bounds scan reads only ts; the binning scan only ts+value
    for rs in plan.split("ReadSchema: ")[1:]:
        first = rs.splitlines()[0]
        assert "props" not in first and "event_type" not in first


def test_chisq_single_group_shuffle(spark, sf_dir):
    plan = plan_of(REGISTRY["chisq_type_dow_events"].spark(spark, sf_dir))
    assert _tree(plan).count("Scan parquet") == 1
    # one hash shuffle for the contingency groupBy; window marginals reuse it
    assert "Join" not in plan


def test_no_per_row_python_udf_or_cartesian_anywhere(spark, sf_dir):
    """Engine-wide sweep: every lazily-constructible registered query's plan
    contains zero BatchEvalPython (per-row Python UDF) and zero
    CartesianProduct operators. Arrow-batched mapInPandas is the sanctioned
    Python path and is exempt. (Full census incl. action-constructing
    queries: tools/plan_census.py -> PLANS.md.)"""
    import re

    from tools.plan_census import CONSTRUCT_EXECUTES

    bad = []
    for name, q in sorted(REGISTRY.items()):
        if name.startswith(CONSTRUCT_EXECUTES):
            continue  # these run jobs at construction; censused offline
        plan = plan_of(q.spark(spark, sf_dir)).split("\n\n")[0]
        if "BatchEvalPython" in plan:
            bad.append((name, "per-row python udf"))
        if "CartesianProduct" in plan:
            bad.append((name, "cartesian product"))
    assert not bad, bad


def test_winsorize_broadcasts_cuts_fact_never_shuffles(spark, sf_dir):
    # the per-type [p05, p95] cut table is dimension-sized: it must reach
    # the fact via BroadcastHashJoin; the fact's only other movement is the
    # final presentation sort
    df = REGISTRY["winsorize_value_events"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_decontaminate_broadcasts_bitset(spark, sf_dir):
    # probes must join the Bloom bucket set via broadcast — the train-side
    # gram stream never shuffles on gram content for the membership test
    df = REGISTRY["bloom_decontaminate_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dup_span_single_doc_exchange_for_islands(spark, sf_dir):
    # the gaps-and-islands span merge runs both window functions over ONE
    # doc_id hash exchange; no cartesian anywhere
    df = REGISTRY["dup_span_stats_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    # exactly one doc_id hash exchange feeds BOTH island windows (they are
    # stacked directly on it — formatted mode lists the exchange arguments)
    assert plan.count("hashpartitioning(doc_id") == 1


def test_bpe_encode_vocab_join_is_broadcast(spark, sf_dir):
    # encoding joins the corpus word stream to the vocab-sized
    # word->subword table: must be a broadcast, never a corpus shuffle
    df = REGISTRY["bpe_encode_documents"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_jl_projection_zero_exchanges_before_sort(spark, sf_dir):
    # data-independent projection: one codegen'd scan; the only exchange
    # permitted is the presentation orderBy's range partitioning
    df = REGISTRY["jl_projection_embeddings"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_plan_census_covers_every_registered_query():
    # PLANS.md claims to be "a census of every query's physical plan" —
    # hold it to that: every registry entry needs a row (regenerate with
    # tools/plan_census.py after adding queries). Environment-gated
    # queries (absent in some containers) are exempt only if absent here.
    import os
    import re

    plans_path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    with open(plans_path) as fh:
        txt = fh.read()
    rows = set(re.findall(r"^\| (\w+) \|", txt, flags=re.M))
    missing = sorted(set(REGISTRY) - rows - {"query"})
    assert not missing, f"PLANS.md missing census rows for: {missing}"
