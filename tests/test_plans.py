"""Physical-plan audits: assert the plans are the ones we'd want at 100 TB —
filters and projections pushed into the parquet scan, fixed-size dims
broadcast, ORDER BY+LIMIT lowered to top-k, no cartesian products where an
equi-join exists."""

from __future__ import annotations

import pytest

from otterbrix_spark.workload import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q06_forecast_revenue")
    assert "PushedFilters:" in plan
    # the shipdate range predicate must be pushed, not evaluated post-scan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q16_distinct")
    # ReadSchema must contain only the two projected columns
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "c_mktsegment" in read_schema and "c_nationkey" in read_schema
    assert "c_name" not in read_schema and "c_acctbal" not in read_schema


def test_small_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q05_local_supplier")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_topk_lowered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q23_sort_computed_key")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_used_for_exists(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q04_exists_semi")
    assert "LeftSemi" in plan


def test_anti_join_used_for_not_exists(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q13_not_exists_anti")
    assert "LeftAnti" in plan


def test_comma_from_becomes_equi_join(spark, sf_dir):
    # declared as cross-join tree + WHERE; Catalyst must recover hash joins
    plan = plan_of(spark, sf_dir, "q35_comma_from")
    assert "CartesianProduct" not in plan


def test_no_python_udfs_in_relational_plans(spark, sf_dir):
    for name in ("q01_pricing_summary", "q03_shipping_priority", "d04_minhash_signature"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_partial_aggregation_map_side_combine(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    # partial+final split: the sums must combine map-side before the shuffle
    assert "partial_sum" in plan and "partial_count" in plan


@pytest.mark.parametrize(
    "name",
    [
        "d07_embedding_neardup", "e04_label_cohesion",
        # r3: d03's pair join is df-capped (posting-list cap) and t05's
        # fuzzy match goes through multi-pass blocking — both must stay
        # equi-join shaped with no nested-loop/cartesian fallback
        "d03_ngram_jaccard", "t05_edit_distance",
    ],
)
def test_neardup_and_cohesion_are_not_all_pairs(spark, sf_dir, name):
    # the 100 TB contract: candidates-then-verify equi-joins (d07) and the
    # sum-of-unit-vectors identity (e04) — never a quadratic pair join
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "ds03_cumulative_channels", "ds04_rank_over_rollup",
        "ds05_moving_deviation", "ds06_grouping_rank", "c06_pattern_profile",
    ],
)
def test_benchmark_shapes_stay_hash_join_shaped(spark, sf_dir, name):
    # TPC-DS/ClickBench window templates: rollups, window ranks and the
    # Q51 full-outer must all lower to hash joins + window exchanges —
    # no nested-loop/cartesian fallback anywhere
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_ds05_single_window_shuffle(spark, sf_dir):
    # the three ds05 windows share the p_brand partition key: the plan must
    # not shuffle once per window function
    plan = plan_of(spark, sf_dir, "ds05_moving_deviation")
    import re as _re

    exchanges = len(_re.findall(r"Exchange hashpartitioning", plan))
    # one shuffle for the groupBy, at most two for the window chains
    # (by_year and ordered share the brand prefix; Spark may fuse or keep 2)
    assert exchanges <= 3, f"{exchanges} hash exchanges:\n{plan[:2000]}"


def test_wholestage_codegen_active(spark, sf_dir):
    df = REGISTRY["q01_pricing_summary"].spark_fn(spark, sf_dir)
    df.collect()  # AQE finalises the physical plan on execution
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(N)' prefixes mark whole-stage-codegen'd spans in the plan tree
    assert "WholeStageCodegen" in executed or "*(" in executed


def test_hard_tpch_shapes_use_hash_joins(spark, sf_dir):
    # Q2/Q20: decorrelated plans must stay equi-join shaped — no cartesian
    # products or nested-loop fallbacks anywhere
    for name in ("q64_tpch_q2_min_cost_supp", "q67_tpch_q20_potential_excess"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q67_in_chains_are_semi_joins(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q67_tpch_q20_potential_excess")
    assert "LeftSemi" in plan


def test_q65_threshold_is_broadcast_not_recompute(spark, sf_dir):
    # the HAVING-vs-global-scalar shape: one scan feeds both the grouped
    # sums and the broadcast threshold — no per-row subquery execution
    plan = plan_of(spark, sf_dir, "q65_tpch_q11_important_stock")
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_b02_filters_pushed_below_join_chain(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "b02_job_join_chain")
    # selective dim predicates must reach the scans, not sit above joins
    pushed = plan.split("PushedFilters:")
    assert len(pushed) > 3  # several scans carry pushed filters
    assert "CartesianProduct" not in plan


def test_q76_correlations_are_semi_anti_joins(spark, sf_dir):
    # Q21's EXISTS/NOT EXISTS must lower to LeftSemi/LeftAnti, and the
    # correlated MAX to an aggregate join — never per-row subqueries
    plan = plan_of(spark, sf_dir, "q76_tpch_q21_waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_c05_topk_lowered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "c05_top_users")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


@pytest.mark.parametrize(
    "name",
    ["c07_multi_distinct", "l02_tag_evolution", "l03_central_person",
     "e05_knn_ivf_nprobe"],
)
def test_round3_shapes_no_nested_loop(spark, sf_dir, name):
    # c07's Expand multi-distinct, the LDBC split-count/full-join scoring
    # shapes and the multi-probe IVF search must all stay equi-join +
    # exchange shaped (the IVF probe/centroid sides are broadcast)
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    if name != "e05_knn_ivf_nprobe":
        # e05's assign step IS a deliberate broadcast corpus x centroids
        # (standard IVF: nlists is fixed and tiny); everything else bans BNLJ
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_c07_lowered_to_expand(spark, sf_dir):
    # multiple COUNT(DISTINCT) in one aggregation: Spark's Expand plan —
    # one replicated-row pass with partial dedup, not N self-joined scans
    plan = plan_of(spark, sf_dir, "c07_multi_distinct")
    assert "Expand" in plan
    # formatted explain prints each node in the tree AND the details
    # section — one physical scan == exactly two mentions
    assert plan.count("Scan parquet") == 2


def test_l03_peer_sum_is_linear(spark, sf_dir):
    # the BI-8 friend-score rewrite: peer totals come from one groupBy and
    # join back — no person x person self-join fan-out anywhere in the plan
    plan = plan_of(spark, sf_dir, "l03_central_person")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert "partial_sum" in plan  # map-side combine on the nation totals


@pytest.mark.parametrize(
    "name",
    ["l04_triangle_count", "l05_top_forum_members", "l06_thread_initiators",
     "l07_activity_score", "c10_minute_series_page"],
)
def test_ldbc_clickbench_round3_hash_join_shaped(spark, sf_dir, name):
    # the BI-11 triangle enumeration (canonical-edge equi-joins), the BI-4
    # membership/left-join stack and the BI-5/BI-9 pre-aggregate joins must
    # all stay hash-join shaped — no cartesian or nested-loop fallback even
    # though l04's edge build carries an s1 < s2 inequality (it rides the
    # l_orderkey equi-key)
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_l05_membership_is_semi_join(spark, sf_dir):
    # BI-4's EXISTS lowers to a semi-join; the tiny top-k part list is
    # broadcast into both the membership and message sides
    plan = plan_of(spark, sf_dir, "l05_top_forum_members")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_c12_point_lookup_pushed(spark, sf_dir):
    # ClickBench Q19: the single-key predicate must reach the parquet
    # reader (min/max row-group skipping at scale), not filter post-scan
    plan = plan_of(spark, sf_dir, "c12_point_lookup")
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "EqualTo(user_id,7)" in pushed


@pytest.mark.parametrize(
    "name", ["c11_topk_deep_offset", "c13_like_row_topk"]
)
def test_pagination_lowers_to_topk(spark, sf_dir, name):
    # ORDER BY .. LIMIT k [OFFSET n] fuses to TakeOrderedAndProject
    # (per-partition top-(n+k), driver merge) — the full sorted result is
    # never materialised or shuffled
    plan = plan_of(spark, sf_dir, name)
    assert "TakeOrderedAndProject" in plan, name


def test_b07_cyclic_join_no_cartesian(spark, sf_dir):
    # the JOB cyclic-closure graph must resolve to hash joins with the
    # cycle edge (c_nationkey = s_nationkey) applied as a post-join filter
    # or join condition — never a cartesian re-derivation
    plan = plan_of(spark, sf_dir, "b07_job_global_min")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # tiny dims broadcast


def test_b08_bridge_is_semi_join(spark, sf_dir):
    # hop 2 re-enters the fact through a LeftSemi on the seed-order set —
    # the bridge must not materialise seed x target pairs
    plan = plan_of(spark, sf_dir, "b08_job_bridge")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_ds13_intersect_lowers_to_semi_joins(spark, sf_dir):
    # Q38's three-way INTERSECT: each leg distincts map-side then meets the
    # next via LeftSemi — no full materialised channel product
    plan = plan_of(spark, sf_dir, "ds13_channel_intersect")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_ds14_composite_key_left_join_shaped(spark, sf_dir):
    # Q93's fact-to-fact LEFT JOIN on (orderkey, linenumber) must be a
    # co-partitioned hash/merge join; the reason-dim filter broadcast
    plan = plan_of(spark, sf_dir, "ds14_returns_netting")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_p04_packing_is_sub_sharded(spark, sf_dir):
    # round-4 de-skew: the running token sum must partition by
    # (source, shard), never by source alone — otherwise one task sees an
    # entire source's corpus at 100 TB. The per-source window is only ever
    # over the tiny one-row-per-shard offsets, and those re-enter the big
    # side via broadcast.
    plan = plan_of(spark, sf_dir, "p04_sequence_pack")
    import re

    specs = re.findall(r"windowspecdefinition\([^)]*", plan)
    sub_sharded = [s for s in specs if "source" in s and "shard" in s]
    assert sub_sharded, f"no sub-sharded window in plan:\n{plan[:2000]}"
    # no window spec may run over a whole source's documents (source-only
    # partitioning with doc_id ordering = the round-3 straggler shape)
    whole_source = [
        s for s in specs if "source" in s and "shard" not in s and "doc_id" in s
    ]
    assert not whole_source, f"whole-source window survives: {whole_source}"
    assert "BroadcastHashJoin" in plan  # offsets join back via broadcast


def test_ds15_snapshot_selfjoin_copartitioned(spark, sf_dir):
    # both year snapshots come from the same groupBy key — the self-join
    # must be hash-shaped on that key, never a nested-loop pairing
    plan = plan_of(spark, sf_dir, "ds15_snapshot_selfjoin")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ds16_returns_exclusion_is_anti_join(spark, sf_dir):
    # Q78's "exclude returned tickets" must lower to a LeftAnti on the
    # order key, not a filter over a materialised outer join
    plan = plan_of(spark, sf_dir, "ds16_channel_ratio_anti")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_ds17_filter_sets_are_semi_joins(spark, sf_dir):
    # frequent-parts and best-customer sets must meet the fact as
    # LeftSemi; the scalar max spend broadcasts
    plan = plan_of(spark, sf_dir, "ds17_frequent_crossshop")
    assert plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in plan


def test_ds18_exists_forms_are_semi_anti(spark, sf_dir):
    # the multi-supplier EXISTS and the returns NOT EXISTS must be one
    # LeftSemi + one LeftAnti over order-level sets — no per-order line
    # pairing self-join
    plan = plan_of(spark, sf_dir, "ds18_ship_together")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["ds19_qoq_growth", "ds20_return_rate_ranks", "ds21_rollup_rank_filter",
     "ds22_cohort_histogram", "c14_prefix_profile", "c15_conditional_ratio"],
)
def test_round4_breadth_shapes_no_nested_loop(spark, sf_dir, name):
    # Q31's four-aggregate growth join, Q49's double ranking, Q70's
    # rank-in-subquery rollup, Q54's cohort histogram and the ClickBench
    # forms must all stay equi-join / exchange shaped
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_ds21_top_set_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds21_rollup_rank_filter")
    assert "LeftSemi" in plan
    assert "Expand" in plan  # the rollup lowering


def test_ds22_cohort_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds22_cohort_histogram")
    assert "LeftSemi" in plan


def test_asof_join_is_window_not_pairwise(spark, sf_dir):
    # the as-of join must be the union+window sweep — one window over the
    # merged timeline, never a pairwise inequality join
    plan = plan_of(spark, sf_dir, "aj01_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_interval_join_is_bucketed_equi_join(spark, sf_dir):
    # the range join must equi-join on (key, bucket); an inequality-only
    # join would lower to BroadcastNestedLoopJoin — the exact scale bug
    # the bucket expansion exists to prevent
    plan = plan_of(spark, sf_dir, "rj01_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "b09_job_double_role_snowflake", "b10_job_hub_intersection",
        "b11_job_path_join", "b12_job_filter_soup",
    ],
)
def test_job_order_shapes_no_cartesian(spark, sf_dir, name):
    # the JOB join-order family: 7-9 way joins must stay hash-join shaped
    # with the role/dim chains reduced to broadcast builds — a wrong order
    # surfaces as a cartesian product or nested-loop fallback
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, name


def test_b10_hub_is_semi_joined(spark, sf_dir):
    # both EXISTS paths must lower to LEFT-SEMI onto the part hub — the
    # cross-path pair materialisation JOB punishes must not appear
    plan = plan_of(spark, sf_dir, "b10_job_hub_intersection")
    assert plan.count("LeftSemi") >= 2


def test_b09_selective_dims_reach_scans(spark, sf_dir):
    # both region roles' filters and the brand IN-list must be pushed
    plan = plan_of(spark, sf_dir, "b09_job_double_role_snowflake")
    assert len(plan.split("PushedFilters:")) > 4


def test_t10_eval_grams_broadcast_semi_join(spark, sf_dir):
    # the eval n-gram set must reach the train side as a broadcast LEFT
    # SEMI join — a shuffled semi would move the full train gram explosion
    plan = plan_of(spark, sf_dir, "t10_decontamination")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_d11_dedup_no_pairwise(spark, sf_dir):
    # paragraph dedup is grain-groupBy + count window over the chunk hash
    # (round-13: the join-back diamond re-ran the explode twice) — never a
    # nested-loop pairwise
    plan = plan_of(spark, sf_dir, "d11_paragraph_dedup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_e06_rerank_joins_are_hash_joins(spark, sf_dir):
    # stage-1 scan is an intended broadcast of the tiny query set; the
    # stage-2 re-rank joins must be hash equi-joins on vec_id/query_id
    plan = plan_of(spark, sf_dir, "e06_knn_quantized")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") >= 2


def test_ds23_fused_single_scan(spark, sf_dir):
    # Q58/Q83's three channel CTEs + 3-way join fuse into ONE scan of the
    # fact with conditional aggregation — the plan must contain no join
    plan = plan_of(spark, sf_dir, "ds23_channel_balance")
    assert "Join" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_ds24_no_global_single_partition_window(spark, sf_dir):
    # the decile ranks must come from bucket-partitioned windows + a
    # broadcast offsets join, never a no-partition-key global window
    plan = plan_of(spark, sf_dir, "ds24_decile_profile")
    assert "BroadcastHashJoin" in plan
    # a no-partition-key global window compiles to an Exchange
    # SinglePartition before the Window node — the scale-killer this
    # implementation exists to avoid
    assert "SinglePartition" not in plan


def test_l09_foaf_all_equi_joins(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "l09_foaf_recommend")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d12_semdedup_intra_cluster_equi_join(spark, sf_dir):
    # SemDeDup's pair comparison must be an equi-join on cluster id —
    # never a cross product over the whole corpus. The ONE allowed
    # nested-loop join is the deliberate broadcast corpus x centroids
    # assignment (k is fixed and tiny); a second one would mean the pair
    # join lost its cid equi-key
    plan = plan_of(spark, sf_dir, "d12_semdedup")
    assert "CartesianProduct" not in plan
    # the centroid assignment (corpus x 8 centroids, broadcast) appears
    # once per self-join side — two cheap BNLJ subtrees; a third would
    # mean the PAIR join itself lost its cid equi-key and went quadratic
    assert plan.count("- BroadcastNestedLoopJoin") <= 2
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_ds25_exists_boolean_is_semi_plus_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds25_exists_boolean")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_d13_production_semdedup_pair_join_is_equi(spark, sf_dir):
    # trained-centroid SemDeDup: the final pair comparison must be an
    # equi-join on cid. Every Lloyd assignment is a deliberate broadcast
    # corpus x centroids cross join (k scales as n/64 but each is
    # broadcast-bounded); the PAIR join going quadratic would surface as a
    # CartesianProduct or an extra nested-loop beyond the 3 assignments
    # (2 training iterations + the final one appearing on both self-join
    # sides can reuse the exchange)
    plan = plan_of(spark, sf_dir, "d13_semdedup_production")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_l11_capped_foaf_all_equi_joins(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "l11_foaf_capped")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Since the round-13 checkpoint change the ranked-window cap executes
    # inside the localCheckpoint'd `capped` subtree, so the declared plan
    # joins checkpoint scans instead of re-deriving the window 4x. Assert
    # that shape here; the cap-before-join SEMANTICS are pinned by the
    # gate's DuckDB oracle (ROW_NUMBER cap in the `capped` CTE).
    assert "ExistingRDD" in plan
    # ...and the cap subtree ITSELF (pre-checkpoint, ADVICE r13) must be
    # the ranked-window shape: a row_number window over the weighted edge
    # union, filtered by the cap — not a join or a global sort.
    from otterbrix_spark.workload.benchmark_shapes import _l11_capped_edges

    sub = _l11_capped_edges(spark, sf_dir)
    sub_plan = sub._sc._jvm.PythonSQLUtils.explainString(
        sub._jdf.queryExecution(), "formatted"
    )
    assert "row_number" in sub_plan and "Window" in sub_plan
    assert "CartesianProduct" not in sub_plan


def test_ds26_union_feeds_single_window_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds26_window_over_union")
    assert "Union" in plan and "CartesianProduct" not in plan


def test_ds27_cumulative_windows_are_partitioned(spark, sf_dir):
    # Q51 shape: the running sums must be per-segment windows — a global
    # single-partition window (SinglePartition exchange feeding the
    # window sort) would serialise the whole stream through one task
    plan = plan_of(spark, sf_dir, "ds27_cumulative_compare")
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_ds28_time_bands_single_scan(spark, sf_dir):
    # the Q88 lowering must be ONE conditional-aggregation scan, not the
    # oracle's 8 subquery scans cross-joined
    plan = plan_of(spark, sf_dir, "ds28_time_band_matrix")
    # one file-index = one scan ("Scan parquet" appears twice per scan in
    # formatted output: tree line + node detail header)
    assert plan.count("InMemoryFileIndex") == 1
    assert "CartesianProduct" not in plan


def test_c17_regex_key_stays_jvm_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "c17_url_domain_agg")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_p07_split_no_pairwise(spark, sf_dir):
    # leakage accounting is an O(#groups) aggregate — no pair join, no
    # cross product anywhere in the split plan
    plan = plan_of(spark, sf_dir, "p07_leakage_free_split")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_e08_recall_ann_side_is_bucket_equi_join(spark, sf_dir):
    # ground truth is the deliberate broadcast cross join (20 fixed
    # queries); the ANN side must stay a bucket equi-join — a second
    # nested-loop would mean the index path lost its bucket key
    plan = plan_of(spark, sf_dir, "e08_ann_recall")
    assert "CartesianProduct" not in plan
    assert plan.count("- BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_aj03_forward_asof_is_window_not_pairwise(spark, sf_dir):
    # the oracle declares a range join; the engine must take the
    # union+window sweep instead — no nested-loop pair matching
    plan = plan_of(spark, sf_dir, "aj03_asof_forward_tolerance")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_ds29_pivot_single_pass_no_values_job(spark, sf_dir):
    # pinned pivot domain: the matrix AND the row counts must come from
    # ONE aggregation pass — exactly one hash-partition exchange, no join
    # back for n_orders, no distinct-values job
    plan = plan_of(spark, sf_dir, "ds29_month_pivot")
    import re as _re

    # the ONLY join is the orders x customer input join — a join AFTER the
    # aggregate (a counts join-back) would make it two
    assert plan.count("Join type: Inner") == 1
    # one grouped aggregation pass (partial+final pair), not two
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 1
    assert "CartesianProduct" not in plan


def test_ds30_chain_is_composite_key_hash_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds30_return_rebuy_chain")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_c18_derived_keys_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "c18_derived_key_group")
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 1
    assert "TakeOrderedAndProject" in plan


def test_ds31_single_scan_integer_predicate(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds31_inventory_ratio_band")
    assert plan.count("InMemoryFileIndex") == 1  # one conditional-agg pass
    assert "CartesianProduct" not in plan


def test_ds32_dimension_join_after_reductions(spark, sf_dir):
    # customer must join AFTER both aggregation levels — the join input on
    # the fact side is the reduced freq frame, not raw lineitem
    plan = plan_of(spark, sf_dir, "ds32_frequent_trips")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_e09_index_scan_partition_pruned(spark, sf_dir):
    # the persisted-IVF query must read ONLY probed cell directories: the
    # index scan carries a NON-EMPTY dynamic-pruning partition filter on
    # cid (a bare "PartitionFilters" check is vacuous — the line prints
    # "[]" for every partitioned scan), and NO scan may read the whole
    # index with an empty partition filter
    plan = plan_of(spark, sf_dir, "e09_ivf_persisted_index")
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters: []" not in plan
    assert "CartesianProduct" not in plan


def test_d14_containment_no_all_pairs(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "d14_containment_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ds33_ratio_single_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds33_am_pm_ratio")
    assert plan.count("InMemoryFileIndex") == 1
    assert "CartesianProduct" not in plan


def test_q46_semi_join_below_customer_join(spark, sf_dir):
    # VERDICT r6 watch item: the HAVING semi-join must sit BELOW the
    # customer join — orders is filtered to the few >150-quantity orders
    # FIRST, so the customer join shuffles a handful of rows, not the
    # full customer x orders product (mostly thrown away at 100x).
    plan = plan_of(spark, sf_dir, "q46_large_orders")
    semi_pos = plan.find("LeftSemi")
    assert semi_pos != -1
    # In "formatted" explain, the nodes list is printed leaves-first for
    # each subtree; the semi-join's orders input must not be the output
    # of the customer join. Assert structurally on the optimized plan
    # string: the customer scan feeds the TOP join, whose other side is
    # the semi-join output.
    df = REGISTRY["q46_large_orders"].spark_fn(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # top-down printout: first Join is the customer join, and the
    # LeftSemi join must appear AFTER it (i.e. nested inside), never
    # the other way round
    first_semi = optimized.find("LeftSemi")
    first_inner = optimized.find("Join Inner")
    assert first_inner != -1 and first_semi != -1
    assert first_inner < first_semi, (
        "semi-join is above the customer join: full customer x orders "
        "shuffle would be materialised before the selective filter"
    )


def test_e10_trained_index_partition_pruned(spark, sf_dir):
    # same lifecycle audit as e09, over the TRAINED-centroid build: the
    # query side must prune to the probed cell directories (non-empty
    # dynamic partition filter), never rescan the whole index
    plan = plan_of(spark, sf_dir, "e10_ivf_trained_index")
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters: []" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "ds34_week_chain_triple_date",
        "ds35_cross_channel_intersect",
        "c19_minute_phrase_topk",
        "l12_weighted_path",
        "y03_dynamic_schema",
        "s10_streaming_restart",
        "q86_with_ordinality",
        "q87_qualify",
        "q88_named_window",
        "a04_stats_moments",
        "t17_idf_rarity",
        "c23_conditional_src_dst",
        "ds39_exists_or_exists",
        "d19_lsh_tuning_eval",
    ],
)
def test_round7_shapes_no_nested_loop(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    # scalar-threshold / root broadcasts are the only BNLJ-free cross
    # joins allowed; anything nested-loop over row data is a scale bug
    assert "BroadcastNestedLoopJoin" not in plan or name in (
        "ds35_cross_channel_intersect",  # 1-row scalar threshold crossJoin
        "l12_weighted_path",  # 1-row root crossJoin
        "y03_dynamic_schema",  # two 1-row summary aggregates crossJoined
        "t17_idf_rarity",  # 1-row corpus-count D crossJoin
        "d19_lsh_tuning_eval",  # 1-row candidate-total crossJoin
    )


def test_c19_topk_lowered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "c19_minute_phrase_topk")
    assert "TakeOrderedAndProject" in plan


def test_ds34_date_dims_broadcast(spark, sf_dir):
    # the three date-role joins must all broadcast the tiny spine; the
    # only big shuffle is lineitem x orders + the final aggregate
    plan = plan_of(spark, sf_dir, "ds34_week_chain_triple_date")
    assert plan.count("BroadcastHashJoin") >= 4  # d1, d2, d3, promo


def test_d15_index_side_bucket_join(spark, sf_dir):
    # the persisted band index is bucketed on the band key: the delta
    # probe join must read it bucket-aligned (no Exchange above the
    # index scan), shuffling only the delta side
    plan = plan_of(spark, sf_dir, "d15_incremental_dedup_index")
    assert "Bucketed: true" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_s11_session_window_single_state_shuffle(spark, sf_dir):
    # native session windows: one hash-partitioned state shuffle on the
    # session key, no cartesian anything
    plan = plan_of(spark, sf_dir, "s11_session_window_native")
    assert "CartesianProduct" not in plan


def test_e11_incremental_query_partition_pruned(spark, sf_dir):
    # the combined (built + appended) index must still query through
    # dynamic partition pruning — appends land inside cell directories
    plan = plan_of(spark, sf_dir, "e11_ivf_incremental_add")
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters: []" not in plan


def test_s12_sliding_window_expand_before_shuffle(spark, sf_dir):
    # a streaming gate's returned frame is the materialised sink, so
    # audit the STREAMING graph's analyzed plan directly: sliding
    # windows must expand each row to its duration/slide windows before
    # the state aggregate (Expand node), never join against a window dim
    # (a streaming frame refuses optimizedPlan without a sink, and the
    # window() expansion lowering is identical batch/streaming, so audit
    # the batch twin of the same graph)
    from otterbrix_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "2 hours", "30 minutes"), F.col("event_type")
    ).count()
    optimized = agg._jdf.queryExecution().optimizedPlan().toString()
    assert "Expand" in optimized
    assert "Join" not in optimized


def test_b13_triangle_stays_hash_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "b13_job_triangle")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_b15_filters_pushed_to_fact_scan(spark, sf_dir):
    # the SSB flat baseline is all pushdown: discount band, quantity,
    # and the shipdate range must reach the parquet scan
    plan = plan_of(spark, sf_dir, "b15_ssb_flat_revenue")
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "l_discount" in pushed and "l_quantity" in pushed
    assert "l_shipdate" in pushed


def test_ds36_reductions_are_semi_joins(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ds36_frequent_best_compose")
    assert plan.count("LeftSemi") >= 2  # both reduction sets semi-join
    assert "CartesianProduct" not in plan


def test_c20_wide_row_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "c20_row_fetch_topk")
    assert "TakeOrderedAndProject" in plan
    # SELECT *: every events column must survive into the scan schema
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    for col in ("event_id", "user_id", "event_type", "value", "props"):
        assert col in read_schema, col
    # the contains filter is pushed to the scan
    assert "props" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_q87_qualify_lowered_to_window_filter(spark, sf_dir):
    """QUALIFY must become an ordinary filter above the window — one
    window exchange per spec, no extra shuffle from the lowering."""
    plan = plan_of(spark, sf_dir, "q87_qualify")
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q88_named_window_single_exchange(spark, sf_dir):
    """Three functions over ONE named spec: a single window operator over
    a single hash exchange on the partition key, not one per function."""
    plan = plan_of(spark, sf_dir, "q88_named_window")
    inner = plan.split("AdaptiveSparkPlan")[-1]
    # all three window functions share the (l_orderkey, l_linenumber) sort
    assert inner.count("Window") <= 2  # operator + its detail block header


def test_e15_adc_ranking_is_broadcast_lut(spark, sf_dir):
    """PQ query-time contract: stored codes join a BROADCAST lookup table
    on (m, code); no raw-vector join, no cartesian anywhere."""
    plan = plan_of(spark, sf_dir, "e15_product_quantization")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "sk10_count_min",
        "l16_pagerank",
        "t19_bigram_lm_score",
        "d21_dsir_importance",
        "g10_mad_anomaly",
        "ds42_rollup_rank_parent",
        "ds43_basket_band",
        "q95_unpivot",
    ],
)
def test_continuation3_shapes_no_nested_loop(spark, sf_dir, name):
    """The t19 position join (doc_id, pos+1)=(doc_id, pos) and the l16
    superstep joins must extract equi-keys — a nested-loop plan on any
    of these is a scale bug."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_sk10_probe_join_is_broadcast(spark, sf_dir):
    """The 256-cell sketch must reach the probe join as a broadcast —
    the sketch is O(1) at any stream size."""
    plan = plan_of(spark, sf_dir, "sk10_count_min")
    assert "BroadcastHashJoin" in plan


def test_d21_model_join_is_broadcast(spark, sf_dir):
    """The 1024-bucket DSIR model joins back to the token stream as a
    broadcast — no shuffle of the corpus against the model."""
    plan = plan_of(spark, sf_dir, "d21_dsir_importance")
    assert "BroadcastHashJoin" in plan


def test_q95_unpivot_adds_no_exchange(spark, sf_dir):
    """Unpivot is a local expand: the only exchanges in the plan are the
    groupBy's (pre-aggregation), none introduced by the reshape."""
    plan = plan_of(spark, sf_dir, "q95_unpivot")
    assert "Expand" in plan or "Generate" in plan


@pytest.mark.parametrize(
    "name",
    [
        "sk11_ams_f2",
        "sk12_ams_join_size",
        "l17_kcore",
        "t20_bpe_apply",
        "p10_epoch_shard_shuffle",
        "b14_job_chain_mins",
        "ds44_pivot_date_band",
        "ds45_channel_worst_ratio",
        "ds46_cv_filter",
        "c25_url_path_hierarchy",
        "q96_posexplode_ordinality",
        "e18_product_quantization",
        "q100_null_safe_join",
        "a06_bool_aggs",
    ],
)
def test_continuation4_shapes_no_nested_loop(spark, sf_dir, name):
    """Every continuation-4 batch gate must plan as hash/broadcast joins
    (single-row cross joins excepted below) — a nested-loop on the data
    path is a scale bug. The sketch gates' single-row estimate/truth
    frames are explicitly broadcast, so even those stay off the
    CartesianProduct path."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name


def test_e18_codebooks_are_broadcast(spark, sf_dir):
    """PQ assignment and ADC meet the corpus ONLY through broadcast
    codebook/distance tables (B*k = 16 rows) — the property that keeps
    PQ viable when the corpus is 10^9 vectors. The only nested-loop in
    the plan is the sanctioned single-row broadcast cross join that
    attaches the query vector for the exact-distance column."""
    plan = plan_of(spark, sf_dir, "e18_product_quantization")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # q0 / med-tru rows


def test_b14_dims_broadcast(spark, sf_dir):
    """Every join in the chain is a broadcast hash join (filtered dims
    and pre-aggregated sides are all small); no sort-merge, no
    nested-loop — the fact table streams through map-side."""
    plan = plan_of(spark, sf_dir, "b14_job_chain_mins")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ds44_date_range_pushed(spark, sf_dir):
    """The 60-day window reaches the parquet scan as PushedFilters."""
    plan = plan_of(spark, sf_dir, "ds44_pivot_date_band")
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_t20_no_exchange_before_sort(spark, sf_dir):
    """The BPE merge chain is pure codegen string work: the only
    exchange in the plan is the final ORDER BY's range partitioning."""
    plan = plan_of(spark, sf_dir, "t20_bpe_apply")
    assert plan.count("Exchange") <= 2  # rangepartitioning (+AQE read)


def test_e19_ivf_pq_broadcast_only(spark, sf_dir):
    """IVF-PQ: centroids, codebooks and ADC tables are all broadcast;
    candidates outside probed cells are cut by a semi-join; the only
    nested-loops are the sanctioned single-row broadcast cross joins
    (query vector, coarse-probe attach)."""
    plan = plan_of(spark, sf_dir, "e19_ivf_pq")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_round8_breadth_shapes_plans(spark, sf_dir):
    """Round-8 shapes: no nested-loop on any data path; b17's snowflake
    dims all broadcast; ds48/ds50 aggregate once then join slices."""
    for name in (
        "ds48_yoy_channel_growth",
        "ds49_inventory_cov_pair",
        "ds50_week_ratio_matrix",
        "b17_deep_chain_mins",
        "l18_multi_hop_interaction",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # b17: every dimension hop is a broadcast — the fact table must be
    # the only shuffle-feeding input (single-row final aggregate)
    plan = plan_of(spark, sf_dir, "b17_deep_chain_mins")
    assert "BroadcastHashJoin" in plan


def test_round8_second_batch_plans(spark, sf_dir):
    """ds51-ds53 + c26: no nested loops; ds53's per-store stats joined
    via broadcast (the correlated-subquery lowering must not shuffle the
    candidate set twice)."""
    for name in (
        "ds51_returns_adjusted_sales",
        "ds52_channel_rollup_report",
        "ds53_above_avg_returns",
        "c26_phrase_min_url",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    assert "BroadcastHashJoin" in plan_of(spark, sf_dir, "ds53_above_avg_returns")


def test_round8_third_batch_plans(spark, sf_dir):
    """d22/sk13/x10: no nested loops; d22's gram dedup is a semi-join
    (never an all-pairs comparison); sk13's exact side lowers to top-k
    (TakeOrderedAndProject), not a global sort."""
    d22 = plan_of(spark, sf_dir, "d22_substring_span_removal")
    assert "CartesianProduct" not in d22
    assert "BroadcastNestedLoopJoin" not in d22
    assert "LeftSemi" in d22
    # sk13's quantile legs combine 1-row frames via broadcast crossJoin —
    # the accepted BNLJ-over-broadcast scalar shape; no CartesianProduct,
    # and the exact side lowers to top-k, never a global sort
    sk13 = plan_of(spark, sf_dir, "sk13_sample_quantiles")
    assert "CartesianProduct" not in sk13
    assert "TakeOrderedAndProject" in sk13


def test_e20_sweep_plan(spark, sf_dir):
    """e20: the nprobe fan-out is an expression explode, not a theta
    join — no nested loop anywhere except the broadcast truth combine."""
    plan = plan_of(spark, sf_dir, "e20_ivf_nprobe_recall")
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_round9_breadth_shapes_plans(spark, sf_dir):
    """Round-9 shapes: no nested loop / cartesian on any data path; b18's
    eight-instance chain broadcasts every dimension (incl. both nation
    roles); c27/c28 are single-scan single-shuffle profiles; l19's
    closure is hash semi/anti joins, never a per-edge probe."""
    for name in (
        "b18_wide_chain_disjunctive",
        "c27_exclusive_ladder",
        "c28_url_param_extract",
        "l19_open_wedge_anti",
        "x12_pg_catalog",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    plan = plan_of(spark, sf_dir, "b18_wide_chain_disjunctive")
    assert "BroadcastHashJoin" in plan
    # c27/c28: exactly one aggregate-feeding Exchange pair (partial +
    # final hash aggregate over one scan) — no join Exchange at all
    for name in ("c27_exclusive_ladder", "c28_url_param_extract"):
        plan = plan_of(spark, sf_dir, name)
        assert "Join" not in plan, name
    # l19: the anti-join and semi-join are both hash joins
    plan = plan_of(spark, sf_dir, "l19_open_wedge_anti")
    assert "LeftAnti" in plan and "LeftSemi" in plan


def test_round9_second_batch_plans(spark, sf_dir):
    """ds54-ds56: EXCEPT chain and NOT EXISTS lower to hash anti-joins
    (no nested loop); ds55 is one fact-fact join + one groupBy."""
    for name in (
        "ds54_except_chain_count",
        "ds55_ship_delay_bands",
        "ds56_not_exists_disjunctive",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    assert "LeftAnti" in plan_of(spark, sf_dir, "ds54_except_chain_count")
    assert "LeftAnti" in plan_of(
        spark, sf_dir, "ds56_not_exists_disjunctive"
    )


def test_round9_third_batch_plans(spark, sf_dir):
    """g12/p12/b19: no nested loop; b19's cross-table OR is a post-join
    Filter above two broadcast hash joins; p12 is scan + explode +
    one aggregate exchange (no join)."""
    for name in (
        "g12_cross_correlation_lags",
        "p12_pack_efficiency",
        "b19_cross_table_or",
        "x14_savepoints",
        "x15_create_table_like",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    plan = plan_of(spark, sf_dir, "b19_cross_table_or")
    assert "BroadcastHashJoin" in plan
    assert "Join" not in plan_of(spark, sf_dir, "p12_pack_efficiency")


def test_round10_breadth_shapes_plans(spark, sf_dir):
    """Round-10 batch: ds62's fact-vs-fact census keeps its FULL OUTER
    as a key-partitioned join (never a nested loop), ds63/ds64/ds65 are
    hash-join plans, t21/e21/c31/g13 are pure single-scan codegen (no
    join, no Python UDF)."""
    for name in (
        "ds62_channel_overlap_full_outer",
        "ds63_returns_excluded_ratio",
        "ds65_dual_rank_return_ratio",
        "l20_weighted_bounded_path",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
    plan = plan_of(spark, sf_dir, "ds62_channel_overlap_full_outer")
    assert "FullOuter" in plan
    for name in (
        "t21_rag_chunking",
        "e21_int8_quantization",
        "c31_value_histogram",
        "g13_cusum_changepoints",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name  # pure codegen
        assert "Join" not in plan or name == "g13_cusum_changepoints", name
    # ds64's global threshold is a ONE-ROW broadcast cross join (the
    # scalar-subquery plan — the only acceptable nested-loop: its build
    # side is a single aggregate row), and the fact passes through two
    # LeftSemi joins
    plan = plan_of(spark, sf_dir, "ds64_frequent_best_cross")
    assert plan.count("LeftSemi") >= 2
    assert "BroadcastExchange" in plan
    # formatted explain prints each node twice (tree + details), so
    # assert presence, not count; the cartesian check guards the rest
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_round11_job_topology_plans(spark, sf_dir):
    """Round-11 JOB depth (b21-b30): every topology class keeps its
    dims on broadcast build sides and its fact joins hash-based — no
    cartesian product, no nested loop, no Python in any of them; the
    anti-join arm (b26) and the bushy bridge (b30) land where declared."""
    for name in (
        "b21_chain8_correlated", "b22_fanout_star_lowsel",
        "b23_dual_hub_bridge", "b24_cycle_closure", "b25_snowflake_deep",
        "b26_chain_antifilter", "b27_star_union_dims",
        "b28_self_role_chain", "b29_diamond_paths", "b30_bushy_two_stars",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastHashJoin" in plan, name
    # b21: the nine-instance chain broadcasts every dimension arm — the
    # only shuffle joins are the fact-side orders/customer hops
    plan = plan_of(spark, sf_dir, "b21_chain8_correlated")
    assert plan.count("BroadcastExchange") >= 3
    # b24: the redundant-equality clique collapses to hash joins on the
    # shared orderkey (the self-join pair is an equi-join, not a loop)
    plan = plan_of(spark, sf_dir, "b24_cycle_closure")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    # b26: the NOT EXISTS arm is a hash LeftAnti
    assert "LeftAnti" in plan_of(spark, sf_dir, "b26_chain_antifilter")
    # b27: the UNION-derived dim is still a single broadcast build side
    plan = plan_of(spark, sf_dir, "b27_star_union_dims")
    assert "Union" in plan and "BroadcastExchange" in plan
    # b29: the diamond dedup is an equi-join on orderkey with the
    # brand/key predicates as join-level filters, never a loop
    plan = plan_of(spark, sf_dir, "b29_diamond_paths")
    assert "TakeOrderedAndProject" in plan  # top-10 lowered, no global sort
    # b30: BOTH stars reduce before the bridge — the final join's inputs
    # are aggregates (HashAggregate appears below the last join)
    plan = plan_of(spark, sf_dir, "b30_bushy_two_stars")
    assert "HashAggregate" in plan


def test_round11_dstail_clickbench_plans(spark, sf_dir):
    """Round-11 TPC-DS tail + ClickBench tail: ds66's iceberg threshold
    is the one-row broadcast scalar shape; ds67 computes its snapshot
    once and self-joins on the reduced grain; ds71's membership flags
    are ONE conditional aggregate (no stacked semi-joins); the c-gates
    stay single-scan codegen with top-k lowered, and c35's time range
    is pushed to the scan."""
    for name in (
        "ds66_iceberg_cte_cross_channel", "ds67_multi_year_megajoin",
        "ds68_promo_nonpromo_ratio", "ds69_state_sequence_flips",
        "ds70_web_sales_gap", "ds71_catalog_channel_affinity",
        "c32_url_regex_classify", "c33_phrase_rank_multiterm",
        "c34_adblock_ratio_bands", "c35_interval_minute_histogram",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    # ds66: the only nested loop is the 1-row threshold broadcast
    plan = plan_of(spark, sf_dir, "ds66_iceberg_cte_cross_channel")
    assert "BroadcastExchange" in plan
    # ds71: membership is an aggregate then ONE join — no semi-join stack
    plan = plan_of(spark, sf_dir, "ds71_catalog_channel_affinity")
    assert "LeftSemi" not in plan
    assert plan.count("HashAggregate") >= 2
    # c32/c33/c34: single-scan, no join at all
    for name in ("c32_url_regex_classify", "c33_phrase_rank_multiterm",
                 "c34_adblock_ratio_bands"):
        assert "Join" not in plan_of(spark, sf_dir, name), name
    # c33/c35: top-k lowers to TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in plan_of(
        spark, sf_dir, "c33_phrase_rank_multiterm"
    )
    plan = plan_of(spark, sf_dir, "c35_interval_minute_histogram")
    assert "TakeOrderedAndProject" in plan
    # the ts range predicate reaches the parquet scan
    assert "PushedFilters:" in plan and "ts" in plan.split(
        "PushedFilters:")[1].split("\n")[0]


def test_round11_llmops_plans(spark, sf_dir):
    """t23/g14/p13: zero Python UDFs; t23's LM model joins are
    broadcast (vocabulary-sized build sides); g14's residual join
    broadcasts the 7-row seasonal frame."""
    for name in ("t23_bigram_lm_fluency", "g14_seasonal_dow_decomposition",
                 "p13_temperature_mix"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    assert plan_of(spark, sf_dir, "t23_bigram_lm_fluency").count(
        "BroadcastHashJoin") >= 1
    assert "BroadcastHashJoin" in plan_of(
        spark, sf_dir, "g14_seasonal_dow_decomposition")


def test_round11_ds72_w11_plans(spark, sf_dir):
    """ds72 is join + two aggregates (broadcast dim); w11 is ONE
    user-partitioned window shuffle, no join, no UDF."""
    plan = plan_of(spark, sf_dir, "ds72_volatility_band")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    plan = plan_of(spark, sf_dir, "w11_time_range_trailing")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" in plan


def test_round12_job_topology_plans(spark, sf_dir):
    """Round-12 JOB second batch (b31-b38): every topology keeps dims on
    broadcast build sides and fact joins hash-based — no cartesian, no
    nested loop, no Python; the existence arms (b36) land as LeftSemi +
    LeftAnti; the bushy bridge (b31) and the composite dims (b35/b37)
    reduce before the fact join."""
    for name in (
        "b31_bushy_triple_fact", "b32_skewed_fan_dims",
        "b33_role_bridge_pentagon", "b34_two_cycle_overlap",
        "b35_filtered_fact_ladder", "b36_semi_bushy_mix",
        "b37_star_in_star", "b38_wide_dim_clique",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastHashJoin" in plan, name
    # b31: both trees exist — the left (part broadcast) and the right
    # (l2 |><| l3 self-bridge) join each other, not a left-deep chain
    plan = plan_of(spark, sf_dir, "b31_bushy_triple_fact")
    assert "BroadcastExchange" in plan
    # b32: the m:n theta rides INSIDE the broadcast hash join on the
    # nation key (join-level filter), never a post-join loop
    plan = plan_of(spark, sf_dir, "b32_skewed_fan_dims")
    assert "BroadcastHashJoin" in plan
    # b34: one spine — lineitem is scanned at most twice (its Scan node
    # appears for the fact role only; the tree never rebuilds the
    # orders-lineitem edge per cycle)
    plan = plan_of(spark, sf_dir, "b34_two_cycle_overlap")
    assert plan.count("Scan parquet") <= 8  # 4 relations, tree+details x2
    # b36: one LeftSemi and one LeftAnti, both hash joins
    plan = plan_of(spark, sf_dir, "b36_semi_bushy_mix")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # b35/b37: the composite dim collapses before the fact join — the
    # selective arm's filters are pushed to its scans
    for name in ("b35_filtered_fact_ladder", "b37_star_in_star"):
        assert "PushedFilters: [" in plan_of(spark, sf_dir, name), name


def test_round12_dstail_plans(spark, sf_dir):
    """Round-12 TPC-DS tail: ds73 joins two branches of ONE partial
    aggregate (no third fact scan); ds74's rollup expands from a single
    shuffle; ds75/ds76 reduce the fact once and re-aggregate the tiny
    frame; ds77 is ONE aggregate — no window, no self-join."""
    for name in (
        "ds73_cross_channel_ratio", "ds74_rollup_channel_sales",
        "ds75_repeat_purchase_span", "ds76_inventory_turns",
        "ds77_first_last_affinity",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    # ds74: rollup = Expand over one aggregate
    plan = plan_of(spark, sf_dir, "ds74_rollup_channel_sales")
    assert "Expand" in plan
    # ds77: no Window node and no join — min/max struct argmin does it
    plan = plan_of(spark, sf_dir, "ds77_first_last_affinity")
    assert "Window" not in plan
    assert "Join" not in plan
    # ds76: exactly one fact-grain shuffle (weekly), brand agg reuses it
    plan = plan_of(spark, sf_dir, "ds76_inventory_turns")
    assert "HashAggregate" in plan


def test_round12_ldbc_plans(spark, sf_dir):
    """Round-12 LDBC BI drip: recursion/windows run on vocabulary-sized
    reductions; the pair expansions are df-capped equi-joins; bi03's
    top-20 is lowered to TakeOrderedAndProject; no Python anywhere."""
    for name in (
        "bi01_message_cascade", "bi02_community_activity",
        "bi03_interaction_decay", "bi04_path_length_dist",
        "bi05_zombie_accounts",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    # bi01: the influence joins ride on broadcast (root/d1 frames are
    # per-type tiny)
    assert "BroadcastHashJoin" in plan_of(spark, sf_dir, "bi01_message_cascade")
    # bi02: one lag window over the weekly reduction
    assert "Window" in plan_of(spark, sf_dir, "bi02_community_activity")
    # bi03: top-20 lowered, no global sort
    assert "TakeOrderedAndProject" in plan_of(
        spark, sf_dir, "bi03_interaction_decay"
    )
    # bi05: two aggregates, no join
    assert "Join" not in plan_of(spark, sf_dir, "bi05_zombie_accounts")


def test_round12_clickbench_tail_plans(spark, sf_dir):
    """Round-12 ClickBench tail (c36-c43): every gate is a single scan
    of events — no join anywhere, no Python; the selection/top-k gates
    lower to TakeOrderedAndProject (per-partition heaps, never a global
    sort); c36's battery is one aggregate pass; c42's timestamp window
    reaches the scan as a pushed filter."""
    singles = (
        "c36_global_scan_battery", "c37_distinct_rank_topk",
        "c38_composite_mixed_battery", "c39_const_group_key",
        "c40_derived_dup_keys", "c41_selection_time_topk",
        "c42_window_flags_deep_page", "c43_star_row_fetch",
    )
    for name in singles:
        plan = plan_of(spark, sf_dir, name)
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # top-k selections lower to TakeOrderedAndProject
    for name in ("c41_selection_time_topk", "c43_star_row_fetch",
                 "c39_const_group_key", "c40_derived_dup_keys"):
        assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, name), name
    # c36: global aggregate — partial + final, one row over the wire
    plan = plan_of(spark, sf_dir, "c36_global_scan_battery")
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan
    # c42: the ts range predicate is pushed to the parquet scan
    plan = plan_of(spark, sf_dir, "c42_window_flags_deep_page")
    assert "PushedFilters:" in plan and "ts" in plan.split(
        "PushedFilters:")[1].split("\n")[0]


def test_round12_ldbc_second_batch_plans(spark, sf_dir):
    """Round-12 LDBC drip second batch (bi06-bi10): the share-of-total
    scalar rides a one-row broadcast (the only nested loop); triangle
    and two-path expansions are hash equi-joins over the df-capped edge
    set; the recommendation's non-adjacency is a LeftAnti; tag evolution
    is ONE scan with conditional window counts (no join); no Python
    anywhere."""
    for name in (
        "bi06_posting_summary_share", "bi07_friend_triangles",
        "bi08_hop_band_census", "bi09_mutual_friend_rec",
        "bi10_tag_evolution",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    # bi06: the global total is a broadcast one-row scalar
    assert "BroadcastNestedLoopJoin" in plan_of(
        spark, sf_dir, "bi06_posting_summary_share"
    )
    # bi09: non-adjacency lands as LeftAnti, top-20 lowered
    plan = plan_of(spark, sf_dir, "bi09_mutual_friend_rec")
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan
    # bi10: single scan, no join at all, top-20 lowered
    plan = plan_of(spark, sf_dir, "bi10_tag_evolution")
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_round12_dstail_second_batch_plans(spark, sf_dir):
    """Round-12 TPC-DS tail second batch (ds78-ds82): ds78's fifteen
    scalar subqueries collapse to ONE conditional-aggregate scan (no
    join, single pass); ds79's disjunction stays a residual on one
    broadcast join (no union-of-arms); ds80's rankings run on the
    reduced brand frame; ds81 broadcasts the nation-sized
    average-of-sums; ds82's orderkey join is co-partitionable; no
    Python, no cartesian anywhere."""
    for name in (
        "ds78_bucket_case_ladder", "ds79_disjunctive_selectivity",
        "ds80_rank_join_best_worst", "ds81_agg_of_agg_threshold",
        "ds82_latency_band_matrix",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    # ds78: one scan, no join, exactly one aggregate pair (partial+final)
    plan = plan_of(spark, sf_dir, "ds78_bucket_case_ladder")
    assert "Join" not in plan
    assert plan.count("Scan parquet") <= 1 or plan.count(
        "InMemoryTableScan") <= 1
    # ds79: the disjunction is a residual on the broadcast join — the
    # plan has joins only for the single customer probe (AQE prints the
    # initial and final plans, so counts are per-plan-string) and never
    # a union of per-arm scans
    plan = plan_of(spark, sf_dir, "ds79_disjunctive_selectivity")
    assert "BroadcastHashJoin" in plan
    assert "Union" not in plan
    # ds80: two windows over the reduced frame, rank equi-join
    plan = plan_of(spark, sf_dir, "ds80_rank_join_best_worst")
    assert "Window" in plan
    # ds81: the nation-average threshold joins back as broadcast
    plan = plan_of(spark, sf_dir, "ds81_agg_of_agg_threshold")
    assert "BroadcastHashJoin" in plan


def test_round12_ssb_completion_plans(spark, sf_dir):
    """Round-12 SSB completion (b39-b41): b39 is a pure pushed-predicate
    scan (no join, bands reach the parquet scan); b40's point dims ride
    broadcast builds; b41's drill-down keeps every dim broadcast with
    the fact reduced by the pushed date range; no Python, no cartesian."""
    for name in ("b39_ssb_narrow_band", "b40_ssb_point_pair",
                 "b41_ssb_drilldown_profit"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    plan = plan_of(spark, sf_dir, "b39_ssb_narrow_band")
    assert "Join" not in plan
    assert "PushedFilters:" in plan and "l_discount" in plan.split(
        "PushedFilters:")[1].split("\n")[0]
    assert "BroadcastHashJoin" in plan_of(spark, sf_dir, "b40_ssb_point_pair")
    assert "BroadcastHashJoin" in plan_of(
        spark, sf_dir, "b41_ssb_drilldown_profit")


def test_round12_ldbc_third_batch_plans(spark, sf_dir):
    """Round-12 LDBC drip third batch (bi11-bi14): the top-k container
    key set drives a broadcast LeftSemi (bi11); authority is ONE
    equi-join over the capped edges after a per-user reduction (bi12);
    the count-of-counts is two stacked aggregates with no join (bi13);
    the co-occurrence pair join runs on the deduplicated (user, day)
    grain (bi14); no Python, no cartesian."""
    for name in (
        "bi11_top_container_detail", "bi12_authority_scores",
        "bi13_count_distribution", "bi14_tag_cooccurrence",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    plan = plan_of(spark, sf_dir, "bi11_top_container_detail")
    assert "LeftSemi" in plan
    plan = plan_of(spark, sf_dir, "bi13_count_distribution")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan_of(
        spark, sf_dir, "bi12_authority_scores")


def test_round12_dstail_third_batch_plans(spark, sf_dir):
    """Round-12 TPC-DS tail third batch (ds83-ds86): ds83's returns
    reduce to a first-return date BEFORE the reorder join (aggregate
    below the join); ds84's dim mismatch is a residual after broadcast
    dim joins; ds85 filters ON a window over the reduced grain; ds86's
    three channel arms stack via Union into ONE aggregate; no Python,
    no cartesian anywhere."""
    for name in (
        "ds83_return_repurchase_chain", "ds84_attribute_mismatch",
        "ds85_deviation_filter", "ds86_union_channels_itemset",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    plan = plan_of(spark, sf_dir, "ds85_deviation_filter")
    assert "Window" in plan
    plan = plan_of(spark, sf_dir, "ds86_union_channels_itemset")
    assert "Union" in plan
    assert "TakeOrderedAndProject" in plan
    plan = plan_of(spark, sf_dir, "ds84_attribute_mismatch")
    assert "BroadcastHashJoin" in plan


def test_round12_bi15_ds87_plans(spark, sf_dir):
    """bi15: seed audience drives a LeftSemi, seed rows excluded before
    the census; ds87: the share ratio is a window over the reduced
    (category, brand) grain — one fact join, never a self-join of the
    grain against its total."""
    plan = plan_of(spark, sf_dir, "bi15_related_topics")
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan
    plan = plan_of(spark, sf_dir, "ds87_category_revenue_share")
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_round12_t24_plan(spark, sf_dir):
    """t24: one positioned-token explode feeds both statistics; the
    bigram is a positional self-equi-join per document (hash, never
    cartesian); no Python anywhere."""
    plan = plan_of(spark, sf_dir, "t24_repetition_quality")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the explode


def test_round12_ds88_plan(spark, sf_dir):
    """ds88: existence under a disjunction is ONE left join with a
    match flag — never a LeftSemi (which would drop the local arm) and
    never a union of per-arm scans."""
    plan = plan_of(spark, sf_dir, "ds88_disjunctive_existence")
    assert "LeftSemi" not in plan
    assert "Union" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_round13_dstail_star_plans(spark, sf_dir):
    """Round-13 TPC-DS tail, star shapes: ds89/ds90 broadcast their
    filtered part dim and push the shipdate window to the lineitem
    scan; ds89's top-10 lowers to TakeOrderedAndProject; ds91 fuses
    Q61's two correlated star subqueries into ONE conditional-aggregate
    scan (exactly one lineitem scan in the plan); no Python, no
    cartesian anywhere."""
    for name in (
        "ds89_brand_month_topk", "ds90_item_window_existence",
        "ds91_promo_share",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    plan = plan_of(spark, sf_dir, "ds89_brand_month_topk")
    assert "TakeOrderedAndProject" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]
    plan = plan_of(spark, sf_dir, "ds91_promo_share")
    assert plan.count("lineitem.parquet") == 1  # fused, single fact scan


def test_round13_dstail_correlated_plans(spark, sf_dir):
    """ds92/ds98: the correlated per-group average becomes a grouped
    re-join — the group-side aggregate must sit below the join
    (partial aggregation present), the threshold stays in integer
    expression space (no Python); ds98's tiny per-nation frame and the
    nation dim broadcast."""
    for name in ("ds92_excess_discount", "ds98_returns_above_nation_avg"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "partial_sum" in plan, name
    plan = plan_of(spark, sf_dir, "ds98_returns_above_nation_avg")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_round13_dstail_union_plans(spark, sf_dir):
    """ds94/ds95/ds97 union channel arms: each arm carries its own
    pushed filter, ONE aggregation runs over the Union (never per-arm
    rescans feeding separate aggs of the same grain); ds95 reduces to
    the (brand, year) grain BEFORE the yoy self-join; ds97's restricted
    dim broadcasts under a left join whose miss is the census."""
    for name in (
        "ds94_hourly_channel_union", "ds95_yoy_brand_decline",
        "ds97_dangling_dim_census",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "Union" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    plan = plan_of(spark, sf_dir, "ds94_hourly_channel_union")
    assert "TakeOrderedAndProject" in plan
    plan = plan_of(spark, sf_dir, "ds97_dangling_dim_census")
    assert "BroadcastHashJoin" in plan


def test_round13_dstail_fetch_count_plans(spark, sf_dir):
    """ds93: bare COUNT(*) — every predicate reaches the scan (pushed
    event_type + value band) and no data-row shuffle survives (the only
    exchange is the single-row partial-count merge); ds96: pure
    broadcast-dim row fetch, ordered top-100."""
    plan = plan_of(spark, sf_dir, "ds93_selectivity_count")
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "event_type" in pushed and "value" in pushed
    assert "BatchEvalPython" not in plan
    plan = plan_of(spark, sf_dir, "ds96_snowflake_row_fetch")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_round13_ldbc_final_plans(spark, sf_dir):
    """bi16: ONE window pass over the user timeline computes the
    reply/like attribution (exactly one Window, on the pre-clustered
    user_id grain); the per-message counts arrive as PRE-AGGREGATED
    left joins (aggregates below the join, as BI-5's Cs/Plm
    subqueries); bi17: (user, day) reduction below the broadcast
    customer join; no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "bi16_topic_poster_scores")
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    plan = plan_of(spark, sf_dir, "bi17_thread_initiators")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_round13_ds99_plan(spark, sf_dir):
    """ds99: Q28's six scalar-subquery scans fuse into ONE pass — exactly
    one lineitem scan; the multi-distinct battery goes through Expand;
    the shipdate window reaches the scan; no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "ds99_band_aggregate_battery")
    assert plan.count("lineitem.parquet") == 1
    assert "Expand" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_round13_t25_plan(spark, sf_dir):
    """t25: detection + redaction are pure JVM regex codegen over ONE
    documents scan — no Python, no explode (counts via regexp_count,
    not extract-then-size), and the only shuffle carries the 6-counter
    source-grain rows, never document text."""
    plan = plan_of(spark, sf_dir, "t25_pii_redaction")
    assert "BatchEvalPython" not in plan
    assert "Generate" not in plan
    assert plan.count("documents.parquet") == 1
    assert "partial_sum" in plan  # map-side combine before the exchange


@pytest.mark.parametrize(
    "name",
    ["l04_triangle_count", "l10_interaction_strength", "l16_pagerank"],
)
def test_round13_edge_weights_are_plain_counts(spark, sf_dir, name):
    """Round-13 batch B: the co-supply edge builds dedupe the 2-column
    base projection BEFORE the pair self-join, so edge weights are plain
    map-side-combinable counts — a distinct aggregate reappearing here
    would mean the pair-grain re-shuffle came back."""
    plan = plan_of(spark, sf_dir, name)
    assert "count(distinct" not in plan.lower(), name
