"""Physical-plan regression tests: the scale-relevant plan shapes
ARCHITECTURE.md claims, asserted so refactors can't silently lose them."""

import contextlib
import io
import re

import pytest

from dataqtor_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _detail(plan, node):
    return len(re.findall(rf"^\(\d+\) {node}", plan, re.M))


def test_search_filters_pushed_to_scan(spark):
    plan = _plan(spark, "p03_typed_search_orders")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(o_totalprice" in pushed
    assert "EqualTo(o_orderstatus,O)" in pushed
    # column pruning: the scan reads only the 4 referenced columns
    schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert schema.count(":") == 4, schema


def test_dim_join_broadcasts(spark):
    plan = _plan(spark, "j01_latlon_enrich")
    assert _detail(plan, "BroadcastHashJoin") >= 1
    assert _detail(plan, "SortMergeJoin") == 0


def test_topk_never_global_sorts(spark):
    plan = _plan(spark, "o01_sort_topk")
    assert _detail(plan, "TakeOrderedAndProject") == 1
    assert _detail(plan, "Sort") == 0  # no standalone global sort


def test_fused_profile_single_scan(spark):
    plan = _plan(spark, "a00_full_profile_lineitem")
    assert _detail(plan, "Scan parquet") == 1


def test_range_join_is_hash_join(spark):
    plan = _plan(spark, "j06_range_join_sessions")
    assert "NestedLoop" not in plan


def test_pivot_no_value_discovery_job(spark):
    # explicit pivot values → single aggregation, no extra distinct scan
    plan = _plan(spark, "a18_pivot_status_priority")
    assert _detail(plan, "Scan parquet") == 1


def test_h01_single_scan_partial_agg(spark):
    plan = _plan(spark, "h01_pricing_summary")
    assert _detail(plan, "Scan parquet") == 1
    assert "PushedFilters: [" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    assert _detail(plan, "HashAggregate") >= 2  # partial + final


def test_h03_topk_and_broadcast(spark):
    plan = _plan(spark, "h03_shipping_priority")
    assert _detail(plan, "TakeOrderedAndProject") >= 1
    assert _detail(plan, "BroadcastHashJoin") >= 1
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_h05_dims_broadcast_filters_pushed(spark):
    plan = _plan(spark, "h05_local_supplier_volume")
    assert _detail(plan, "BroadcastHashJoin") >= 3
    assert "EqualTo(r_name,ASIA)" in plan
    assert _detail(plan, "CartesianProduct") == 0


def test_funnel_no_global_sort(spark):
    plan = _plan(spark, "b01_funnel_events")
    # stage joins are per-user aggregates; any Sort present belongs to a
    # SortMergeJoin (two sides each), never a row-data global sort
    assert _detail(plan, "Sort") <= _detail(plan, "SortMergeJoin") * 2


def test_transitions_window_is_user_partitioned(spark):
    plan = _plan(spark, "b03_event_transitions")
    assert _detail(plan, "Window") >= 1
    # the lead window must be partitioned (parallel), not a global orderBy
    assert re.search(r"partitionBy.*user_id|hashpartitioning\(user_id", plan)


def test_h04_semi_join_no_lineitem_output(spark):
    plan = _plan(spark, "h04_priority_check")
    assert "LeftSemi" in plan
    # quarter filter pushed to the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_h06_pure_scan_agg(spark):
    plan = _plan(spark, "h06_forecast_revenue")
    assert _detail(plan, "Scan parquet") == 1
    assert _detail(plan, "SortMergeJoin") == 0
    assert _detail(plan, "BroadcastHashJoin") == 0
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_quantity,24.0)" in pushed


def test_h10_topk_and_nation_broadcast(spark):
    plan = _plan(spark, "h10_returned_items")
    assert _detail(plan, "TakeOrderedAndProject") >= 1
    assert _detail(plan, "BroadcastHashJoin") >= 1
    assert "EqualTo(l_returnflag,R)" in plan


def test_h13_left_outer_preserves_zero_customers(spark):
    plan = _plan(spark, "h13_customer_distribution")
    assert "LeftOuter" in plan
    # the priority filter must not reach the customer side
    assert "IsNotNull(c_custkey)" not in plan


def test_h14_part_broadcast_pruned(spark):
    plan = _plan(spark, "h14_promo_revenue")
    assert _detail(plan, "BroadcastHashJoin") >= 1
    # part scan reads only the 2 projected columns
    for line in plan.splitlines():
        if "ReadSchema" in line and "p_partkey" in line:
            schema = line.split("ReadSchema: ", 1)[1]
            assert schema.count(":") == 2, schema


def test_h22_anti_join_and_scalar_broadcast(spark):
    plan = _plan(spark, "h22_dormant_customers")
    assert "LeftAnti" in plan
    assert _detail(plan, "CartesianProduct") == 0  # scalar is broadcast
    assert "GreaterThanOrEqual(o_orderdate" in plan  # recency pushed


def test_h07_single_fact_shuffle_all_dims_broadcast(spark):
    # Q7: nation/supplier/customer all broadcast; lineitem⋈orders is the
    # only shuffled join, so the plan carries at most 3 exchanges
    # (join + aggregate sides) and no SortMergeJoin
    plan = _plan(spark, "h07_volume_shipping")
    assert _detail(plan, "BroadcastHashJoin") >= 3
    assert _detail(plan, "SortMergeJoin") <= 1
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_h09_part_filter_prunes_fact_via_broadcast(spark):
    plan = _plan(spark, "h09_product_type_profit")
    assert _detail(plan, "BroadcastHashJoin") >= 3
    # the LIKE filter must reach the part scan, not evaluate post-join
    assert "StringContains(p_name,red)" in plan or "p_name" in \
        plan.split("PushedFilters: [", 1)[1]


def test_h17_threshold_join_broadcasts_aggregate(spark):
    plan = _plan(spark, "h17_small_quantity_revenue")
    assert _detail(plan, "BroadcastHashJoin") >= 2
    assert _detail(plan, "SortMergeJoin") == 0


def test_h21_no_pair_set_sort_merge(spark):
    # the count-collapse rewrite keeps the qualifying-order set broadcast;
    # no sort-merge join of the deduped pair sets
    plan = _plan(spark, "h21_waiting_suppliers")
    assert _detail(plan, "BroadcastHashJoin") >= 2
    assert _detail(plan, "SortMergeJoin") <= 1


def test_cube_expands_before_single_shuffle(spark):
    plan = _plan(spark, "cube01_returnflag_status")
    assert _detail(plan, "Expand") == 1
    assert _detail(plan, "Exchange") == 1


def test_bm25_tokenizes_once_and_releases_cache(spark):
    # the exploded token stream is persisted so the three consumers share
    # ONE tokenize pass, then released once the (tiny) top-k materializes

    def big_cached():
        return {r.id() for r in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()
                if r.isCached() and r.memSize() > 1 << 20}

    # scope the invariant to THIS query: in the shared-session suite an
    # earlier test's still-referenced localCheckpoint (e.g. er03's pinned
    # candidate frame awaiting Python GC) may legitimately remain cached
    before = big_cached()
    df = QUERIES["t23_bm25_search"](spark, SF)
    assert len(df.take(5)) == 5  # already materialized via localCheckpoint
    # the only NEW cached RDD may be the 15-row checkpoint, never the
    # token explode (which would be corpus-sized)
    leaked = big_cached() - before
    assert not leaked, f"corpus-sized cache must be unpersisted: {leaked}"
