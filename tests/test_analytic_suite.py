"""Plan pins for the composite analytic suite (SURVEY.md §2.14, h1-h22).

Correctness is the driver's job (every h row is O-tier with a DuckDB
oracle); these tests pin the *physical* properties that make the shapes
viable at 100 TB — the composite-plan analog of test_plans.py:

* no disguised cross product anywhere in the family: every join must be
  hash- or merge-based, never CartesianProduct / BroadcastNestedLoopJoin
  (the subquery shapes — correlated MIN, NOT IN, EXISTS/NOT EXISTS — are
  exactly where a bad decorrelation would smuggle one in);
* dimension sides broadcast (h5's 6-table snowflake runs on ONE fact
  exchange);
* the scan aggregates (h1, h6) stay scan -> partial -> single exchange ->
  final;
* top-k queries use TakeOrderedAndProject, never a global Sort.
"""

from __future__ import annotations

from google_analytics_dataframes_spark.plans import audit
from google_analytics_dataframes_spark.registry import registry
from tests.conftest import SF_DIR

FORBIDDEN_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _h_queries():
    return {n: q for n, q in registry().items() if n.startswith("h") and n[1].isdigit()}


def test_no_cross_products_anywhere_in_family(spark):
    """The whole point of the subquery shapes: Catalyst must decorrelate
    them into equi joins.  A CartesianProduct in h2/h16/h21/h22 would be
    correct and unshippable."""
    for name, q in _h_queries().items():
        if name == "h11_important_parts":
            continue  # pinned separately: single-row scalar broadcast-back
        nodes = audit.node_names(q.fn(spark, SF_DIR))
        bad = [n for n in nodes if n in FORBIDDEN_JOINS]
        assert not bad, f"{name}: forbidden join operators {bad} in plan"


def test_h11_nested_loop_is_single_row_scalar_broadcast(spark):
    """h11 joins the per-part values against the global threshold with a
    condition-free broadcast join — that IS a BroadcastNestedLoopJoin, and
    it is the correct plan because the build side is the one-row global
    aggregate (a scalar), so the 'loop' is one comparison per part row.
    Pin that the build side is an aggregate, not a table scan."""
    df = registry()["h11_important_parts"].fn(spark, SF_DIR)
    plan = audit.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    nodes = audit.node_names(df)
    i = nodes.index("BroadcastNestedLoopJoin")
    # the broadcast build feeding the BNLJ is the threshold aggregate
    assert "HashAggregate" in nodes[:i]
    assert nodes.count("BroadcastNestedLoopJoin") == 1


def test_h5_snowflake_is_broadcast_only_one_fact_exchange(spark):
    """6-table join, 5 broadcast dims, exactly one wide exchange (the
    final group-by) — the fact table never shuffles for a join."""
    df = registry()["h5_local_supplier_volume"].fn(spark, SF_DIR)
    joins = audit.join_algorithms(df)
    assert joins and set(joins) == {"BroadcastHashJoin"}
    assert audit.count_exchanges(df) == 1


def test_scan_aggregates_single_exchange(spark):
    """h1/h6: scan -> map-side partial -> one agg exchange -> final.

    Round 14: h1 additionally carries ``fanout(by=l_orderkey)`` ahead of
    its nine decimal partials (io.fanout doc), so its plan has exactly one
    EXTRA narrow exchange — hashpartitioning on the spread key — BEFORE
    the partial aggregate, and still exactly one aggregate exchange.  h6's
    single-exchange contract is unchanged."""
    reg = registry()
    for name, n_exchanges in (
        ("h1_pricing_summary", 2),
        ("h6_forecast_revenue", 1),
    ):
        df = reg[name].fn(spark, SF_DIR)
        nodes = audit.node_names(df)
        assert nodes.count("HashAggregate") == 2, name
        assert audit.count_exchanges(df) == n_exchanges, name
    # the extra h1 exchange is the fanout's hash partitioning, not a sort
    # or an accidental wide shuffle
    plan = audit.formatted_plan(reg["h1_pricing_summary"].fn(spark, SF_DIR))
    assert "hashpartitioning(l_orderkey" in plan
    assert "Sort" not in audit.node_names(reg["h1_pricing_summary"].fn(spark, SF_DIR))


def test_h6_predicates_push_to_scan(spark):
    scans = audit.scan_info(registry()["h6_forecast_revenue"].fn(spark, SF_DIR))
    assert len(scans) == 1
    pushed = scans[0]["pushed_filters"]
    assert "l_quantity" in pushed and "l_discount" in pushed and "l_shipdate" in pushed
    # projection pruned to the 5 referenced columns
    assert "l_orderkey" not in scans[0]["read_schema"]


def test_topk_shapes_use_take_ordered(spark):
    reg = registry()
    for name in ("h3_shipping_priority", "h10_returned_items", "h21_waiting_orders"):
        nodes = audit.node_names(reg[name].fn(spark, SF_DIR))
        assert "TakeOrderedAndProject" in nodes, name
        assert "Sort" not in nodes or name == "h21_waiting_orders", name


def test_h16_not_in_plans_as_hash_anti_join(spark):
    """NOT IN over a non-nullable key must become a (broadcast) hash anti
    join, not a nested loop."""
    df = registry()["h16_supplier_counts"].fn(spark, SF_DIR)
    plan = audit.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_family_is_fully_registered_with_oracles():
    hq = _h_queries()
    assert len(hq) == 22
    assert all(q.oracle for q in hq.values()), "every h row is O-tier"
