"""Physical-plan regression gates: a small, fast subset of
tools/explain_audit.py's invariants asserted in CI, so a refactor that
silently drops a pushdown, broadcast, or top-k pattern — or
reintroduces a data-sized single-partition window — fails tests, not a
later manual audit."""

from __future__ import annotations

import pytest

from etl_8million_data__spark.plans import all_queries

SF = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize(
    ("name", "expects"),
    [
        ("tpch_q6_forecast_revenue", ["PushedFilters", "HashAggregate"]),
        ("tpch_q3_shipping_priority", ["BroadcastHashJoin", "TakeOrderedAndProject"]),
        ("topk_orders_global", ["TakeOrderedAndProject"]),
        ("regional_revenue_5way_join", ["BroadcastHashJoin", "HashAggregate"]),
        ("corpus_term_frequencies", ["TakeOrderedAndProject", "HashAggregate"]),
        ("dedup_semantic_keepers", ["LeftAnti", "HashAggregate"]),
        ("range_bounds_sampled_orders", ["PushedFilters", "Window"]),
        ("moving_avg_and_ntile", ["BroadcastHashJoin", "Window"]),
    ],
)
def test_plan_contains(spark, name, expects):
    plan = _formatted_plan(all_queries()[name].build(spark, SF))
    missing = [e for e in expects if e not in plan]
    assert not missing, f"{name}: plan lost {missing}"


def test_ntile_has_no_data_sized_single_partition_window(spark):
    """moving_avg_and_ntile's only SinglePartition exchanges must feed
    post-aggregation (boundary/total) tables, never the orders scan —
    the invariant the boundary-table rewrite exists for."""
    plan = _formatted_plan(all_queries()["moving_avg_and_ntile"].build(spark, SF))
    # formatted plan lists operators bottom-up per subtree; a
    # SinglePartition Exchange whose subtree contains a parquet scan
    # WITHOUT an intervening HashAggregate would be the regression.
    import re

    # crude but effective: every Exchange SinglePartition must appear
    # AFTER (above) at least one HashAggregate in its section
    sections = plan.split("Exchange SinglePartition")
    for before in sections[:-1]:
        assert "HashAggregate" in before, "SinglePartition exchange over raw data"
