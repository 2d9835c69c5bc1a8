"""Physical-plan shape assertions for the decision-support suite.

Correctness of every registered shape is covered by
``test_oracle_parity``; these tests pin the SCALE properties the
docstrings promise — no cartesian/nested-loop fallbacks, dims
broadcast, bounded shuffle counts — so a refactor that silently
degrades the plan fails CI even while values still match.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE

from mwa_uvdata_pipeline_spark.plans import load_all

PLANS = load_all()

NEW_SHAPES = [
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_ship_delay",
    "q15_top_supplier",
]


def _plan(spark, name: str) -> str:
    df = PLANS[name].spark(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", NEW_SHAPES)
def test_no_cartesian_fallback(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or name in (
        # scalar 1-row subquery joins legitimately broadcast-nested-loop
        "q11_important_parts",
        "q15_top_supplier",
    )


@pytest.mark.parametrize(
    ("name", "max_hash_exchanges"),
    [
        # one agg shuffle; every join side broadcasts at this SF
        ("q8_market_share", 1),
        ("q9_product_profit", 1),
        # custkey rollup shuffle only; top-k is TakeOrderedAndProject
        ("q10_returned_items", 1),
        # partkey rollup + scalar-total reduction
        ("q11_important_parts", 2),
        # orderkey join side(s) + 2-group agg
        ("q12_ship_delay", 2),
        # suppkey rollup reused by the MAX scalar — not recomputed
        ("q15_top_supplier", 2),
    ],
)
def test_shuffle_budget(spark, name, max_hash_exchanges):
    plan = _plan(spark, name)
    n = plan.count("Exchange hashpartitioning")
    assert n <= max_hash_exchanges, f"{name}: {n} hash exchanges\n{plan}"


def test_q10_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "q10_returned_items")
