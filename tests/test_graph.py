"""Connected-components operator (operators/graph.py): chains must
close transitively, disjoint cliques must stay separate, and the label
fixpoint must be the component-min id."""

from __future__ import annotations

import pytest

from mwa_uvdata_pipeline_spark.operators.graph import connected_components


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        (r.node, r.component) for r in connected_components(df).collect()
    }


def test_chain_closes_transitively(spark):
    # 1-2, 2-3, 3-4: one component, canonical = 1, even though 1 and 4
    # never share an edge
    got = _components(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_disjoint_cliques_stay_separate(spark):
    got = _components(spark, [(1, 2), (2, 1), (10, 11), (11, 12), (10, 12)])
    assert got == {(1, 1), (2, 1), (10, 10), (11, 10), (12, 10)}


def test_long_path_converges(spark):
    # worst-case diameter for min-label propagation: a path with the
    # min id at one end, labels must travel the full length
    n = 12
    got = _components(spark, [(i, i + 1) for i in range(n)])
    assert got == {(i, 0) for i in range(n + 1)}


def test_nodes_outside_pairs_absent(spark):
    got = _components(spark, [(5, 7)])
    assert got == {(5, 5), (7, 5)}


def test_raises_when_rounds_exhausted(spark):
    # diameter > max_rounds must raise, never silently return a
    # non-fixpoint labeling
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_rounds=1)
