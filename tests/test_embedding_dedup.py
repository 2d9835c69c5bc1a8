"""Scale-posture assertions for the embedding dedup family: the
registered LSH plan must never materialize a corpus-wide pairwise join,
its survivors must be a subset of the exact all-pairs result (LSH has
false negatives, never false positives), and the dedup_clusters
component-map join must carry no forced broadcast hint."""

from __future__ import annotations

from mwa_uvdata_pipeline_spark.plans.text import (
    dedup_clusters,
    dedup_embedding_cosine,
    e_knn_within_label,
    e_knn_within_label_fold,
    exact_pairwise_cosine,
)
from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_dedup_has_no_cartesian_product(spark):
    plan = _executed_plan(dedup_embedding_cosine(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_dedup_subset_of_exact(spark):
    got = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in dedup_embedding_cosine(spark, SF_SMALL).collect()
    }
    exact = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in exact_pairwise_cosine(spark, SF_SMALL).collect()
    }
    assert got, "LSH candidate generation found no pairs at all"
    assert got <= exact  # every survivor verified by exact cosine


def test_blocked_knn_blas_equals_fold(spark):
    # the registered Arrow/BLAS block kernel and the pure-DataFrame
    # exact-fold twin must agree to the last bit after the 6-dp round —
    # this pins the numeric contract the DuckDB oracle checks
    cols = ["vec_id", "nn_rank", "nn_id", "cos_sim"]
    fast = sorted(map(tuple, e_knn_within_label(spark, SF_SMALL).select(*cols).collect()))
    fold = sorted(map(tuple, e_knn_within_label_fold(spark, SF_SMALL).select(*cols).collect()))
    assert fast == fold


def test_cluster_component_join_is_unhinted(spark):
    # the (node, component) map is corpus-linear worst-case; the final
    # join must leave strategy choice to AQE (no ResolvedHint in the
    # analyzed plan), not force a broadcast
    df = dedup_clusters(spark, SF_SMALL)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
