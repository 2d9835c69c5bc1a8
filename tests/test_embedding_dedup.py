"""Scale-posture assertions for the embedding dedup family: the
registered LSH plan must never materialize a corpus-wide pairwise join,
its survivors must be a subset of the exact all-pairs result (LSH has
false negatives, never false positives), and the dedup_clusters
component-map join must carry no forced broadcast hint."""

from __future__ import annotations

from mwa_uvdata_pipeline_spark.plans.text import (
    _emb_lsh_bits,
    _knn_lsh_bits,
    dedup_clusters,
    dedup_embedding_cosine,
    e_knn_exact_blocked,
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
    # the two exact twins (Arrow/BLAS kernel vs pure-DataFrame fold)
    # must agree after the 6-dp round. Scores compare with a 1e-6
    # tolerance rather than exact tuple equality: a sub-ulp
    # accumulation-order difference between the BLAS matmul and the
    # left-to-right fold straddling a rounding boundary is a tie, not a
    # bug — in that case either neighbor order is acceptable provided
    # both scores sit within the tolerance.
    cols = ["vec_id", "nn_rank", "nn_id", "cos_sim"]
    fast = {
        (r[0], r[1]): (r[2], r[3])
        for r in map(tuple, e_knn_exact_blocked(spark, SF_SMALL).select(*cols).collect())
    }
    fold = {
        (r[0], r[1]): (r[2], r[3])
        for r in map(tuple, e_knn_within_label_fold(spark, SF_SMALL).select(*cols).collect())
    }
    assert fast.keys() == fold.keys()
    for key, (nn_a, cos_a) in fast.items():
        nn_b, cos_b = fold[key]
        # neighbor ids may differ only on a rounding-boundary tie, in
        # which case both scores still sit within the tolerance — the
        # score bound is the single invariant either way
        assert abs(cos_a - cos_b) <= 1e-6, key


def test_knn_lsh_no_cartesian_and_subset_of_exact(spark):
    # the registered LSH-sub-bucketed plan must never materialize a
    # label-wide pairwise join, and every (query, neighbor, score) it
    # returns must be a true exact-reranked pair from within the label
    plan = _executed_plan(e_knn_within_label(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = e_knn_within_label(spark, SF_SMALL).collect()
    assert got, "LSH candidate generation found no neighbors at all"
    exact_pairs = {
        (r.vec_id, r.nn_id): r.cos_sim
        for r in e_knn_within_label_fold(spark, SF_SMALL)
        .drop("nn_rank")
        .collect()
    }
    # the fold twin only keeps top-k; recompute full pair scores locally
    import duckdb

    full = {
        (a, b): c
        for a, b, c in duckdb.sql(
            f"""
            WITH n AS (
              SELECT vec_id, label, embedding,
                     sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * x))) AS nrm
              FROM read_parquet('{SF_SMALL}/embeddings.parquet'))
            SELECT a.vec_id, b.vec_id,
                   ROUND(list_sum(list_transform(range(1, 65),
                         i -> CAST(a.embedding[i] AS DOUBLE)
                              * b.embedding[i])) / (a.nrm * b.nrm), 6)
            FROM n a JOIN n b
              ON a.label = b.label AND a.vec_id <> b.vec_id
            """
        ).fetchall()
    }
    for r in got:
        assert (r.vec_id, r.nn_id) in full
        assert abs(full[(r.vec_id, r.nn_id)] - r.cos_sim) <= 1e-6
    # recall sanity vs the exact top-k. The synthetic embeddings are
    # near-random (exact top-3 cosine ~ 0.28 => per-bit sign agreement
    # p = 1 - theta/pi ~ 0.59; OR-construction recall
    # 1 - (1 - p^4)^4 ~ 0.40), so the bound pins the theoretical floor
    # for this corpus — at real near-dup similarity (cos >= 0.9,
    # p ~ 0.86) the same schedule gives recall ~ 0.97.
    got_pairs = {(r.vec_id, r.nn_id) for r in got}
    hits = sum(1 for p in exact_pairs if p in got_pairs)
    assert hits / len(exact_pairs) >= 0.3, f"recall {hits}/{len(exact_pairs)}"


def test_emb_lsh_bits_scale_schedule():
    # same contract as the kNN schedule: floor = the SQL-twin 4-bit
    # instantiation at oracle scale, then bucket population held
    # ~constant as the corpus grows (the 17.7x -> 1.15x probe fix)
    assert _emb_lsh_bits(500) == 4       # oracle scale (sf<=0.01)
    assert _emb_lsh_bits(50) == 4
    assert _emb_lsh_bits(2000) == 6      # sf0.1
    assert _emb_lsh_bits(20000) == 10    # 10x probe
    assert _emb_lsh_bits(10**9) == 16    # clamped to the 64-dim cap


def test_knn_lsh_bits_scale_schedule():
    # bucket width stays ~constant as blocks grow: the width schedule
    # is what turns sum(B^2) into ~N * tables * target at 100 TB
    assert _knn_lsh_bits(500, 10) == 4      # oracle scale: the SQL twin
    assert _knn_lsh_bits(50, 10) == 4       # floor below that
    assert _knn_lsh_bits(2000, 10) == 6     # sf0.1
    assert _knn_lsh_bits(20000, 10) == 9    # 10x probe
    assert _knn_lsh_bits(10**9, 10) == 16   # clamped to the 64-dim cap


def test_cluster_component_join_is_unhinted(spark):
    # the (node, component) map is corpus-linear worst-case; the final
    # join must leave strategy choice to AQE (no ResolvedHint in the
    # analyzed plan), not force a broadcast
    df = dedup_clusters(spark, SF_SMALL)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_recall_floor_at_bench_scale(spark, sf_bench):
    """Recall floors at sf0.1, where the adaptive schedules leave the
    4-bit floor (6 bits -> 7 tables via _lsh_tables) and the sf0.001
    recall tests stop being representative. Measured round 5:
    dedup_embedding_cosine 0.336, e_knn_within_label 0.275 — matching
    the sign-LSH model at this corpus's weak similarities (exact pairs
    sit near the 0.35 gate, per-bit agreement p = 1 - arccos(.35)/pi
    ~ 0.61, predicted 1-(1-p^6)^7 ~ 0.32; at the cos>=0.9 design point
    the same schedule holds ~0.96). Floors are measured-minus-margin;
    a schedule regression (frozen tables, over-wide buckets) trips
    them long before it reaches production scale."""
    got = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine(spark, sf_bench).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in exact_pairwise_cosine(spark, sf_bench).collect()
    }
    assert len(got & exact) / len(exact) >= 0.30

    got_nn = {
        (r.vec_id, r.nn_id)
        for r in e_knn_within_label(spark, sf_bench).collect()
    }
    exact_nn = {
        (r.vec_id, r.nn_id)
        for r in e_knn_within_label_fold(spark, sf_bench).collect()
    }
    assert len(got_nn & exact_nn) / len(exact_nn) >= 0.24


def test_km_k_scale_schedule():
    """Adaptive kmeans cluster count (the round-6/7 ask): floor 4 at
    oracle (500 rows) AND bench (2000 rows) scale — where the static
    SQL twins instantiate vec_id < 4 — growing ∝ N/512 beyond, capped
    at 4096 so the broadcast centroid table stays ~2 MB."""
    from mwa_uvdata_pipeline_spark.plans.text import _km_k, _sem_lsh_bits

    assert _km_k(500) == 4  # oracle floor (sf<=0.01)
    assert _km_k(2000) == 4  # bench scale (sf0.1)
    assert _km_k(20_000) == 40  # 10x probe: adaptive k engaged
    assert _km_k(200_000) == 391  # 100x probe
    assert _km_k(10**9) == 4096  # cap
    ks = [_km_k(n) for n in (500, 2000, 20_000, 200_000, 10**7, 10**9)]
    assert ks == sorted(ks)
    # composed schedule: while k grows (N <= cap*512 ~ 2M) the average
    # block stays ~512 and bits hold the 4-bit floor; past the k cap
    # the block grows again and bits resume absorbing it
    assert _sem_lsh_bits(500) == 4
    assert _sem_lsh_bits(2_000_000) == 4  # k still absorbing growth
    assert 4 < _sem_lsh_bits(10**7) <= _sem_lsh_bits(10**9) <= 16


def test_lsh_tables_scale_schedule():
    from mwa_uvdata_pipeline_spark.plans.text import _lsh_tables

    # floor: the 4x4 SQL-twin instantiation must be exact at oracle
    # scale or parity would break
    assert _lsh_tables(4) == 4
    assert _lsh_tables(4, 4) == 4
    # recall-holding growth: more bits -> more tables, monotone, capped
    assert _lsh_tables(6) == 7
    assert _lsh_tables(10) == 13
    assert _lsh_tables(16) == 16  # cap
    widths = [_lsh_tables(b) for b in range(4, 17)]
    assert widths == sorted(widths)


def test_semantic_dedup_recall_floor_and_subset(spark, sf_bench):
    """dedup_semantic at bench scale: every LSH-found drop must be a
    TRUE drop (the exact twin agrees — subset by construction, since
    every candidate pair is exact-verified), and drop recall vs the
    exact within-cluster pairwise twin holds a measured floor
    (round 6: 0.642 at sf0.1's weak 0.35 gate; ~0.96 at a real
    cos>=0.9 design point per the sign-LSH model). The 0.55 floor is
    measured-minus-margin against the DRIVER-generated fixture (seed
    fixed by the driver, TESTDATA.md); if that fixture is ever
    regenerated under a different seed, re-measure and re-pin — the
    sf_bench fixture skip-gates the test where the data is absent."""
    from mwa_uvdata_pipeline_spark.plans.text import (
        dedup_semantic,
        dedup_semantic_exact,
    )

    got = {
        r.vec_id for r in dedup_semantic(spark, sf_bench).collect()
        if not r.keep
    }
    exact = {
        r.vec_id for r in dedup_semantic_exact(spark, sf_bench).collect()
        if not r.keep
    }
    assert not (got - exact)  # zero false drops
    assert len(got & exact) / len(exact) >= 0.55
