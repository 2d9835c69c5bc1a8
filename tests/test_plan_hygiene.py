"""Physical-plan hygiene sweep over the whole registry.

The 100-TB failure mode this guards: a plan that silently degrades to
an all-pairs join. ``CartesianProduct`` is banned outright; a
``BroadcastNestedLoopJoin`` is allowed only for plans that
intentionally broadcast a BOUNDED frame (a scalar aggregate, a fixed
query set, a centroid table) — growing that whitelist requires
explaining why the broadcast side stays small at scale.

Streaming-exec entries are skipped: their returned frame is a memory
sink scan, not the streaming plan (their operator topology is asserted
in test_streaming.py).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

from mwa_uvdata_pipeline_spark.plans import load_all

# name -> why the broadcast side is bounded at any corpus size
BNLJ_ALLOWED = {
    "j6_cross_join": "the operator IS a deliberate small-dim cross join",
    "q11_important_parts": "broadcast scalar threshold (single-row agg)",
    "q22_dormant_customers": "broadcast scalar avg balance (single-row agg)",
    "sim_cosine_topk": "broadcast fixed query set (k query vectors)",
    "sim_ivf_topk": "broadcast centroid table (k centroids)",
    "sim_pq_adc_topk": "LUT build: queries x sub-codebook, both fixed-size",
    "sim_ivfpq_topk": "broadcast coarse-centroid table (<=50 rows) + "
                      "LUT build (queries x sub-codebook, both fixed)",
    "t_tfidf_top3": "broadcast corpus row count (single-row agg)",
    "sim_bm25_topk": "broadcast corpus stats (single-row agg)",
    "sim_hybrid_rrf": "broadcast single query vector + corpus stats "
                      "(both 1-row); fusion joins two k-row lists",
    "x_bloom_prune": "broadcast single-row bloom bitmap (fixed 2^16 "
                     "bits = 1024 longs, independent of dim size)",
    "x_assoc_rules": "broadcast scalar basket count (single-row agg)",
    "e_matryoshka": "broadcast fixed query set (k query vectors)",
    "x_skew_diagnose": "broadcast total/n_keys (single-row agg)",
    "ml_naive_bayes": "broadcast per-label totals (n_langs rows, a "
                      "fixed label domain) + single-row vocab size",
    "t_bpe_train": "broadcast single-row top merge pair per round",
    "t_bpe_apply": "broadcast single-row top merge pair per round "
                   "(training sub-plan) + vocab-sized segmentation",
    "t_importance_resample": "broadcast DSIR corpus scalars — a "
                             "SINGLE 1-row aggregate (vocab size + "
                             "target/ref token totals), bounded at "
                             "any corpus size",
    "t_mixture_sample": "broadcast token budget (single-row MIN over "
                        "per-lang totals), bounded at any corpus size",
    "agg_kmv_intersect": "broadcast theta + n_common (two single-row "
                         "sketch aggregates, k-bounded by construction)",
    "e_hard_negatives": "broadcast fixed 20-anchor set (TakeOrdered "
                        "limit, constant at any corpus size)",
    "ev_hll_rolling": "broadcast register-bucket set (<= 64 rows, the "
                      "sketch width) against the day grid",
    "agg_kmv_anotb": "broadcast theta + n_anotb (two single-row "
                     "sketch aggregates, k-bounded by construction)",
    "t_corpus_drift": "broadcast corpus midpoint + era totals (two "
                      "single-row aggregates)",
    "graph_modularity": "broadcast edge-count scalar (single-row agg)",
    "graph_local_bridges": "broadcast closed-edge count (single-row "
                           "agg) against the edge-count scalar",
    "ev_time_to_convert": "broadcast converter stats + median (both "
                          "single-row aggregates)",
    "ev_rfm_segments": "broadcast corpus-max timestamp (single-row "
                       "agg)",
    "t_ngram_pmi": "broadcast unigram + bigram totals (two single-row "
                   "aggregates)",
    "ml_decision_stump": "broadcast class totals (single-row agg) "
                         "against the bounded value-domain table",
    "ev_survival_table": "broadcast observation horizon + subject "
                         "total (two single-row aggregates)",
    "pipeline_train_eval": "broadcast per-label totals (n_langs rows, "
                           "fixed label domain) + single-row train "
                           "vocab size (the ml_naive_bayes shape)",
    "ml_logreg_gd": "broadcast 1-row weight vector + corpus-count "
                    "scalar per GD iteration; the other side is the "
                    "value-domain stats grid (<= 561 combos)",
    "ml_adaboost_stumps": "broadcast 1-row weight total + 1-row best "
                          "stump per boosting round; the other side "
                          "is the (x1, x2, y) value-domain grid "
                          "(<= 1122 cells)",
    "sim_recall_at_k": "broadcast fixed 16-query evaluation panel "
                       "(TakeOrdered limit, constant at any corpus "
                       "size) against the corpus scan for the exact "
                       "ground-truth leg",
    "ml_adaboost_eval": "broadcast 1-row params/model frame per "
                        "boosting round and for test scoring; the "
                        "other side is the train-split value-domain "
                        "grid (<= 1122 cells) or the test scan",
    "t_kanonymity": "broadcast fixed 3-row k ladder against the "
                    "QI-cell table (attribute-domain bounded)",
    "ml_auc_holdout": "broadcast 1-row weight vector + corpus-count "
                      "scalar per GD round and for test scoring; the "
                      "other side is the train/test value-domain grid "
                      "(<= 561 combos each)",
    "agg_quantile_sketch_error": "broadcast 1-row min/max/count frame "
                                 "against the scan and the <= 128-bin "
                                 "sketch; broadcast 1-row estimate/"
                                 "rank frames for the audit pass",
    "ml_calibration_bins": "broadcast 1-row weight vector + corpus-"
                           "count scalar per GD round and for test "
                           "scoring (the ml_auc_holdout shape); the "
                           "other side is the train/test value-domain "
                           "grid (<= 561 combos each)",
}


def _plan_names():
    return sorted(n for n in load_all() if not n.startswith("stream_"))


@pytest.mark.parametrize("name", _plan_names())
def test_no_unbounded_join_explosion(spark, name):
    plan = load_all()[name]
    s = plan.spark(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in s, f"{name}: cartesian product in plan"
    if "BroadcastNestedLoopJoin" in s:
        assert name in BNLJ_ALLOWED, (
            f"{name}: BroadcastNestedLoopJoin not whitelisted — broadcast "
            "side must be provably bounded at corpus scale"
        )
