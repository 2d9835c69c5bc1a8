"""Measure adaptive-LSH recall against the exact twins at BENCH scale.

The recall tests in tests/test_embedding_dedup.py run at sf0.001 where
the adaptive bit schedules sit at their 4-bit floor; at sf0.1 the
widths grow (6 bits for ~2-5k vectors) and recall shifts — narrower
buckets mean fewer candidates per table. This probe measures, at a
given sf_dir (default sf0.1):

- ``dedup_embedding_cosine`` pair recall vs ``exact_pairwise_cosine``
  (the unregistered all-pairs audit twin);
- ``e_knn_within_label`` neighbor recall vs ``e_knn_within_label_fold``
  (the exact within-label top-k twin).

Both registered plans are verified-subset by construction (every
survivor is exact-scored), so recall is the only degree of freedom.
Numbers are recorded in SCALE.md; tests/test_embedding_dedup.py pins
floors at the same scale.

Usage: python tools/recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from mwa_uvdata_pipeline_spark.plans.text import (
        dedup_embedding_cosine,
        e_knn_within_label,
        e_knn_within_label_fold,
        exact_pairwise_cosine,
    )
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("recall-probe")

    got_pairs = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    exact_pairs = {
        (r.vec_a, r.vec_b)
        for r in exact_pairwise_cosine(spark, sf_dir).collect()
    }
    dedup_recall = (
        len(got_pairs & exact_pairs) / len(exact_pairs) if exact_pairs else 1.0
    )

    got_nn = {
        (r.vec_id, r.nn_id) for r in e_knn_within_label(spark, sf_dir).collect()
    }
    exact_nn = {
        (r.vec_id, r.nn_id)
        for r in e_knn_within_label_fold(spark, sf_dir).collect()
    }
    knn_recall = len(got_nn & exact_nn) / len(exact_nn) if exact_nn else 1.0

    from mwa_uvdata_pipeline_spark.plans.text import (
        dedup_semantic,
        dedup_semantic_exact,
    )

    got_drop = {
        r.vec_id
        for r in dedup_semantic(spark, sf_dir).collect()
        if not r.keep
    }
    exact_drop = {
        r.vec_id
        for r in dedup_semantic_exact(spark, sf_dir).collect()
        if not r.keep
    }
    sem_recall = (
        len(got_drop & exact_drop) / len(exact_drop) if exact_drop else 1.0
    )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "dedup_embedding_cosine": {
                    "lsh_pairs": len(got_pairs),
                    "exact_pairs": len(exact_pairs),
                    "recall": round(dedup_recall, 4),
                },
                "e_knn_within_label": {
                    "lsh_hits": len(got_nn & exact_nn),
                    "exact_topk": len(exact_nn),
                    "recall": round(knn_recall, 4),
                },
                "dedup_semantic": {
                    "lsh_drops": len(got_drop),
                    "exact_drops": len(exact_drop),
                    "false_drops": len(got_drop - exact_drop),
                    "drop_recall": round(sem_recall, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
