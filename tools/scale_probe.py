"""Measure how headline plans scale when facts grow 10x.

Builds a synthetic 10x dataset from sf0.1: fact tables are unioned 10
times with key offsets so join keys stay consistent and cardinalities
grow linearly; dimensions are kept as-is (the realistic growth mode —
facts grow, dims don't). Grown corpora are PERTURBED, not duplicated:

- ``documents``: every non-leading token in copy i is tagged ``c{i}``,
  so shingles are disjoint across copies — a 10x corpus of new content.
  Plain duplication would make every doc a 10-way near-dup and the
  dedup answers themselves (pair lists, clusters) would grow
  quadratically by construction, telling us nothing about the plan.
- ``embeddings``: copy i flips the sign of dimension j when bit
  (j mod 4) of i is set — norm-preserving, deterministic, and spreads
  copies across LSH/IVF buckets the way genuinely new vectors would.
- ``lineitem``: orderkey/partkey/suppkey all offset per copy, so the
  part-supplier graph gains 10x nodes AND 10x edges (offsetting only
  orderkey would leave the DISTINCT edge set unchanged).

Then times each query at both scales (min of 2 warm runs after a
warmup) and prints the per-query time ratio plus one JSON line. A plan
whose ratio is near the data ratio (or below — fixed overhead
amortizes) scales linearly; a super-linear ratio exposes a hidden
all-pairs/skew problem.

Skew-adversarial mode (``--skew``): the perturbed-growth probe keeps
key distributions UNIFORM — exactly the blind spot that hid
m_phash_dedup's 65.6x blow-up in round 4 until the hash widened. With
``--skew`` the fixtures additionally get a Zipfian hot key at every
scale:

- ``documents``: a fixed 5-token boilerplate footer is appended to 50%
  of docs (every copy, untagged), so its 3 shingles have DF = N/2 —
  the hot posting-list key that breaks naive posting self-joins;
- ``events``: 30% of events are reassigned to one hot ``user_id``, so
  any per-user shuffle has one reducer holding 30% of the table;
- ``lineitem``: 30% of lineitems point at one hot ``l_partkey``.

Both the 1x baseline and the Nx grown dataset carry the SAME skew
fraction, so the reported ratio isolates growth-under-skew: a plan
with a hot-key quadratic shows a ratio near n_copies^2 here even when
the uniform probe reports ~1x.

Usage: python tools/scale_probe.py [--skew] [n_copies] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_probe"

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_orders",
    "j1_broadcast_lookup",
    "dedup_exact",
    "ev_funnel",
    "ev_retention",
    "x_unpivot",
    # the heavy north-star family (VERDICT r3: previously unprobed)
    "dedup_embedding_cosine",
    "dedup_clusters",
    "graph_pagerank",
    "sim_pq_adc_topk",
    "e_knn_within_label",
    # round-4 additions
    "x_cdc_apply",
    "x_scd2_history",
    "sim_bm25_topk",
    "dedup_incremental",
    "t_edit_distance_pairs",
    "ev_rate_anomaly",
    "sim_hybrid_rrf",
    # round-4 second wave
    "graph_triangles",
    "ev_gapfill_locf",
    "ml_linreg",
    "x_bloom_prune",
    "x_assoc_rules",
    "agg_cms_heavy",
    "x_table_diff",
    "dedup_best_in_cluster",
    # round-4 third wave
    "dedup_containment",
    "t_bigram_familiarity",
    "m_phash_dedup",
    "graph_bfs_hops",
    "graph_kcore_peel",
    "e_matryoshka",
    # round-4 fourth wave
    "x_identity_stitch",
    "ev_attribution",
    "ev_ab_test",
    "t_bpe_token_estimate",
    "t_lang_id",
    "t_rolling_fingerprint",
    # round-5 additions
    "ml_kmeans",
    "ml_naive_bayes",
    "t_duplicate_spans",
    "sim_ivfpq_topk",
    "t_dataset_card",
    "t_pii_scrub",
    "x_skew_diagnose",
    "s_zorder_layout",
    # round-6 additions
    "dedup_semantic",
    "pipeline_prep_attrition",
    "j10_bucketed_join",
]

# The skew-sensitive set: posting self-joins (containment/jaccard),
# the corpus-frequency join, a per-user shuffle, the salted join built
# for exactly this situation, plus the hub-sensitive graph census,
# basket pair expansion, signature grouping, and exact-dup groupBy.
SKEW_QUERIES = [
    "dedup_containment",
    "dedup_ngram_jaccard",
    "t_bigram_familiarity",
    "ev_funnel",
    "j9_salted_join",
    "graph_triangles",
    "x_assoc_rules",
    "dedup_minhash_buckets",
    "dedup_exact",
]

# Round-8 skew flavor (``--skew2``): a SEPARATE hot-key shape per the
# round-7 verdict's unfinished probe list. Kept out of _skew because a
# hot l_orderkey would, by construction, make the per-order basket
# expansions (x_assoc_rules, graph_triangles) quadratic in DATA, which
# probes the dataset, not the plan. The three targets touch disjoint
# tables, so one build carries all three:
# - embeddings: 30% of vectors get a dominant shared component in dim
#   63 (outside every LSH key window), so kmeans lumps them into ONE
#   giant cluster while their bucket keys stay diverse — exactly the
#   case fixed k=4 used to make likely and the adaptive-k + sub-bucket
#   design must absorb;
# - lineitem: 30% of lineitems point at orderkey 1, so one bucket of
#   the j10 merge join holds 30% of the fact table;
# - events: users with user_id % 3 == 1 have every event's DATE pinned
#   to the corpus start (time-of-day kept), so ~1/3 of all users share
#   one cohort_date — the giant cohort.
SKEW2_QUERIES = ["dedup_semantic", "j10_bucketed_join", "ev_cohort_ltv"]

KEY_OFFSETS = {
    "lineitem": {
        "l_orderkey": 1_000_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "orders": {"o_orderkey": 1_000_000_000},
    "events": {"event_id": 1_000_000_000},
    "documents": {"doc_id": 1_000_000_000},
    "embeddings": {"vec_id": 1_000_000_000},
}


def _perturb(df, t: str, i: int):
    """Make copy i genuinely new content (see module docstring)."""
    from pyspark.sql import functions as F

    if i == 0:
        return df
    if t == "documents":
        return df.withColumn(
            "text", F.regexp_replace(F.col("text"), " ", f" c{i}")
        )
    if t == "embeddings":
        signs = [-1.0 if (i >> b) & 1 else 1.0 for b in range(4)]

        def flip(x, j):
            jm = j % 4
            s = (
                F.when(jm == 0, F.lit(signs[0]))
                .when(jm == 1, F.lit(signs[1]))
                .when(jm == 2, F.lit(signs[2]))
                .otherwise(F.lit(signs[3]))
            )
            return (x * s).cast("float")

        return df.withColumn("embedding", F.transform(F.col("embedding"), flip))
    return df


def _skew(df, t: str):
    """Inject one Zipfian hot key per fact table (see module docstring).

    The hot fractions are scale-invariant (predicates on stable key
    parity/modulus), so 1x and Nx builds have identical skew shape. The
    boilerplate footer tokens are NOT copy-tagged, so the resulting
    shingles are shared across all copies — one global hot posting key.
    """
    from pyspark.sql import functions as F

    if t == "documents":
        # doc_id offsets are even (1e9), so parity — hence the 50%
        # fraction — is preserved across copies.
        return df.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.col("text"), F.lit(" zq0 zq1 zq2 zq3 zq4")),
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if t == "events":
        return df.withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 < 3, F.lit(7).cast("long"))
            .otherwise(F.col("user_id")),
        )
    if t == "lineitem":
        return df.withColumn(
            "l_partkey",
            F.when(F.col("l_orderkey") % 10 < 3, F.lit(1).cast("long"))
            .otherwise(F.col("l_partkey")),
        )
    return df


def _skew2(df, t: str):
    """Round-8 hot-key shapes (see SKEW2_QUERIES comment). All
    predicates are mod-based on keys whose copy offsets are multiples
    of 10/3, so 1x and Nx builds carry the same hot fraction."""
    from pyspark.sql import functions as F

    if t == "embeddings":
        # one giant kmeans cluster: dominant shared component in dim 63
        # (outside every LSH key window: tables*bits <= 16 dims), so
        # cluster assignment lumps 30% of vectors while their sub-bucket
        # keys stay diverse
        return df.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 10 < 3,
                F.transform(
                    F.col("embedding"),
                    lambda x, j: F.when(j == 63, F.lit(5.0))
                    .otherwise(x)
                    .cast("float"),
                ),
            ).otherwise(F.col("embedding")),
        )
    if t == "lineitem":
        # hot join key for the bucketed merge join: one bucket holds 30%
        return df.withColumn(
            "l_orderkey",
            F.when(F.col("l_orderkey") % 10 < 3, F.lit(1).cast("long"))
            .otherwise(F.col("l_orderkey")),
        )
    if t == "events":
        # giant cohort: ~1/3 of users first appear on the corpus start
        # date (every event's DATE pinned, time-of-day kept)
        pin = F.expr(
            "ts - make_interval(0, 0, 0, "
            "datediff(to_date(ts), to_date('2024-01-01')), 0, 0, 0)"
        )
        return df.withColumn(
            "ts", F.when(F.col("user_id") % 3 == 1, pin).otherwise(F.col("ts"))
        )
    return df


def build(
    spark, n_copies: int, dst: str = DST, skew: bool = False,
    skew2: bool = False,
) -> None:
    from pyspark.sql import functions as F

    from mwa_uvdata_pipeline_spark.plans import table

    os.makedirs(dst, exist_ok=True)
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        df = table(spark, SRC, t)
        if t in KEY_OFFSETS and n_copies > 1:
            copies = []
            for i in range(n_copies):
                c = _perturb(df, t, i)
                for col, step in KEY_OFFSETS[t].items():
                    c = c.withColumn(col, F.col(col) + F.lit(i * step))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df
        if skew:
            out = _skew(out, t)
        if skew2:
            out = _skew2(out, t)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def run(spark, plans, queries, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in queries:
        p = plans[name]
        p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            p.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = best
    return times


def main() -> None:
    args = sys.argv[1:]
    skip_build = "--nobuild" in args
    skew = "--skew" in args
    skew2 = "--skew2" in args
    args = [a for a in args if a not in ("--nobuild", "--skew", "--skew2")]
    n_copies = int(args[0]) if args and args[0].isdigit() else 10
    if args and args[0].isdigit():
        args = args[1:]
    queries = args or (
        SKEW2_QUERIES if skew2 else SKEW_QUERIES if skew else QUERIES
    )

    from mwa_uvdata_pipeline_spark.plans import load_all
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    plans = load_all()
    if skew2:
        base_dir, big_dir = "/tmp/scale_probe_sk2_1", "/tmp/scale_probe_sk2_N"
        if not skip_build:
            print(f"building skew2 1x + {n_copies}x facts ...", flush=True)
            build(spark, 1, base_dir, skew2=True)
            build(spark, n_copies, big_dir, skew2=True)
    elif skew:
        base_dir, big_dir = "/tmp/scale_probe_skew1", "/tmp/scale_probe_skewN"
        if not skip_build:
            print(f"building skewed 1x + {n_copies}x facts ...", flush=True)
            build(spark, 1, base_dir, skew=True)
            build(spark, n_copies, big_dir, skew=True)
    else:
        base_dir, big_dir = SRC, DST
        if not skip_build:
            print(f"building {n_copies}x facts at {DST} ...", flush=True)
            build(spark, n_copies)
    base = run(spark, plans, queries, base_dir)
    big = run(spark, plans, queries, big_dir)
    mode = "skew2" if skew2 else "skew" if skew else "uniform"
    label = {"skew2": "sk2-1x", "skew": "skew1x", "uniform": "sf0.1"}[mode]
    print(f"\n{'query':<24}{label:>9}{'Nx':>9}{'ratio':>8}")
    ratios = {}
    for name in queries:
        ratios[name] = round(big[name] / base[name], 2)
        print(f"{name:<24}{base[name]:>9.2f}{big[name]:>9.2f}{ratios[name]:>8.1f}")
    print(json.dumps({
        "n_copies": n_copies,
        "mode": mode,
        "skew": skew or skew2,
        "base_sec": {k: round(v, 3) for k, v in base.items()},
        "big_sec": {k: round(v, 3) for k, v in big.items()},
        "ratio": ratios,
    }))


if __name__ == "__main__":
    main()
