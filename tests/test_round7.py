"""Round-7 regressions: two-level rank/cumsum equivalence (the
sharded forms must equal their naive single-window counterparts on
real data), sketch merge algebra invariants, and the banded
distribution ranks."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from mwa_uvdata_pipeline_spark.plans import load_all, table


def test_stratified_sample_equals_naive_single_window(spark):
    """The two-level (lang, md5-prefix) draw must pick EXACTLY the
    rows a naive per-lang rank picks — the prefix shards are a
    partition of the md5 order, not an approximation."""
    from mwa_uvdata_pipeline_spark.plans.text import (
        _STRATUM_N,
        t_stratified_sample,
    )

    got = {
        (r.doc_id, r.lang, r.rn)
        for r in t_stratified_sample(spark, SF_SMALL).collect()
    }
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = {
        (r.doc_id, r.lang, r.rn)
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _STRATUM_N)
        .collect()
    }
    assert got == naive


def test_kmv_two_level_equals_naive_rank(spark):
    """Per-group bottom-k built from per-shard bottom-ks must equal
    the direct per-group rank (a group's k smallest are inside their
    own shard's k smallest)."""
    from mwa_uvdata_pipeline_spark.plans.events import (
        _KMV_K,
        _kmv_pergroup,
    )

    ev = table(spark, SF_SMALL, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    got = {
        (r.event_type, r.hv) for r in _kmv_pergroup(h, _KMV_K).collect()
    }
    w = Window.partitionBy("event_type").orderBy("hv")
    naive = {
        (r.event_type, r.hv)
        for r in h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KMV_K)
        .select("event_type", "hv")
        .collect()
    }
    assert got == naive


def test_w7_banded_rank_equals_native_dist_functions(spark):
    """The banded two-level rank must reproduce Spark's own
    percent_rank/cume_dist bit-for-bit (unique ordering key)."""
    plan = load_all()["w7_dist_rank"]
    got = {
        (r.o_orderkey, r.pr, r.cd)
        for r in plan.spark(spark, SF_SMALL).collect()
    }
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    naive = {
        (r.o_orderkey, r.pr, r.cd)
        for r in table(spark, SF_SMALL, "orders")
        .select(
            "o_orderkey",
            F.round(F.percent_rank().over(w), 9).alias("pr"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        .collect()
    }
    assert got == naive


def test_hll_merged_equals_direct_global_sketch(spark):
    """The '(merged)' HLL scope — built only from per-scope register
    tables — must equal the sketch computed directly over the union
    (MAX merge algebra), and its estimate must be a sane
    distinct-count (within 40% of truth for n >> m)."""
    from mwa_uvdata_pipeline_spark.plans.events import ev_hll_merge

    rows = {r.scope: r for r in ev_hll_merge(spark, SF_SMALL).collect()}
    merged = rows["(merged)"]
    ev = table(spark, SF_SMALL, "events")
    truth = ev.select("user_id").distinct().count()
    # direct global sketch: same pipeline without the scope split
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    direct = (
        ev.select(hv.alias("hv"))
        .distinct()
        .select(
            (F.col("hv") % 64).alias("bucket"),
            F.expr("hv div 64").alias("rem"),
        )
        .withColumn(
            "rho",
            F.expr(
                "CASE "
                + " ".join(
                    f"WHEN rem >= {1 << k} THEN {26 - k}"
                    for k in range(25, -1, -1)
                )
                + " ELSE 27 END"
            ),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 27 - rho)")).alias(
                "s"
            ),
        )
        .collect()[0]
    )
    s_scaled = direct["s"] + (64 - direct["n_present"]) * (1 << 27)
    assert merged.n_present == direct["n_present"]
    assert merged.s_scaled == s_scaled
    # the corrected estimator (linear counting in the small-range
    # regime, raw harmonic mean otherwise) must track truth
    assert abs(merged.est_corrected - truth) / truth < 0.4


def test_bitmap_merged_distinct_is_exact(spark):
    """Bitmap OR-merge is an EXACT algebra: the merged popcount must
    equal the true global distinct user count."""
    from mwa_uvdata_pipeline_spark.plans.events import agg_bitmap_distinct

    rows = {
        r.scope: r for r in agg_bitmap_distinct(spark, SF_SMALL).collect()
    }
    truth = (
        table(spark, SF_SMALL, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows["(merged)"].n_distinct == truth
    # per-scope counts are exact too, and each <= global
    per = [v.n_distinct for k, v in rows.items() if k != "(merged)"]
    assert all(0 < p <= truth for p in per)


def test_mixture_sample_budget_invariants(spark):
    """Every language's kept tokens must stop at the first doc
    crossing the budget: kept <= budget + max single doc, and at
    least one doc kept per lang (budget >= half the floor lang)."""
    from mwa_uvdata_pipeline_spark.plans.text import t_mixture_sample

    rows = t_mixture_sample(spark, SF_SMALL).collect()
    assert rows
    budgets = {r.budget for r in rows}
    assert len(budgets) == 1  # one global budget
    budget = budgets.pop()
    # overshoot bound: the last admitted doc STARTS inside the budget,
    # so kept tokens < budget + that language's largest document
    max_doc = {
        r.lang: r.m
        for r in table(spark, SF_SMALL, "documents")
        .groupBy("lang")
        .agg(F.max(F.size(F.split("text", " "))).alias("m"))
        .collect()
    }
    for r in rows:
        assert 1 <= r.n_docs_kept <= r.n_docs_total
        assert r.n_tokens_kept < budget + max_doc[r.lang]
        # the budget is binding: dropping the overshoot doc (at most
        # one) would leave the kept mass under budget
        assert r.n_tokens_kept - max_doc[r.lang] < budget


def test_vad_known_doc(spark):
    """Spot-check VAD against a hand-computed doc: doc_id 0 has 64
    samples s[i] = (13 i) % 2048 - 1024 -> 4 frames of 16."""
    from mwa_uvdata_pipeline_spark.plans.text import m_audio_vad

    row = [
        r for r in m_audio_vad(spark, SF_SMALL).collect() if r.doc_id == 0
    ][0]
    import numpy as np

    i = np.arange(64)
    s = (0 * 7 + i * 13) % 2048 - 1024
    fr = s.reshape(4, 16)
    energy = (fr * fr).sum(axis=1)
    active = energy > 16 * 349525
    run = best = 0
    for a in active:
        run = run + 1 if a else 0
        best = max(best, run)
    assert row.n_frames == 4
    assert row.n_active == int(active.sum())
    assert row.max_run == best
    assert row.energy_active == int(energy[active].sum())


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from("abc"), st.integers(0, 10_000)),
            min_size=1,
            max_size=120,
            unique=True,
        ),
        st.integers(1, 9),
    )
    def test_kmv_two_level_equivalence_property(spark, rows, k):
        """Property: for ANY distinct (group, hash) table and any k,
        per-shard bottom-k pooled and re-ranked equals the direct
        per-group bottom-k — the algebra behind every two-level rank
        in the repo."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from mwa_uvdata_pipeline_spark.plans.events import _kmv_pergroup

        h = spark.createDataFrame(rows, "event_type string, hv long")
        got = {
            (r.event_type, r.hv) for r in _kmv_pergroup(h, k).collect()
        }
        w = Window.partitionBy("event_type").orderBy("hv")
        naive = {
            (r.event_type, r.hv)
            for r in h.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("event_type", "hv")
            .collect()
        }
        assert got == naive
