"""Property-style invariants (SURVEY.md §5.3) with hypothesis-driven
small synthetic hypercubes: diff algebra, INS permutation invariance,
match-filter flag monotonicity, union-of-slices equivalence.

Few examples per property (Spark job latency dominates) but each
example is a different random grid, which is what catches shape bugs.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.operators.diff import time_diff
from mwa_uvdata_pipeline_spark.operators.ins import incoherent_noise_spectrum, zscore
from mwa_uvdata_pipeline_spark.operators.matchfilter import MatchFilterConfig, match_filter

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VIS_SCHEMA = (
    "time_idx int, ant1 int, ant2 int, chan int, pol string, freq_hz double, "
    "vis struct<re: double, im: double>, flag boolean, nsample float"
)


def _grid(spark, values, T=4, ants=(0, 1, 2), C=3):
    """Dense hypercube with vis values drawn from ``values`` (cycled)."""
    rows = []
    i = 0
    baselines = [(a, b) for a in ants for b in ants if a <= b]
    for t in range(T):
        for a1, a2 in baselines:
            for c in range(C):
                v = values[i % len(values)]
                i += 1
                rows.append(
                    (t, a1, a2, c, "XX", 1e8 + c, (float(v), float(-v)), False, 1.0)
                )
    return spark.createDataFrame(rows, VIS_SCHEMA)


@given(vals=st.lists(st.integers(-8, 8), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_diff_has_T_minus_1_steps_per_series(spark, vals):
    df = _grid(spark, vals, T=4)
    d = time_diff(df)
    per_series = d.groupBy("ant1", "ant2", "chan", "pol").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert per_series.where(F.col("n") != 3).count() == 0


@given(const=st.integers(-5, 5))
@settings(**_SETTINGS)
def test_diff_of_constant_series_is_zero(spark, const):
    df = _grid(spark, [const], T=3)
    d = time_diff(df)
    nonzero = d.where(
        (F.col("vis.re") != 0.0) | (F.col("vis.im") != 0.0)
    ).count()
    assert nonzero == 0


@given(seed=st.integers(0, 2**16))
@settings(**_SETTINGS)
def test_ins_invariant_under_baseline_relabel(spark, seed):
    """INS averages over the baseline axis, so renaming antennas (keeping
    auto/cross status) must not change the cross spectrum."""
    import random

    rng = random.Random(seed)
    vals = [rng.randint(-8, 8) for _ in range(7)]
    df = _grid(spark, vals, ants=(0, 1, 2))
    perm = {0: 2, 1: 0, 2: 1}
    mapping = F.create_map([F.lit(x) for kv in perm.items() for x in kv])
    relabeled = (
        df.withColumn("a1", mapping[F.col("ant1")])
        .withColumn("a2", mapping[F.col("ant2")])
        .withColumn("ant1", F.least("a1", "a2"))
        .withColumn("ant2", F.greatest("a1", "a2"))
        .drop("a1", "a2")
    )
    base = {
        (r["time_idx"], r["chan"], r["pol"]): r["ins"]
        for r in incoherent_noise_spectrum(time_diff(df)).collect()
    }
    got = {
        (r["time_idx"], r["chan"], r["pol"]): r["ins"]
        for r in incoherent_noise_spectrum(time_diff(relabeled)).collect()
    }
    assert base.keys() == got.keys()
    for k in base:
        a, b = base[k], got[k]
        assert (a is None) == (b is None)
        if a is not None:
            assert math.isclose(a, b, rel_tol=1e-9)


@given(seed=st.integers(0, 2**16))
@settings(**_SETTINGS)
def test_match_filter_flags_only_grow(spark, seed):
    """mf_flag is the OR of the stage flags: every narrow/streak/tb
    verdict implies mf_flag (monotonicity through MF stages)."""
    import random

    rng = random.Random(seed)
    vals = [rng.randint(-9, 9) for _ in range(11)]
    df = _grid(spark, vals)
    mf = match_filter(zscore(incoherent_noise_spectrum(time_diff(df))),
                      MatchFilterConfig())
    bad = mf.where(
        (F.col("narrow_flag") | F.col("streak_flag") | F.col("tb_flag"))
        & ~F.col("mf_flag")
    ).count()
    assert bad == 0


@given(split=st.integers(1, 3), seed=st.integers(0, 2**16))
@settings(**_SETTINGS)
def test_union_of_slices_equals_whole(spark, split, seed):
    """S5: reading in time batches and unioning ≡ one read
    (reference processors.py:154-173 accumulate loop)."""
    import random

    rng = random.Random(seed)
    vals = [rng.randint(-8, 8) for _ in range(5)]
    df = _grid(spark, vals, T=4)
    lo = df.where(F.col("time_idx") < split)
    hi = df.where(F.col("time_idx") >= split)
    assert lo.unionByName(hi).exceptAll(df).isEmpty()
    assert df.exceptAll(lo.unionByName(hi)).isEmpty()


@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    probes=st.lists(st.integers(10_001, 50_000), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_bloom_never_false_negative(spark, keys, probes):
    """Any inserted key set, any probe set: every inserted key tests
    positive (bloom exactness of x_bloom_prune rests on this)."""
    from mwa_uvdata_pipeline_spark.operators.bloom import build_bloom, might_contain

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = build_bloom(df, "k", m_bits=1 << 12, k=4)
    hits = (
        df.join(F.broadcast(bloom))
        .where(might_contain("words", "k", m_bits=1 << 12, k=4))
        .count()
    )
    assert hits == len(keys)


@given(
    cents=st.lists(
        st.integers(-10_000_000, 10_000_000), min_size=1, max_size=50
    ),
    cut=st.integers(1, 49),
)
@settings(**_SETTINGS)
def test_partial_agg_merge_equals_full(spark, cents, cut):
    """x_incremental_agg's algebra: splitting any value list at any
    point and merging the two partial (count, sum, min, max) tuples
    must equal the unsplit aggregate."""
    cut = min(cut, len(cents))
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "i long, c long"
    )

    def partial(d):
        return d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            F.min("c").alias("lo"),
            F.max("c").alias("hi"),
        )

    merged = (
        partial(df.where(F.col("i") < cut))
        .union(partial(df.where(F.col("i") >= cut)))
        .agg(
            F.sum("n").alias("n"), F.sum("s").alias("s"),
            F.min("lo").alias("lo"), F.max("hi").alias("hi"),
        )
        .first()
    )
    full = partial(df).first()
    assert (merged.n, merged.s, merged.lo, merged.hi) == (
        full.n, full.s, full.lo, full.hi,
    )
