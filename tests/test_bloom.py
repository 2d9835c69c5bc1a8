"""Bloom-filter operator invariants (operators/bloom.py).

The plan-level exactness of x_bloom_prune is covered by the oracle
parity suite; these tests pin the operator properties the exactness
RELIES on: zero false negatives (same hash family on both sides) and a
bitmap whose size is fixed regardless of build cardinality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.operators.bloom import build_bloom, might_contain


def test_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = build_bloom(keys, "k", m_bits=1 << 12, k=5)
    hits = (
        keys.join(F.broadcast(bloom))
        .where(might_contain("words", "k", m_bits=1 << 12, k=5))
        .count()
    )
    assert hits == 500  # every inserted key must test positive


def test_false_positive_rate_sane(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = build_bloom(keys, "k", m_bits=1 << 16, k=5)
    probe = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = (
        probe.join(F.broadcast(bloom))
        .where(might_contain("words", "k"))
        .count()
    )
    # 500 keys in 2^16 bits with k=5 -> theoretical FP ~ 4e-7; allow
    # generous slack, the point is "prunes almost everything"
    assert fp < 20


def test_bitmap_size_fixed(spark):
    small = build_bloom(spark.range(0, 10).select(F.col("id").alias("k")), "k")
    big = build_bloom(spark.range(0, 5_000).select(F.col("id").alias("k")), "k")
    n_small = small.select(F.size("words")).first()[0]
    n_big = big.select(F.size("words")).first()[0]
    assert n_small == n_big == (1 << 16) // 64


def test_param_mismatch_raises(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    keys = spark.range(0, 50).select(F.col("id").alias("k"))
    bloom = build_bloom(keys, "k", m_bits=1 << 12, k=5)
    probe = keys.join(F.broadcast(bloom)).where(
        might_contain("words", "k", m_bits=1 << 12, k=4)  # wrong k
    )
    with pytest.raises(SparkRuntimeException):
        probe.count()


def test_identifier_validation():
    import pytest

    with pytest.raises(ValueError):
        might_contain("words; DROP TABLE x", "k")
    with pytest.raises(ValueError):
        might_contain("words", "k OR 1=1")
    with pytest.raises(ValueError):
        might_contain("words", "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        might_contain("words", "k", k=0)
