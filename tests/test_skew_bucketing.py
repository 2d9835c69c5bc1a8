"""Scale tooling: salted aggregation correctness under skew and
bucketed-table joins eliminating shuffle exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.operators.skew import salted_agg
from mwa_uvdata_pipeline_spark.plans import table
from mwa_uvdata_pipeline_spark.sinks import write_bucketed
from tests.conftest import SF_SMALL


def test_salted_agg_equals_direct(spark):
    # 90% of rows on one hot key — the shape salting exists for
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    got = salted_agg(
        df, ["k"],
        {"total": ("sum", "v"), "n": ("count", "v"),
         "lo": ("min", "v"), "hi": ("max", "v")},
        n_salt=8,
    )
    want = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.range(10).select(F.lit("a").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(df, ["k"], {"m": ("median", "v")})


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4,
                   path=str(tmp_path / "b_orders"))
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", n_buckets=4,
        path=str(tmp_path / "b_lineitem"),
    )
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    # force a non-broadcast join so bucketing is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-bucketed: no shuffle either side
        n = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
    want = orders.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).count()
    assert n == want
