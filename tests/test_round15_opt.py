"""Round-15 optimization pins: every change here altered an operator's
INTERNALS (partitioning, expression construction) while the oracle gate
proves the VALUES unchanged — these tests pin the internals themselves
so a regression is caught without a full bench run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def test_fan_out_partition_count_tracks_default_parallelism(spark):
    from mwa_uvdata_pipeline_spark.plans import fan_out, table

    docs = table(spark, SF_SMALL, "documents")
    n = spark.sparkContext.defaultParallelism
    assert fan_out(docs, "doc_id").rdd.getNumPartitions() == n


def test_fan_out_preserves_rows_exactly(spark):
    from mwa_uvdata_pipeline_spark.plans import fan_out, table

    docs = table(spark, SF_SMALL, "documents").select("doc_id")
    a = sorted(r.doc_id for r in docs.collect())
    b = sorted(r.doc_id for r in fan_out(docs, "doc_id").collect())
    assert a == b


def test_synth_payloads_is_parallel_and_key_only_exchange(spark):
    """The codec seam: payload synthesis must fan out across the
    cluster, and the exchange below the mapInPandas chain must carry
    ONLY the doc_id key — payload bytes are born after the shuffle."""
    from mwa_uvdata_pipeline_spark.operators.multimodal import synth_payloads
    from mwa_uvdata_pipeline_spark.plans import table

    docs = table(spark, SF_SMALL, "documents")
    out = synth_payloads(docs, "wav")
    n = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == n
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    # the exchange input is the bare key column, never the payload
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert ex and all("payload" not in ln for ln in ex)


def test_char_entropy_runlength_fold_matches_explode_formulation(spark):
    """t_char_entropy was restructured from a corpus-wide (doc, lang,
    trigram) hash aggregate to a per-doc sorted-run-length fold; the
    two must agree row for row (the oracle proves it vs DuckDB, this
    pins it Spark-vs-Spark so a drift is locally attributable)."""
    from mwa_uvdata_pipeline_spark.plans import load_all, table

    docs = table(spark, SF_SMALL, "documents").where(F.length("text") >= 3)
    tri = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.substring(F.col("text"), i, 3),
            )
        ).alias("t"),
    )
    cnt = tri.groupBy("doc_id", "lang", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = cnt.groupBy("doc_id", "lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1000000).cast("long")
        )
        .cast("long")
        .alias("clnc_micro"),
    )
    h_micro = F.round(
        F.log(F.col("n").cast("double")) * 1000000
        - F.col("clnc_micro") / F.col("n")
    ).cast("long")
    want = sorted(
        map(
            tuple,
            per.select("lang", h_micro.alias("h_micro"))
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("h_micro").cast("long").alias("sum_h_micro"),
                F.min("h_micro").cast("long").alias("min_h_micro"),
                F.max("h_micro").cast("long").alias("max_h_micro"),
            )
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            load_all()["t_char_entropy"].spark(spark, SF_SMALL).collect(),
        )
    )
    assert got == want


@pytest.mark.parametrize("bits,n_tables", [(4, 4), (5, 6)])
def test_lsh_keyed_expr_matches_column_form(spark, bits, n_tables):
    """_emb_lsh_keyed_expr (one F.expr string) must be value-identical
    to the per-bit Column construction it replaced."""
    from mwa_uvdata_pipeline_spark.plans import table
    from mwa_uvdata_pipeline_spark.plans.text import (
        _emb_lsh_key,
        _emb_lsh_keyed_expr,
    )

    emb = table(spark, SF_SMALL, "embeddings").limit(64)
    new = (
        emb.select(
            "vec_id", _emb_lsh_keyed_expr("embedding", n_tables, bits).alias("tk")
        )
        .select("vec_id", "tk.t", "tk.k")
    )
    old = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        _emb_lsh_key(F.col("embedding"), t, bits).alias("k"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tk"),
    ).select("vec_id", "tk.t", "tk.k")
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )
