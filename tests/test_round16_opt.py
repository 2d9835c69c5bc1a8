"""Round-16 optimization pins: internals-level tests for changes whose
VALUES are proven unchanged by the oracle gate — these pin the plan
shapes and fusion seams so a regression is caught without a bench run."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_synth_decode_fuses_into_one_python_pass(spark):
    """decode_x(synth_payloads(...)) must run ONE MapInPandas above the
    key-only exchange — the synth->decode seam may not round-trip
    payload bytes through the JVM (guide §4: one boundary crossing)."""
    from mwa_uvdata_pipeline_spark.operators.multimodal import (
        decode_wav,
        synth_payloads,
    )
    from mwa_uvdata_pipeline_spark.plans import table

    docs = table(spark, SF_SMALL, "documents")
    out = decode_wav(synth_payloads(docs, "wav"))
    plan = _executed_plan(out)
    assert plan.count("MapInPandas") == 1
    ex = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert ex and all("payload" not in ln for ln in ex)


def test_fused_decode_values_match_materialized_path(spark):
    """The fusion is a pure plan rewrite: decoding the fused frame and
    decoding the materialized synth output must agree row for row."""
    from mwa_uvdata_pipeline_spark.operators.multimodal import (
        decode_jpeg,
        synth_payloads,
    )
    from mwa_uvdata_pipeline_spark.plans import table

    docs = table(spark, SF_SMALL, "documents")
    fused = decode_jpeg(synth_payloads(docs, "jpeg"))
    # non-string select defeats the fusion seam -> materialized chain
    mat = synth_payloads(docs, "jpeg").select("doc_id", F.col("payload"))
    assert _executed_plan(decode_jpeg(mat)).count("MapInPandas") == 2
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, decode_jpeg(mat).collect()))
    assert a == b


def test_lazy_synth_frame_falls_back_for_generic_use(spark):
    """Non-seam DataFrame use of synth_payloads output (counts, column
    pruning, filters) must behave exactly like the materialized chain."""
    from mwa_uvdata_pipeline_spark.operators.multimodal import (
        synth_payloads,
    )
    from mwa_uvdata_pipeline_spark.plans import table

    docs = table(spark, SF_SMALL, "documents")
    raw = synth_payloads(docs, "ppm")
    n = spark.sparkContext.defaultParallelism
    assert raw.rdd.getNumPartitions() == n
    assert raw.where(F.col("doc_id") < 10).count() == 10
    head = raw.orderBy("doc_id").limit(1).collect()[0]
    assert bytes(head.payload[:2]) == b"P6"
