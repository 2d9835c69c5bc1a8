"""Invariants for the chunking / vocab / decontamination text ops.

The oracle-parity test pins exact values on the synthetic corpus;
these pin the STRUCTURAL guarantees on arbitrary texts: chunking
loses no characters and reconstructs the original, OOV rates are
valid fractions, decontamination finds exactly the probed docs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.plans.text import (
    _CHUNK_LEN,
    _CHUNK_STRIDE,
    _PROBE_PHRASES,
    shingle_rows,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _chunk(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    starts = F.sequence(F.lit(1), F.length("text"), F.lit(_CHUNK_STRIDE))
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            ((F.col("i") - 1) / _CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.substring(F.col("text"), F.col("i"), F.lit(_CHUNK_LEN)).alias("chunk"),
        )
        .collect()
    )


@given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=400), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_chunks_reconstruct_original(spark, texts):
    rows = _chunk(spark, texts)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == len(texts)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        text = texts[doc_id]
        # contiguous ids from 0; strides cover the whole text
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        rebuilt = "".join(c.chunk[: _CHUNK_STRIDE] for c in chunks[:-1]) + chunks[-1].chunk
        assert rebuilt == text
        # overlap: chunk k repeats the tail of the stride-window before it
        for k in range(1, len(chunks)):
            expected = text[k * _CHUNK_STRIDE : k * _CHUNK_STRIDE + _CHUNK_LEN]
            assert chunks[k].chunk == expected


def test_chunk_bounds(spark):
    rows = _chunk(spark, ["x" * 1, "y" * _CHUNK_LEN, "z" * (_CHUNK_LEN + 1)])
    for r in rows:
        assert 1 <= len(r.chunk) <= _CHUNK_LEN
    # a text one char past the window gets a second (overlap-only) chunk
    n_chunks = {r.doc_id: 0 for r in rows}
    for r in rows:
        n_chunks[r.doc_id] += 1
    assert n_chunks == {0: 1, 1: 2, 2: 2}


def test_oov_rate_bounds(spark, request):
    from mwa_uvdata_pipeline_spark.plans import load_all

    from tests.conftest import SF_SMALL

    df = load_all()["t_vocab_coverage"].spark(spark, SF_SMALL)
    bad = df.where(
        (F.col("oov_rate") < 0)
        | (F.col("oov_rate") > 1)
        | (F.col("n_oov") > F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_decontaminate_matches_substring_probe(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "beta gamma delta epsilon"),
            (2, "zeta eta theta"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    hits = (
        shingle_rows(docs, k=3)
        .where(F.col("s").isin("beta gamma delta", "eta theta iota"))
        .select("doc_id")
        .distinct()
    )
    assert sorted(r.doc_id for r in hits.collect()) == [0, 1]
    assert _PROBE_PHRASES  # registered plan probes a non-empty set
