"""Invariants of the round-5 operators beyond oracle parity: the PII
scrubber must plant-and-remove exactly the spans the residue rules
dictate (and leave NO pattern match behind), and the skew diagnostics
must satisfy their own share algebra.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from mwa_uvdata_pipeline_spark.plans import load_all


def test_pii_scrub_counts_follow_residues(spark):
    rows = load_all()["t_pii_scrub"].spark(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % 5 == 0 else 0), r
        assert r.n_ips == (1 if r.doc_id % 7 == 0 else 0), r


def test_pii_scrub_leaves_no_matches(spark):
    # re-derive the scrubbed text (the registered plan gates it only by
    # md5) and assert the three patterns no longer match anywhere
    from mwa_uvdata_pipeline_spark.plans.text import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
        t_pii_scrub,
    )

    df = t_pii_scrub(spark, SF_SMALL)
    # rebuild raw+scrub inline the same way the plan does, on a doc
    # known to carry all three classes (doc_id 0: %3=%5=%7=0)
    planted = (
        "x contact user105@example.com now call 555-867-0105 from 10.105.0.1"
    )
    scrubbed = re.sub(
        _PII_IP,
        "<IP>",
        re.sub(_PII_PHONE, "<PHONE>", re.sub(_PII_EMAIL, "<EMAIL>", planted)),
    )
    assert scrubbed == "x contact <EMAIL> now call <PHONE> from <IP>"
    for pat in (_PII_EMAIL, _PII_PHONE, _PII_IP):
        assert not re.search(pat, scrubbed)
    assert df.count() > 0


def test_skew_diagnose_share_algebra(spark):
    rows = load_all()["x_skew_diagnose"].spark(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    total, n_keys = rows[0].total, rows[0].n_keys
    for r in rows:
        assert r.total == total and r.n_keys == n_keys
        assert r.share_ppm == r.n * 1_000_000 // total
        assert r.x_avg_pct == r.n * n_keys * 100 // total
    # the heaviest key is at least average by construction
    assert rows[0].x_avg_pct >= 100


def test_kmeans_partition_invariants(spark):
    rows = load_all()["ml_kmeans"].spark(spark, SF_SMALL).collect()
    assert rows
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r.cid, []).append(r)
    # every surviving cluster reports all 64 dims and one member count
    total = 0
    for cid, rs in by_cid.items():
        assert sorted(r.dim for r in rs) == list(range(64))
        assert len({r.n_members for r in rs}) == 1
        total += rs[0].n_members
    # assignments PARTITION the corpus: every vector in exactly one
    # cluster
    from mwa_uvdata_pipeline_spark.plans import table as _table

    n_vecs = _table(spark, SF_SMALL, "embeddings").count()
    assert total == n_vecs
    # centroids stay inside the quantized data envelope
    assert all(abs(r.centroid_q) <= 4_000_000 for r in rows)


def test_wav_decode_is_real_parsing(spark):
    # corrupt one byte of the RIFF header and the decoder must fail
    # loudly, not return md5-fake metadata
    import io
    import wave

    import pytest

    from mwa_uvdata_pipeline_spark.operators.multimodal import (
        synth_wav_bytes,
    )

    good = synth_wav_bytes(7)
    with wave.open(io.BytesIO(good), "rb") as w:
        assert w.getframerate() == 8000
        assert w.getnframes() == 64 + 7 % 64
    bad = b"JUNK" + good[4:]
    with pytest.raises(Exception):
        wave.open(io.BytesIO(bad), "rb")


def test_ppm_decode_handles_comments(spark):
    from mwa_uvdata_pipeline_spark.operators.multimodal import (
        synth_ppm_bytes,
    )

    raw = synth_ppm_bytes(11)
    # splice a comment line into the header; decode must skip it
    assert raw.startswith(b"P6\n")
    commented = b"P6\n# test comment\n" + raw[3:]
    import numpy as np
    import pandas as pd

    from mwa_uvdata_pipeline_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [11], "payload": [commented]})
    )
    row = mm.decode_ppm(df).collect()[0]
    assert row.width == 4 + 11 % 13
    assert row.height == 3 + 11 % 7
    # channel sums match the generator formula
    w, h, d = row.width, row.height, 11
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert row.sum_r == int(((d + x * 3 + y * 5) % 256).sum() * 1)
    assert row.sum_g == int(
        np.broadcast_to((d * 2 + x) % 256, (h, w)).sum()
    )
    assert row.sum_b == int(((x * y + d) % 256).sum())


def test_dataset_card_invariants(spark):
    rows = load_all()["t_dataset_card"].spark(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.n_sources > 0
        assert r.p50_chars <= r.p90_chars
        assert 0 <= r.n_exact_dup < r.n_docs
        # Shannon entropy of a distribution over n_sources outcomes
        import math

        assert -1e-9 <= r.source_entropy <= math.log(r.n_sources) + 1e-9


def test_naive_bayes_beats_chance(spark):
    rows = load_all()["ml_naive_bayes"].spark(spark, SF_SMALL).collect()
    total = sum(r.n for r in rows)
    correct = sum(r.n for r in rows if r.actual == r.predicted)
    n_langs = len({r.actual for r in rows})
    assert n_langs >= 2
    # resubstitution accuracy must beat the uniform-chance rate
    assert correct / total > 1.0 / n_langs
