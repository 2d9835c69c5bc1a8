"""S7 TSV sink roundtrip, hypercube layout, and the multimodal
mapInPandas plumbing (decode stub, frame fan-out, feature vectors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    binary_payload,
    decode_media,
    extract_features,
    sample_frames,
)
from mwa_uvdata_pipeline_spark.plans import table
from mwa_uvdata_pipeline_spark.sinks import (
    compact_parquet,
    read_tsv,
    write_hypercube,
    write_tsv,
)
from tests.conftest import SF_SMALL


def test_tsv_roundtrip(spark, tmp_path):
    df = table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "docs_tsv")
    write_tsv(df, out, single_file=True)
    back = read_tsv(spark, out, schema="doc_id long, lang string, n_chars long")
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)
    got = {r["doc_id"]: r["n_chars"] for r in back.collect()}
    want = {r["doc_id"]: r["n_chars"] for r in df.collect()}
    assert got == want


def test_hypercube_layout_prunes(spark, vis, tmp_path):
    out = str(tmp_path / "cube")
    write_hypercube(vis, out, partition_by=("chan",))
    back = spark.read.parquet(out)
    assert back.count() == vis.count()
    # partition pruning: a chan predicate must reach PartitionFilters
    plan = back.where(F.col("chan") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(chan" in plan


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    ev = table(spark, SF_SMALL, "events")
    ev.repartition(64).write.parquet(src)
    stats = compact_parquet(spark, src, dst, target_files=4)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 4
    before = spark.read.parquet(src)
    after = spark.read.parquet(dst)
    assert after.schema == before.schema
    key = [F.sum("event_id"), F.count(F.lit(1)), F.sum(F.crc32(F.col("props")))]
    assert after.agg(*key).collect() == before.agg(*key).collect()


def test_decode_media_one_row_per_input(spark):
    docs = binary_payload(table(spark, SF_SMALL, "documents"))
    dec = decode_media(docs)
    assert dec.count() == docs.count()
    row = dec.orderBy("doc_id").first()
    assert 64 <= row["width"] < 64 + 1024
    assert 1 <= row["n_frames"] <= 16


def test_sample_frames_fanout_matches_meta(spark):
    docs = binary_payload(table(spark, SF_SMALL, "documents"))
    frames = sample_frames(docs, every=2)
    per_doc = (
        frames.groupBy("doc_id", "n_frames")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    for r in per_doc:
        assert r["k"] == (r["n_frames"] + 1) // 2
    # frame indices are the even prefix
    bad = frames.where((F.col("frame_idx") % 2 != 0) | (F.col("frame_idx") >= F.col("n_frames"))).count()
    assert bad == 0


def test_extract_features_shape_and_determinism(spark):
    docs = binary_payload(table(spark, SF_SMALL, "documents"))
    f1 = extract_features(docs)
    assert dict(f1.dtypes)["features"] == "array<float>"
    rows = f1.orderBy("doc_id").limit(3).collect()
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r["features"])
    # deterministic across runs
    again = extract_features(docs).orderBy("doc_id").limit(3).collect()
    assert [r["features"] for r in rows] == [r["features"] for r in again]


def test_decode_real_path_raises_without_libs(spark):
    docs = binary_payload(table(spark, SF_SMALL, "documents")).limit(2)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        decode_media(docs, deterministic=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
