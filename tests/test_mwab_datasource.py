"""MWAB container + mwa_vis Python DataSource: roundtrip equality with
the parquet fixture, partition planning, and scan-level pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from mwa_uvdata_pipeline_spark.mwab import (
    MWABReader,
    long_to_mwab,
    read_header,
    register_mwa_source,
)


@pytest.fixture(scope="module")
def mwab_path(spark, vis, tmp_path_factory):
    out = tmp_path_factory.mktemp("mwab") / "obs.mwab"
    long_to_mwab(vis.toPandas(), str(out))
    return str(out)


def test_header_roundtrip(mwab_path):
    header, off = read_header(mwab_path)
    assert header["n_times"] == 10 and header["n_chans"] == 16
    assert len(header["pols"]) == 2 and off > len(b"MWAB1\n") + 8


def test_datasource_equals_fixture(spark, vis, mwab_path):
    register_mwa_source(spark)
    got = spark.read.format("mwa_vis").option("path", mwab_path).load()
    assert got.schema == vis.schema
    assert got.count() == vis.count()
    # exact content equality, both directions
    assert got.exceptAll(vis).isEmpty() and vis.exceptAll(got).isEmpty()


def test_partition_planning_blocks(mwab_path):
    r = MWABReader({"path": mwab_path, "time_block": 4})
    assert len(r.partitions()) == 3  # 10 times / block 4 → 4+4+2


def test_pushdown_prunes_partitions(mwab_path):
    r = MWABReader({"path": mwab_path, "time_block": 4})
    rest = r.pushFilters(
        [GreaterThanOrEqual(("time_idx",), 8), EqualTo(("pol",), "XX")]
    )
    assert [type(f) for f in rest] == [EqualTo]  # pol filter not handled
    assert len(r.partitions()) == 1  # times 8-9 only


def test_pushdown_filtered_read_is_correct(spark, vis, mwab_path):
    register_mwa_source(spark)
    got = (
        spark.read.format("mwa_vis").option("path", mwab_path).load()
        .where((F.col("time_idx") >= 3) & (F.col("time_idx") < 7))
        .where(F.col("chan") == 5)
    )
    want = vis.where((F.col("time_idx") >= 3) & (F.col("time_idx") < 7)).where(
        F.col("chan") == 5
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).isEmpty()


def test_chan_bounds_reader_level(mwab_path):
    r = MWABReader({"path": mwab_path})
    r.pushFilters([EqualTo(("chan",), 5), LessThan(("time_idx",), 1)])
    rows = 0
    for part in r.partitions():
        for batch in r.read(part) or []:
            pdf = batch.to_pandas()
            assert set(pdf["chan"]) == {5}
            assert set(pdf["time_idx"]) == {0}
            rows += len(pdf)
    assert rows == 36 * 2  # 36 baselines x 2 pols


@pytest.fixture(scope="module")
def mwab_dist_dir(spark, vis, tmp_path_factory):
    from mwa_uvdata_pipeline_spark.mwab import long_to_mwab_distributed

    out = tmp_path_factory.mktemp("mwab_dist")
    manifest = long_to_mwab_distributed(vis, str(out), time_block=4).collect()
    assert sorted(r["blk"] for r in manifest) == [0, 1, 2]  # 10 times / 4
    return str(out)


def test_distributed_pack_equals_fixture(spark, vis, mwab_dist_dir):
    register_mwa_source(spark)
    got = (
        spark.read.format("mwa_vis")
        .option("path", f"{mwab_dist_dir}/*.mwab")
        .load()
    )
    assert got.schema == vis.schema
    assert got.count() == vis.count()
    assert got.exceptAll(vis).isEmpty() and vis.exceptAll(got).isEmpty()


def test_distributed_pack_headers_carry_time0(mwab_dist_dir):
    import glob

    paths = sorted(glob.glob(f"{mwab_dist_dir}/*.mwab"))
    offs = [read_header(p)[0].get("time0", 0) for p in paths]
    assert offs == [0, 4, 8]
    assert [read_header(p)[0]["n_times"] for p in paths] == [4, 4, 2]


def test_distributed_pushdown_prunes_across_files(mwab_dist_dir):
    # global time bound 8.. lands entirely in the third file's 2 steps
    r = MWABReader({"path": f"{mwab_dist_dir}/*.mwab", "time_block": 4})
    r.pushFilters([GreaterThanOrEqual(("time_idx",), 8)])
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].path.endswith("part-00002.mwab")
    got = {
        int(t)
        for part in parts
        for batch in r.read(part) or []
        for t in batch.to_pandas()["time_idx"].unique()
    }
    assert got == {8, 9}  # global indices survive the time0 shift


# ---------------------------------------------------------------- writer
# Commit-protocol regressions (round-7 ADVICE): the manifest is the read
# path's source of truth, orphans from failed attempts are invisible,
# append merges, overwrite defers deletion to commit().


@pytest.fixture(scope="module")
def mwab_sink_dir(spark, vis, tmp_path_factory):
    register_mwa_source(spark)
    out = tmp_path_factory.mktemp("mwab_sink") / "committed"
    (
        vis.repartition(4, "time_idx")
        .write.format("mwa_vis")
        .mode("overwrite")
        .save(str(out))
    )
    return str(out)


def _manifest(d):
    import json
    import os

    with open(os.path.join(d, "_MANIFEST.json")) as f:
        return json.load(f)


def test_writer_commit_manifest_and_no_temps(vis, mwab_sink_dir):
    import glob
    import os

    man = _manifest(mwab_sink_dir)
    assert man["n_rows"] == vis.count()
    # manifest entries are basenames, rejoined by the reader
    assert all(os.sep not in p for p in man["files"])
    assert sorted(
        os.path.basename(p)
        for p in glob.glob(f"{mwab_sink_dir}/part-*.mwab")
    ) == man["files"]
    assert not glob.glob(f"{mwab_sink_dir}/.*inprogress")


def test_reader_resolves_manifest_from_any_path_spelling(
    spark, vis, mwab_sink_dir
):
    """The same directory reached via a different spelling (here a
    relative path from the test cwd) must resolve the manifest's
    basenames against the READER's directory."""
    import os

    rel = os.path.relpath(mwab_sink_dir)
    got = (
        spark.read.format("mwa_vis")
        .option("path", f"{rel}/*.mwab")
        .load()
        .count()
    )
    assert got == vis.count()


def test_glob_fallback_refused_on_crashed_first_commit(tmp_path):
    """A directory with final-named parts, leftover .inprogress temps
    and NO manifest is a crashed first-ever commit: the glob fallback
    must refuse it rather than risk partial/duplicate visibility."""
    import pytest

    from mwa_uvdata_pipeline_spark.mwab import _committed_files

    (tmp_path / "part-aa-000000-t000000.mwab").write_bytes(b"x")
    (tmp_path / ".part-aa-000001-t000001.mwab.inprogress").write_bytes(b"x")
    with pytest.raises(ValueError, match="in-progress"):
        _committed_files(str(tmp_path / "*.mwab"))


def test_reader_ignores_orphan_files(spark, vis, mwab_sink_dir):
    """An uncommitted file (failed/retried task attempt, or stale
    generation) matching the glob must NOT be read back as a duplicate
    dense slab: the reader takes its listing from _MANIFEST.json."""
    import os
    import shutil

    man = _manifest(mwab_sink_dir)
    orphan = os.path.join(mwab_sink_dir, "part-deadbeef-000099-t000000.mwab")
    shutil.copy(os.path.join(mwab_sink_dir, man["files"][0]), orphan)
    try:
        got = (
            spark.read.format("mwa_vis")
            .option("path", f"{mwab_sink_dir}/*.mwab")
            .load()
            .count()
        )
        assert got == vis.count()
    finally:
        os.remove(orphan)


def test_append_merges_manifest(spark, vis, tmp_path_factory):
    register_mwa_source(spark)
    d = str(tmp_path_factory.mktemp("mwab_sink") / "app")
    w = vis.repartition(2, "time_idx").write.format("mwa_vis")
    w.mode("overwrite").save(d)
    one = _manifest(d)
    w.mode("append").save(d)
    two = _manifest(d)
    assert two["n_rows"] == 2 * one["n_rows"]
    assert set(one["files"]) < set(two["files"])
    got = (
        spark.read.format("mwa_vis").option("path", f"{d}/*.mwab").load().count()
    )
    assert got == 2 * vis.count()


def test_overwrite_retires_previous_generation(spark, vis, tmp_path_factory):
    import glob

    register_mwa_source(spark)
    d = str(tmp_path_factory.mktemp("mwab_sink") / "ow")
    w = vis.repartition(2, "time_idx").write.format("mwa_vis")
    w.mode("overwrite").save(d)
    old_files = set(_manifest(d)["files"])
    w.mode("overwrite").save(d)
    man = _manifest(d)
    import os

    ondisk = sorted(
        os.path.basename(p) for p in glob.glob(f"{d}/part-*.mwab")
    )
    assert ondisk == man["files"]  # old generation fully retired
    assert not old_files & set(man["files"])  # job token => fresh names
    got = (
        spark.read.format("mwa_vis").option("path", f"{d}/*.mwab").load().count()
    )
    assert got == vis.count()
