"""Z-order layout locality (s_zorder_layout): a 2-D box predicate must
intersect only a minority of the z-ordered files' parquet min/max
envelopes, while a time-sorted layout — the natural ingest order —
intersects essentially every file on the user dimension (each
time-slice file contains all users, so its user_id [min, max] spans the
whole domain). File skipping is exactly "files whose envelope misses
the box are never opened", so envelope intersection counts ARE the
scan cost model."""

from __future__ import annotations

import datetime
import glob

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"
BOX_U = (10, 20)
BOX_T = (datetime.datetime(2024, 1, 10), datetime.datetime(2024, 1, 16))


def _envelopes(d: str) -> list[tuple]:
    """Per-file (user_min, user_max, ts_min, ts_max) from footers."""
    out = []
    for f in glob.glob(f"{d}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ui, ti = names.index("user_id"), names.index("ts")
        umin = umax = tmin = tmax = None
        for rg in range(md.num_row_groups):
            us = md.row_group(rg).column(ui).statistics
            ts = md.row_group(rg).column(ti).statistics
            umin = us.min if umin is None else min(umin, us.min)
            umax = us.max if umax is None else max(umax, us.max)
            tmin = ts.min if tmin is None else min(tmin, ts.min)
            tmax = ts.max if tmax is None else max(tmax, ts.max)
        out.append((umin, umax, tmin, tmax))
    return out


def _hits(envs: list[tuple]) -> int:
    n = 0
    for umin, umax, tmin, tmax in envs:
        if umax < BOX_U[0] or umin > BOX_U[1]:
            continue
        if tmax < BOX_T[0] or tmin > BOX_T[1]:
            continue
        n += 1
    return n


def test_zorder_file_skipping(spark, tmp_path):
    from mwa_uvdata_pipeline_spark import plans
    from mwa_uvdata_pipeline_spark.plans import load_all, load_events

    # run the registered plan once so the REAL fixture build executes,
    # then inspect the directory it produced
    assert load_all()["s_zorder_layout"].spark(spark, SF).count() > 0
    zdir = plans._FIXTURE_DIRS[("ev_zorder", SF)]
    z_envs = _envelopes(zdir)
    assert len(z_envs) >= 8  # range partitioner produced real files

    # baseline: the natural time-sorted ingest layout, same file count
    ev = load_events(spark, SF)
    bdir = str(tmp_path / "bytime")
    (
        ev.repartitionByRange(len(z_envs), "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(bdir)
    )
    t_envs = _envelopes(bdir)

    z_hits, t_hits = _hits(z_envs), _hits(t_envs)
    # time-sorted: every file in the 6-day window spans all users ->
    # its hit count equals its time overlap (~1/5 of files); z-order
    # must localize BOTH dims and beat it outright, touching a
    # minority of files
    assert z_hits < t_hits, (z_hits, t_hits)
    assert z_hits <= len(z_envs) // 2, (z_hits, len(z_envs))

    # and the z-layout loses no rows: same box count both ways
    import pyspark.sql.functions as F

    def box_count(path):
        return (
            spark.read.parquet(path)
            .where(F.col("user_id").between(*BOX_U))
            .where(
                (F.col("ts") >= F.lit("2024-01-10").cast("timestamp_ntz"))
                & (F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz"))
            )
            .count()
        )

    assert box_count(zdir) == box_count(bdir)
