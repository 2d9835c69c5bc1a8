"""Structured Streaming semantics (SURVEY.md §2.12, FIXTURES.md §B5):
replayed file stream, watermark late-data drop, stateful dedup,
streaming-equals-batch for finalized windows."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.plans import load_events
from mwa_uvdata_pipeline_spark.streaming.events import (
    replay_events,
    run_to_memory,
    stream_dedup,
    stream_session_windows,
    stream_tumbling_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("events_replay")
    events = load_events(spark, SF_SMALL)
    replay_events(events, str(out), n_files=6)
    return str(out)


def test_replay_covers_all_events(spark, replay_dir):
    n_src = load_events(spark, SF_SMALL).count()
    n_replay = spark.read.parquet(f"{replay_dir}/part*").count()
    assert n_replay == n_src


def test_stream_tumbling_matches_batch(spark, replay_dir):
    run_to_memory(
        stream_tumbling_counts(spark, f"{replay_dir}/part*", watermark="10 minutes"),
        "tumbling_sink",
        output_mode="complete",
    )
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_sink").collect()
    }
    want = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            load_events(spark, SF_SMALL)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias("sum_value"),
            )
            .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
            .collect()
        )
    }
    assert got == want


def _ts(s: str):
    from datetime import datetime

    return datetime.fromisoformat(s)


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    # two files; the second replays an event_id from the first
    rows1 = [(1, _ts("2024-01-01 10:00:00"), 7, "click", 1.0, "{}"),
             (2, _ts("2024-01-01 10:01:00"), 7, "click", 1.0, "{}")]
    rows2 = [(2, _ts("2024-01-01 10:02:00"), 7, "click", 1.0, "{}"),  # dup id
             (3, _ts("2024-01-01 10:03:00"), 7, "click", 1.0, "{}")]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{tmp_path}/f0")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(f"{tmp_path}/f1")
    run_to_memory(
        stream_dedup(spark, f"{tmp_path}/f*"), "dedup_sink", output_mode="append"
    )
    ids = sorted(r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_sink").collect())
    assert ids == [1, 2, 3]


def test_watermark_drops_late_event(spark, tmp_path):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # Spark's late-row filter uses the PREVIOUS batch's watermark, so the
    # 10:00 window must be evicted a full batch before the late row lands:
    # f0 opens window 10:00; f1 pushes max event time to 11:30 (next-batch
    # wm 11:20); f2's batch runs with wm 11:20 → evicts/emits window 10:00
    # (n=1); f3's late 10:06 event then hits the filter (wm 11:20) → dropped.
    arrivals = [
        (1, "2024-01-01 10:05:00"),
        (2, "2024-01-01 11:30:00"),
        (4, "2024-01-01 11:31:00"),
        (3, "2024-01-01 10:06:00"),  # late: below watermark, window evicted
    ]
    for i, (eid, t) in enumerate(arrivals):
        spark.createDataFrame(
            [(eid, _ts(t), 1, "click", 1.0, "{}")], schema
        ).coalesce(1).write.parquet(f"{tmp_path}/f{i}")
    run_to_memory(
        stream_tumbling_counts(spark, f"{tmp_path}/f*", watermark="10 minutes"),
        "late_sink",
        output_mode="append",
    )
    rows = {
        r["win_start"].isoformat(): r["n"]
        for r in spark.sql("SELECT * FROM late_sink").collect()
    }
    # the 10:00 window emitted with n=1 — the late event never counted
    assert rows.get("2024-01-01T10:00:00") == 1


def test_stream_stateful_running_totals(spark, replay_dir):
    from mwa_uvdata_pipeline_spark.streaming.events import stream_user_running_totals

    run_to_memory(
        stream_user_running_totals(spark, f"{replay_dir}/part*"),
        "totals_sink",
        output_mode="update",
    )
    # update mode emits one row per (user, batch); the final state is the max
    got = {
        r["user_id"]: r["n"]
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n FROM totals_sink GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in load_events(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_pattern_vshapes_matches_batch(spark, replay_dir):
    """The stateful V-shape CEP operator's final per-key state must
    equal the batch LAG-window formulation key-for-key — proving the
    incremental fold across micro-batch boundaries replays the
    (ts, event_id) order exactly."""
    from mwa_uvdata_pipeline_spark.plans.events import ev_pattern_vshape
    from mwa_uvdata_pipeline_spark.streaming.events import (
        stream_pattern_vshapes,
    )

    run_to_memory(
        stream_pattern_vshapes(spark, f"{replay_dir}/part*"),
        "vshape_sink",
        output_mode="update",
    )
    got = {
        (r["user_id"], r["event_type"]): r["nv"]
        for r in spark.sql(
            "SELECT user_id, event_type, max_by(n_vshapes, n_seen) AS nv "
            "FROM vshape_sink GROUP BY user_id, event_type "
            "HAVING MAX(n_seen) >= 3"
        ).collect()
    }
    ev = load_events(spark, SF_SMALL)
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    want = {
        (r["user_id"], r["event_type"]): r["nv"]
        for r in ev.select(
            "user_id",
            "event_type",
            cents.alias("c"),
            F.lag(cents, 1).over(w).alias("p1"),
            F.lag(cents, 2).over(w).alias("p2"),
        )
        .where(F.col("p2").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(
            F.sum(
                F.when(
                    (F.col("p2") > F.col("p1"))
                    & (F.col("p1") < F.col("c")),
                    1,
                ).otherwise(0)
            ).alias("nv")
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_sessionize_runs(spark, replay_dir):
    run_to_memory(
        stream_session_windows(spark, f"{replay_dir}/part*"),
        "session_sink",
        output_mode="complete",
    )
    n = spark.sql("SELECT COUNT(*) AS n FROM session_sink").first()["n"]
    assert n > 0


def test_session_ttl_state_evicted(spark):
    """The TTL session operator must END with ~zero state: every real
    user's state row is removed once the watermark passes last-event +
    gap (the sentinels guarantee it does), leaving only the sentinel's
    own open session. This is the bounded-state claim of SCALE.md
    measured, not asserted from theory."""
    import tempfile

    from mwa_uvdata_pipeline_spark.plans import load_events
    from mwa_uvdata_pipeline_spark.streaming.events import (
        append_watermark_sentinels,
        replay_events,
        run_to_memory,
        stream_session_ttl,
    )

    ev = load_events(spark, SF_SMALL)
    out = tempfile.mkdtemp(prefix="ttl_replay_")
    replay_events(ev, out, n_files=4)
    append_watermark_sentinels(ev, out, advance_s=21600 + 7200)
    q = run_to_memory(
        stream_session_ttl(spark, f"{out}/part*"),
        "ttl_evict_sink",
        output_mode="update",
    )
    final_state = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_state <= 1  # only the sentinel's open session survives
    peak_state = max(
        p["stateOperators"][0]["numRowsTotal"] for p in q.recentProgress
    )
    n_users = ev.select("user_id").distinct().count()
    assert peak_state <= n_users + 1  # bounded by active keys, not events


def test_session_ttl_out_of_order_within_watermark(spark, tmp_path):
    """A late-but-admitted event must merge into the right tentative
    session instead of dragging the session end backwards (the round-4
    ADVICE finding): file 1 delivers t=0s and t=200s, file 2 delivers
    the STRAGGLER t=100s (still above the watermark, which is only
    max(200s) - 10min < 0 after file 1) together with a second session
    at t=2000s/2100s. Expected batch gap-sessionization (gap 600s):
    (0, 200, 3) and (2000, 2100, 2). The pre-fix arrival-split
    implementation emitted (0, 100, 3) — end moved backwards by the
    straggler. Two sentinel files flush the timers."""
    import datetime

    from mwa_uvdata_pipeline_spark.streaming.events import (
        EVENT_SCHEMA,
        _set_tree_mtime,
        run_to_memory,
        stream_session_ttl,
    )

    base = datetime.datetime(2024, 1, 1)

    def ev_row(eid, sec, user=1):
        return (eid, base + datetime.timedelta(seconds=sec), user, "e", 0.0, "{}")

    files = [
        [ev_row(1, 0), ev_row(2, 200)],
        [ev_row(3, 100), ev_row(4, 2000), ev_row(5, 2100)],  # straggler
        [ev_row(90, 10_000, user=-1)],  # sentinels advance the watermark
        [ev_row(91, 14_000, user=-1)],
    ]
    import time

    t0 = time.time()
    for i, rows in enumerate(files):
        p = str(tmp_path / f"part{i:03d}")
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(p)
        _set_tree_mtime(p, t0 + i)
    run_to_memory(
        stream_session_ttl(spark, f"{tmp_path}/part*", gap_s=600),
        "ttl_ooo_sink",
        output_mode="update",
    )
    got = {
        (r.session_start, r.session_end, r.n_events)
        for r in spark.sql(
            "SELECT * FROM ttl_ooo_sink WHERE user_id >= 0"
        ).collect()
    }
    want = {
        (base, base + datetime.timedelta(seconds=200), 3),
        (
            base + datetime.timedelta(seconds=2000),
            base + datetime.timedelta(seconds=2100),
            2,
        ),
    }
    assert got == want


def test_tws_totals_parity_when_protobuf_available(spark):
    """transformWithStateInPandas parity gate — SKIPPED in this
    container (no google.protobuf, which the TWS state server
    requires; see stream_tws_totals docstring). On a protobuf-enabled
    cluster this runs the Spark 4 arbitrary-stateful operator and
    checks the recovered final state against the batch GROUP BY."""
    pytest.importorskip("google.protobuf")
    import uuid

    from pyspark.sql import functions as F

    from mwa_uvdata_pipeline_spark.plans import table
    from mwa_uvdata_pipeline_spark.plans.events import _replay_fixture
    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_tws_totals,
    )

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = _replay_fixture(spark, SF_SMALL)
        sink = f"tws_{uuid.uuid4().hex[:6]}"
        run_to_memory(
            stream_tws_totals(spark, f"{out}/part*"), sink,
            output_mode="update",
        )
        got = {
            (r.user_id, r.n, r.sc)
            for r in spark.sql(
                f"SELECT user_id, MAX(n_events) AS n, "
                f"max_by(sum_cents, n_events) AS sc FROM {sink} "
                f"GROUP BY user_id"
            ).collect()
        }
        exp = {
            (r.user_id, r.n, r.sc)
            for r in table(spark, SF_SMALL, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("sc"),
            )
            .collect()
        }
        assert got == exp
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)


def test_stream_hll_registers_match_batch_any_order(spark, tmp_path):
    """The streaming HLL register table must equal the batch one even
    when the replay files arrive in a scrambled (non-time) order —
    the MAX merge algebra makes arrival order irrelevant."""
    import uuid

    from mwa_uvdata_pipeline_spark.plans import table
    from mwa_uvdata_pipeline_spark.streaming.events import (
        _HLL_RHO_CASE,
        _set_tree_mtime,
        run_to_memory,
        stream_hll_registers,
    )
    from tests.conftest import SF_SMALL

    ev = table(spark, SF_SMALL, "events")
    # scrambled replay: slice by user hash, not time, with inverted
    # mtimes so the file source reads "newest" data first
    import time

    base = time.time()
    for i in range(3):
        p = str(tmp_path / f"part{i:03d}")
        ev.where(F.col("user_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        _set_tree_mtime(p, base + (3 - i))
    sink = f"hllr_{uuid.uuid4().hex[:6]}"
    run_to_memory(
        stream_hll_registers(spark, f"{tmp_path}/part*"),
        sink,
        output_mode="complete",
    )
    got = {
        (r.bucket, r.rho) for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    exp = {
        (r.bucket, r.rho)
        for r in ev.select(hv.alias("hv"))
        .distinct()
        .select((F.col("hv") % 64).alias("bucket"), F.expr("hv div 64").alias("rem"))
        .selectExpr("bucket", f"{_HLL_RHO_CASE} AS rho")
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    assert got == exp
