"""Event-table plans: JSON scalars, time representations, and the
batch twins of the streaming windows (SURVEY.md §2.12 — tumbling /
sliding / session windows, stateful dedup).

The streaming module (``mwa_uvdata_pipeline_spark.streaming``) runs the
same logical aggregations with readStream + watermark; these batch
versions give the driver an exact DuckDB oracle for the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.functions.times import _GPS_EPOCH_UNIX, _LEAP_SECONDS
from mwa_uvdata_pipeline_spark.plans import epoch_us, register, table


def _replay_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Process-cached 4-slice replay of the events table (read-only).

    Every streaming exec entry used to write its own replay copy per
    plan construction and leak it in /tmp; the replay is a pure
    function of sf_dir, so it is built once per process via
    ``fixture_dir`` and shared (ADVICE r4 cleanup)."""
    from mwa_uvdata_pipeline_spark.plans import fixture_dir
    from mwa_uvdata_pipeline_spark.streaming.events import replay_events

    return fixture_dir(
        "ev_replay4",
        sf_dir,
        lambda d: replay_events(table(spark, sf_dir, "events"), d, n_files=4),
    )


def _gps_case_sql(unix_expr: str) -> str:
    """The same leap-second CASE chain :func:`gps_from_unix` compiles to,
    rendered as ANSI SQL for the DuckDB oracle."""
    clauses = "\n".join(
        f"WHEN {unix_expr} >= {b} THEN {t - 19}"
        for b, t in reversed(_LEAP_SECONDS)
    )
    return f"(CASE {clauses} ELSE 0 END)"


@register(
    "x_json_extract",
    sql="""
    SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    doc="JSON property extraction from events.props (SURVEY §2.7 JSON note); "
        "regex-based so Spark and DuckDB agree without the JSON extension.",
)
def x_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .select(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "x6_time_representations",
    sql=f"""
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS isot,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS unix_sec,
           CAST(FLOOR(epoch(ts)) AS BIGINT) / 86400.0 + 2440587.5 AS jd,
           CAST(FLOOR(epoch(ts)) AS BIGINT) - {_GPS_EPOCH_UNIX}
             + {_gps_case_sql("CAST(FLOOR(epoch(ts)) AS BIGINT)")} AS gps
    FROM events
    """,
    doc="X6 display_time: ISO-T / unix / JD / GPS representations "
        "(reference utils.py:191-193); GPS via the static leap-second "
        "table — identical CASE chain in both engines.",
)
def x6_time_representations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    unix = F.floor(epoch_us(ev) / F.lit(1_000_000.0)).cast("long")
    from mwa_uvdata_pipeline_spark.functions.times import _gps_offset_expr

    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("isot"),
        unix.alias("unix_sec"),
        (unix / F.lit(86400.0) + F.lit(2440587.5)).alias("jd"),
        (unix - F.lit(_GPS_EPOCH_UNIX) + _gps_offset_expr(unix).cast("long")).alias("gps"),
    )


@register(
    "ev_tumbling_window",
    sql="""
    SELECT date_trunc('hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events GROUP BY 1, 2
    """,
    bench=True,
    doc="Tumbling 1h window aggregate — batch twin of the streaming "
        "groupBy(window(ts, '1 hour')) (SURVEY §2.12).",
)
def ev_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


@register(
    "ev_sliding_window",
    sql="""
    WITH slid AS (
        SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
                    AS TIMESTAMP) AS win_start, value FROM events
        UNION ALL
        SELECT CAST(to_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) - 1) * 1800)
                    AS TIMESTAMP), value FROM events
    )
    SELECT win_start, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM slid GROUP BY win_start
    """,
    doc="Sliding 1h/30m window — each event lands in two windows; batch "
        "twin of window(ts, '1 hour', '30 minutes') (SURVEY §2.12).",
)
def ev_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


@register(
    "ev_sessionize",
    sql="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                    THEN 1 ELSE 0 END AS is_new,
               event_id
        FROM events),
    sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM marked)
    SELECT user_id, session_id, MIN(ts) AS session_start,
           MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Session windows (30 min gap) via gaps-and-islands — batch twin of "
        "session_window(ts, '30 minutes') (SURVEY §2.12).",
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = table(spark, sf_dir, "events")
    ev = raw.withColumn("ts_us", epoch_us(raw))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag("ts_us").over(w)
    is_new = F.when(
        prev_us.isNull() | ((F.col("ts_us") - prev_us) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "ev_dedup_keep_first",
    sql="""
    SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1
    """,
    doc="Stateful-dedup batch twin: keep earliest event per "
        "(user_id, event_type) — dropDuplicates semantics (SURVEY §2.12).",
)
def ev_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@register(
    "stream_tumbling_exec",
    sql="""
    SELECT date_trunc('hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming EXECUTED as a query: the events table is "
        "replayed as a file stream (maxFilesPerTrigger=1, AvailableNow), "
        "aggregated with the streaming tumbling-window operator in "
        "complete mode, and the drained memory sink must hash-match the "
        "BATCH DuckDB oracle — streaming-equals-batch as a correctness "
        "gate, not just a unit test (SURVEY §2.12).",
)
def stream_tumbling_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_tumbling_counts,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"st_sink_{uuid.uuid4().hex[:8]}"
    # state-store width = shuffle partitions at query start; keep it
    # narrow for the replay (restored after the stream drains)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_tumbling_counts(spark, f"{out}/part*"),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT win_start, event_type, n, sum_value FROM {sink}")


@register(
    "stream_session_exec",
    sql="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                    THEN 1 ELSE 0 END AS is_new,
               event_id
        FROM events),
    sessions AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM marked)
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Structured Streaming session windows EXECUTED as a query: the "
        "events table is replayed as a file stream, aggregated with the "
        "native session_window operator (30 min gap) in complete mode, "
        "and the drained memory sink must hash-match the batch "
        "gaps-and-islands oracle. Boundary semantics verified "
        "empirically: session_window merges events exactly gap apart "
        "(new session only when diff > gap), matching the oracle's "
        "strict `> 1800`; session_end = last ts + gap (SURVEY §2.12).",
)
def stream_session_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_session_windows,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"ss_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_session_windows(spark, f"{out}/part*"),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(
        f"SELECT session_start, session_end, user_id, n_events FROM {sink}"
    )


@register(
    "stream_sliding_exec",
    sql="""
    WITH slid AS (
        SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
                    AS TIMESTAMP) AS win_start, value FROM events
        UNION ALL
        SELECT CAST(to_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) - 1) * 1800)
                    AS TIMESTAMP), value FROM events
    )
    SELECT win_start, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM slid GROUP BY win_start
    """,
    doc="Sliding-window aggregation EXECUTED as a stream: the events "
        "table is replayed as a file stream and aggregated with the "
        "streaming window(ts, 1h, 30m) operator in complete mode; the "
        "drained memory sink must hash-match the batch DuckDB oracle "
        "(each event expanded into its two windows). Completes the "
        "executed-streaming parity family: tumbling, sliding, session, "
        "dedup (SURVEY §2.12).",
)
def stream_sliding_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_sliding_counts,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"sl_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_sliding_counts(spark, f"{out}/part*"),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT win_start, n, sum_value FROM {sink}")


@register(
    "stream_dedup_exec",
    sql="""
    SELECT event_id, ts, user_id, event_type, value FROM events
    """,
    doc="Stateful streaming dedup EXECUTED as a query: the events table "
        "is unioned with an exact copy of every 7th event (same ts, so "
        "whichever copy wins, the row values are identical and the "
        "result is deterministic), replayed as a file stream, and "
        "deduplicated with dropDuplicatesWithinWatermark on event_id. "
        "The appended memory sink must hash-match the original table — "
        "the injected duplicates all land within the 10-minute "
        "watermark horizon, so streaming state provably removes them. "
        "State is sharded by event_id and bounded by the watermark. "
        "Runs on the ROCKSDB state store provider (restored after the "
        "drain): at 100 TB dedup state must spill to local disk rather "
        "than live on the executor heap, so the oracle gate proves the "
        "spillable-store configuration end-to-end, not just the "
        "default HDFS-backed in-memory map (SURVEY §2.12).",
)
def stream_dedup_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.plans import fixture_dir
    from mwa_uvdata_pipeline_spark.streaming.events import (
        replay_events,
        run_to_memory,
        stream_dedup,
    )

    def _build(d: str) -> None:
        ev = table(spark, sf_dir, "events")
        dups = ev.where(F.col("event_id") % 7 == 0)
        replay_events(ev.unionByName(dups), d, n_files=4)

    out = fixture_dir("ev_replay_dups", sf_dir, _build)
    sink = f"sd_sink_{uuid.uuid4().hex[:8]}"
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_prov = spark.conf.get(prov_key, None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set(prov_key, rocksdb)
    try:
        run_to_memory(
            stream_dedup(spark, f"{out}/part*").select(
                "event_id", "ts", "user_id", "event_type", "value"
            ),
            sink,
            output_mode="append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev_prov)
    return spark.sql(
        f"SELECT event_id, ts, user_id, event_type, value FROM {sink}"
    )


@register(
    "stream_foreachbatch_exec",
    sql="""
    SELECT date_trunc('hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="foreachBatch incremental materialization EXECUTED as a query: "
        "the tumbling aggregate streams in update mode, each "
        "micro-batch appends its changed keys to a parquet log stamped "
        "with the batch id, and the read-side last-write-wins merge "
        "must hash-match the batch aggregate — the append-only upsert "
        "pattern for materializing continuous aggregates onto a plain "
        "data lake, proven equivalent to recomputation (SURVEY §2.12).",
)
def stream_foreachbatch_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import scratch_dir
    from mwa_uvdata_pipeline_spark.streaming.events import (
        latest_per_key,
        stream_tumbling_to_parquet,
    )

    src = _replay_fixture(spark, sf_dir)
    sink = scratch_dir("ev_matview_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream_tumbling_to_parquet(spark, f"{src}/part*", f"{sink}/log")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return latest_per_key(spark, f"{sink}/log")


@register(
    "stream_stateful_exec",
    sql="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState) EXECUTED as "
        "a query: per-user running totals stream in update mode, and "
        "the final state — the last update per user, recovered via "
        "max_by keyed on the strictly-increasing per-user update "
        "sequence n_events — must hash-match the batch GROUP BY. "
        "Works because the state accumulates exact integer cents: an "
        "exact accumulator makes the fixpoint independent of "
        "micro-batch boundaries, which is what makes arbitrary "
        "stateful logic oracle-checkable (SURVEY §2.12).",
)
def stream_stateful_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_user_running_totals,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"ss_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_user_running_totals(spark, f"{out}/part*"),
            sink,
            output_mode="update",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # last-write-per-key: n_events is the per-user update sequence
    # (strictly increasing — every emitted update has seen >= 1 more
    # event), so max_by keys the latest state without assuming
    # sum_cents itself is monotone (it isn't if values can be negative)
    return spark.sql(
        f"SELECT user_id, MAX(n_events) AS n_events, "
        f"max_by(sum_cents, n_events) AS sum_cents "
        f"FROM {sink} GROUP BY user_id"
    )


@register(
    "stream_file_sink_exec",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events GROUP BY event_type
    """,
    doc="File-source → file-sink ingest EXECUTED end-to-end: the "
        "events replay streams through a checkpointed append-mode "
        "parquet sink (each micro-batch commits its own small files), "
        "the fragmented landing zone is rewritten by "
        "sinks.compact_parquet into right-sized files, and the "
        "aggregate over the COMPACTED copy must hash-match the batch "
        "oracle over the original table — proving no rows were lost or "
        "duplicated across the stream-commit + compaction seam, the "
        "continuous-ingest loop every 100-TB lake runs (SURVEY §2.12; "
        "the compaction rationale is sinks.py's small-files note).",
)
def stream_file_sink_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import scratch_dir
    from mwa_uvdata_pipeline_spark.sinks import compact_parquet
    from mwa_uvdata_pipeline_spark.streaming.events import (
        stream_append_to_parquet,
    )

    src = _replay_fixture(spark, sf_dir)
    work = scratch_dir("ev_landing_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream_append_to_parquet(
            spark, f"{src}/part*", f"{work}/raw", f"{work}/ckpt"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    stats = compact_parquet(spark, f"{work}/raw", f"{work}/compact", target_files=2)
    assert stats["files_before"] >= 4, stats  # one+ file per micro-batch
    assert stats["files_after"] <= 2, stats
    return (
        spark.read.parquet(f"{work}/compact")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


@register(
    "stream_restart_exec",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events GROUP BY event_type
    """,
    doc="Checkpoint RESTART recovery EXECUTED: the replay is drained in "
        "two separate streaming runs against the SAME checkpoint and "
        "sink — run 1 sees half the files, the query stops, more files "
        "land, run 2 resumes from the checkpoint's committed offsets "
        "and processes only the new files. The aggregate over the "
        "combined sink must hash-match the batch oracle: one row lost "
        "(offset over-commit) or doubled (replayed without the sink "
        "manifest filtering it) breaks the hash. This is the "
        "exactly-once-across-restart guarantee a long-running ingest "
        "job actually relies on, distinct from stream_file_sink_exec's "
        "single-run seam (SURVEY §2.12).",
)
def stream_restart_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from mwa_uvdata_pipeline_spark.plans import scratch_dir
    from mwa_uvdata_pipeline_spark.streaming.events import (
        stream_append_to_parquet,
    )

    src = _replay_fixture(spark, sf_dir)
    staged = scratch_dir("ev_staged_")
    work = scratch_dir("ev_restart_")
    paths = sorted(
        f"{src}/{d}" for d in os.listdir(src) if d.startswith("part")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for p in paths[:2]:  # first half lands, run 1 drains and stops
            shutil.copytree(p, f"{staged}/{p.rsplit('/', 1)[-1]}")
        stream_append_to_parquet(
            spark, f"{staged}/part*", f"{work}/out", f"{work}/ckpt"
        )
        for p in paths[2:]:  # more files land, run 2 resumes the ckpt
            shutil.copytree(p, f"{staged}/{p.rsplit('/', 1)[-1]}")
        stream_append_to_parquet(
            spark, f"{staged}/part*", f"{work}/out", f"{work}/ckpt"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(f"{work}/out")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


@register(
    "stream_interval_join_exec",
    sql="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts < v.ts + INTERVAL 10 MINUTE
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    doc="Stream-stream interval join EXECUTED as a query: views and "
        "purchases are read as two watermarked file streams and joined "
        "on user_id with a bounded event-time range (purchase within "
        "10 minutes after the view); the appended memory sink must "
        "hash-match the batch inequality join. State eviction is "
        "driven by the watermark passing the join horizon, so this "
        "also proves the watermark delay is sized correctly — an "
        "early-evicted buffered row would drop a pair and break the "
        "hash (SURVEY §2.12).",
)
def stream_interval_join_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_interval_join,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"sj_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_interval_join(spark, f"{out}/part*"),
            sink,
            output_mode="append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT view_id, purchase_id FROM {sink}")


@register(
    "ev_rate_anomaly",
    sql="""
    WITH h AS (SELECT date_trunc('hour', ts) AS hr, event_type,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    w AS (SELECT hr, event_type, n,
                 CAST(SUM(n) OVER trail AS BIGINT) AS sum24,
                 CAST(COUNT(*) OVER trail AS BIGINT) AS n24
          FROM h
          WINDOW trail AS (PARTITION BY event_type ORDER BY hr
                           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT hr, event_type, n,
           COALESCE(sum24, 0) AS sum24,
           (n24 = 24 AND n * 24 > 2 * sum24) AS is_anomaly
    FROM w
    """,
    doc="Trailing-rate anomaly detection — the monitoring staple over "
        "any event firehose: per (hour, type) counts compared against "
        "the trailing 24 observed hours, flagged when the current rate "
        "exceeds 2x the trailing mean. The comparison is the "
        "cross-multiplied INTEGER inequality n * 24 > 2 * sum24 — no "
        "float mean/stddev, so both engines flag identical rows (a "
        "naive-vs-Welford stddev would differ in ulps and flip "
        "boundary rows). One shuffle on the type key; the window runs "
        "over the bounded hour grid per type, and warm-up hours "
        "(fewer than 24 trailing) never flag.",
)
def ev_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    trail = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    return h.select(
        "hr",
        "event_type",
        "n",
        F.coalesce(F.sum("n").over(trail), F.lit(0)).alias("sum24"),
        (
            (F.count(F.lit(1)).over(trail) == 24)
            & (F.col("n") * 24 > 2 * F.sum("n").over(trail))
        ).alias("is_anomaly"),
    )


@register(
    "x_scd2_history",
    sql="""
    WITH ordered AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
               LAG(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    changes AS (
        SELECT user_id, event_type, event_id, us FROM ordered
        WHERE prev IS NULL OR event_type <> prev)
    SELECT user_id, event_type,
           us AS valid_from_us,
           LEAD(us) OVER w2 AS valid_to_us,
           LEAD(us) OVER w2 IS NULL AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)
    """,
    doc="SCD Type-2 history build — the dimension-versioning shape "
        "every warehouse maintains: the event stream is treated as a "
        "change log per user, consecutive duplicates collapse (LAG "
        "change detection), and each surviving change becomes a "
        "version row with [valid_from, valid_to) stitched by LEAD; "
        "the open interval is the current version. Both windows "
        "partition on the same user_id key, so the whole build is ONE "
        "shuffle (the second window reuses the partitioning and only "
        "re-sorts within partitions); ties at identical timestamps "
        "break on event_id so both engines stitch identical "
        "intervals. Epochs as integer microseconds via the NTZ-safe "
        "epoch_us.",
)
def x_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev).alias("us")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", "event_id", us,
        F.lag("event_type").over(w).alias("prev"),
    )
    changes = ordered.where(
        F.col("prev").isNull() | (F.col("event_type") != F.col("prev"))
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    nxt = F.lead("us").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.col("us").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "j9_salted_join",
    sql="""
    WITH c AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
               FROM events GROUP BY user_id)
    SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_date,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events JOIN c USING (user_id)
    GROUP BY c.cohort_date
    """,
    doc="Salted skew join oracle-gated against the plain equi-join: "
        "events join their user's cohort row with each user's rows "
        "spread over 8 salt sub-keys (salt = hash of the unique "
        "event_id, so a hot user occupies 8 reducers) and the cohort "
        "side replicated once per sub-key (operators/skew.py:salted_"
        "join). The per-cohort rollup on top is salt-invariant, so a "
        "green row proves the spread-and-replicate rewrite preserves "
        "join semantics end-to-end — the planned-skew complement of "
        "agg_salted.",
)
def j9_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events")
    cohort = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("cohort_date"))
    )
    joined = salted_join(
        ev, cohort, on="user_id", salt_col=F.xxhash64("event_id"), n_salt=8
    )
    return joined.groupBy(
        F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
    )


@register(
    "ev_markov_transitions",
    sql="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events),
    n AS (SELECT from_type, to_type, COUNT(*) AS n
          FROM seq WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE),
                 6) AS p
    FROM n
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences: LEAD pairs consecutive events within each user's "
        "timeline (unique event_id tiebreak), one hash aggregate "
        "counts transitions, and row-normalization is a window over "
        "the |types|^2-row count table — so the only corpus-sized "
        "shuffle is the user_id sequence window, shared shape with "
        "ev_sessionize/ev_funnel. The transition matrix is the "
        "session-model / next-event-prediction primitive.",
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    n = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_type")
    return n.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt).cast("double"), 6).alias("p"),
    )


@register(
    "agg_argmax",
    sql="""
    SELECT user_id, event_type AS top_type, value AS top_value,
           event_id AS top_event_id
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY value DESC, event_id DESC)
                        AS rn
          FROM events)
    WHERE rn = 1
    """,
    doc="Arg-max aggregation: each user's highest-value event (type, "
        "value, id) via max_by keyed on a (value, event_id) struct — "
        "the struct ordering makes ties deterministic, which is the "
        "difference between max_by being safe and being flaky at "
        "scale. One hash aggregate with map-side partials; the oracle "
        "states the same thing as a ranking window, so the green row "
        "also pins Spark's struct-ordering semantics against SQL "
        "DESC/DESC ordering.",
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    key = F.struct("value", "event_id")
    return (
        ev.groupBy("user_id")
        .agg(
            F.expr("max_by(event_type, struct(value, event_id))").alias(
                "top_type"
            ),
            F.max(key).alias("m"),
        )
        .select(
            "user_id",
            "top_type",
            F.col("m.value").alias("top_value"),
            F.col("m.event_id").alias("top_event_id"),
        )
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "agg_pivot",
    sql=f"""
    SELECT user_id,
           {", ".join(
               f"COUNT(*) FILTER (event_type = '{t}') AS n_{t}"
               for t in _PIVOT_TYPES
           )}
    FROM events GROUP BY user_id
    """,
    doc="Pivot: per-user event counts spread into one column per event "
        "type. The value list is EXPLICIT — at scale an unlisted pivot "
        "first runs a distinct-values job over the corpus and then "
        "risks a column per unique value; listing the domain makes the "
        "pivot a single hash aggregate with a fixed output schema "
        "(Catalyst compiles it to the same conditional-count form the "
        "oracle states). Missing cells are filled to 0 to match COUNT "
        "FILTER semantics.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    renamed = out.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in _PIVOT_TYPES]
    )
    return renamed


@register(
    "ev_funnel",
    sql="""
    WITH w0 AS (
        SELECT user_id, event_type, ts,
               MIN(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' AND ts >= t0
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM w0),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t1
                            AND ts < t1 + INTERVAL 86400 SECONDS
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t2
                            AND ts < t2 + INTERVAL 86400 SECONDS
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2),
    per_user AS (
        SELECT user_id, MAX(t0) AS t0, MAX(t1) AS t1,
               MAX(t2) AS t2, MAX(t3) AS t3
        FROM w3 GROUP BY user_id)
    SELECT stage, COUNT(*) AS n_users FROM (
        SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 4
                         WHEN t2 IS NOT NULL THEN 3
                         WHEN t1 IS NOT NULL THEN 2
                         WHEN t0 IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS stage
        FROM per_user)
    GROUP BY stage
    """,
    bench=True,
    doc="Ordered funnel analysis: signup → first view after signup → "
        "first click within a day of that view → first purchase "
        "within a day of that click, per user; output is users per "
        "furthest stage reached. "
        "The four chained 'earliest qualifying event' milestones are "
        "unordered window MINs over the same user_id partitioning, so "
        "Catalyst stacks all four Window operators behind ONE exchange "
        "— a single shuffle for the whole funnel, vs the 4-way "
        "self-join a naive formulation would pay. Per-user funnel "
        "state is O(1), the final stage histogram is 5 rows.",
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")

    def first_after(etype: str, lower, horizon_s: int | None = None):
        cond = F.col("event_type") == etype
        if lower is not None:
            cond = cond & (F.col("ts") >= F.col(lower))
        if horizon_s is not None:
            cond = cond & (
                F.col("ts") < F.col(lower) + F.expr(f"INTERVAL {horizon_s} SECONDS")
            )
        return F.min(F.when(cond, F.col("ts"))).over(w)

    staged = (
        ev.withColumn("t0", first_after("signup", None))
        .withColumn("t1", first_after("view", "t0"))
        .withColumn("t2", first_after("click", "t1", 86400))
        .withColumn("t3", first_after("purchase", "t2", 86400))
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t0").alias("t0"),
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 4)
        .when(F.col("t2").isNotNull(), 3)
        .when(F.col("t1").isNotNull(), 2)
        .when(F.col("t0").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
    )
    return (
        per_user.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "ev_retention",
    sql="""
    WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
               FROM events),
    c AS (SELECT user_id, MIN(d) AS cohort_date FROM a GROUP BY user_id)
    SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_date,
           CAST(date_diff('day', cohort_date, d) AS BIGINT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN c USING (user_id)
    GROUP BY c.cohort_date, day_offset
    """,
    doc="Cohort retention: users are cohorted by their first active "
        "date; output counts distinct active users per (cohort date, "
        "day offset). The (user, date) activity grid is deduplicated "
        "with one hash aggregate, the cohort map is a per-user MIN on "
        "the same user_id shuffle, and the rejoin is an equi-join on "
        "user_id that AQE broadcasts when the cohort map is small — "
        "at 100 TB the map is corpus-sized, and the join stays a "
        "shuffled hash join co-partitioned with the activity grid. "
        "Output cardinality is bounded by cohorts x horizon days, "
        "independent of event volume.",
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    return (
        active.join(cohort, "user_id")
        .groupBy(
            # dates stringify identically in both engines; raw DATE
            # round-trips as midnight TIMESTAMP through DuckDB's pandas
            # bridge and breaks the value compare
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort_date").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "agg_salted",
    sql="""
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
    doc="Two-stage salted aggregation (operators/skew.py) oracle-gated "
        "against the plain GROUP BY: rows are sharded over (user_id, "
        "salt) for the partial pass, then the <= n_salt partials per "
        "key merge in a negligible second shuffle. Proves partial+merge "
        "equivalence end-to-end for the algebraic aggregate family "
        "(count/sum/min/max) — the documented fix for hot-key "
        "aggregation skew where AQE's skew-join split does not apply "
        "(SCALE.md: skewed keys -> salting).",
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.operators.skew import salted_agg

    ev = table(spark, sf_dir, "events").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    return salted_agg(
        ev,
        keys=["user_id"],
        aggs={
            "n": ("count", None),
            "sum_cents": ("sum", "value_cents"),
            "first_ts": ("min", "ts"),
            "last_ts": ("max", "ts"),
        },
        n_salt=16,
    )


@register(
    "w6_range_frame",
    sql="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS sum_value_1h
    FROM events
    """,
    doc="RANGE-frame window: per-user running sum over the trailing "
        "hour of event time (value-based frame, not row count — W3's "
        "rowsBetween complement). Deterministic under duplicate "
        "timestamps because RANGE includes all frame peers. One shuffle "
        "on user_id; frame evaluation is a sorted single pass per "
        "partition, state bounded by the hour horizon.",
)
def w6_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us(ev))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w).cast("double")
            / 100.0
        ).alias("sum_value_1h"),
    )


@register(
    "ev_multi_rollup",
    sql="""
    WITH b AS (
        SELECT CAST(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)
                                 // 900 * 900) AS TIMESTAMP) AS b15,
               CAST(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)
                                 // 3600 * 3600) AS TIMESTAMP) AS b1h,
               CAST(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)
                                 // 86400 * 86400) AS TIMESTAMP) AS b1d,
               CAST(ROUND(value * 100) AS BIGINT) AS v_cents
        FROM events)
    SELECT CASE WHEN GROUPING(b15) = 0 THEN '15m'
                WHEN GROUPING(b1h) = 0 THEN '1h'
                ELSE '1d' END AS gran,
           COALESCE(b15, b1h, b1d) AS bucket_start,
           COUNT(*) AS n,
           CAST(CAST(SUM(v_cents) AS BIGINT) AS DOUBLE) / 100.0
               AS sum_value
    FROM b
    GROUP BY GROUPING SETS ((b15), (b1h), (b1d))
    """,
    doc="Hypertable-style multi-granularity rollup (continuous-"
        "aggregate shape): 15-minute, hourly, and daily buckets of the "
        "event stream in ONE pass — GROUPING SETS over three "
        "pre-computed bucket columns expands each row once and hash-"
        "aggregates behind a single shuffle, instead of three separate "
        "scans+shuffles. At 100 TB this is the materialization query "
        "for a cascaded rollup: coarser tiers could equally fold from "
        "the 15m tier (sum of sums), which the exact integer-cents "
        "accumulation makes lossless.",
)
def ev_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    secs = F.unix_timestamp("ts")
    b = ev.select(
        F.timestamp_seconds((secs / 900).cast("long") * 900).alias("b15"),
        F.timestamp_seconds((secs / 3600).cast("long") * 3600).alias("b1h"),
        F.timestamp_seconds((secs / 86400).cast("long") * 86400).alias("b1d"),
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    return (
        b.groupingSets([["b15"], ["b1h"], ["b1d"]], "b15", "b1h", "b1d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("v_cents").cast("double") / 100.0).alias("sum_value"),
            # grouping() must be evaluated inside the Aggregate node
            F.grouping("b15").alias("g15"),
            F.grouping("b1h").alias("g1h"),
        )
        .select(
            F.when(F.col("g15") == 0, "15m")
            .when(F.col("g1h") == 0, "1h")
            .otherwise("1d")
            .alias("gran"),
            F.coalesce("b15", "b1h", "b1d").alias("bucket_start"),
            "n",
            "sum_value",
        )
    )


_KMV_K = 8


@register(
    "agg_kmv_distinct",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM events),
    k8 AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K})
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(MAX(hv) AS BIGINT) AS kth_hash,
           ({_KMV_K} - 1) * 4294967296.0 / MAX(hv) AS est_distinct
    FROM k8
    """,
    doc="KMV (k-minimum-values) distinct-count sketch over "
        "events.user_id: hash every key (first 8 md5 hex chars as a "
        "32-bit value), keep the k smallest distinct hashes, estimate "
        "|D| = (k-1) / max_kept_normalized. Unlike HLL the sketch is "
        "exactly reproducible across engines (md5 is byte-stable), so "
        "the oracle matches bit-for-bit. The plan is "
        "sketch-shaped-at-scale: map-side hashing, per-partition "
        "partial top-k via the distinct + TakeOrdered, one tiny "
        "reduction — the k-row sketch is mergeable (union then "
        "re-take-k), the basis of distributed distinct estimation.",
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    kmin = (
        ev.select(hv.alias("hv")).distinct().orderBy("hv").limit(_KMV_K)
    )
    return kmin.agg(
        F.lit(_KMV_K).cast("long").alias("k"),
        F.max("hv").alias("kth_hash"),
        ((_KMV_K - 1) * F.lit(4294967296.0) / F.max("hv")).alias("est_distinct"),
    )


@register(
    "ev_gapfill_locf",
    sql="""
    WITH obs AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT grid.event_type,
           strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS hour,
           last_value(obs.c IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sum_cents,
           obs.c IS NOT NULL AS observed
    FROM grid LEFT JOIN obs
      ON grid.event_type = obs.event_type AND grid.h = obs.h
    """,
    doc="Hypertable-style gap fill + LOCF (last observation carried "
        "forward): each event-type series is regularized onto its own "
        "hourly grid between its first and last observation, missing "
        "hours inherit the most recent observed hourly total, and an "
        "`observed` flag marks synthesized rows. The grid is built "
        "per-series from a groupBy bounds aggregate + sequence/explode "
        "— no cross join, and grid cardinality is series x horizon "
        "hours, independent of event volume. The fill is one "
        "ignore-nulls running `last` window per series; at 100 TB the "
        "shuffle key is the series id, the natural hypertable "
        "partitioning, and each partition holds only the bounded grid, "
        "not the raw events (they were pre-aggregated on the same key "
        "by the obs rollup, whose partial aggregation is map-side).",
)
def ev_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    obs = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("c"))
    )
    grid = (
        obs.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.last("c", ignorenulls=True).over(w).alias("sum_cents"),
            F.col("c").isNotNull().alias("observed"),
        )
    )


@register(
    "stream_static_join_exec",
    sql="""
    SELECT CASE user_id % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver'
                ELSE 'bronze' END AS tier,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY 1, 2
    """,
    doc="Stream-static dimension join EXECUTED as a streaming query: "
        "the events replay (file source, maxFilesPerTrigger=1, "
        "AvailableNow) inner-joins a static user->tier dimension per "
        "micro-batch — the stateless enrichment pattern — then "
        "aggregates per (tier, event_type) in complete mode; the "
        "drained memory sink must hash-match the batch DuckDB oracle "
        "(which derives the tier inline, since the dim covers every "
        "user). Join state is ZERO (only the bounded 3x5-key aggregate "
        "holds state); at 100 TB the static side broadcasts per "
        "micro-batch, so dim refreshes land without restarting the "
        "stream.",
)
def stream_static_join_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_static_enriched_counts,
    )

    ev = table(spark, sf_dir, "events")
    dim = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.expr(
                "CASE user_id % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' "
                "ELSE 'bronze' END"
            ).alias("tier"),
        )
    )
    out = _replay_fixture(spark, sf_dir)
    sink = f"ssj_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_static_enriched_counts(spark, f"{out}/part*", dim),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(
        f"SELECT tier, event_type, n, sum_cents FROM {sink}"
    )


# chi-square cell contribution over exact integer marginals; written
# once, parsed by both engines (int64 -> double is deterministic and
# identical expression trees give bit-identical IEEE results)
_CHI_E = (
    "((CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)) / CAST(n AS DOUBLE))"
)
_CHI_CONTRIB = (
    f"(((CAST(o AS DOUBLE) - {_CHI_E}) * (CAST(o AS DOUBLE) - {_CHI_E})) "
    f"/ {_CHI_E})"
)


@register(
    "x_chisq",
    sql=f"""
    WITH cells AS (
        SELECT event_type,
               CASE user_id % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver'
                    ELSE 'bronze' END AS tier,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    marg AS (
        SELECT event_type, tier, o,
               CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT)
                   AS row_n,
               CAST(SUM(o) OVER (PARTITION BY tier) AS BIGINT) AS col_n,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM cells
    )
    SELECT event_type, tier, o, row_n, col_n,
           {_CHI_E} AS expected,
           {_CHI_CONTRIB} AS chi2_contrib
    FROM marg
    """,
    doc="Chi-square independence scan (event_type x user tier): "
        "observed counts, marginals, expected-under-independence, and "
        "per-cell chi-square contribution — the drift/bias detector a "
        "training-data pipeline runs across slices. One hash aggregate "
        "over the fact table reduces everything to the bounded "
        "|types| x |tiers| cell grid; marginals are windows OVER THAT "
        "GRID (15 rows — no second fact pass, no scalar-broadcast "
        "join), and the statistic derives from exact int64 counts "
        "through a double expression tree shared verbatim with the "
        "oracle.",
)
def x_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.expr(
                "CASE user_id % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' "
                "ELSE 'bronze' END"
            ).alias("tier"),
        )
        .groupBy("event_type", "tier")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    marg = cells.select(
        "event_type", "tier", "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_n"),
        F.sum("o").over(Window.partitionBy("tier")).alias("col_n"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    return marg.select(
        "event_type", "tier", "o", "row_n", "col_n",
        F.expr(_CHI_E).alias("expected"),
        F.expr(_CHI_CONTRIB).alias("chi2_contrib"),
    )


@register(
    "x_incremental_agg",
    sql="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
    doc="Incremental materialized-view maintenance: a standing per-user "
        "aggregate snapshot (events before 2024-01-20) is refreshed by "
        "MERGING the new partition's partial aggregates — union the two "
        "partial tables, re-aggregate with the same algebraic "
        "combiners (count->sum, sum->sum, min->min, max->max) — and "
        "must equal the full recompute, which is what the oracle "
        "states. The refresh touches O(|delta| + |affected keys|) "
        "rows, never the full history: the pattern that keeps a "
        "100-TB rollup current without nightly full scans, and the "
        "algebraic-mergeability guarantee is exactly what makes "
        "partial aggregation / AQE combine legal.",
)
def x_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    cut = "2024-01-20"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    snapshot = partial(ev.where(F.col("ts") < cut))
    delta = partial(ev.where(F.col("ts") >= cut))
    return (
        snapshot.union(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
    )


@register(
    "ev_trigrams",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type AS t1,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    doc="Behavioral trigram mining: count every length-3 event-type "
        "sequence per user stream (order by ts with event_id "
        "tiebreak) — the n-gram tier above ev_markov_transitions' "
        "first-order matrix, the next-event / funnel-discovery "
        "primitive. ONE shuffle on user_id serves both LEADs (same "
        "window frame), then the trigram rollup groups on a key "
        "bounded by |event types|^3 — map-side partials collapse it "
        "before the second (tiny) exchange.",
)
def ev_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.where(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "x_table_diff",
    sql="""
    WITH before AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events WHERE ts < TIMESTAMP '2024-01-20' GROUP BY user_id
    ),
    after AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY user_id
    )
    SELECT COALESCE(b.user_id, a.user_id) AS user_id,
           CASE WHEN b.user_id IS NULL THEN 'added'
                WHEN a.user_id IS NULL THEN 'removed'
                WHEN b.n = a.n AND b.sum_cents = a.sum_cents
                    THEN 'unchanged'
                ELSE 'changed' END AS status,
           b.n AS n_before, a.n AS n_after,
           b.sum_cents AS cents_before, a.sum_cents AS cents_after
    FROM before b FULL OUTER JOIN after a ON b.user_id = a.user_id
    """,
    doc="Table reconciliation (data diff): two snapshots of the "
        "per-user rollup — as of 2024-01-20 vs current — compared "
        "row-by-row with ONE full-outer join on the key, each row "
        "classified added / removed / changed / unchanged. The "
        "anti-entropy audit run after every CDC apply or backfill "
        "(complements x_cdc_apply, which mutates; this verifies). At "
        "100 TB both sides are pre-aggregated on the join key, so the "
        "diff shuffles rollups, not raw facts, and the join is "
        "co-partitioned with zero residual state.",
)
def x_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )

    b = rollup(ev.where(F.col("ts") < "2024-01-20")).alias("b")
    a = rollup(ev).alias("a")
    status = (
        F.when(F.col("b.user_id").isNull(), "added")
        .when(F.col("a.user_id").isNull(), "removed")
        .when(
            (F.col("b.n") == F.col("a.n"))
            & (F.col("b.sum_cents") == F.col("a.sum_cents")),
            "unchanged",
        )
        .otherwise("changed")
    )
    return b.join(a, F.col("b.user_id") == F.col("a.user_id"), "full_outer").select(
        F.coalesce(F.col("b.user_id"), F.col("a.user_id")).alias("user_id"),
        status.alias("status"),
        F.col("b.n").alias("n_before"),
        F.col("a.n").alias("n_after"),
        F.col("b.sum_cents").alias("cents_before"),
        F.col("a.sum_cents").alias("cents_after"),
    )


_CMS_LANES = 4
_CMS_WIDTH = 256
_CMS_T = 80  # heavy-hitter threshold (events per user)


@register(
    "agg_cms_heavy",
    sql=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id HAVING COUNT(*) >= {_CMS_T}
    """,
    doc="Count-min-sketch heavy hitters with exact verify: event "
        "counts fold into a FIXED 4x256 counter matrix (explode 4 "
        "hash lanes, one hash-agg on (lane, pos) — the mergeable "
        "frequency sketch, 1 KB regardless of key cardinality), "
        "candidate keys take the MIN estimate across their 4 lanes "
        "(CMS never underestimates, so candidates are a superset of "
        "the true heavy hitters), and an exact count pass runs ONLY "
        "over candidate keys (semi-join pruned) to drop collision "
        "inflation. The oracle is the plain HAVING — the sketch is "
        "transparent by the no-underestimate guarantee, same "
        "verify-after-prune contract as x_bloom_prune. At 100 TB the "
        "first pass moves 1 KB per partition and the exact pass only "
        "touches keys that might qualify.",
)
def agg_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    lanes = F.array(*[
        F.struct(
            F.lit(i).alias("lane"),
            F.pmod(F.xxhash64(F.col("user_id"), F.lit(i)), F.lit(_CMS_WIDTH))
            .alias("pos"),
        )
        for i in range(_CMS_LANES)
    ])
    cms = (
        ev.select(F.explode(lanes).alias("lp"))
        .groupBy(F.col("lp.lane").alias("lane"), F.col("lp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    users = ev.select("user_id").distinct()
    probes = users.select(
        "user_id", F.explode(lanes).alias("lp")
    ).select("user_id", F.col("lp.lane").alias("lane"), F.col("lp.pos").alias("pos"))
    est = (
        probes.join(cms, ["lane", "pos"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est"))
    )
    candidates = est.where(F.col("est") >= _CMS_T).select("user_id")
    return (
        ev.join(candidates, "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= _CMS_T)
    )


@register(
    "stream_session_ttl_exec",
    sql="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 21600
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new,
               event_id
        FROM events),
    sess AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS sid
        FROM marked),
    agg AS (
        SELECT user_id, sid, MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid)
    SELECT user_id, session_start, session_end, n_events FROM agg
    """,
    doc="Custom session windows with TTL state eviction, EXECUTED "
        "(streaming/events.py stream_session_ttl): "
        "applyInPandasWithState + EventTimeTimeout — a user's state "
        "row is REMOVED once the watermark passes last-event + 6h, so "
        "total state is bounded by the gap-horizon's active users, "
        "never by every key seen (the unbounded-key-universe fix "
        "SCALE.md prescribes over NoTimeout). State holds TENTATIVE "
        "sessions merged on gap-adjacency and emits a session only "
        "when the watermark passes its end + gap, so emission equals "
        "batch gap-sessionization under arbitrary within-watermark "
        "disorder (not just time-ordered replay); two "
        "sentinel far-future events appended to the replay "
        "(append_watermark_sentinels) push the final watermark past "
        "every real key's last-event + TTL, so ALL real sessions flush "
        "deterministically before the drain. Oracle: the full batch "
        "6h-gap gaps-and-islands sessionization — exact parity, no "
        "trailing-session carve-out.",
)
def stream_session_ttl_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.plans import fixture_dir
    from mwa_uvdata_pipeline_spark.streaming.events import (
        append_watermark_sentinels,
        replay_events,
        run_to_memory,
        stream_session_ttl,
    )

    def _build(d: str) -> None:
        ev = table(spark, sf_dir, "events")
        replay_events(ev, d, n_files=4)
        # 6h TTL + 10 min watermark delay + slack: the sentinels'
        # watermark must clear every real key's (last event + gap)
        append_watermark_sentinels(ev, d, advance_s=21600 + 7200)

    out = fixture_dir("ev_replay_sttl", sf_dir, _build)
    sink = f"sttl_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_session_ttl(spark, f"{out}/part*"),
            sink,
            output_mode="update",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(
        f"SELECT user_id, session_start, session_end, n_events "
        f"FROM {sink} WHERE user_id >= 0"  # sentinel user never emits,
        # but keep the guard explicit
    )


@register(
    "ev_rollup_cascade",
    sql="""
    SELECT CAST(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)
                             // 86400 * 86400) AS TIMESTAMP) AS b1d,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events GROUP BY 1, 2
    """,
    doc="Continuous-aggregate CASCADE: the daily rollup is computed "
        "from the HOURLY rollup, which is computed from the 15-MINUTE "
        "rollup, which is computed from raw events — never re-reading "
        "raw data above the finest tier — and must equal the oracle's "
        "direct day-from-raw aggregate. This is the maintenance path "
        "of a hypertable continuous aggregate at 100 TB (each tier "
        "refreshes from the tier below, cost ∝ finer-tier rows, not "
        "raw events), legal because count/sum-of-cents are algebraic "
        "and the bucket lattice is aligned (900 | 3600 | 86400). Each "
        "re-aggregation groups ~24-96x fewer rows than its input; "
        "only the first tier shuffles event-scale data.",
)
def ev_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    base = ev.select(
        (us - (us % F.lit(900 * 1_000_000))).alias("b15_us"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    m15 = base.groupBy("b15_us", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_cents").alias("sum_cents"),
    )
    h1 = (
        m15.withColumn(
            "b1h_us", F.col("b15_us") - (F.col("b15_us") % F.lit(3600 * 1_000_000))
        )
        .groupBy("b1h_us", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )
    d1 = (
        h1.withColumn(
            "b1d_us", F.col("b1h_us") - (F.col("b1h_us") % F.lit(86400 * 1_000_000))
        )
        .groupBy("b1d_us", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )
    return d1.select(
        F.timestamp_micros(F.col("b1d_us")).alias("b1d"),
        "event_type", "n", "sum_cents",
    )


@register(
    "x_identity_stitch",
    sql="""
    WITH RECURSIVE pairs AS (
        -- users sharing a device: device nodes offset into their own
        -- id space so the bipartite graph has disjoint node ranges
        SELECT DISTINCT user_id AS u,
               CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                   + 1000000 AS v
        FROM events
        WHERE CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) < 20
    ),
    edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
    reach(u, r) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
    ),
    canon AS (SELECT u, MIN(r) AS cid FROM reach GROUP BY u)
    SELECT u AS user_id, cid AS identity_id
    FROM canon WHERE u < 1000000
    """,
    doc="Identity stitching (entity resolution): users observed on the "
        "same device (events.props k < 20, standing in for a device/"
        "cookie id) merge into one identity via connected components "
        "over the user↔device bipartite graph — the cross-device "
        "user-stitching every analytics/training pipeline runs before "
        "per-identity dedup or attribution. Device nodes are offset "
        "into a disjoint id range; the components operator "
        "(operators/graph.py min-label propagation) does the closure "
        "in O(diameter) join+agg rounds, and the bipartite diameter "
        "is short by construction. The oracle states reachability as "
        "a recursive CTE, same contract as dedup_clusters.",
)
def x_identity_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.operators.graph import connected_components

    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    pairs = (
        ev.select(
            F.col("user_id").alias("doc_a"),
            (k + 1_000_000).alias("doc_b"),
        )
        .where(F.col("doc_b") - 1_000_000 < 20)
        .distinct()
    )
    comp = connected_components(pairs)
    return (
        comp.where(F.col("node") < 1_000_000)
        .select(
            F.col("node").alias("user_id"),
            F.col("component").alias("identity_id"),
        )
    )


@register(
    "ev_attribution",
    sql="""
    WITH stream AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    windowed AS (
        SELECT user_id, event_type, cents,
               LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_type,
               epoch_us(ts) - LAST_VALUE(CASE WHEN event_type IN
                                              ('view', 'click')
                                              THEN epoch_us(ts)
                                         END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_age_us
        FROM stream
    )
    SELECT COALESCE(CASE WHEN touch_age_us <= 3600000000
                         THEN touch_type END, '(direct)') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM windowed
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="Last-touch attribution: every purchase credits the most "
        "recent view/click by the same user within a 1h lookback, "
        "else '(direct)'. ONE user_id window pass computes the "
        "last-marketing-touch type AND its age for every event "
        "(ignore-nulls LAST_VALUE over the preceding frame — no "
        "purchases×touches join, no as-of join state), then the "
        "purchase rows fold into a channel rollup bounded by |touch "
        "types|. The shuffle key is user_id — the same partitioning "
        "every other per-user operator here reuses; at 100 TB this "
        "is one exchange regardless of touch volume, where the naive "
        "purchases⋈touches range join is quadratic in active users' "
        "event density.",
)
def ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    stream = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        us.alias("ts_us"),
    )
    attributed = (
        stream.withColumn(
            "touch_type",
            F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w),
        )
        .withColumn(
            "touch_age_us",
            F.col("ts_us")
            - F.last(F.when(is_touch, F.col("ts_us")), ignorenulls=True).over(w),
        )
        .where(F.col("event_type") == "purchase")
    )
    channel = F.coalesce(
        F.when(F.col("touch_age_us") <= 3_600_000_000, F.col("touch_type")),
        F.lit("(direct)"),
    )
    return attributed.groupBy(channel.alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").alias("rev_cents"),
    )


# two-proportion z arithmetic over exact integer counts; one string,
# both engines (same determinism argument as _CHI_*)
_AB = {c: f"CAST({c} AS DOUBLE)" for c in ("n1", "c1", "n2", "c2")}
_AB_P1 = f"({_AB['c1']} / {_AB['n1']})"
_AB_P2 = f"({_AB['c2']} / {_AB['n2']})"
_AB_P = f"(({_AB['c1']} + {_AB['c2']}) / ({_AB['n1']} + {_AB['n2']}))"
_AB_Z = (
    f"(({_AB_P1} - {_AB_P2}) / sqrt({_AB_P} * (1.0 - {_AB_P}) "
    f"* (1.0 / {_AB['n1']} + 1.0 / {_AB['n2']})))"
)


@register(
    "ev_ab_test",
    sql=f"""
    WITH u AS (
        SELECT user_id,
               CASE user_id % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver'
                    ELSE 'bronze' END AS tier,
               MAX(CASE WHEN event_type = 'purchase' AND value > 90
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n1,
               CAST(SUM(converted) AS BIGINT) AS c1
        FROM u GROUP BY tier
    ),
    m AS (
        SELECT tier, n1, c1,
               CAST(SUM(n1) OVER () - n1 AS BIGINT) AS n2,
               CAST(SUM(c1) OVER () - c1 AS BIGINT) AS c2
        FROM t
    )
    SELECT tier, n1 AS n_users, c1 AS n_converted,
           {_AB_P1} AS conv_rate,
           {_AB_Z} AS z_vs_rest
    FROM m
    """,
    doc="A/B conversion test: per-tier user conversion (a purchase over 90 — a predicate rare enough that the pooled rate is not 1, which would zero the variance) "
        "with a two-proportion z-score of each tier against the pooled "
        "rest — the experiment-readout primitive. One user-level "
        "hash-agg collapses events to (user, converted), one tiny agg "
        "to tier counts, complements as windows over the 3-row grid "
        "(no second fact pass), and the statistic derives from exact "
        "int64 counts through a double expression tree shared verbatim "
        "with the oracle — a floating-point significance test that is "
        "exactly oracle-checkable, same discipline as ml_linreg and "
        "x_chisq.",
)
def ev_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.expr(
                "CASE user_id % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' "
                "ELSE 'bronze' END"
            ).alias("tier"),
            "converted",
        )
    )
    t = u.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("converted").cast("long").alias("c1"),
    )
    w = Window.partitionBy()
    m = t.select(
        "tier", "n1", "c1",
        (F.sum("n1").over(w) - F.col("n1")).cast("long").alias("n2"),
        (F.sum("c1").over(w) - F.col("c1")).cast("long").alias("c2"),
    )
    return m.select(
        "tier",
        F.col("n1").alias("n_users"),
        F.col("c1").alias("n_converted"),
        F.expr(_AB_P1).alias("conv_rate"),
        F.expr(_AB_Z).alias("z_vs_rest"),
    )


@register(
    "x_pandas_udaf",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                    * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_sq_cents
    FROM events GROUP BY 1
    """,
    doc="Custom aggregate via a GROUPED_AGG pandas UDF — the "
        "user-defined-aggregate tier of the UDF surface (SURVEY "
        "§2.11), distinct from mapInPandas (row transform) and "
        "applyInPandasWithState (stateful stream): the UDF receives "
        "each group's column as an Arrow-backed pandas Series and "
        "returns one scalar. The aggregate is an EXACT integer sum of "
        "squared cents, so the result is accumulation-order-free and "
        "oracle-checkable — the same discipline that makes every "
        "float aggregate here gateable. Note the scale caveat in the "
        "plan: a grouped-agg pandas UDF is all-to-one per group (no "
        "partial aggregation), so it is the right tool for genuinely "
        "non-algebraic aggregates only — anything decomposable should "
        "stay a built-in (this entry exists to prove the API, and the "
        "group count here is bounded at |event types|).",
)
def x_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # this Spark build does not resolve the (pd.Series) -> float type
    # hint for grouped aggregates — declare GROUPED_AGG explicitly.
    # The int64 sum returns through a double, exact because
    # sum(cents^2) < 2^53 per group at any realistic group size here
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def sum_sq(cents):
        v = cents.astype("int64")
        return float((v * v).sum())

    # grouped-agg pandas UDFs cannot mix with built-in aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the count rides
    # through a second UDF
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def cnt(cents):
        return float(len(cents))

    ev = table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    return ev.groupBy("event_type").agg(
        cnt("cents").cast("long").alias("n"),
        sum_sq("cents").cast("long").alias("sum_sq_cents"),
    )


@register(
    "x_arrow_batch",
    sql="""
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * 2 + 1) AS BIGINT)
               AS adj_cents
    FROM events GROUP BY 1
    """,
    doc="mapInArrow transform — the zero-copy tier of the UDF surface "
        "(SURVEY §2.11): batches arrive as pyarrow RecordBatches and "
        "are transformed with Arrow compute kernels (multiply/add on "
        "the int64 cents column), never materializing pandas objects — "
        "the cheapest Python hook Spark offers when the work is "
        "columnar arithmetic on Arrow arrays. The transform is exact "
        "integer (2x+1 per cent value), so the downstream aggregate "
        "hash-matches the oracle; memory per task is one Arrow batch "
        "regardless of partition size.",
)
def x_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    def double_plus_one(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            adj = pc.add(pc.multiply(batch.column(1), 2), 1)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), adj], ["event_type", "adj_cents"]
            )

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    out = ev.mapInArrow(double_plus_one, "event_type string, adj_cents long")
    return out.groupBy("event_type").agg(
        F.sum("adj_cents").alias("adj_cents")
    )


@register(
    "x_skew_diagnose",
    sql="""
    WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY user_id),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                      CAST(COUNT(*) AS BIGINT) AS n_keys FROM c)
    SELECT c.user_id, c.n,
           CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm,
           CAST(c.n * t.n_keys * 100 // t.total AS BIGINT)
               AS x_avg_pct,
           t.total, t.n_keys
    FROM c, t
    ORDER BY c.n DESC, c.user_id
    LIMIT 10
    """,
    doc="Key-skew diagnostics — the profiling pass you run BEFORE "
        "choosing a join/agg strategy at 100 TB: per-key frequency of "
        "the shuffle key (user_id), top-10 heavy hitters with exact "
        "integer share (ppm of all rows) and multiple-of-average "
        "(x_avg_pct = 100 means a perfectly uniform key). A hitter at "
        "x_avg_pct >> 100 is the signal to salt (j9_salted_join), "
        "broadcast, or isolate that key. Shape: one partial-combine "
        "hash agg (the count), a single-row global agg broadcast back "
        "via crossJoin, and a TakeOrderedAndProject for the top-10 — "
        "the diagnostic itself is skew-proof because counting "
        "collapses the hot key map-side.",
)
def x_skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "n",
            F.expr("n * 1000000 div total").alias("share_ppm"),
            F.expr("n * n_keys * 100 div total").alias("x_avg_pct"),
            "total",
            "n_keys",
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@register(
    "ev_cohort_ltv",
    sql="""
    WITH c AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
               FROM events GROUP BY user_id),
    p AS (SELECT user_id, CAST(ts AS DATE) AS d,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
    g AS (SELECT strftime(c.cohort_date, '%Y-%m-%d') AS cohort_date,
                 CAST(date_diff('day', c.cohort_date, p.d) AS BIGINT)
                     AS day_offset,
                 CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_buyers,
                 CAST(SUM(p.cents) AS BIGINT) AS revenue_cents
          FROM p JOIN c USING (user_id)
          GROUP BY c.cohort_date, day_offset)
    SELECT cohort_date, day_offset, n_buyers, revenue_cents,
           CAST(SUM(revenue_cents) OVER (
               PARTITION BY cohort_date ORDER BY day_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_revenue_cents
    FROM g
    """,
    doc="Cohort lifetime value: users cohorted by first-active date "
        "(the ev_retention convention), purchase revenue aggregated "
        "per (cohort, day offset) in exact cents, plus the running "
        "cumulative LTV curve per cohort. Shape: one user_id shuffle "
        "builds the cohort map, the purchase leg joins it "
        "co-partitioned, ONE hash agg produces the cohort x offset "
        "grid, and the cumulative window runs on that grid — bounded "
        "by cohorts x horizon days, independent of event volume, so "
        "the within-cohort ordered window never sees raw events.",
)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = (
        p.join(c, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort_date").cast("long").alias("day_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_buyers"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_date")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(w).cast("long")
    )


def _kmv_pergroup(h, k: int):
    """Per-group bottom-k of a distinct (event_type, hv) hash table,
    built in TWO levels so no window ever ranks a group's full distinct
    set: the k smallest of a group are necessarily the k smallest of
    their own hash shard, so per-(group, hv mod 64) bottom-k runs 64-way
    parallel and the second rank sees <= 64*k pooled rows per group.
    Result identical to a direct per-group rank (hv is distinct within
    a group), but the frame a single task sorts is bounded by
    max(shard population, 64*k), not the group's cardinality."""
    w1 = Window.partitionBy("event_type", "shard").orderBy("hv")
    w2 = Window.partitionBy("event_type").orderBy("hv")
    return (
        h.withColumn("shard", F.col("hv") % 64)
        .withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= k)
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select("event_type", "hv")
    )



@register(
    "agg_kmv_merge",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM events),
    g AS (SELECT event_type, hv,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY hv) AS rn
          FROM h),
    sk AS (SELECT event_type, hv FROM g WHERE rn <= {_KMV_K}),
    m2 AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
           FROM (SELECT DISTINCT hv FROM sk)),
    msk AS (SELECT hv FROM m2 WHERE rn <= {_KMV_K})
    SELECT event_type AS scope,
           CAST({_KMV_K} AS BIGINT) AS k,
           CAST(MAX(hv) AS BIGINT) AS kth_hash,
           ({_KMV_K} - 1) * 4294967296.0 / MAX(hv) AS est_distinct
    FROM sk GROUP BY event_type
    UNION ALL
    SELECT '(merged)', CAST({_KMV_K} AS BIGINT), CAST(MAX(hv) AS BIGINT),
           ({_KMV_K} - 1) * 4294967296.0 / MAX(hv)
    FROM msk
    """,
    doc="KMV sketch MERGE — the property that makes a sketch "
        "distributed: per-event_type k-minimum-value sketches (k "
        "smallest distinct 32-bit md5 hashes of user_id), then a "
        "merged global estimate built ONLY from the per-group "
        "sketches (union the k-row sketches, re-take the k smallest). "
        "Because every global k-min hash is necessarily inside its "
        "own group's k-mins, the merged sketch equals the sketch of "
        "the union — the exact algebra a 1000-executor rollup relies "
        "on (partials per shard, tiny merge at the top). All windows "
        "run on sketch-sized frames: per-group rank on the distinct "
        "hash table, global rank on <= n_groups x k = 24 rows.",
)
def agg_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    # two-level bottom-k: no task ever sorts a group's full hash set
    sk = _kmv_pergroup(h, _KMV_K).persist()
    per_group = sk.groupBy(F.col("event_type").alias("scope")).agg(
        F.lit(_KMV_K).cast("long").alias("k"),
        F.max("hv").alias("kth_hash"),
        ((_KMV_K - 1) * F.lit(4294967296.0) / F.max("hv"))
            .alias("est_distinct"),
    )
    wm = Window.orderBy("hv")  # frame <= n_groups * k rows (sketches)
    merged = (
        sk.select("hv")
        .distinct()
        .withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") <= _KMV_K)
        .agg(
            F.lit("(merged)").alias("scope"),
            F.lit(_KMV_K).cast("long").alias("k"),
            F.max("hv").alias("kth_hash"),
            ((_KMV_K - 1) * F.lit(4294967296.0) / F.max("hv"))
                .alias("est_distinct"),
        )
        .select("scope", "k", "kth_hash", "est_distinct")
    )
    return per_group.unionAll(merged)


@register(
    "stream_state_read_exec",
    sql="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    w AS (SELECT date_trunc('hour', ts) AS ws, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_cents
          FROM events GROUP BY 1, 2)
    SELECT strftime(w.ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
           n, sum_cents
    FROM w, mx
    WHERE w.ws + INTERVAL 1 HOUR > mx.m - INTERVAL 10 MINUTE
    """,
    doc="State-store INTROSPECTION (Spark 4 statestore reader): run "
        "the tumbling-window stream to completion against a real "
        "checkpoint, then read the checkpoint's state store back as a "
        "DataFrame and verify its residual contents against the batch "
        "oracle. After the final no-data batch the watermark sits at "
        "max(ts) - 10 minutes and append mode has emitted AND EVICTED "
        "every window whose end <= watermark — so the surviving state "
        "rows must be exactly the per-(window, event_type) partial "
        "aggregates (count + cents sum, the pre-projection buffer) of "
        "windows still open past the watermark. This gates the "
        "EVICTION semantics themselves, not just the emitted output: "
        "leaked state rows (the 100-TB unbounded-state failure mode) "
        "or wrongly-dropped open windows both fail the compare. The "
        "reader is also the production debugging tool for inspecting "
        "a live job's state without stopping it.",
)
def stream_state_read_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.plans import scratch_dir
    from mwa_uvdata_pipeline_spark.streaming.events import (
        _await_drained,
        stream_tumbling_counts,
    )

    out = _replay_fixture(spark, sf_dir)
    ckpt = scratch_dir("ckpt_ssr_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_tumbling_counts(spark, f"{out}/part*")
            .writeStream.format("memory")
            .queryName(f"ssr_sink_{uuid.uuid4().hex[:8]}")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drained(q, 120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    st = spark.read.format("statestore").load(ckpt)
    return st.select(
        F.date_format("key.window.start", "yyyy-MM-dd HH:mm:ss")
            .alias("win_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
        F.col("value.sum").alias("sum_cents"),
    )


# ---------------------------------------------------------------- round 7
# Third sketch family (HLL registers), mergeable histogram/quantile
# sketch, and a watermark-delay audit — each designed around the merge
# algebra or bounded-frame property a 1000-executor rollup needs.

_HLL_M = 64  # 6-bit bucket index; registers per sketch

# rho = 1 + leading-zero count of the remaining 26 hash bits; identical
# CASE text evaluated by BOTH engines, so there is no float log2 to
# disagree on. rem >= 2^25 -> top bit set -> rho 1; rem = 0 -> rho 27.
_HLL_RHO_CASE = (
    "CASE "
    + " ".join(
        f"WHEN rem >= {1 << k} THEN {26 - k}" for k in range(25, -1, -1)
    )
    + " ELSE 27 END"
)


@register(
    "ev_hll_merge",
    bench=True,
    sql=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM events),
    b AS (SELECT event_type, hv % {_HLL_M} AS bucket,
                 hv // {_HLL_M} AS rem FROM h),
    reg AS (SELECT event_type, bucket,
                   MAX({_HLL_RHO_CASE}) AS rho
            FROM b GROUP BY event_type, bucket),
    per AS (SELECT event_type AS scope,
                   CAST(COUNT(*) AS BIGINT) AS n_present,
                   CAST(SUM(CAST(2 AS BIGINT) ** (27 - rho)) AS BIGINT)
                       AS s_present
            FROM reg GROUP BY event_type),
    mreg AS (SELECT bucket, MAX(rho) AS rho FROM reg GROUP BY bucket),
    mrg AS (SELECT '(merged)' AS scope,
                   CAST(COUNT(*) AS BIGINT) AS n_present,
                   CAST(SUM(CAST(2 AS BIGINT) ** (27 - rho)) AS BIGINT)
                       AS s_present
            FROM mreg),
    u AS (SELECT * FROM per UNION ALL SELECT * FROM mrg)
    SELECT scope, CAST({_HLL_M} AS BIGINT) AS m, n_present,
           s_present + ({_HLL_M} - n_present) * 134217728 AS s_scaled,
           0.709 * 4096.0 * 134217728.0 /
               (s_present + ({_HLL_M} - n_present) * 134217728)
               AS est_distinct,
           ROUND(CASE WHEN n_present < {_HLL_M}
                 THEN {_HLL_M} * ln({_HLL_M} /
                          CAST({_HLL_M} - n_present AS DOUBLE))
                 ELSE 0.709 * 4096.0 * 134217728.0 /
                      (s_present + ({_HLL_M} - n_present) * 134217728)
                 END, 6) AS est_corrected
    FROM u
    """,
    doc="HyperLogLog register sketch with its EXACT merge algebra — "
        "the third sketch family after KMV (distinct) and CMS (heavy "
        "hitters), and the one real engines ship for COUNT(DISTINCT): "
        "bucket = hash mod 64, rho = 1 + leading-zero count of the "
        "remaining 26 bits (a generated 27-arm integer CASE shared "
        "verbatim with the oracle — no float log2 to disagree on), "
        "register = MAX(rho) per bucket. MAX is associative and "
        "commutative, so per-event_type register tables merge to the "
        "global sketch by element-wise max — bit-identical to "
        "sketching the union, the property a 1000-executor rollup "
        "needs (64-long registers per shard, tiny merge at the top). "
        "The harmonic-mean denominator sum(2^-rho) is kept in exact "
        "integer form S/2^27 (S = sum 2^(27-rho), absent registers "
        "contribute 2^27); the small-range regime applies the "
        "standard linear-counting correction m*ln(m/V) when empty "
        "registers remain. est_distinct is one deterministic "
        "double division, not an order-dependent float sum. Shape: "
        "one hash-distinct, one (type,bucket) hash agg with map-side "
        "partials, then aggs over register-table frames (<= "
        "n_types x 64 rows).",
)
def ev_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    b = (
        ev.select("event_type", hv.alias("hv"))
        .distinct()
        .select(
            "event_type",
            (F.col("hv") % _HLL_M).alias("bucket"),
            F.expr(f"hv div {_HLL_M}").alias("rem"),
        )
    )
    reg = (
        b.withColumn("rho", F.expr(_HLL_RHO_CASE))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
        .persist()  # two consumers: per-scope sketches + the merge
    )
    pow_term = F.expr("shiftleft(CAST(1 AS BIGINT), 27 - rho)")
    per = reg.groupBy(F.col("event_type").alias("scope")).agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(pow_term).cast("long").alias("s_present"),
    )
    mrg = (
        reg.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .agg(
            F.lit("(merged)").alias("scope"),
            F.count(F.lit(1)).cast("long").alias("n_present"),
            F.sum(pow_term).cast("long").alias("s_present"),
        )
    )
    u = per.unionByName(mrg)
    s_scaled = F.col("s_present") + (_HLL_M - F.col("n_present")) * F.lit(
        134217728
    )
    raw = F.lit(0.709) * F.lit(4096.0) * F.lit(134217728.0) / s_scaled
    # standard small-range (linear counting) correction: with empty
    # registers present, m * ln(m / V) is the right estimator for
    # n << m; rounded to 6 dp so both engines' ln agree post-round
    lc = F.lit(_HLL_M) * F.log(
        F.lit(_HLL_M) / (_HLL_M - F.col("n_present")).cast("double")
    )
    return u.select(
        "scope",
        F.lit(_HLL_M).cast("long").alias("m"),
        "n_present",
        s_scaled.alias("s_scaled"),
        raw.alias("est_distinct"),
        F.round(
            F.when(F.col("n_present") < _HLL_M, lc).otherwise(raw), 6
        ).alias("est_corrected"),
    )


_HB_W = 8  # histogram bin width over value
_HB_N = 16  # bins; domain clamped to [0, 128)


@register(
    "agg_hist_merge",
    sql=f"""
    WITH b AS (
        SELECT event_type,
               LEAST(GREATEST(CAST(FLOOR(value / {_HB_W}) AS BIGINT), 0),
                     {_HB_N - 1}) AS bin
        FROM events),
    hist AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
             FROM b GROUP BY event_type, bin),
    merged AS (SELECT '(merged)' AS scope, bin, SUM(c) AS c
               FROM hist GROUP BY bin),
    allh AS (SELECT event_type AS scope, bin, c FROM hist
             UNION ALL SELECT scope, bin, c FROM merged),
    cum AS (SELECT scope, bin, c,
                   SUM(c) OVER (PARTITION BY scope ORDER BY bin
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cumc,
                   SUM(c) OVER (PARTITION BY scope) AS total
            FROM allh),
    med AS (SELECT scope, MIN(bin) AS mbin FROM cum
            WHERE cumc >= total / 2.0 GROUP BY scope)
    SELECT cum.scope,
           CAST(MAX(cum.total) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_bins_present,
           CAST(MAX(med.mbin) AS BIGINT) AS median_bin,
           MAX(CASE WHEN cum.bin = med.mbin THEN
               med.mbin * {_HB_W} + {_HB_W} *
               (cum.total / 2.0 - (cum.cumc - cum.c)) / cum.c
           END) AS est_median
    FROM cum JOIN med ON cum.scope = med.scope
    GROUP BY cum.scope
    """,
    doc="Mergeable equi-width histogram sketch — the quantile-sketch "
        "algebra alongside KMV/HLL (distinct) and CMS (frequency): "
        "per-event_type 16-bin histograms over value (bin counts are "
        "plain sums, so shard histograms merge to the global one by "
        "vector addition — the '(merged)' scope is built ONLY from "
        "the per-scope sketch rows, never re-reading the data), and "
        "the median estimated by linear interpolation inside the "
        "first bin whose cumulative count crosses total/2. Every "
        "window runs on a sketch-sized frame (<= 16 rows per scope); "
        "the only full-data pass is one (type,bin) hash agg with "
        "map-side partials. Integer-exact until the single "
        "interpolation division.",
)
def agg_hist_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / _HB_W).cast("long"), F.lit(0)),
        F.lit(_HB_N - 1),
    )
    hist = (
        ev.select("event_type", bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()  # consumers: per-scope rows + the vector-sum merge
    )
    merged = (
        hist.groupBy("bin")
        .agg(F.sum("c").alias("c"))
        .select(F.lit("(merged)").alias("scope"), "bin", "c")
    )
    allh = hist.select(
        F.col("event_type").alias("scope"), "bin", "c"
    ).unionByName(merged)
    wcum = (
        Window.partitionBy("scope")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("scope")
    cum = allh.select(
        "scope",
        "bin",
        "c",
        F.sum("c").over(wcum).alias("cumc"),
        F.sum("c").over(wtot).alias("total"),
    )
    med = (
        cum.where(F.col("cumc") >= F.col("total") / 2.0)
        .groupBy("scope")
        .agg(F.min("bin").alias("mbin"))
    )
    interp = F.when(
        F.col("bin") == F.col("mbin"),
        F.col("mbin") * _HB_W
        + _HB_W
        * (F.col("total") / 2.0 - (F.col("cumc") - F.col("c")))
        / F.col("c"),
    )
    return (
        cum.join(med, "scope")
        .groupBy("scope")
        .agg(
            F.max("total").cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_bins_present"),
            F.max("mbin").cast("long").alias("median_bin"),
            F.max(interp).alias("est_median"),
        )
    )


_LATE_BATCH = 1000  # arrival micro-batch size (events per trigger)


@register(
    "ev_lateness_audit",
    sql=f"""
    WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us,
                      event_id // {_LATE_BATCH} AS b
               FROM events),
    bt AS (SELECT b, MAX(us) AS bmax FROM e GROUP BY b),
    wm AS (SELECT b,
                  MAX(bmax) OVER (ORDER BY b
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS wm_prior
           FROM bt)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN e.us < wm.wm_prior - 60000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_60s,
           CAST(SUM(CASE WHEN e.us < wm.wm_prior - 300000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_300s,
           CAST(MAX(GREATEST(COALESCE(wm.wm_prior - e.us, 0), 0))
                AS BIGINT) AS max_lateness_us
    FROM e JOIN wm ON e.b = wm.b
    GROUP BY e.event_type
    """,
    doc="Watermark-delay audit — the batch analysis that picks "
        "withWatermark() for the streaming family: arrival order "
        "(event_id) is cut into trigger-sized micro-batches, the "
        "high-water mark entering each batch is the running max "
        "event-time over PRIOR batches (exactly Spark's "
        "per-trigger watermark update), and each candidate delay's "
        "drop count is how many events a watermark of that delay "
        "would have discarded. The only ordered window runs on the "
        "BATCH table — one row per trigger, not per event (the "
        "production frame is #triggers, thousands, regardless of "
        "corpus size); events join back on the batch key as an "
        "ordinary equi-join with map-side partial aggregation on "
        "top. Lateness stays in integer microseconds throughout.",
)
def ev_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = table(spark, sf_dir, "events")
    e = raw.select(
        "event_id",
        "event_type",
        epoch_us(raw).alias("us"),
        F.expr(f"event_id div {_LATE_BATCH}").alias("b"),
    )
    bt = e.groupBy("b").agg(F.max("us").alias("bmax"))
    wprior = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )  # frame = one row per trigger, bounded by trigger count
    wm = bt.select("b", F.max("bmax").over(wprior).alias("wm_prior"))
    late = F.greatest(
        F.coalesce(F.col("wm_prior") - F.col("us"), F.lit(0)), F.lit(0)
    )
    return (
        e.join(wm, "b")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.coalesce(
                    (F.col("us") < F.col("wm_prior") - 60_000_000)
                    .cast("int"),
                    F.lit(0),
                )
            ).cast("long").alias("n_drop_60s"),
            F.sum(
                F.coalesce(
                    (F.col("us") < F.col("wm_prior") - 300_000_000)
                    .cast("int"),
                    F.lit(0),
                )
            ).cast("long").alias("n_drop_300s"),
            F.max(late).cast("long").alias("max_lateness_us"),
        )
    )


@register(
    "agg_bitmap_distinct",
    sql="""
    WITH b AS (
        SELECT DISTINCT event_type,
               user_id // 32 AS word, user_id % 32 AS bit
        FROM events),
    m AS (SELECT event_type, word,
                 CAST(bit_or(CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                      AS BIGINT) AS mask
          FROM b GROUP BY event_type, word),
    per AS (SELECT event_type AS scope,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct
            FROM m GROUP BY event_type),
    gm AS (SELECT word, CAST(bit_or(mask) AS BIGINT) AS mask
           FROM m GROUP BY word),
    mrg AS (SELECT '(merged)' AS scope,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct
            FROM gm)
    SELECT * FROM per UNION ALL SELECT * FROM mrg
    """,
    doc="Bitmap-index distinct counting with its OR-merge algebra — "
        "the EXACT counterpart to the HLL estimate, and the layout "
        "roaring-bitmap engines (Druid, ClickHouse, Pinot) use for "
        "COUNT(DISTINCT) and segment intersection: user ids are "
        "packed as (word = id div 32, bit = id mod 32), each "
        "(event_type, word) group bit_or-aggregates its 32-bit "
        "chunk mask, and the distinct count is the popcount sum over "
        "words. bit_or is associative/commutative, so per-shard masks "
        "merge to the global bitmap by word-wise OR — the '(merged)' "
        "scope is built ONLY from the per-scope mask table, and "
        "equals the direct global count exactly (no estimate). "
        "Shape: one hash-distinct, one (type,word) bit_or agg with "
        "map-side partials, then aggs over the mask table — whose "
        "size is distinct-ids/32 rows, the compression that makes "
        "bitmap rollups cheap at 100 TB.",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.expr("user_id div 32").alias("word"),
        (F.col("user_id") % 32).cast("int").alias("bit"),
    ).distinct()
    m = b.groupBy("event_type", "word").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask")
    ).persist()  # two consumers: per-scope counts + the OR-merge
    per = m.groupBy(F.col("event_type").alias("scope")).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.bit_count("mask")).cast("long").alias("n_distinct"),
    )
    mrg = (
        m.groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
        .agg(
            F.lit("(merged)").alias("scope"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.bit_count("mask")).cast("long").alias("n_distinct"),
        )
    )
    return per.unionByName(mrg)


@register(
    "agg_kmv_intersect",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM events WHERE event_type IN ('click', 'purchase')),
    g AS (SELECT event_type, hv,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY hv) AS rn
          FROM h),
    sk AS (SELECT event_type, hv FROM g WHERE rn <= {_KMV_K}),
    th AS (SELECT MIN(kth) AS theta FROM (
               SELECT event_type, MAX(hv) AS kth FROM sk
               GROUP BY event_type)),
    common AS (SELECT a.hv FROM sk a JOIN sk b ON a.hv = b.hv, th
               WHERE a.event_type = 'click'
                 AND b.event_type = 'purchase'
                 AND a.hv < th.theta)
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(MAX(th.theta) AS BIGINT) AS theta,
           CAST(COUNT(common.hv) AS BIGINT) AS n_common,
           COUNT(common.hv) * 4294967296.0 / MAX(th.theta)
               AS est_intersection
    FROM th LEFT JOIN common ON TRUE
    """,
    doc="Theta-sketch set INTERSECTION — the estimate KMV/theta "
        "sketches exist for beyond plain distinct counts (Apache "
        "DataSketches' core use: audience overlap without touching "
        "raw ids): sketch the 'click' and 'purchase' user sets with "
        "k-minimum-values, set theta to the smaller sketch's kth "
        "hash, and count common hashes below theta; the overlap "
        "estimate is n_common / (theta / 2^32). Everything after the "
        "two k-row sketches is sketch-sized — the candidate join is "
        "k x k at most, and the only full-data pass is the initial "
        "hash-distinct. Integer-exact up to the single estimating "
        "division, so the oracle gate is exact-value.",
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    # two-level bottom-k: no task ever sorts a group's full hash set
    sk = _kmv_pergroup(h, _KMV_K).persist()
    th = sk.groupBy("event_type").agg(F.max("hv").alias("kth")).agg(
        F.min("kth").alias("theta")
    )
    a = sk.where(F.col("event_type") == "click").select("hv")
    b = sk.where(F.col("event_type") == "purchase").select("hv")
    common = (
        a.join(b, "hv")  # k x k sketch join at most
        .crossJoin(F.broadcast(th))
        .where(F.col("hv") < F.col("theta"))
        .select("hv")
    )
    n_common = common.agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    return (
        th.crossJoin(F.broadcast(n_common))
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("theta").cast("long").alias("theta"),
            "n_common",
            (
                F.col("n_common") * F.lit(4294967296.0) / F.col("theta")
            ).alias("est_intersection"),
        )
    )


@register(
    "stream_hll_exec",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM events),
    b AS (SELECT hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS rem FROM h)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(MAX({_HLL_RHO_CASE}) AS INTEGER) AS rho
    FROM b GROUP BY bucket
    """,
    doc="Streaming HLL register build EXECUTED as a query: the events "
        "replay is consumed one file per trigger and each trigger "
        "folds its batch into the 64-register MAX state; the "
        "complete-mode memory sink after the drain must equal the "
        "batch-computed register table BIT-FOR-BIT (register MAX is "
        "monotone/commutative — the reason sketches are the right "
        "streaming aggregation state: 64 longs regardless of volume, "
        "no watermark needed, arrival order provably irrelevant). "
        "This is the streaming half of ev_hll_merge's rollup story: "
        "shards in space (executors) and shards in time (triggers) "
        "merge through the same algebra.",
)
def stream_hll_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_hll_registers,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"hll_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_hll_registers(spark, f"{out}/part*"),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(
        f"SELECT CAST(bucket AS BIGINT) AS bucket, "
        f"CAST(rho AS INT) AS rho FROM {sink}"
    )


@register(
    "stream_quantile_sketch_exec",
    sql="""
    WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    h AS (SELECT cents // 100 AS bin, CAST(COUNT(*) AS BIGINT) AS c
          FROM v GROUP BY 1),
    cum AS (SELECT bin, c,
                   CAST(SUM(c) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cumc
            FROM h),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    tq AS (SELECT q, (q * n.n + 99) // 100 AS k, n.n
           FROM (SELECT UNNEST([50, 90, 99]) AS q), n)
    SELECT CAST(tq.q AS BIGINT) AS q, tq.n,
           CAST(tq.k AS BIGINT) AS k_target,
           CAST(LEAST(cum.bin * 100
                      + ((tq.k - (cum.cumc - cum.c)) * 100) // cum.c,
                      cum.bin * 100 + 99) AS BIGINT) AS est_cents
    FROM tq JOIN cum
      ON cum.cumc >= tq.k AND cum.cumc - cum.c < tq.k
    """,
    doc="Streaming quantile sketch EXECUTED as a query — the streaming "
        "complement of agg_quantile_sketch_error the way "
        "stream_minhash_exec complements dedup_incremental: the events "
        "replay is consumed one file per trigger and each trigger "
        "folds its batch into a fixed-width (one-dollar) cents "
        "histogram in complete mode — COUNT per bin is commutative/"
        "associative, so state is the occupied-bin table (value-domain "
        "bounded, never rows) and arrival order is provably "
        "irrelevant. After the drain, p50/p90/p99 are read off the "
        "final sink table by the same capped within-bin interpolation, "
        "and the gate demands they equal the batch-computed estimates "
        "EXACTLY (the oracle restates histogram + interpolation from "
        "the raw table). Fixed ABSOLUTE width (vs the batch audit's "
        "range-adaptive bins) is the deliberate streamable trade: no "
        "two-pass min/max, and the grid stays mergeable across "
        "restarts and days. The post-drain derivation touches <= "
        "occupied-bins rows; at 100 TB the stream's shuffle carries "
        "bin partials only.",
)
def stream_quantile_sketch_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_value_histogram,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"qsk_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_value_histogram(spark, f"{out}/part*"),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # post-drain: derive the quantile estimates from the final sketch
    # state (<= occupied bins rows) with the shared capped
    # interpolation — identical arithmetic to the oracle's
    return spark.sql(
        f"""
        WITH cum AS (SELECT bin, c,
                            CAST(SUM(c) OVER (ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cumc
                     FROM {sink}),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM {sink}),
        tq AS (SELECT q, CAST((q * n.n + 99) div 100 AS BIGINT) AS k,
                      n.n
               FROM (SELECT explode(array(50, 90, 99)) AS q), n)
        SELECT CAST(tq.q AS BIGINT) AS q, tq.n,
               CAST(tq.k AS BIGINT) AS k_target,
               CAST(LEAST(cum.bin * 100
                          + ((tq.k - (cum.cumc - cum.c)) * 100)
                            div cum.c,
                          cum.bin * 100 + 99) AS BIGINT) AS est_cents
        FROM tq JOIN cum
          ON cum.cumc >= tq.k AND cum.cumc - cum.c < tq.k
        """
    )


@register(
    "stream_quantile_drift_exec",
    sql="""
    WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    h AS (SELECT cents // 100 AS bin, CAST(COUNT(*) AS BIGINT) AS c
          FROM v GROUP BY 1),
    cum AS (SELECT bin, c,
                   CAST(SUM(c) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cumc
            FROM h),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    tq AS (SELECT q, (q * n.n + 99) // 100 AS k, n.n
           FROM (SELECT UNNEST([50, 90, 99]) AS q), n),
    tgt AS (SELECT tq.q, tq.k, tq.n, cum.c,
                   LEAST(cum.bin * 100
                         + ((tq.k - (cum.cumc - cum.c)) * 100) // cum.c,
                         cum.bin * 100 + 99) AS est
            FROM tq JOIN cum
              ON cum.cumc >= tq.k AND cum.cumc - cum.c < tq.k),
    piv AS (SELECT MAX(CASE WHEN q = 50 THEN est END) AS e50,
                   MAX(CASE WHEN q = 90 THEN est END) AS e90,
                   MAX(CASE WHEN q = 99 THEN est END) AS e99
            FROM tgt),
    rk AS (SELECT CAST(SUM(CASE WHEN cents <= e50 THEN 1 ELSE 0 END)
                       AS BIGINT) AS r50,
                  CAST(SUM(CASE WHEN cents <= e90 THEN 1 ELSE 0 END)
                       AS BIGINT) AS r90,
                  CAST(SUM(CASE WHEN cents <= e99 THEN 1 ELSE 0 END)
                       AS BIGINT) AS r99
           FROM v, piv)
    SELECT CAST(t.q AS BIGINT) AS q, CAST(t.n AS BIGINT) AS n,
           CAST(t.k AS BIGINT) AS k_target,
           CAST(t.est AS BIGINT) AS est_cents,
           CAST(CASE t.q WHEN 50 THEN rk.r50 WHEN 90 THEN rk.r90
                ELSE rk.r99 END AS BIGINT) AS actual_rank,
           CAST((CASE t.q WHEN 50 THEN rk.r50 WHEN 90 THEN rk.r90
                 ELSE rk.r99 END) - t.k AS BIGINT) AS rank_err,
           CAST(t.c AS BIGINT) AS bin_pop
    FROM tgt t, rk
    """,
    doc="Streaming quantile DRIFT audit (r9 verdict #7) — closes the "
        "error-bound gap between the two existing gates: "
        "agg_quantile_sketch_error bounds the BATCH sketch's rank "
        "error, and stream_quantile_sketch_exec proves the STREAMING "
        "sketch's state contract, but nothing tied the streaming "
        "estimates to an error envelope. Here the events replay is "
        "drained through the executed complete-mode histogram stream "
        "(one file per trigger, state = occupied one-dollar bins), "
        "p50/p90/p99 are interpolated off the FINAL STREAM STATE, and "
        "then ONE exact batch counting pass measures each streaming "
        "estimate's true rank — emitting the same signed rank_err "
        "next to bin_pop as the batch audit, so the streaming sketch "
        "inherits the provable |rank_err| <= bin_pop envelope (the "
        "estimate and its target rank share a bin by construction; "
        "pinned in tests/test_round10.py). The oracle restates "
        "histogram, interpolation, and rank audit from the raw "
        "table, so a drift anywhere in the streaming fold breaks "
        "exact-value equality. Scale: the stream shuffles bin "
        "partials only; the audit adds one map-side-combined "
        "conditional-count pass against a broadcast 1-row estimate "
        "frame — no sort, no corpus-sized window.",
)
def stream_quantile_drift_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_value_histogram,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"qdr_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_value_histogram(spark, f"{out}/part*"),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # estimates read off the final STREAM state (<= occupied bins)
    est = spark.sql(
        f"""
        WITH cum AS (SELECT bin, c,
                            CAST(SUM(c) OVER (ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cumc
                     FROM {sink}),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM {sink}),
        tq AS (SELECT q, CAST((q * n.n + 99) div 100 AS BIGINT) AS k,
                      n.n
               FROM (SELECT explode(array(50, 90, 99)) AS q), n)
        SELECT CAST(tq.q AS BIGINT) AS q, tq.n,
               CAST(tq.k AS BIGINT) AS k_target,
               CAST(LEAST(cum.bin * 100
                          + ((tq.k - (cum.cumc - cum.c)) * 100)
                            div cum.c,
                          cum.bin * 100 + 99) AS BIGINT) AS est_cents,
               CAST(cum.c AS BIGINT) AS bin_pop
        FROM tq JOIN cum
          ON cum.cumc >= tq.k AND cum.cumc - cum.c < tq.k
        """
    )
    # exact audit: one batch counting pass against the raw table
    v = table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    piv = est.agg(
        F.max(F.when(F.col("q") == 50, F.col("est_cents"))).alias("e50"),
        F.max(F.when(F.col("q") == 90, F.col("est_cents"))).alias("e90"),
        F.max(F.when(F.col("q") == 99, F.col("est_cents"))).alias("e99"),
    )
    rk = v.crossJoin(F.broadcast(piv)).agg(
        F.sum(F.expr("CASE WHEN cents <= e50 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("r50"),
        F.sum(F.expr("CASE WHEN cents <= e90 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("r90"),
        F.sum(F.expr("CASE WHEN cents <= e99 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("r99"),
    )
    return (
        est.crossJoin(F.broadcast(rk))
        .withColumn(
            "actual_rank",
            F.expr(
                "CASE q WHEN 50 THEN r50 WHEN 90 THEN r90 ELSE r99 END"
            ).cast("long"),
        )
        .select(
            "q",
            "n",
            "k_target",
            "est_cents",
            "actual_rank",
            (F.col("actual_rank") - F.col("k_target"))
            .cast("long")
            .alias("rank_err"),
            "bin_pop",
        )
    )


@register(
    "j11_interval_overlap",
    sql="""
    WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                      LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS pus
               FROM events),
    marked AS (SELECT user_id, event_id, us,
                      CASE WHEN pus IS NULL OR us - pus > 1800000000
                           THEN 1 ELSE 0 END AS new_s
               FROM o),
    sess AS (SELECT user_id, us,
                    SUM(new_s) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS sid
             FROM marked),
    iv AS (SELECT user_id, sid, MIN(us) AS s_lo, MAX(us) AS s_hi
           FROM sess GROUP BY user_id, sid),
    hours AS (SELECT DISTINCT (epoch_us(ts) // 3600000000) AS h
              FROM events),
    win AS (SELECT h * 3600000000 AS w_lo,
                   h * 3600000000 + 1800000000 AS w_hi
            FROM hours WHERE h % 4 = 0)
    SELECT win.w_lo AS window_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT iv.user_id) AS BIGINT) AS n_users
    FROM win JOIN iv
      ON iv.s_lo < win.w_hi AND win.w_lo <= iv.s_hi
    GROUP BY win.w_lo
    """,
    doc="Interval-overlap join (interval x interval, distinct from "
        "j8's point-in-range): 30-minute-gap user sessions against "
        "half-hour maintenance windows on every 4th hour. The oracle "
        "states the raw inequality join; the Spark plan replicates "
        "each session to the HOUR BINS it covers (sequence over the "
        "bin range — bounded, a session spans few hours by the gap "
        "rule), keys windows by their bin, equi-joins on the bin and "
        "refines the exact overlap, then dedups (session, window) "
        "pairs that matched in several bins. Shuffle volume is "
        "O(sessions x avg bins) — independent of the time span — "
        "where a theta join would cross every session with every "
        "window. Session construction itself is the per-user "
        "gaps-and-islands cumsum (user-keyed frames).",
)
def j11_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_id", us.alias("us"),
        F.lag(us).over(w).alias("pus"),
    )
    marked = o.select(
        "user_id",
        "event_id",
        "us",
        F.when(
            F.col("pus").isNull() | (F.col("us") - F.col("pus") > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    # event_id tiebreak: new_s was derived under (ts, event_id) order,
    # so the cumsum must replay the SAME order when timestamps tie
    # (the ev_sessionize convention) or engines may split differently
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("sid", F.sum("new_s").over(wcum))
    iv = sess.groupBy("user_id", "sid").agg(
        F.min("us").alias("s_lo"), F.max("us").alias("s_hi")
    )
    hours = ev.select(
        F.floor(us / 3_600_000_000).cast("long").alias("h")
    ).distinct()
    win = hours.where(F.col("h") % 4 == 0).select(
        (F.col("h") * 3_600_000_000).alias("w_lo"),
        (F.col("h") * 3_600_000_000 + 1_800_000_000).alias("w_hi"),
        F.col("h").alias("bin"),
    )
    # replicate each session to the hour bins it covers
    ivb = iv.select(
        "user_id",
        "sid",
        "s_lo",
        "s_hi",
        F.explode(
            F.sequence(
                F.expr("s_lo div 3600000000"), F.expr("s_hi div 3600000000")
            )
        ).alias("bin"),
    )
    pairs = (
        ivb.join(win, "bin")
        .where((F.col("s_lo") < F.col("w_hi")) & (F.col("w_lo") <= F.col("s_hi")))
        .select("user_id", "sid", "w_lo")
        .distinct()
    )
    return pairs.groupBy(F.col("w_lo").alias("window_start_us")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "ev_hll_rolling",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day,
               CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM events),
    b AS (SELECT day, hv % {_HLL_M} AS bucket,
                 hv // {_HLL_M} AS rem FROM h),
    reg AS (SELECT day, bucket, MAX({_HLL_RHO_CASE}) AS rho
            FROM b GROUP BY day, bucket),
    days AS (SELECT DISTINCT day FROM reg),
    grid AS (SELECT days.day, g.bucket
             FROM days, (SELECT DISTINCT bucket FROM reg) g),
    dense AS (SELECT grid.day, grid.bucket,
                     COALESCE(reg.rho, 0) AS rho
              FROM grid LEFT JOIN reg
                ON grid.day = reg.day AND grid.bucket = reg.bucket),
    rolled AS (SELECT day, bucket,
                      MAX(rho) OVER (PARTITION BY bucket ORDER BY day
                                     ROWS BETWEEN 2 PRECEDING
                                     AND CURRENT ROW) AS rho
               FROM dense)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN rho > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_present,
           CAST(SUM(CAST(2 AS BIGINT) ** (27 - rho)) AS BIGINT)
               + ({_HLL_M} - CAST(COUNT(*) AS BIGINT)) * 134217728
               AS s_scaled,
           0.709 * 4096.0 * 134217728.0 /
               (CAST(SUM(CAST(2 AS BIGINT) ** (27 - rho)) AS BIGINT)
                + ({_HLL_M} - CAST(COUNT(*) AS BIGINT)) * 134217728)
               AS est_distinct
    FROM rolled GROUP BY day
    """,
    doc="Rolling windowed distinct via sketch merge — the OLAP "
        "pattern that makes 'distinct users, trailing 3 days, every "
        "day' tractable at 100 TB: raw events fold ONCE into daily "
        "64-register HLL tables, and the trailing window is a MAX "
        "over each register's 3-day frame — the window never sees an "
        "event, only registers (64 parallel per-bucket frames of "
        "#days rows). rho = 0 marks an empty register (2^27 term), "
        "so the merged S stays integer-exact. The same daily sketch "
        "table serves any trailing width without re-reading raw "
        "data — the reason engines store sketches, not counts.",
)
def ev_hll_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = ev.select(
        F.col("ts").cast("date").alias("day"), hv.alias("hv")
    ).distinct()
    b = h.select(
        "day",
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.expr(f"hv div {_HLL_M}").alias("rem"),
    )
    reg = (
        b.withColumn("rho", F.expr(_HLL_RHO_CASE))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho"))
        .persist()  # consumers: day grid + bucket grid + dense join
    )
    days = reg.select("day").distinct()
    buckets = reg.select("bucket").distinct()
    grid = days.crossJoin(F.broadcast(buckets))
    dense = grid.join(reg, ["day", "bucket"], "left").select(
        "day", "bucket", F.coalesce("rho", F.lit(0)).alias("rho")
    )
    wroll = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rowsBetween(-2, Window.currentRow)
    )  # frame: one row per day per register — sketch-sized
    rolled = dense.withColumn("rho", F.max("rho").over(wroll))
    pow_term = F.expr("shiftleft(CAST(1 AS BIGINT), 27 - rho)")
    s_scaled = (
        F.sum(pow_term).cast("long")
        + (_HLL_M - F.count(F.lit(1)).cast("long")) * 134217728
    ).cast("long")
    return rolled.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum((F.col("rho") > 0).cast("int")).cast("long").alias("n_present"),
        s_scaled.alias("s_scaled"),
        (F.lit(0.709) * F.lit(4096.0) * F.lit(134217728.0) / s_scaled).alias(
            "est_distinct"
        ),
    )


@register(
    "s_compaction_roundtrip",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events GROUP BY event_type
    """,
    doc="Small-files compaction GATED end-to-end (sinks."
        "compact_parquet): the events table is deliberately shattered "
        "into 64 tiny parquet files (the streaming-append failure "
        "mode whose footer/open overhead dominates scans at 100 TB), "
        "compacted back into right-sized files via one round-robin "
        "repartition rewrite, and the compacted copy must aggregate "
        "identically to the original table — content preservation "
        "proven through the oracle, file-count collapse asserted in "
        "the builder. The scan after compaction reads a handful of "
        "files instead of 64; at production scale this is the "
        "difference between a listing-bound driver and a scan-bound "
        "cluster.",
)
def s_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os

    from mwa_uvdata_pipeline_spark.plans import fixture_dir
    from mwa_uvdata_pipeline_spark.sinks import compact_parquet

    def _build(d: str) -> None:
        frag = os.path.join(d, "frag")
        ev = table(spark, sf_dir, "events")
        ev.repartition(64).write.mode("overwrite").parquet(frag)
        n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
        assert n_frag >= 32, f"fixture not fragmented: {n_frag}"
        stats = compact_parquet(
            spark, frag, os.path.join(d, "compact"), target_files=4
        )
        assert stats["files_after"] < stats["files_before"]

    out = fixture_dir("compaction", sf_dir, _build)
    ev = spark.read.parquet(os.path.join(out, "compact"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("sum_id"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
    )


@register(
    "ev_anomaly_mad",
    sql="""
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    r1 AS (SELECT event_type, n,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY n, hr) AS rk,
                  COUNT(*) OVER (PARTITION BY event_type) AS cnt
           FROM h),
    med AS (SELECT event_type, n AS med FROM r1
            WHERE rk = (cnt + 1) // 2),
    dev AS (SELECT h.event_type, h.hr, h.n,
                   ABS(h.n - med.med) AS d, med.med
            FROM h JOIN med ON h.event_type = med.event_type),
    r2 AS (SELECT event_type, d,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY d, hr) AS rk,
                  COUNT(*) OVER (PARTITION BY event_type) AS cnt
           FROM dev),
    mad AS (SELECT event_type, d AS mad FROM r2
            WHERE rk = (cnt + 1) // 2)
    SELECT dev.event_type,
           CAST(MAX(dev.med) AS BIGINT) AS med,
           CAST(MAX(mad.mad) AS BIGINT) AS mad,
           CAST(SUM(CASE WHEN dev.d > 5 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalous,
           CAST(MAX(dev.d) AS BIGINT) AS max_dev
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type
    """,
    doc="Robust anomaly detection by median absolute deviation — the "
        "outlier gate ev_rate_anomaly's trailing MEAN cannot provide "
        "(a single spike drags a mean; the double median shrugs it "
        "off): hourly counts per type, the LOWER median ((n+1) div 2 "
        "rank with an hr tiebreak — integer-exact and "
        "order-deterministic in both engines, no interpolation), "
        "deviations, the median of those, and hours beyond 5 MADs "
        "flagged. Every window runs on the HOURLY aggregate table "
        "(calendar-bounded frames, one row per hour per type); raw "
        "events are touched once by the (type, hour) hash agg.",
)
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wtype = Window.partitionBy("event_type")

    def lower_median(df, val, out):
        w = Window.partitionBy("event_type").orderBy(val, "hr")
        return (
            df.withColumn("rk", F.row_number().over(w))
            .withColumn("cnt", F.count(F.lit(1)).over(wtype))
            .where(F.col("rk") == F.expr("(cnt + 1) div 2"))
            .select("event_type", F.col(val).alias(out))
        )

    med = lower_median(h, "n", "med")
    dev = h.join(med, "event_type").select(
        "event_type",
        "hr",
        "n",
        F.abs(F.col("n") - F.col("med")).alias("d"),
        "med",
    )
    mad = lower_median(dev, "d", "mad")
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").cast("long").alias("med"),
            F.max("mad").cast("long").alias("mad"),
            F.sum((F.col("d") > 5 * F.col("mad")).cast("int"))
            .cast("long")
            .alias("n_anomalous"),
            F.max("d").cast("long").alias("max_dev"),
        )
    )


@register(
    "ev_ewma_dyadic",
    sql="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    w AS (SELECT day, n,
                 CAST(COALESCE(LAG(n, 0) OVER (ORDER BY day), 0) * 128 + COALESCE(LAG(n, 1) OVER (ORDER BY day), 0) * 64 + COALESCE(LAG(n, 2) OVER (ORDER BY day), 0) * 32 + COALESCE(LAG(n, 3) OVER (ORDER BY day), 0) * 16 + COALESCE(LAG(n, 4) OVER (ORDER BY day), 0) * 8 + COALESCE(LAG(n, 5) OVER (ORDER BY day), 0) * 4 + COALESCE(LAG(n, 6) OVER (ORDER BY day), 0) * 2 + COALESCE(LAG(n, 7) OVER (ORDER BY day), 0) * 1
                      AS BIGINT) AS acc
          FROM d)
    SELECT strftime(day, '%Y-%m-%d') AS day, n,
           acc // 255 AS ewma_floor,
           acc AS acc_scaled
    FROM w
    """,
    doc="Dyadic-exact exponential smoothing — time-series smoothing "
        "whose weights are powers of 1/2 over a trailing 8-row frame "
        "(weight 2^(7-i) for lag i, normalizer 255 = 2^8 - 1), so the "
        "accumulator is a plain integer sum and the smoothed level is "
        "one floor division: no float recurrence, no order-dependent "
        "rounding, exactly reproducible across engines and across "
        "partial/merge recomputation — the property that lets a "
        "1000-executor backfill and an incremental daily job agree "
        "bit-for-bit. The window runs on the DAILY aggregate table "
        "(calendar-bounded, gapless for this event stream); raw "
        "events are touched once.",
)
def ev_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wlag = Window.orderBy("day")  # frame: one row per calendar day
    acc = None
    for i in range(8):
        term = F.coalesce(F.lag("n", i).over(wlag), F.lit(0)) * F.lit(
            1 << (7 - i)
        ).cast("long")
        acc = term if acc is None else acc + term
    return (
        d.withColumn("acc", acc.cast("long"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.expr("CAST(acc div 255 AS BIGINT)").alias("ewma_floor"),
            F.col("acc").alias("acc_scaled"),
        )
    )


@register(
    "agg_exact_median_2pass",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    r AS (SELECT event_type, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cents) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS cnt
          FROM v)
    SELECT event_type,
           CAST(cnt AS BIGINT) AS n,
           CAST(cents AS BIGINT) AS median_cents
    FROM r WHERE rk = (cnt + 1) // 2
    """,
    doc="EXACT median without a full sort — the two-pass technique "
        "that scales where percentile_approx is inexact and a global "
        "rank is a single-task sort: pass 1 histograms values into "
        "fixed-width bins per group (one hash agg), the cumulative "
        "bin counts locate the bin CONTAINING the lower median and "
        "the number of rows preceding it; pass 2 re-reads ONLY rows "
        "inside that bin (a pushed predicate — ~n/bins rows), ranks "
        "that small subset per group, and picks the (n+1)/2-th "
        "element exactly. The oracle computes the same lower median "
        "by direct rank, proving the two-pass answer EXACT, not "
        "approximate. Per-group second-pass frames are bin-population "
        "sized; the cumulative window runs on the bin table.",
)
def agg_exact_median_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).persist()  # two passes by design: histogram, then one-bin rank
    binw = 100  # one-dollar bins over integer cents
    hist = v.groupBy(
        "event_type", F.expr(f"cents div {binw}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )  # frame: one row per occupied bin (value-domain bounded)
    cum = hist.select(
        "event_type",
        "bin",
        "c",
        F.sum("c").over(wcum).alias("cumc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    target = cum.where(
        (F.col("cumc") >= F.expr("(n + 1) div 2"))
        & (F.col("cumc") - F.col("c") < F.expr("(n + 1) div 2"))
    ).select(
        "event_type",
        "bin",
        (F.col("cumc") - F.col("c")).alias("before"),
        "n",
    )
    # pass 2: rank ONLY the rows inside each group's median bin
    wbin = Window.partitionBy("event_type").orderBy("cents")
    inbin = v.join(F.broadcast(target), "event_type").where(
        F.expr(f"cents div {binw}") == F.col("bin")
    )
    return (
        inbin.withColumn("rk", F.row_number().over(wbin))
        .where(F.col("rk") + F.col("before") == F.expr("(n + 1) div 2"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("cents").alias("median_cents"),
        )
    )


@register(
    "x_variant_extract",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events GROUP BY event_type
    """,
    doc="Spark 4 VARIANT ingestion of semi-structured payloads: the "
        "JSON props column is parsed ONCE into the binary VARIANT "
        "encoding (parse_json) and fields are extracted with typed "
        "variant_get paths — the open-table-format answer to "
        "schema-on-read JSON that avoids per-expression re-parsing "
        "(x_json_extract's get_json_object re-tokenizes the string "
        "for every path; VARIANT amortizes one parse across all "
        "extractions and keeps comparisons/aggregations on typed "
        "values). Oracle extracts the same field with DuckDB's JSON "
        "path functions; integer field, exact.",
)
def x_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@register(
    "x_observe_metrics",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative
    FROM events
    """,
    doc="Pipeline observability via df.observe(): named metrics "
        "(row count, value mass, negative-value violations) are "
        "accumulated DURING the action by the Observation API — the "
        "zero-extra-pass instrumentation a production job attaches to "
        "every stage for data-quality circuit breakers, instead of "
        "re-scanning the input to audit it. The observed values are "
        "returned as a 1-row frame and must equal the oracle's "
        "direct aggregation — proving the instrumented metrics "
        "faithfully reflect the data that flowed through. The extra "
        "action is a count on the observed frame (metrics become "
        "available only after an action completes).",
)
def x_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.sum((F.col("value") < 0).cast("int")).cast("long").alias(
            "n_negative"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), int(m["sum_cents"]), int(m["n_negative"]))],
        "n_rows long, sum_cents long, n_negative long",
    )


@register(
    "x_pipe_sql",
    sql="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events WHERE event_type = 'click'
    GROUP BY user_id HAVING COUNT(*) >= 3
    """,
    doc="Spark 4 SQL pipe syntax (|>): the same logical plan as the "
        "classic SELECT, written as a linear FROM |> WHERE |> "
        "AGGREGATE |> WHERE flow — the composable form Spark 4.0 "
        "added for pipeline-style SQL. Catalyst compiles both "
        "spellings to one plan (filter pushed to the scan, partial "
        "aggregation map-side), so this gates that the new surface "
        "produces the standard plan, not a different engine path. "
        "Oracle is the classic spelling in DuckDB.",
)
def x_pipe_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("pipe_events")
    return spark.sql(
        """
        FROM pipe_events
        |> WHERE event_type = 'click'
        |> AGGREGATE COUNT(*) AS n_clicks,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                          AS BIGINT) AS cents
           GROUP BY user_id
        |> WHERE n_clicks >= 3
        |> SELECT user_id, CAST(n_clicks AS BIGINT) AS n_clicks, cents
        """
    )


@register(
    "x_lateral_topn",
    sql="""
    WITH u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id, t.event_id, t.event_type
    FROM u, LATERAL (
        SELECT event_id, event_type FROM events e
        WHERE e.user_id = u.user_id
        ORDER BY e.ts DESC, e.event_id DESC LIMIT 2
    ) t
    """,
    doc="Correlated LATERAL subquery — 'each user's 2 most recent "
        "events' written as the correlated form analysts reach for; "
        "Catalyst DECORRELATES it (no per-user re-execution — the "
        "rewritten plan is the same shuffle-once ranked-window shape "
        "a hand-written row_number query produces), which is the "
        "property that makes the convenient spelling safe at scale. "
        "DuckDB runs the identical LATERAL text as the oracle.",
)
def x_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("lat_events")
    return spark.sql(
        """
        WITH u AS (SELECT DISTINCT user_id FROM lat_events)
        SELECT u.user_id, t.event_id, t.event_type
        FROM u, LATERAL (
            SELECT event_id, event_type FROM lat_events e
            WHERE e.user_id = u.user_id
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 2
        ) t
        """
    )


@register(
    "ev_peak_concurrency",
    sql="""
    WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                      LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS pus
               FROM events),
    marked AS (SELECT user_id, event_id, us,
                      CASE WHEN pus IS NULL OR us - pus > 1800000000
                           THEN 1 ELSE 0 END AS new_s
               FROM o),
    sess AS (SELECT user_id, us,
                    SUM(new_s) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS sid
             FROM marked),
    iv AS (SELECT user_id, sid, MIN(us) AS s_lo, MAX(us) + 1 AS s_hi
           FROM sess GROUP BY user_id, sid),
    delta AS (SELECT s_lo AS us, 1 AS d FROM iv
              UNION ALL SELECT s_hi AS us, -1 AS d FROM iv),
    dd AS (SELECT us, d, us // 86400000000 AS day FROM delta),
    incum AS (SELECT day, us, d,
                     SUM(d) OVER (PARTITION BY day ORDER BY us, d
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS c
              FROM dd),
    dtot AS (SELECT day, CAST(SUM(d) AS BIGINT) AS net FROM dd
             GROUP BY day),
    doff AS (SELECT day,
                    COALESCE(SUM(net) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS off
             FROM dtot)
    SELECT CAST(incum.day AS BIGINT) AS day_idx,
           CAST(MAX(doff.off + incum.c) AS BIGINT) AS peak_concurrent,
           CAST(COUNT(*) AS BIGINT) AS n_deltas
    FROM incum JOIN doff ON incum.day = doff.day
    GROUP BY incum.day
    """,
    doc="Peak concurrent sessions per day — the sweep line (+1 at "
        "session start, -1 past its end, running sum = concurrency) "
        "with the cumsum STITCHED in two levels so no task ever sorts "
        "the whole timeline: deltas cumsum within their own DAY "
        "(parallel per-day frames; ties ordered ends-before-starts by "
        "the d ascending tiebreak, the half-open interval convention) "
        "and a per-day net-delta offset table (one row per day, "
        "calendar-bounded window) carries the running level across "
        "day boundaries — sessions spanning midnight place their -1 "
        "on the later day and the stitch accounts them exactly. "
        "Session construction is the same per-user gaps-and-islands "
        "as ev_sessionize/j11.",
)
def ev_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_id", us.alias("us"),
        F.lag(us).over(w).alias("pus"),
    )
    marked = o.select(
        "user_id",
        "event_id",
        "us",
        F.when(
            F.col("pus").isNull()
            | (F.col("us") - F.col("pus") > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    # event_id tiebreak matches the lag pass's order (the ev_sessionize
    # convention) so tied timestamps split identically in both engines
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iv = (
        marked.withColumn("sid", F.sum("new_s").over(wcum))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_lo"), (F.max("us") + 1).alias("s_hi"))
    )
    delta = iv.select(F.col("s_lo").alias("us"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("s_hi").alias("us"), F.lit(-1).alias("d"))
    )
    dd = delta.withColumn("day", F.expr("us div 86400000000"))
    win_day = (
        Window.partitionBy("day")
        .orderBy("us", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    incum = dd.withColumn("c", F.sum("d").over(win_day))
    dtot = dd.groupBy("day").agg(F.sum("d").cast("long").alias("net"))
    woff = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )  # frame: one row per calendar day
    doff = dtot.select(
        "day", F.coalesce(F.sum("net").over(woff), F.lit(0)).alias("off")
    )
    return (
        incum.join(F.broadcast(doff), "day")
        .groupBy(F.col("day").cast("long").alias("day_idx"))
        .agg(
            F.max(F.col("off") + F.col("c")).cast("long").alias(
                "peak_concurrent"
            ),
            F.count(F.lit(1)).cast("long").alias("n_deltas"),
        )
    )


@register(
    "agg_kmv_anotb",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM events WHERE event_type IN ('view', 'purchase')),
    g AS (SELECT event_type, hv,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY hv) AS rn
          FROM h),
    sk AS (SELECT event_type, hv FROM g WHERE rn <= {_KMV_K}),
    th AS (SELECT MIN(kth) AS theta FROM (
               SELECT event_type, MAX(hv) AS kth FROM sk
               GROUP BY event_type)),
    a AS (SELECT hv FROM sk, th
          WHERE event_type = 'view' AND hv < th.theta),
    b AS (SELECT hv FROM sk WHERE event_type = 'purchase'),
    anotb AS (SELECT a.hv FROM a LEFT JOIN b ON a.hv = b.hv
              WHERE b.hv IS NULL)
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(MAX(th.theta) AS BIGINT) AS theta,
           CAST(COUNT(anotb.hv) AS BIGINT) AS n_anotb,
           COUNT(anotb.hv) * 4294967296.0 / MAX(th.theta)
               AS est_a_not_b
    FROM th LEFT JOIN anotb ON TRUE
    """,
    doc="Theta-sketch set DIFFERENCE (A-not-B) — with agg_kmv_merge "
        "(union) and agg_kmv_intersect this completes the sketch set "
        "algebra DataSketches ships: viewers-who-never-purchased "
        "estimated from two k-row sketches by counting A's sub-theta "
        "hashes absent from B's sketch; est = n / (theta / 2^32). "
        "Everything after the two-level sketch build is k x k; the "
        "only full pass is the hash-distinct. Exact-value gated up "
        "to the single estimating division.",
)
def agg_kmv_anotb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    sk = _kmv_pergroup(h, _KMV_K).persist()
    th = sk.groupBy("event_type").agg(F.max("hv").alias("kth")).agg(
        F.min("kth").alias("theta")
    )
    a = (
        sk.where(F.col("event_type") == "view")
        .crossJoin(F.broadcast(th))
        .where(F.col("hv") < F.col("theta"))
        .select("hv")
    )
    b = sk.where(F.col("event_type") == "purchase").select("hv")
    anotb = a.join(b, "hv", "left_anti")
    n = anotb.agg(F.count(F.lit(1)).cast("long").alias("n_anotb"))
    return th.crossJoin(F.broadcast(n)).select(
        F.lit(_KMV_K).cast("long").alias("k"),
        F.col("theta").cast("long").alias("theta"),
        "n_anotb",
        (F.col("n_anotb") * F.lit(4294967296.0) / F.col("theta")).alias(
            "est_a_not_b"
        ),
    )


@register(
    "ev_entropy_rate",
    sql="""
    WITH s AS (SELECT user_id, event_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          AS to_type
               FROM events),
    n AS (SELECT event_type AS from_type, to_type,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM s WHERE to_type IS NOT NULL
          GROUP BY event_type, to_type),
    t AS (SELECT from_type,
                 CAST(SUM(c) AS BIGINT) AS tot,
                 CAST(SUM(c * CAST(ROUND(ln(c) * 1000000) AS BIGINT))
                      AS BIGINT) AS clnc
          FROM n GROUP BY from_type)
    SELECT from_type, tot,
           CAST(ROUND(ln(tot) * 1000000 - clnc / tot) AS BIGINT)
               AS h_micro
    FROM t
    """,
    doc="Behavioral entropy rate — the Shannon entropy of each "
        "state's outgoing Markov transition distribution (how "
        "predictable the next action is given the current one), the "
        "complement of ev_markov_transitions' probability table. "
        "H = ln(tot) - (1/tot) sum c*ln c with per-term integer "
        "micro-nat quantization (the t_char_entropy discipline), so "
        "the only float steps are one division and one subtraction "
        "per state. Windows are per-user lead frames; the entropy "
        "itself runs on the state-pair table (n_types^2 rows).",
)
def ev_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    n = s.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    t = n.groupBy("from_type").agg(
        F.sum("c").cast("long").alias("tot"),
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1000000).cast(
                "long"
            )
        )
        .cast("long")
        .alias("clnc"),
    )
    return t.select(
        "from_type",
        "tot",
        F.round(
            F.log(F.col("tot").cast("double")) * 1000000
            - F.col("clnc") / F.col("tot")
        )
        .cast("long")
        .alias("h_micro"),
    )


@register(
    "w8_session_window",
    sql="""
    WITH o AS (SELECT user_id, epoch_us(ts) AS us,
                      LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS pus
               FROM events),
    marked AS (SELECT user_id, us,
                      CASE WHEN pus IS NULL OR us - pus >= 1800000000
                           THEN 1 ELSE 0 END AS new_s
               FROM o),
    sess AS (SELECT user_id, us,
                    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS sid
             FROM marked)
    SELECT user_id,
           CAST(MIN(us) AS BIGINT) AS session_start_us,
           CAST(MAX(us) + 1800000000 AS BIGINT) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="Native batch session_window — Spark's built-in session "
        "operator run as an ordinary GROUP BY (the same "
        "SessionWindowing expression the streaming family uses, here "
        "in batch mode): sessions close after a 30-minute gap, the "
        "window end is last-event + gap by the operator's contract, "
        "and the oracle re-derives identical sessions via "
        "gaps-and-islands — gating that the ENGINE's sessionizer "
        "agrees with the hand-rolled cumsum formulation "
        "(ev_sessionize) event-for-event, boundary-for-boundary "
        "(note the >= gap edge: session_window treats an exactly-gap "
        "arrival as a NEW session). One shuffle on the session key; "
        "Spark merges adjacent windows internally without a per-user "
        "global sort surfaced in the plan.",
)
def w8_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    sw = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"), "n_events",
        )
    )
    ws_us = epoch_us(sw, "ws")
    we_us = epoch_us(sw, "we")
    return sw.select(
        "user_id",
        ws_us.cast("long").alias("session_start_us"),
        we_us.cast("long").alias("session_end_us"),
        "n_events",
    )


@register(
    "ev_user_trajectories",
    sql="""
    WITH r AS (SELECT user_id, event_type,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rk
               FROM events),
    tr AS (SELECT user_id,
                  string_agg(event_type, '>' ORDER BY rk) AS trajectory
           FROM r WHERE rk <= 5 GROUP BY user_id)
    SELECT trajectory,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM tr GROUP BY trajectory
    ORDER BY n_users DESC, trajectory LIMIT 10
    """,
    doc="Behavioral trajectory fingerprints — each user's first five "
        "actions as an ordered path, the onboarding-funnel shape "
        "product analytics clusters on: per-user rank (user-keyed "
        "frames), an ORDERED string_agg over at most five rows, and "
        "a global top-10 TakeOrdered with a lexicographic tiebreak. "
        "The trajectory alphabet is event_type^5 at most, so the "
        "final aggregate is domain-bounded regardless of user count.",
)
def ev_user_trajectories(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rk")
    ).where(F.col("rk") <= 5)
    tr = r.groupBy("user_id").agg(
        F.concat_ws(
            ">", F.array_sort(
                F.collect_list(F.struct("rk", "event_type"))
            ).getField("event_type")
        ).alias("trajectory")
    )
    return (
        tr.groupBy("trajectory")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "trajectory")
        .limit(10)
    )


@register(
    "ev_time_to_convert",
    sql="""
    WITH su AS (SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    pu AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
           WHERE event_type = 'purchase' GROUP BY user_id),
    d AS (SELECT su.user_id, pu.t1 - su.t0 AS dt_us
          FROM su JOIN pu ON su.user_id = pu.user_id
          WHERE pu.t1 >= su.t0),
    r AS (SELECT user_id, dt_us,
                 ROW_NUMBER() OVER (ORDER BY dt_us, user_id) AS rk,
                 COUNT(*) OVER () AS cnt
          FROM d)
    SELECT CAST((SELECT COUNT(*) FROM su) AS BIGINT) AS n_signups,
           CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_converted,
           CAST((SELECT dt_us FROM r WHERE rk = (cnt + 1) // 2) AS BIGINT)
               AS median_dt_us,
           CAST((SELECT MIN(dt_us) FROM d) AS BIGINT) AS min_dt_us,
           CAST((SELECT MAX(dt_us) FROM d) AS BIGINT) AS max_dt_us
    """,
    doc="Time-to-convert analysis — signup-to-first-purchase latency, "
        "the survival statistic growth teams track: first signup and "
        "first purchase per user (two filtered min-aggs), the delta "
        "for converters, and the exact lower median via the same "
        "multi-pass histogram refinement as agg_exact_median_2pass: "
        "pass 1 histograms converter deltas into one-hour bins (one "
        "hash agg; the bin table is delta-range/1h sized, not "
        "population sized), pass 2 sub-histograms the median hour "
        "into one-second bins (<=3600 rows), pass 3 cumulates "
        "exact-value counts inside the median second (<=1e6 distinct "
        "micros — value-domain bounded). Every ordered window frame "
        "is value-domain bounded; no window ever ranks rows, so even "
        "an all-converters-in-one-bin distribution stays distributed. "
        "Integer microseconds throughout.",
)
def ev_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t0"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    d = (
        su.join(pu, "user_id")
        .where(F.col("t1") >= F.col("t0"))
        .select("user_id", (F.col("t1") - F.col("t0")).alias("dt_us"))
        .persist()  # consumers: histogram, one-bin rank, min/max
    )
    binw = 3_600_000_000  # one-hour bins over integer microseconds
    hist = d.groupBy(F.expr(f"dt_us div {binw}").alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # frame: one row per occupied hour bin (delta-range bounded)
    cum = hist.select(
        "bin",
        "c",
        F.sum("c").over(wcum).alias("cumc"),
        F.sum("c").over(Window.partitionBy()).alias("cnt"),
    )
    tgt = cum.where(
        (F.col("cumc") >= F.expr("(cnt + 1) div 2"))
        & (F.col("cumc") - F.col("c") < F.expr("(cnt + 1) div 2"))
    ).select("bin", (F.col("cumc") - F.col("c")).alias("before"), "cnt")
    # pass 2: sub-histogram the median bin into ONE-SECOND bins
    # (<=3600 rows regardless of how many converters share the hour —
    # the round-8 version ranked the bin's ROWS here, which an
    # all-in-one-bin distribution degrades to an O(converters)
    # single-task sort). The sub-bin cumulation locates the second
    # containing the target order statistic.
    subw = 1_000_000  # one-second sub-bins (micros)
    wsub = Window.orderBy("sbin")  # frame: <=3600 occupied seconds
    tgt2 = (
        d.join(F.broadcast(tgt), F.expr(f"dt_us div {binw}") == F.col("bin"))
        .groupBy(
            F.expr(f"dt_us div {subw}").alias("sbin"), "before", "cnt"
        )
        .agg(F.count(F.lit(1)).alias("sc"))
        .withColumn("scum", F.sum("sc").over(wsub))
        .where(
            (F.col("scum") + F.col("before") >= F.expr("(cnt + 1) div 2"))
            & (
                F.col("scum") - F.col("sc") + F.col("before")
                < F.expr("(cnt + 1) div 2")
            )
        )
        .select(
            "sbin",
            (F.col("scum") - F.col("sc") + F.col("before")).alias("before2"),
            "cnt",
        )
    )
    # pass 3: cumulate EXACT-VALUE counts inside the median second.
    # Distinct dt_us values in a one-second sub-bin are <=1e6 (the
    # micro value domain), so this ordered window is value-domain
    # bounded, never population bounded — no row-level rank anywhere.
    # The final agg guarantees exactly ONE row even with zero
    # converters (agg over an empty frame yields a NULL row), matching
    # the oracle's scalar subquery — a raw 0-row med would collapse
    # the crossJoin.
    wval = Window.orderBy("dt_us")  # frame: distinct micros, one second
    med = (
        d.join(F.broadcast(tgt2), F.expr(f"dt_us div {subw}") == F.col("sbin"))
        .groupBy("dt_us", "before2", "cnt")
        .agg(F.count(F.lit(1)).alias("vc"))
        .withColumn("vcum", F.sum("vc").over(wval))
        .where(
            (F.col("vcum") + F.col("before2") >= F.expr("(cnt + 1) div 2"))
            & (
                F.col("vcum") - F.col("vc") + F.col("before2")
                < F.expr("(cnt + 1) div 2")
            )
        )
        .agg(F.max("dt_us").alias("median_dt_us"))
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.min("dt_us").cast("long").alias("min_dt_us"),
        F.max("dt_us").cast("long").alias("max_dt_us"),
    )
    n_su = su.agg(F.count(F.lit(1)).cast("long").alias("n_signups"))
    return (
        n_su.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(med))
        .select(
            "n_signups",
            "n_converted",
            F.col("median_dt_us").cast("long").alias("median_dt_us"),
            "min_dt_us",
            "max_dt_us",
        )
    )


@register(
    "ev_stickiness",
    sql="""
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
               FROM events),
    w AS (SELECT day, user_id,
                 (epoch_us(CAST(day AS TIMESTAMP)) // 86400000000 + 3) // 7
                     AS wk
          FROM d),
    dau AS (SELECT wk, day, CAST(COUNT(*) AS BIGINT) AS dau
            FROM w GROUP BY wk, day),
    wau AS (SELECT wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM w GROUP BY wk)
    SELECT dau.wk AS week_idx,
           CAST(SUM(dau.dau) AS BIGINT) AS sum_dau,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(wau.wau) AS BIGINT) AS wau,
           CAST(SUM(dau.dau) * 1000000 // (COUNT(*) * MAX(wau.wau))
                AS BIGINT) AS stickiness_ppm
    FROM dau JOIN wau ON dau.wk = wau.wk
    GROUP BY dau.wk
    """,
    doc="Engagement stickiness — average DAU over WAU per ISO-ish "
        "week (the DAU/MAU-style habit metric): one distinct "
        "(day, user) projection feeds BOTH the daily and weekly "
        "distinct counts, the week index is integer day arithmetic "
        "(epoch-day + 3 div 7 aligns weeks to Monday), and the "
        "ratio is one integer ppm division. Exactly the metric "
        "shape that motivates the sketch family at 100 TB — here "
        "exact, with the distinct projection as the only wide "
        "shuffle.",
)
def ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    w = d.select(
        "day",
        "user_id",
        F.expr(
            "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
            "00:00:00', CAST(day AS TIMESTAMP_NTZ)) div 86400000000 + 3) "
            "div 7"
        ).alias("wk"),
    )
    dau = w.groupBy("wk", "day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    wau = w.groupBy("wk").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "wk")
        .groupBy(F.col("wk").alias("week_idx"))
        .agg(
            F.sum("dau").cast("long").alias("sum_dau"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("wau").cast("long").alias("wau"),
            F.expr(
                "CAST(SUM(dau) * 1000000 div (COUNT(*) * MAX(wau)) "
                "AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
    )


@register(
    "s_dynamic_partition_overwrite",
    sql="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05'
                    THEN CAST(ROUND(value * 100) AS BIGINT) * 2
                    ELSE CAST(ROUND(value * 100) AS BIGINT) END)
                AS BIGINT) AS sum_cents
    FROM events GROUP BY 1
    """,
    doc="Dynamic partition overwrite — the lakehouse backfill write "
        "mode (partitionOverwriteMode=dynamic): events land "
        "partitioned by event_date, then ONE day is re-written with "
        "corrected values (cents doubled) through a plain "
        "mode('overwrite') save that — in dynamic mode — replaces "
        "ONLY the partitions present in the incoming frame instead "
        "of truncating the table (static mode's notorious data-loss "
        "footgun). The read-back aggregate must equal the original "
        "table with exactly that day's values doubled — proving the "
        "other 29 partitions were untouched. This is how a 100-TB "
        "fact table takes late-arriving corrections: rewrite one "
        "day's files, never the table.",
)
def s_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from mwa_uvdata_pipeline_spark.plans import fixture_dir

    def _build(d: str) -> None:
        out = os.path.join(d, "t")
        ev = table(spark, sf_dir, "events").select(
            F.col("ts").cast("date").cast("string").alias("event_date"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        ev.write.partitionBy("event_date").mode("overwrite").parquet(out)
        patch = ev.where(F.col("event_date") == "2024-01-05").select(
            (F.col("cents") * 2).alias("cents"), "event_date"
        )
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "STATIC"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            patch.write.partitionBy("event_date").mode(
                "overwrite"
            ).parquet(out)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    out = fixture_dir("dyn_overwrite", sf_dir, _build)
    t = spark.read.parquet(os.path.join(out, "t"))
    return t.groupBy(F.col("event_date").cast("string").alias("event_date")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@register(
    "ev_error_wilson",
    sql="""
    WITH h AS (SELECT date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN event_type = 'error'
                               THEN 1 ELSE 0 END) AS BIGINT) AS e
               FROM events GROUP BY 1)
    SELECT strftime(hr, '%Y-%m-%d %H') AS hour,
           n, e,
           ROUND((CAST(e AS DOUBLE) / n + 2.0 / n
                  - 2.0 * sqrt(CAST(e AS DOUBLE) / n
                               * (1.0 - CAST(e AS DOUBLE) / n) / n
                               + 1.0 / (n * CAST(n AS DOUBLE))))
                 / (1.0 + 4.0 / n), 6) AS wilson_lower
    FROM h
    ORDER BY wilson_lower DESC, hour LIMIT 10
    """,
    doc="Error-rate alerting with Wilson lower bounds — ranking hours "
        "by the LOWER confidence bound of their error proportion "
        "(z = 2), the estimator that stops low-traffic hours with "
        "one unlucky error from outranking sustained failures (the "
        "same reason ranking UIs use Wilson instead of raw "
        "ratios). The bound is a fixed-order double expression over "
        "two integers per hour, rounded to 6 dp for cross-engine "
        "equality; the hourly table is calendar-bounded and the "
        "alert list is a TakeOrdered(10).",
)
def ev_error_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "error").cast("int"))
        .cast("long")
        .alias("e"),
    )
    p = F.col("e").cast("double") / F.col("n")
    nD = F.col("n").cast("double")
    wilson = (
        p
        + 2.0 / F.col("n")
        - 2.0
        * F.sqrt(p * (1.0 - p) / F.col("n") + 1.0 / (F.col("n") * nD))
    ) / (1.0 + 4.0 / F.col("n"))
    return (
        h.select(
            F.date_format("hr", "yyyy-MM-dd HH").alias("hour"),
            "n",
            "e",
            F.round(wilson, 6).alias("wilson_lower"),
        )
        .orderBy(F.desc("wilson_lower"), "hour")
        .limit(10)
    )


@register(
    "ev_velocity_flags",
    sql="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    c AS (SELECT a.user_id, a.event_id,
                 CAST(COUNT(*) AS BIGINT) AS n_in_window
          FROM e a JOIN e b
            ON a.user_id = b.user_id
           AND b.us >= a.us - 300000000 AND b.us <= a.us
          GROUP BY a.user_id, a.event_id),
    m AS (SELECT user_id, MAX(n_in_window) AS peak_5min
          FROM c GROUP BY user_id)
    SELECT user_id, CAST(peak_5min AS BIGINT) AS peak_5min
    FROM m WHERE peak_5min >= 2 ORDER BY user_id
    """,
    doc="Velocity checks — the fraud-ops primitive 'too many actions "
        "in any trailing 5 minutes': each event counts same-user "
        "events in its trailing window, users peak-aggregated, "
        "threshold-flagged. The oracle states the inequality "
        "self-join; the Spark plan banded-buckets time (bucket = "
        "300 s) so each event probes exactly TWO (user, bucket) "
        "cells as an equi-join and refines the exact range — "
        "shuffle O(rows), independent of window width vs data span "
        "(the j8_range_join discipline applied to self-velocity).",
)
def ev_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    win = 300_000_000
    e = ev.select("user_id", "event_id", us.alias("us")).persist()
    probe = e.select(
        "user_id",
        "event_id",
        "us",
        F.explode(
            F.array(
                F.expr(f"us div {win}"), F.expr(f"us div {win}") - 1
            )
        ).alias("bucket"),
    )
    build = e.select(
        "user_id",
        F.col("us").alias("bus"),
        F.expr(f"us div {win}").alias("bucket"),
    )
    c = (
        probe.join(build, ["user_id", "bucket"])
        .where(
            (F.col("bus") >= F.col("us") - win) & (F.col("bus") <= F.col("us"))
        )
        .groupBy("user_id", "event_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_window"))
    )
    return (
        c.groupBy("user_id")
        .agg(F.max("n_in_window").cast("long").alias("peak_5min"))
        .where(F.col("peak_5min") >= 2)
        .orderBy("user_id")
    )


@register(
    "agg_higher_moments",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(ROUND(value) AS BIGINT) AS x
               FROM events),
    mo AS (SELECT event_type,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS s1,
                  CAST(SUM(x * x) AS BIGINT) AS s2,
                  CAST(SUM(x * x * x) AS BIGINT) AS s3,
                  CAST(SUM(x * x * x * x) AS BIGINT) AS s4
           FROM v GROUP BY event_type)
    SELECT event_type, n, s1, s2, s3, s4,
           ROUND((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s3
                  - 3.0 * n * s1 * s2
                  + 2.0 * s1 * s1 * s1)
                 / pow(CAST(n AS DOUBLE) * s2
                       - CAST(s1 AS DOUBLE) * s1, 1.5)
                 * sqrt(CAST(n AS DOUBLE)), 6) AS skewness
    FROM mo
    """,
    doc="Higher-moment statistics over mergeable integer power sums — "
        "skewness from the first four raw moments (values quantized "
        "to integer dollars so s4 stays inside int64 headroom to "
        "~1e10 rows; the shuffle carries five longs per group at any "
        "volume, merging by addition). The skewness expression is "
        "one fixed-order double tree over the integer sums, rounded "
        "to 6 dp — the ml_linreg/ridge determinism discipline "
        "extended to third moments. Distribution-shape monitoring "
        "(sudden skew shifts flag pipeline regressions) without a "
        "second pass over the data.",
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round("value").cast("long").alias("x")
    )
    mo = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("long").alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
        .cast("long")
        .alias("s4"),
    )
    nD = F.col("n").cast("double")
    skew = (
        (
            nD * nD * F.col("s3")
            - 3.0 * F.col("n") * F.col("s1") * F.col("s2")
            + 2.0 * F.col("s1") * F.col("s1") * F.col("s1")
        )
        / F.pow(nD * F.col("s2") - F.col("s1").cast("double") * F.col("s1"), 1.5)
        * F.sqrt(nD)
    )
    return mo.select(
        "event_type", "n", "s1", "s2", "s3", "s4",
        F.round(skew, 6).alias("skewness"),
    )


@register(
    "ev_rfm_segments",
    sql="""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
    u AS (SELECT user_id,
                 CAST((mx.tmax - MAX(epoch_us(ts))) // 86400000000
                      AS BIGINT) AS r_days,
                 CAST(COUNT(*) AS BIGINT) AS f,
                 CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS m_cents
          FROM events, mx
          WHERE event_type = 'purchase'
          GROUP BY user_id, mx.tmax),
    s AS (SELECT user_id,
                 CASE WHEN r_days <= 3 THEN 3
                      WHEN r_days <= 10 THEN 2 ELSE 1 END AS r_score,
                 CASE WHEN f >= 40 THEN 3
                      WHEN f >= 20 THEN 2 ELSE 1 END AS f_score,
                 CASE WHEN m_cents >= 150000 THEN 3
                      WHEN m_cents >= 50000 THEN 2 ELSE 1 END AS m_score
          FROM u)
    SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
               AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s GROUP BY 1
    """,
    doc="RFM customer segmentation — recency / frequency / monetary "
        "scores on fixed thresholds (deterministic cutoffs, the "
        "production choice when segment definitions must be stable "
        "across runs; quantile cutoffs would use the "
        "t_perplexity_buckets histogram pattern), rolled into the "
        "classic 27-cell segment code. One purchase-filtered "
        "per-user agg with a broadcast corpus-max scalar; the "
        "segment rollup is domain-bounded.",
)
def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    mx = ev.agg(F.max(us).alias("tmax"))
    u = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mx))
        .groupBy("user_id", "tmax")
        .agg(
            F.max(us).alias("tlast"),
            F.count(F.lit(1)).cast("long").alias("f"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("m_cents"),
        )
        .select(
            "user_id",
            F.expr("(tmax - tlast) div 86400000000").alias("r_days"),
            "f",
            "m_cents",
        )
    )
    r_score = (
        F.when(F.col("r_days") <= 3, 3)
        .when(F.col("r_days") <= 10, 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("f") >= 40, 3).when(F.col("f") >= 20, 2).otherwise(1)
    )
    m_score = (
        F.when(F.col("m_cents") >= 150000, 3)
        .when(F.col("m_cents") >= 50000, 2)
        .otherwise(1)
    )
    return (
        u.select(
            (r_score * 100 + f_score * 10 + m_score)
            .cast("long")
            .alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@register(
    "ev_new_vs_returning",
    sql="""
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
               FROM events),
    f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM d JOIN f ON d.user_id = f.user_id
    GROUP BY d.day
    """,
    doc="New-vs-returning daily split — the growth-accounting "
        "identity every activity dashboard opens with: each user's "
        "first-seen day (one min-agg over the distinct (day, user) "
        "projection) classifies every later active day as returning. "
        "One distinct projection feeds both sides; the join is "
        "user-keyed and the rollup calendar-bounded — the 100-TB "
        "shape is two hash aggs and one equi-join, no windows.",
)
def ev_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct().persist()  # consumers: first-day agg + daily classify
    f = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        d.join(f, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("long")
            .alias("new_users"),
            F.sum((F.col("day") > F.col("first_day")).cast("int"))
            .cast("long")
            .alias("returning_users"),
        )
    )


@register(
    "ev_dow_profile",
    sql="""
    WITH d AS (SELECT event_type,
                      CAST(dayofweek(ts) AS BIGINT) AS dow,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    c AS (SELECT event_type, dow,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS cents
          FROM d GROUP BY event_type, dow),
    t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
          FROM c GROUP BY event_type)
    SELECT c.event_type, c.dow, c.n, c.cents,
           CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_ppm
    FROM c JOIN t ON c.event_type = t.event_type
    """,
    doc="Day-of-week activity profile per event type with integer-ppm "
        "shares — the seasonality cube behind staffing and anomaly "
        "baselines (ev_anomaly_mad's MAD gate assumes a stationary "
        "profile; this is the table that checks it). Two hash aggs "
        "over the bounded (type, dow) grid; DuckDB's dayofweek is "
        "0-based Sunday like Spark's dayofweek is 1-based — the "
        "oracle uses DuckDB's dayofweek directly and Spark matches "
        "its convention below.",
)
def ev_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    t = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("tot"))
    return (
        c.join(t, "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            "cents",
            F.expr("CAST(n * 1000000 div tot AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


@register(
    "agg_exact_quantiles_2pass",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    r AS (SELECT event_type, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cents) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS cnt
          FROM v)
    SELECT event_type,
           CAST(MAX(cnt) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.25 * cnt) AS BIGINT)
                         THEN cents END) AS BIGINT) AS p25_cents,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.50 * cnt) AS BIGINT)
                         THEN cents END) AS BIGINT) AS p50_cents,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.75 * cnt) AS BIGINT)
                         THEN cents END) AS BIGINT) AS p75_cents
    FROM r GROUP BY event_type
    """,
    bench=True,
    doc="EXACT p25/p50/p75 per group via the two-pass histogram — the "
        "agg_exact_median_2pass pattern generalized to a quantile SET "
        "in the same two passes: pass 1 histograms cents into "
        "one-dollar bins (one hash agg), the cumulative bin table "
        "locates the bin containing EACH target rank (lower quantile, "
        "rank ceil(p*n)), pass 2 ranks only rows inside target bins "
        "(per-(group, bin) windows — one bin's population each, never "
        "the group) and emits the three order statistics. The "
        "map-reduce answer to 'exact quantiles without a sort': at "
        "100 TB the second pass touches ~3 bins per group regardless "
        "of group size. Oracle ranks directly — proving the histogram "
        "refinement EXACT, not percentile_approx-approximate.",
)
def agg_exact_quantiles_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).persist()  # two passes by design: histogram, then in-bin ranks
    binw = 100
    hist = v.groupBy(
        "event_type", F.expr(f"cents div {binw}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )  # frame: occupied bins only (value-domain bounded)
    cum = hist.select(
        "event_type",
        "bin",
        "c",
        F.sum("c").over(wcum).alias("cumc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    # one target row per (group, quantile): rank k_p = ceil(p * n)
    ps = F.explode(F.array(F.lit(25), F.lit(50), F.lit(75))).alias("p")
    tgt = (
        cum.select("event_type", "bin", "c", "cumc", "n", ps)
        .withColumn("k", F.expr("CAST((p * n + 99) div 100 AS BIGINT)"))
        .where((F.col("cumc") >= F.col("k"))
               & (F.col("cumc") - F.col("c") < F.col("k")))
        .select("event_type", "p", "bin",
                (F.col("cumc") - F.col("c")).alias("before"), "k", "n")
    )
    # pass 2: rank ONLY rows inside each group's target bins (a bin may
    # serve several quantiles; rank once per (group, bin))
    wbin = Window.partitionBy("event_type", "bin").orderBy("cents")
    inbin = (
        v.withColumn("bin", F.expr(f"cents div {binw}"))
        .join(F.broadcast(tgt.select("event_type", "bin").distinct()),
              ["event_type", "bin"])
        .withColumn("rk", F.row_number().over(wbin))
    )
    hits = inbin.join(F.broadcast(tgt), ["event_type", "bin"]).where(
        F.col("rk") + F.col("before") == F.col("k")
    )
    return (
        hits.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(F.when(F.col("p") == 25, F.col("cents"))).cast("long")
                .alias("p25_cents"),
            F.max(F.when(F.col("p") == 50, F.col("cents"))).cast("long")
                .alias("p50_cents"),
            F.max(F.when(F.col("p") == 75, F.col("cents"))).cast("long")
                .alias("p75_cents"),
        )
    )


@register(
    "agg_quantile_sketch_error",
    sql="""
    WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    mm AS (SELECT CAST(MIN(cents) AS BIGINT) AS mn,
                  CAST(MAX(cents) AS BIGINT) AS mx,
                  CAST(COUNT(*) AS BIGINT) AS n FROM v),
    bw AS (SELECT mn, mx, n, (mx - mn) // 128 + 1 AS binw FROM mm),
    h AS (SELECT (v.cents - bw.mn) // bw.binw AS bin,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM v, bw GROUP BY 1),
    cum AS (SELECT bin, c,
                   CAST(SUM(c) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cumc
            FROM h),
    tq AS (SELECT q, (q * bw.n + 99) // 100 AS k, bw.mn, bw.binw, bw.n
           FROM (SELECT UNNEST([50, 90, 99]) AS q), bw),
    tgt AS (SELECT tq.q, tq.k, tq.n, cum.bin, cum.c,
                   cum.cumc - cum.c AS before,
                   LEAST(tq.mn + cum.bin * tq.binw
                         + ((tq.k - (cum.cumc - cum.c)) * tq.binw)
                           // cum.c,
                         tq.mn + (cum.bin + 1) * tq.binw - 1) AS est
            FROM tq JOIN cum
              ON cum.cumc >= tq.k AND cum.cumc - cum.c < tq.k),
    piv AS (SELECT MAX(CASE WHEN q = 50 THEN est END) AS e50,
                   MAX(CASE WHEN q = 90 THEN est END) AS e90,
                   MAX(CASE WHEN q = 99 THEN est END) AS e99
            FROM tgt),
    rk AS (SELECT CAST(SUM(CASE WHEN cents <= e50 THEN 1 ELSE 0 END)
                       AS BIGINT) AS r50,
                  CAST(SUM(CASE WHEN cents <= e90 THEN 1 ELSE 0 END)
                       AS BIGINT) AS r90,
                  CAST(SUM(CASE WHEN cents <= e99 THEN 1 ELSE 0 END)
                       AS BIGINT) AS r99
           FROM v, piv)
    SELECT CAST(t.q AS BIGINT) AS q, t.n,
           CAST(t.k AS BIGINT) AS k_target,
           CAST(t.est AS BIGINT) AS est_cents,
           CAST(CASE t.q WHEN 50 THEN rk.r50 WHEN 90 THEN rk.r90
                ELSE rk.r99 END AS BIGINT) AS actual_rank,
           CAST((CASE t.q WHEN 50 THEN rk.r50 WHEN 90 THEN rk.r90
                 ELSE rk.r99 END) - t.k AS BIGINT) AS rank_err,
           t.c AS bin_pop
    FROM tgt t, rk
    """,
    doc="Quantile-sketch error audit — the tuning dial for the "
        "mergeable-histogram quantile path (the dedup_lsh_recall "
        "discipline applied to sketched order statistics): build the "
        "128-bin equi-width histogram sketch, read p50/p90/p99 off it "
        "by within-bin linear interpolation (uniform-within-bin "
        "assumption, upper-edge capped), then measure each estimate's "
        "TRUE rank with one exact counting pass and report the signed "
        "rank error next to the bin population — the provable error "
        "envelope, since the estimate and the target rank share a "
        "bin by construction (|rank_err| <= bin_pop, pinned in "
        "tests). This is the number that tells an operator whether "
        "128 bins suffice for their value distribution or the sketch "
        "needs refinement, without ever sorting the corpus. Scale "
        "shape: pass 1 min/max/count + the fixed-width histogram "
        "(both map-side-combined, sketch state is <= 128 longs and "
        "MERGEABLE across partitions/days); the cumulative window "
        "runs over <= 128 occupied bins; pass 2 is three conditional "
        "counts against a broadcast 1-row estimate frame. No ordered "
        "window ever sees a data-sized frame.",
)
def agg_quantile_sketch_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    ).persist()  # two passes by design: sketch build, then rank audit
    mm = v.agg(
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).withColumn("binw", F.expr("(mx - mn) div 128 + 1"))
    h = (
        v.crossJoin(F.broadcast(mm))
        .groupBy(F.expr("(cents - mn) div binw").alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # frame: <= 128 occupied sketch bins
    cum = h.select("bin", "c", F.sum("c").over(wcum).alias("cumc"))
    qs = F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("q")
    tgt = (
        cum.crossJoin(F.broadcast(mm))
        .select("bin", "c", "cumc", "mn", "binw", "n", qs)
        .withColumn("k", F.expr("(q * n + 99) div 100"))
        .where(
            (F.col("cumc") >= F.col("k"))
            & (F.col("cumc") - F.col("c") < F.col("k"))
        )
        .withColumn(
            "est",
            F.expr(
                "LEAST(mn + bin * binw"
                " + ((k - (cumc - c)) * binw) div c,"
                " mn + (bin + 1) * binw - 1)"
            ),
        )
        .select("q", "k", "n", "c", "est")
    )
    piv = tgt.agg(
        F.max(F.when(F.col("q") == 50, F.col("est"))).alias("e50"),
        F.max(F.when(F.col("q") == 90, F.col("est"))).alias("e90"),
        F.max(F.when(F.col("q") == 99, F.col("est"))).alias("e99"),
    )
    rk = v.crossJoin(F.broadcast(piv)).agg(
        F.sum(F.expr("CASE WHEN cents <= e50 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("r50"),
        F.sum(F.expr("CASE WHEN cents <= e90 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("r90"),
        F.sum(F.expr("CASE WHEN cents <= e99 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("r99"),
    )
    return (
        tgt.crossJoin(F.broadcast(rk))
        .withColumn(
            "actual_rank",
            F.expr(
                "CASE q WHEN 50 THEN r50 WHEN 90 THEN r90 ELSE r99 END"
            ).cast("long"),
        )
        .select(
            F.col("q").cast("long").alias("q"),
            "n",
            F.col("k").cast("long").alias("k_target"),
            F.col("est").cast("long").alias("est_cents"),
            "actual_rank",
            (F.col("actual_rank") - F.col("k"))
            .cast("long")
            .alias("rank_err"),
            F.col("c").cast("long").alias("bin_pop"),
        )
    )


@register(
    "ev_pareto_concentration",
    sql="""
    WITH u AS (SELECT user_id, COUNT(*) AS c FROM events
               GROUP BY user_id),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(c) AS BIGINT) AS total_events,
                 CAST(CEIL(0.1 * COUNT(*)) AS BIGINT) AS k FROM u),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rk
          FROM u)
    SELECT s.n_users, s.k AS k_top, s.total_events,
           CAST(SUM(CASE WHEN r.rk <= s.k THEN r.c ELSE 0 END)
                AS BIGINT) AS top_events,
           CAST(SUM(CASE WHEN r.rk <= s.k THEN r.c ELSE 0 END)
                * 1000000 // s.total_events AS BIGINT) AS share_ppm
    FROM r, s
    GROUP BY s.n_users, s.k, s.total_events
    """,
    doc="Activity concentration — what share of all events the top "
        "10% most-active users produce (the Pareto statistic behind "
        "power-user dashboards and abuse triage). Computed WITHOUT "
        "ranking the user table: per-user counts hash-agg into a "
        "count-of-counts histogram (one row per distinct activity "
        "level — value-domain bounded), the cumulative histogram from "
        "the most-active level down locates the top-decile threshold, "
        "and the top-k event mass is the full levels above the "
        "threshold plus (k - users_above) * threshold_level for the "
        "tied boundary level — exact because tied users are "
        "interchangeable by count. The oracle ranks users directly; "
        "equality proves the histogram shortcut. At 100 TB the only "
        "per-user pass is the first hash agg.",
)
def ev_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    # count-of-counts histogram: one row per distinct activity level
    h = u.groupBy("c").agg(
        F.count(F.lit(1)).alias("nu"), F.sum("c").alias("se")
    )
    wdesc = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # frame: distinct activity levels only
    cum = h.select(
        "c",
        "nu",
        "se",
        F.sum("nu").over(wdesc).alias("cum_u"),
        F.sum("se").over(wdesc).alias("cum_e"),
        F.sum("nu").over(Window.partitionBy()).alias("n_users"),
        F.sum("se").over(Window.partitionBy()).alias("total_events"),
    ).withColumn("k", F.expr("CAST((n_users + 9) div 10 AS BIGINT)"))
    thr = cum.where(
        (F.col("cum_u") >= F.col("k"))
        & (F.col("cum_u") - F.col("nu") < F.col("k"))
    )
    return thr.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("k_top"),
        F.col("total_events").cast("long").alias("total_events"),
        (
            F.col("cum_e") - F.col("se")
            + (F.col("k") - (F.col("cum_u") - F.col("nu"))) * F.col("c")
        ).cast("long").alias("top_events"),
        F.expr(
            "CAST((cum_e - se + (k - (cum_u - nu)) * c) * 1000000"
            " div total_events AS BIGINT)"
        ).alias("share_ppm"),
    )


# cadence profile, shared VERBATIM by the batch entry and its
# streaming exec twin (same single-copy rationale as _SQL_VSHAPE_CENSUS)
_SQL_CADENCE_PROFILE = """
    WITH g AS (SELECT user_id,
                      (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id))
                          // 1000000 AS gap_s
               FROM events),
    m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(gap_s) AS BIGINT) AS s1,
                 CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
          FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
          HAVING COUNT(*) >= 5 AND SUM(gap_s) > 0),
    cv AS (SELECT user_id, n,
                  ROUND((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                        / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)), 6)
                      AS cv2
           FROM m)
    SELECT CASE WHEN cv2 < 0.01 THEN 'metronomic'
                WHEN cv2 < 1.0 THEN 'regular'
                ELSE 'bursty' END AS cadence,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_gaps,
           MIN(cv2) AS min_cv2,
           MAX(cv2) AS max_cv2
    FROM cv GROUP BY cadence
    """


@register(
    "ev_cadence_cv",
    sql=_SQL_CADENCE_PROFILE,
    doc="Inter-event cadence regularity per user — the bot/script "
        "signal behind rate-limit triage: the squared coefficient of "
        "variation of a user's inter-event gaps (integer seconds), "
        "computed from the three mergeable moments (n, sum, "
        "sum-of-squares) so the per-user state is three longs "
        "regardless of event count, then bucketed (metronomic < 0.01, "
        "regular < 1, bursty) and aggregated to a bounded cadence "
        "profile. The moments accumulate as EXACT integers; only the "
        "final per-user scalar (n*s2 - s1^2)/s1^2 is evaluated in "
        "double — a fixed sequence of IEEE ops on identical integers, "
        "so both engines produce the identical rounded value (an "
        "integer-ppm formulation overflows int64 at n*s2*1e6). One "
        "per-user window for the gaps, one hash agg for the moments.",
)
def ev_cadence_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        F.floor((us - F.lag(us).over(w)) / 1_000_000).alias("gap_s"),
    )
    m = (
        g.where(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("gap_s").cast("long").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).cast("long").alias("s2"),
        )
        .where((F.col("n") >= 5) & (F.col("s1") > 0))
    )
    cv = m.select(
        "n",
        F.round(
            (
                F.col("n").cast("double") * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double")
            )
            / (F.col("s1").cast("double") * F.col("s1").cast("double")),
            6,
        ).alias("cv2"),
    )
    cadence = (
        F.when(F.col("cv2") < 0.01, "metronomic")
        .when(F.col("cv2") < 1.0, "regular")
        .otherwise("bursty")
    )
    return (
        cv.groupBy(cadence.alias("cadence"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n").cast("long").alias("n_gaps"),
            F.min("cv2").alias("min_cv2"),
            F.max("cv2").alias("max_cv2"),
        )
    )


# V-shape pattern census, shared VERBATIM by the batch entry and its
# streaming exec twin — one copy so an oracle fix can never gate one
# of the pair against a stale formulation (the sessionize-tiebreak
# lesson: three hand-copies each needed the same fix)
_SQL_VSHAPE_CENSUS = """
    WITH s AS (SELECT user_id, event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents,
                      LAG(CAST(ROUND(value * 100) AS BIGINT), 1) OVER (
                          PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS p1,
                      LAG(CAST(ROUND(value * 100) AS BIGINT), 2) OVER (
                          PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS p2
               FROM events),
    v AS (SELECT user_id, event_type,
                 CASE WHEN p2 > p1 AND p1 < cents THEN 1 ELSE 0 END AS hit
          FROM s WHERE p2 IS NOT NULL),
    pu AS (SELECT event_type, user_id, CAST(SUM(hit) AS BIGINT) AS nv
           FROM v GROUP BY event_type, user_id)
    SELECT event_type,
           CAST(SUM(nv) AS BIGINT) AS n_vshapes,
           CAST(SUM(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_users_with_pattern,
           CAST(MAX(nv) AS BIGINT) AS max_per_user
    FROM pu GROUP BY event_type
    """


@register(
    "ev_pattern_vshape",
    sql=_SQL_VSHAPE_CENSUS,
    doc="Row-pattern matching (the MATCH_RECOGNIZE family, which "
        "Spark lacks natively) compiled to windows: a V-shape "
        "(down-then-up) in each user's per-type value series — two "
        "LAGs over the (user, type) ordered stream, a three-point "
        "predicate, then two hash aggs for the per-type pattern "
        "census. The window frame is one user's one-type stream "
        "(the same per-user key every sessionize plan shuffles on); "
        "pattern evaluation itself is stateless row logic, so the "
        "whole match pipeline is one shuffle regardless of pattern "
        "length — the standard relational compilation of sequence "
        "patterns. Tiebreak (ts, event_id) everywhere.",
)
def ev_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        cents.alias("cents"),
        F.lag(cents, 1).over(w).alias("p1"),
        F.lag(cents, 2).over(w).alias("p2"),
    )
    v = s.where(F.col("p2").isNotNull()).select(
        "user_id",
        "event_type",
        F.when(
            (F.col("p2") > F.col("p1")) & (F.col("p1") < F.col("cents")), 1
        )
        .otherwise(0)
        .alias("hit"),
    )
    pu = v.groupBy("event_type", "user_id").agg(
        F.sum("hit").cast("long").alias("nv")
    )
    return pu.groupBy("event_type").agg(
        F.sum("nv").cast("long").alias("n_vshapes"),
        F.sum(F.when(F.col("nv") > 0, 1).otherwise(0)).cast("long").alias(
            "n_users_with_pattern"
        ),
        F.max("nv").cast("long").alias("max_per_user"),
    )


@register(
    "stream_pattern_exec",
    sql=_SQL_VSHAPE_CENSUS,
    doc="Streaming CEP / row-pattern matching EXECUTED as a query "
        "(SURVEY §2.12 + the ev_pattern_vshape batch twin): the "
        "V-shape detector runs as a custom stateful operator "
        "(applyInPandasWithState, four longs of state per "
        "(user, type) key — pattern length bounds state, not stream "
        "length) over the 4-slice time-ordered replay in update "
        "mode; the final state per key is recovered from the memory "
        "sink via max_by on the strictly-increasing n_seen sequence, "
        "keys with fewer than 3 events are dropped (they have no "
        "3-point window in the batch formulation), and the per-type "
        "pattern census must hash-match the batch LAG-window oracle "
        "exactly — proving the incremental fold across micro-batch "
        "boundaries equals the ordered batch computation.",
)
def stream_pattern_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_pattern_vshapes,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"vp_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_pattern_vshapes(spark, f"{out}/part*"),
            sink,
            output_mode="update",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(
        f"""
        WITH latest AS (
            SELECT user_id, event_type,
                   MAX(n_seen) AS n_seen,
                   max_by(n_vshapes, n_seen) AS nv
            FROM {sink} GROUP BY user_id, event_type)
        SELECT event_type,
               CAST(SUM(nv) AS BIGINT) AS n_vshapes,
               CAST(SUM(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_users_with_pattern,
               CAST(MAX(nv) AS BIGINT) AS max_per_user
        FROM latest WHERE n_seen >= 3 GROUP BY event_type
        """
    )


@register(
    "ev_survival_table",
    sql="""
    WITH su AS (SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    pu AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
           WHERE event_type = 'purchase' GROUP BY user_id),
    horizon AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
    subj AS (
        SELECT su.user_id,
               CASE WHEN pu.t1 IS NOT NULL AND pu.t1 >= su.t0
                    THEN (pu.t1 - su.t0) // 86400000000 END AS conv_d,
               (horizon.tmax - su.t0) // 86400000000 AS cens_d
        FROM su LEFT JOIN pu USING (user_id) CROSS JOIN horizon),
    ev AS (SELECT COALESCE(conv_d, cens_d) AS d,
                  CASE WHEN conv_d IS NOT NULL THEN 1 ELSE 0 END AS conv
           FROM subj),
    hist AS (SELECT d, CAST(SUM(conv) AS BIGINT) AS n_conv,
                    CAST(SUM(1 - conv) AS BIGINT) AS n_cens
             FROM ev GROUP BY d),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev)
    SELECT hist.d AS day_offset,
           CAST(tot.n - COALESCE(SUM(hist.n_conv + hist.n_cens) OVER (
               ORDER BY hist.d ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk,
           hist.n_conv AS n_converted,
           hist.n_cens AS n_censored
    FROM hist CROSS JOIN tot
    """,
    doc="Kaplan-Meier survival table for signup-to-purchase — the "
        "censoring-aware time-to-event analysis ev_time_to_convert's "
        "converters-only median cannot express (never-converting "
        "users are CENSORED at the observation horizon, not dropped): "
        "per day offset, the at-risk count, conversions, and "
        "censorings — the exact integer ingredients of the KM "
        "estimator, emitted as a table so the survival curve's "
        "product terms (1 - d_i/n_i) stay exact rationals instead of "
        "an order-dependent float product. Shape: two filtered "
        "per-user min-aggs, one single-row horizon broadcast, one "
        "day-offset hash agg, and the at-risk cumulative window runs "
        "over the DAY table (calendar-bounded), never users. The "
        "oracle states the same algebra directly.",
)
def ev_survival_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t0"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    horizon = ev.agg(F.max(us).alias("tmax"))
    subj = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0")),
                F.expr("(t1 - t0) div 86400000000"),
            ).alias("conv_d"),
            F.expr("(tmax - t0) div 86400000000").alias("cens_d"),
        )
    )
    evd = subj.select(
        F.coalesce("conv_d", "cens_d").alias("d"),
        F.when(F.col("conv_d").isNotNull(), 1).otherwise(0).alias("conv"),
    )
    hist = evd.groupBy("d").agg(
        F.sum("conv").cast("long").alias("n_conv"),
        F.sum(1 - F.col("conv")).cast("long").alias("n_cens"),
    )
    tot = evd.agg(F.count(F.lit(1)).cast("long").alias("n"))
    wprev = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, -1
    )  # frame: one row per day offset (calendar-bounded)
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("day_offset"),
            (
                F.col("n")
                - F.coalesce(
                    F.sum(F.col("n_conv") + F.col("n_cens")).over(wprev),
                    F.lit(0),
                )
            ).cast("long").alias("n_at_risk"),
            F.col("n_conv").alias("n_converted"),
            F.col("n_cens").alias("n_censored"),
        )
    )


@register(
    "stream_cadence_exec",
    sql=_SQL_CADENCE_PROFILE,
    doc="Streaming bot-cadence detection EXECUTED as a query (the "
        "stateful twin of ev_cadence_cv): per-user gap moments "
        "accumulate in four longs of state (stream_cadence_moments, "
        "applyInPandasWithState) over the time-ordered replay; the "
        "final state per user is recovered via max_by on the "
        "strictly-increasing n_seen sequence, the cv^2 scalar is "
        "evaluated in the same fixed IEEE-double sequence as the "
        "batch plan, and the bucketed cadence profile must "
        "hash-match the batch LAG-window oracle — proving the "
        "incremental integer fold equals the ordered batch "
        "computation across micro-batch boundaries.",
)
def stream_cadence_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_cadence_moments,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"cad_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_cadence_moments(spark, f"{out}/part*"),
            sink,
            output_mode="update",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(
        f"""
        WITH latest AS (
            SELECT user_id,
                   max_by(n_gaps, n_seen) AS n,
                   max_by(s1, n_seen) AS s1,
                   max_by(s2, n_seen) AS s2
            FROM {sink} GROUP BY user_id),
        m AS (SELECT * FROM latest WHERE n >= 5 AND s1 > 0),
        cv AS (SELECT n,
                      ROUND((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                            / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)),
                            6) AS cv2
               FROM m)
        SELECT CASE WHEN cv2 < 0.01 THEN 'metronomic'
                    WHEN cv2 < 1.0 THEN 'regular'
                    ELSE 'bursty' END AS cadence,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(n) AS BIGINT) AS n_gaps,
               MIN(cv2) AS min_cv2,
               MAX(cv2) AS max_cv2
        FROM cv GROUP BY cadence
        """
    )


@register(
    "ev_streaks",
    sql="""
    WITH d AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day
               FROM events),
    r AS (SELECT user_id, day,
                 day - ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY day) AS grp
          FROM d),
    s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
          FROM r GROUP BY user_id, grp),
    m AS (SELECT user_id, CAST(MAX(len) AS BIGINT) AS best
          FROM s GROUP BY user_id)
    SELECT best AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM m GROUP BY best
    """,
    doc="Longest consecutive-day activity streak per user, rolled to "
        "a streak-length histogram — the engagement metric behind "
        "every 'N-day streak' product surface, and the day-grain "
        "sibling of second-grain sessionization: the classic "
        "day - row_number() gaps-and-islands trick turns consecutive "
        "days into a constant group key with ONE per-user window over "
        "the user's DISTINCT-day set (bounded by the calendar, not "
        "event volume — the distinct collapses first), then two hash "
        "aggs. Output is one row per distinct streak length.",
)
def ev_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    d = ev.select(
        "user_id",
        F.floor(us / F.lit(86_400_000_000)).cast("long").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.select(
        "user_id",
        "day",
        (F.col("day") - F.row_number().over(w)).alias("grp"),
    )
    s = r.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    m = s.groupBy("user_id").agg(F.max("len").cast("long").alias("best"))
    return m.groupBy(F.col("best").alias("streak_days")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# events row-set checksum, shared by the batch surface and the
# streaming exec twin (single-copy, the _SQL_VSHAPE_CENSUS rationale)
_SQL_EVENTS_CHECKSUM = """
    WITH h AS (
        SELECT event_type,
               CAST(CAST('0x' || substr(md5(
                   CAST(event_id AS VARCHAR) || '|'
                   || CAST(user_id AS VARCHAR) || '|'
                   || event_type || '|'
                   || CAST(CAST(ROUND(value * 100) AS BIGINT)
                           AS VARCHAR)
               ), 1, 15) AS BIGINT) AS BIGINT) AS hv
        FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(hv) AS BIGINT) AS xor_check,
           CAST(SUM(hv % 1000003) AS BIGINT) AS sum_check
    FROM h GROUP BY event_type
    """


def _events_checksum_cols():
    # F.concat (NOT concat_ws): a NULL field must NULL the whole row
    # hash exactly like the oracle's '||', so NULL-bearing rows drop
    # out of both engines' accumulators identically instead of Spark
    # silently skipping the field and hashing a shorter rendering
    row = F.concat(
        F.col("event_id").cast("string"),
        F.lit("|"),
        F.col("user_id").cast("string"),
        F.lit("|"),
        F.col("event_type"),
        F.lit("|"),
        F.round(F.col("value") * 100).cast("long").cast("string"),
    )
    return F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")


@register(
    "stream_checksum_exec",
    sql=_SQL_EVENTS_CHECKSUM,
    doc="Continuous ingest-integrity checksum EXECUTED as a streaming "
        "query: the x_table_checksum accumulators (XOR + modular sum "
        "over a cross-engine md5 row hash) are COMMUTATIVE and "
        "ASSOCIATIVE, so they run as a plain streaming aggregate in "
        "complete mode — no watermark, no custom state, O(groups) "
        "state total — over the 4-slice replay, and the final sink "
        "table must hash-match the batch oracle over the same rows. "
        "This is how a 100-TB continuous pipeline proves the landed "
        "row set equals the source without ever sorting either side: "
        "the checksum table is group-domain sized and the stream "
        "maintains it incrementally for free.",
)
def stream_checksum_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        run_to_memory,
        stream_checksum_agg,
    )

    out = _replay_fixture(spark, sf_dir)
    sink = f"ck_sink_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(
            stream_checksum_agg(
                spark, f"{out}/part*", _events_checksum_cols()
            ),
            sink,
            output_mode="complete",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)


_HOLT_SERIES_CTES = """
    d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
    b AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
          FROM d GROUP BY 1),
    grid AS (
        SELECT event_type, d0,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM b),
    ser AS (
        SELECT g.event_type,
               CAST(date_diff('day', g.d0, g.day) AS BIGINT) AS idx,
               CAST(COALESCE(d.n, 0) AS BIGINT) AS y
        FROM grid g
        LEFT JOIN d ON g.event_type = d.event_type AND g.day = d.day)
"""  #: shared gap-filled per-type daily series (forecaster + backtest
#: twins read ONE definition, so a gap-fill semantics change cannot
#: decouple the eval from the model it audits)


def _holt_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-type daily series (event_type, idx, y) — the
    Spark half of _HOLT_SERIES_CTES, shared by ev_forecast_holt and
    ev_forecast_backtest. NULL series keys are dropped explicitly
    (shared with the oracle): groupBy would keep a NULL group here,
    but the grid equi-join below is not null-safe and would zero its
    counts."""
    ev = table(spark, sf_dir, "events")
    d = ev.where(F.col("event_type").isNotNull()).groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    bounds = d.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "event_type",
        "d0",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    return grid.join(d, ["event_type", "day"], "left").select(
        "event_type",
        F.datediff("day", "d0").cast("long").alias("idx"),
        F.coalesce("n", F.lit(0)).cast("long").alias("y"),
    )


def _holt_fold(series: Column) -> Column:
    """JVM higher-order fold of the exact-integer Holt recursion
    (micro-unit level/trend state, dyadic alpha=1/4 beta=1/8, the
    plans.tpch._SDIV truncation convention realized as a shift on the
    non-negative magnitude — exact at any int64 because the dyadic
    denominators are powers of two). `series` is a sorted
    array<struct<idx,y>>; returns struct<l, b, seen>."""
    zero = F.lit(0).cast("long")

    def _sdiv_shift(num, bits):
        return F.when(num >= 0, F.shiftright(num, bits)).otherwise(
            -F.shiftright(-num, bits)
        )

    def _step(acc, e):
        y6 = e["y"] * F.lit(1000000).cast("long")
        num_l = y6 + F.lit(3).cast("long") * (acc["l"] + acc["b"])
        nl = _sdiv_shift(num_l, 2).cast("long")
        num_b = (nl - acc["l"]) + F.lit(7).cast("long") * acc["b"]
        nb = _sdiv_shift(num_b, 3).cast("long")
        first = F.struct(
            y6.alias("l"), zero.alias("b"),
            F.lit(1).cast("long").alias("seen"),
        )
        rest = F.struct(
            nl.alias("l"), nb.alias("b"),
            (acc["seen"] + F.lit(1).cast("long")).alias("seen"),
        )
        return F.when(acc["seen"] == zero, first).otherwise(rest)

    init = F.struct(zero.alias("l"), zero.alias("b"), zero.alias("seen"))
    return F.aggregate(series, init, _step)


def _holt_sql() -> str:
    """WITH RECURSIVE twin of ev_forecast_holt: the identical
    integer Holt recursion (micro-unit state, dyadic alpha=1/4 and
    beta=1/8, sign-aware truncating divisions via the shared
    _SDIV_DUCK helper). NULL event_type is filtered explicitly in
    both engines: Spark's groupBy would keep a NULL group whose
    non-null-safe grid join zeroes it, while SQL's equi-joins drop
    it — filtering pins one shared semantic."""
    from mwa_uvdata_pipeline_spark.plans.tpch import _SDIV_DUCK

    nl = _SDIV_DUCK("(s.y * 1000000 + 3 * (r.l + r.b))", "4")
    nb = _SDIV_DUCK(f"(({nl}) - r.l + 7 * r.b)", "8")
    return f"""
    WITH RECURSIVE {_HOLT_SERIES_CTES},
    rec AS (
        SELECT event_type, idx, y * 1000000 AS l, CAST(0 AS BIGINT) AS b
        FROM ser WHERE idx = 0
        UNION ALL
        SELECT s.event_type, s.idx,
               CAST({nl} AS BIGINT) AS l,
               CAST({nb} AS BIGINT) AS b
        FROM rec r
        JOIN ser s ON s.event_type = r.event_type AND s.idx = r.idx + 1),
    fin AS (
        SELECT r.event_type, r.l, r.b, r.idx + 1 AS n_days
        FROM rec r
        JOIN (SELECT event_type, MAX(idx) AS mi FROM rec GROUP BY 1) m
          ON r.event_type = m.event_type AND r.idx = m.mi)
    SELECT f.event_type,
           CAST(h.h AS BIGINT) AS horizon,
           CAST(f.l + h.h * f.b AS BIGINT) AS yhat_micro,
           f.l AS level_micro,
           f.b AS trend_micro,
           CAST(f.n_days AS BIGINT) AS n_days
    FROM fin f, UNNEST(range(1, 8)) h(h)
    """


@register(
    "ev_forecast_holt",
    bench=True,
    sql=_holt_sql(),
    doc="Holt linear-trend forecasting over per-type daily activity "
        "— the capacity-planning / ingest-rate-projection step of a "
        "pipeline dashboard: counts are gap-filled onto each type's "
        "calendar grid (zero-activity days must decay the trend), "
        "and the two-state Holt recursion (level + trend) runs in "
        "exact integer micro-units with dyadic smoothing (alpha=1/4, "
        "beta=1/8), so every update is one arithmetic-shift division "
        "and the state trajectory is bit-identical in both engines — "
        "the oracle walks the same recursion as a WITH RECURSIVE. "
        "Emits a 7-day-ahead linear forecast per type. Scale shape: "
        "the ONE full-data pass is the (type, day) hash aggregate "
        "(map-side combined, shuffle carries the calendar grid, not "
        "events); the sequential fold is over a series whose length "
        "grows with CALENDAR TIME, not corpus size, and runs as a "
        "JVM higher-order aggregate over the per-type sorted array "
        "(O(days) per type, no Python). The forecast explode is "
        "7 rows per type.",
)
def ev_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ser = _holt_daily_series(spark, sf_dir)
    arr = ser.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("idx", "y"))).alias("s")
    )
    st = arr.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        _holt_fold(F.col("s")).alias("st"),
    )
    return st.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"),
        F.col("st.l").alias("level_micro"),
        F.col("st.b").alias("trend_micro"),
        "n_days",
    ).select(
        "event_type",
        F.col("h").cast("long").alias("horizon"),
        "level_micro",
        "trend_micro",
        "n_days",
    ).select(
        "event_type",
        "horizon",
        (F.col("level_micro") + F.col("horizon") * F.col("trend_micro"))
        .cast("long")
        .alias("yhat_micro"),
        "level_micro",
        "trend_micro",
        "n_days",
    )


def _holt_backtest_sql() -> str:
    """WITH RECURSIVE twin of ev_forecast_backtest: the identical
    Holt recursion run ONLY over each type's train prefix (all but
    the last 7 calendar days), then the 7 forecasts joined with the
    held-out actuals and the naive last-train-value baseline."""
    from mwa_uvdata_pipeline_spark.plans.tpch import _SDIV_DUCK

    nl = _SDIV_DUCK("(s.y * 1000000 + 3 * (r.l + r.b))", "4")
    nb = _SDIV_DUCK(f"(({nl}) - r.l + 7 * r.b)", "8")
    return f"""
    WITH RECURSIVE {_HOLT_SERIES_CTES},
    mx AS (SELECT event_type, MAX(idx) AS m FROM ser GROUP BY 1
           HAVING MAX(idx) >= 7),
    tr AS (SELECT s.event_type, s.idx, s.y
           FROM ser s JOIN mx ON s.event_type = mx.event_type
           WHERE s.idx <= mx.m - 7),
    rec AS (
        SELECT event_type, idx, y * 1000000 AS l, CAST(0 AS BIGINT) AS b
        FROM tr WHERE idx = 0
        UNION ALL
        SELECT s.event_type, s.idx,
               CAST({nl} AS BIGINT) AS l,
               CAST({nb} AS BIGINT) AS b
        FROM rec r
        JOIN tr s ON s.event_type = r.event_type AND s.idx = r.idx + 1),
    fin AS (
        SELECT r.event_type, r.l, r.b
        FROM rec r JOIN mx ON r.event_type = mx.event_type
        WHERE r.idx = mx.m - 7),
    lastv AS (
        SELECT s.event_type, s.y AS ylast
        FROM ser s JOIN mx ON s.event_type = mx.event_type
        WHERE s.idx = mx.m - 7),
    test AS (
        SELECT s.event_type, s.idx - (mx.m - 7) AS h, s.y
        FROM ser s JOIN mx ON s.event_type = mx.event_type
        WHERE s.idx > mx.m - 7)
    SELECT f.event_type,
           CAST(mx.m - 6 AS BIGINT) AS n_train_days,
           CAST(SUM(ABS(f.l + t.h * f.b - t.y * 1000000)) AS BIGINT)
               AS holt_mae_sum_micro,
           CAST(SUM(ABS(lv.ylast * 1000000 - t.y * 1000000)) AS BIGINT)
               AS naive_mae_sum_micro,
           CAST(SUM(f.l + t.h * f.b - t.y * 1000000) AS BIGINT)
               AS holt_bias_sum_micro
    FROM fin f
    JOIN mx ON f.event_type = mx.event_type
    JOIN lastv lv ON f.event_type = lv.event_type
    JOIN test t ON f.event_type = t.event_type
    GROUP BY f.event_type, mx.m
    """


@register(
    "ev_forecast_backtest",
    sql=_holt_backtest_sql(),
    doc="Holdout backtest of the Holt forecaster — the eval twin "
        "every registered model gets (classifier: "
        "pipeline_train_eval; retriever: sim_recall_at_k; forecaster: "
        "this): each type's gap-filled daily series is split into a "
        "train prefix (all but the last 7 calendar days) and a 7-day "
        "holdout, the SAME exact-integer Holt fold (_holt_fold) runs "
        "over the prefix only, and the 7 linear forecasts are scored "
        "against the held-out actuals — MAE and signed bias in exact "
        "integer micro-units (sums, so no division convention enters) "
        "— alongside the naive last-train-value baseline, the "
        "standard forecast-skill reference: a Holt MAE above the "
        "naive MAE means the trend component is hurting and the "
        "dashboard should not trust it. Types with fewer than 8 "
        "calendar days drop out of both engines (no 7-day holdout "
        "exists). Scale shape: identical to ev_forecast_holt — one "
        "map-side-combined (type, day) aggregate, per-type O(days) "
        "array fold, everything after is per-type constant work; the "
        "slice/test arithmetic is JVM array expressions, no explode, "
        "no window, no Python.",
)
def ev_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ser = _holt_daily_series(spark, sf_dir)
    arr = (
        ser.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("idx", "y"))).alias("s"))
        .where(F.size("s") >= 8)
    )
    sz = F.size("s")
    split = arr.select(
        "event_type",
        (sz - 7).cast("long").alias("n_train_days"),
        _holt_fold(F.slice(F.col("s"), F.lit(1), sz - 7)).alias("st"),
        F.element_at("s", sz - 7)["y"].alias("ylast"),
        F.slice(F.col("s"), sz - 6, F.lit(7)).alias("test"),
    )
    M = F.lit(1000000).cast("long")
    zero = F.lit(0).cast("long")

    def _sum(expr_fn):
        # fold the 7-element holdout with a (value, h) transform; h is
        # the 1-based horizon recovered from the array position
        return F.aggregate(
            F.zip_with(
                F.col("test"),
                F.sequence(F.lit(1), F.lit(7)),
                lambda e, h: expr_fn(e, h.cast("long")),
            ),
            zero,
            lambda acc, v: acc + v,
        )

    holt_err = lambda e, h: F.abs(
        F.col("st.l") + h * F.col("st.b") - e["y"] * M
    )
    naive_err = lambda e, h: F.abs(F.col("ylast") * M - e["y"] * M)
    bias = lambda e, h: F.col("st.l") + h * F.col("st.b") - e["y"] * M
    return split.select(
        "event_type",
        "n_train_days",
        _sum(holt_err).cast("long").alias("holt_mae_sum_micro"),
        _sum(naive_err).cast("long").alias("naive_mae_sum_micro"),
        _sum(bias).cast("long").alias("holt_bias_sum_micro"),
    )


def _cusum_sql() -> str:
    """WITH RECURSIVE twin of ev_changepoint_cusum: the identical
    two-sided integer CUSUM recursion (micro-unit deviations from the
    per-type series mean, slack k = mu/4, decision interval h = 4*mu,
    truncating divisions via the shared _SDIV_DUCK). Shares the Holt
    entry's gap-filled calendar grid so zero-activity days pull the
    negative CUSUM exactly as in the Spark fold."""
    from mwa_uvdata_pipeline_spark.plans.tpch import _SDIV_DUCK

    mu = _SDIV_DUCK("SUM(y) * 1000000", "COUNT(*)")
    dev = "(s.y * 1000000 - m.mu)"
    sp = f"GREATEST(0, r.sp + ({dev}) - m.k)"
    sn = f"GREATEST(0, r.sn - ({dev}) - m.k)"
    alarm = f"(({sp}) > m.h OR ({sn}) > m.h)"
    return f"""
    WITH RECURSIVE {_HOLT_SERIES_CTES},
    m0 AS (SELECT event_type,
                  CAST(COUNT(*) AS BIGINT) AS n_days,
                  CAST({mu} AS BIGINT) AS mu
           FROM ser GROUP BY 1),
    m AS (SELECT event_type, n_days, mu,
                 CAST(mu // 4 AS BIGINT) AS k,
                 CAST(4 * mu AS BIGINT) AS h
          FROM m0),
    rec AS (
        SELECT event_type, CAST(-1 AS BIGINT) AS idx,
               CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
               CAST(0 AS BIGINT) AS maxp, CAST(0 AS BIGINT) AS maxn,
               CAST(-1 AS BIGINT) AS first_alarm,
               CAST(0 AS BIGINT) AS n_alarms
        FROM m
        UNION ALL
        SELECT s.event_type, s.idx,
               CAST({sp} AS BIGINT) AS sp,
               CAST({sn} AS BIGINT) AS sn,
               CAST(GREATEST(r.maxp, {sp}) AS BIGINT) AS maxp,
               CAST(GREATEST(r.maxn, {sn}) AS BIGINT) AS maxn,
               CAST(CASE WHEN r.first_alarm >= 0 THEN r.first_alarm
                         WHEN {alarm} THEN s.idx
                         ELSE -1 END AS BIGINT) AS first_alarm,
               CAST(r.n_alarms + CASE WHEN {alarm} THEN 1 ELSE 0 END
                    AS BIGINT) AS n_alarms
        FROM rec r
        JOIN ser s ON s.event_type = r.event_type AND s.idx = r.idx + 1
        JOIN m ON m.event_type = r.event_type),
    fin AS (
        SELECT r.*
        FROM rec r
        JOIN (SELECT event_type, MAX(idx) AS mi FROM rec GROUP BY 1) x
          ON r.event_type = x.event_type AND r.idx = x.mi)
    SELECT f.event_type,
           m.n_days,
           m.mu AS mean_micro,
           f.maxp AS max_cusum_pos,
           f.maxn AS max_cusum_neg,
           f.first_alarm AS first_alarm_idx,
           f.n_alarms AS n_alarm_days
    FROM fin f JOIN m ON f.event_type = m.event_type
    """


@register(
    "ev_changepoint_cusum",
    sql=_cusum_sql(),
    doc="Two-sided CUSUM changepoint detection over per-type daily "
        "activity — the drift monitor a 100-TB ingest pipeline runs "
        "on its own arrival rates (did a source silently double or "
        "go dark mid-month?): daily counts are gap-filled onto each "
        "type's calendar grid (a dark day must pull the negative "
        "CUSUM), deviations from the per-type series mean accumulate "
        "in exact integer micro-units with slack k = mu/4, and a "
        "decision interval h = 4*mu flags alarm days; the fold "
        "tracks both one-sided statistics, their maxima, the first "
        "alarm day and the alarm-day count. Every update is integer "
        "add/compare, so the state trajectory is bit-identical to "
        "the oracle's WITH RECURSIVE walk. Scale shape: the ONE "
        "full-data pass is the (type, day) hash aggregate (map-side "
        "combined); the sequential fold runs as a JVM higher-order "
        "aggregate over the per-type sorted day array, O(days) per "
        "type — series length grows with CALENDAR TIME, not corpus "
        "size, exactly like ev_forecast_holt.",
)
def ev_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ser = _holt_daily_series(spark, sf_dir)
    agg = ser.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("idx", "y"))).alias("s"),
        F.sum("y").cast("long").alias("sum_y"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    base = (
        agg.withColumn(
            "mu", F.expr("CAST(sum_y * 1000000 div n_days AS BIGINT)")
        )
        .withColumn("k", F.expr("CAST(mu div 4 AS BIGINT)"))
        .withColumn("h", (F.lit(4).cast("long") * F.col("mu")))
    )

    zero = F.lit(0).cast("long")
    neg1 = F.lit(-1).cast("long")

    def _step(acc, e):
        dev = e["y"] * F.lit(1000000).cast("long") - F.col("mu")
        sp = F.greatest(zero, acc["sp"] + dev - F.col("k"))
        sn = F.greatest(zero, acc["sn"] - dev - F.col("k"))
        alarm = (sp > F.col("h")) | (sn > F.col("h"))
        return F.struct(
            sp.alias("sp"),
            sn.alias("sn"),
            F.greatest(acc["maxp"], sp).alias("maxp"),
            F.greatest(acc["maxn"], sn).alias("maxn"),
            F.when(acc["first"] >= 0, acc["first"])
            .when(alarm, e["idx"])
            .otherwise(neg1)
            .cast("long")
            .alias("first"),
            (
                acc["n_al"]
                + F.when(alarm, F.lit(1)).otherwise(F.lit(0)).cast("long")
            ).alias("n_al"),
        )

    init = F.struct(
        zero.alias("sp"),
        zero.alias("sn"),
        zero.alias("maxp"),
        zero.alias("maxn"),
        neg1.alias("first"),
        zero.alias("n_al"),
    )
    st = base.select(
        "event_type",
        "n_days",
        F.col("mu").alias("mean_micro"),
        F.aggregate("s", init, _step).alias("st"),
    )
    return st.select(
        "event_type",
        "n_days",
        "mean_micro",
        F.col("st.maxp").alias("max_cusum_pos"),
        F.col("st.maxn").alias("max_cusum_neg"),
        F.col("st.first").alias("first_alarm_idx"),
        F.col("st.n_al").alias("n_alarm_days"),
    )
