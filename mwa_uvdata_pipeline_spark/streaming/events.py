"""Streaming event pipelines (SURVEY.md §2.12; FIXTURES.md §B5).

File-source replay: the batch events table split into N sequential
files fed through ``readStream`` with ``maxFilesPerTrigger=1`` +
``Trigger.AvailableNow`` so the watermark advances between
micro-batches exactly as it would against a live source.

Scale posture: streaming state (window aggs, dedup keys) is bounded by
the watermark horizon; keys partition the state store, so a 1000-node
cluster shards state by groupBy key with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _await_drained(q, timeout: int) -> None:
    """awaitTermination returns False on timeout with the query STILL
    RUNNING — callers would then read a partially-written sink as if
    complete. Fail loudly instead (the probes use 300s for the same
    drains; 120s is tight on a loaded host)."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming drain exceeded {timeout}s; sink is incomplete"
        )


def replay_events(events: DataFrame, out_dir: str, n_files: int = 10) -> list[str]:
    """Split a batch events frame into ``n_files`` sequential parquet
    files by time order (FIXTURES.md §B5 replay layout). Driver-side
    loop over file boundaries only — each slice is written by executors.
    """
    import time

    bounds = events.selectExpr(
        f"percentile_approx(ts, array({','.join(str((i + 1) / n_files) for i in range(n_files - 1))}), 10000) AS b"
    ).first()["b"]
    lo = None
    paths = []
    base = time.time()
    for i in range(n_files):
        hi = bounds[i] if i < n_files - 1 else None
        sl = events
        if lo is not None:
            sl = sl.where(F.col("ts") > F.lit(lo))
        if hi is not None:
            sl = sl.where(F.col("ts") <= F.lit(hi))
        path = f"{out_dir}/part{i:03d}"
        sl.coalesce(1).write.mode("overwrite").parquet(path)
        # Explicit strictly-increasing mtimes: the file source orders
        # files by modification time, and a coarse-mtime filesystem can
        # otherwise tie (or invert) slices written in the same second.
        _set_tree_mtime(path, base + i)
        paths.append(path)
        lo = hi
    return paths


def _set_tree_mtime(path: str, when: float) -> None:
    """os.utime every file under ``path`` (and the dir itself)."""
    import os

    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (when, when))
        os.utime(root, (when, when))


def _max_tree_mtime(out_dir: str) -> float:
    import os

    latest = 0.0
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            latest = max(latest, os.path.getmtime(os.path.join(root, f)))
    return latest


def append_watermark_sentinels(
    events: DataFrame, out_dir: str, advance_s: int
) -> None:
    """Write two single-event files for a sentinel user (-1) whose
    timestamps sit ``advance_s`` (and +1h) past the real stream's end.
    Processing them advances the event-time watermark beyond every real
    key's last-event + TTL, so EventTimeTimeout state flushes
    DETERMINISTICALLY before the AvailableNow drain. TWO files, not
    one: timers armed against a watermark fire in the batch AFTER that
    watermark commits, so the second sentinel's batch is what flushes
    keys whose timers needed the first sentinel's watermark (measured:
    batch-by-batch numRowsTotal goes 150 -> 66 -> 1 — the trailing 1 is
    the sentinel's own never-closing session, which sits within one TTL
    gap of its sibling and is filtered by user_id >= 0 downstream).

    Sentinel files get EXPLICIT mtimes strictly later than every real
    replay file (os.utime past the dir's max mtime): the file source
    orders by modification time, and on a coarse-mtime filesystem a
    sentinel that sorted before the last real slice would advance the
    watermark early and stateful operators would silently DROP that
    slice's events."""
    spark = events.sparkSession
    max_ts = events.agg(F.max("ts")).first()[0]  # bounded: one scalar
    after_real = _max_tree_mtime(out_dir)
    for i, off in enumerate((advance_s, advance_s + 3600)):
        row = [(
            -1 - i,
            max_ts + __import__("datetime").timedelta(seconds=off),
            -1,
            "sentinel",
            0.0,
            "{}",
        )]
        path = f"{out_dir}/part9{i:02d}"  # matches the part* glob
        spark.createDataFrame(row, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        _set_tree_mtime(path, after_real + 10.0 * (i + 1))


def _read_stream(spark: SparkSession, src_glob: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )


def stream_value_histogram(spark: SparkSession, src_glob: str) -> DataFrame:
    """Streaming fixed-width value-histogram sketch: quantize each
    event's value to integer cents as it arrives, bucket into
    one-dollar bins, COUNT per bin. Counting is commutative and
    associative, so every trigger folds its batch into the
    value-domain-bounded bin table (state = occupied bins, NOT rows)
    and the final complete-mode state equals the batch histogram
    regardless of file arrival order — the quantile sketch's
    time-mergeability: shards in time (triggers) merge through the
    same algebra agg_hist_merge proves for shards in space
    (executors/days). The fixed ABSOLUTE bin width (vs
    agg_quantile_sketch_error's range-adaptive width) is deliberate:
    a stream cannot two-pass min/max, and a fixed grid is what keeps
    the state mergeable across restarts — the standard production
    trade. Domain assumption, stated: values are non-negative
    amounts (the events fixture's contract), so truncating ``div``
    puts every bin at exactly 100 cents; a signed domain would need
    floor-division binning in BOTH engines (Spark and DuckDB both
    truncate toward zero, so bin 0 would otherwise span -99..+99)."""
    return (
        _read_stream(spark, src_glob)
        .select(F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
        .select(F.expr("cents div 100").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def stream_tumbling_counts(
    spark: SparkSession,
    src_glob: str,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts with late-data drop beyond the watermark."""
    return (
        _read_stream(spark, src_glob)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def stream_sliding_counts(
    spark: SparkSession,
    src_glob: str,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding-window counts (each event lands in window/slide windows);
    state per open window, bounded by the watermark."""
    return (
        _read_stream(spark, src_glob)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


def stream_static_enriched_counts(
    spark: SparkSession, src_glob: str, dim: DataFrame
) -> DataFrame:
    """Stream-static join then aggregate: each micro-batch of the event
    stream is enriched against a STATIC dimension (inner equi-join on
    user_id — stateless, the batch side is re-broadcast per micro-batch
    by the planner) and rolled up per (tier, event_type). Only the
    aggregation holds state, keyed by the bounded tier x type space.
    The 100-TB pattern: dimension lookup inside a stream without
    sending the stream through a stateful join."""
    return (
        _read_stream(spark, src_glob)
        .join(dim, "user_id")
        .groupBy("tier", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
    )


def stream_dedup(
    spark: SparkSession, src_glob: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark
    horizon (dropDuplicates state bounded by watermark)."""
    return (
        _read_stream(spark, src_glob)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def stream_session_windows(
    spark: SparkSession,
    src_glob: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per user with a gap timeout — the native
    session_window operator (batch twin: plans.events.ev_sessionize)."""
    return (
        _read_stream(spark, src_glob)
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_interval_join(
    spark: SparkSession,
    src_glob: str,
    watermark: str = "30 minutes",
    window_s: int = 600,
) -> DataFrame:
    """Stream-stream interval join: each view matched to the purchases
    by the same user in the ``window_s`` seconds that follow it.

    Both sides carry a watermark and the join condition bounds event
    time on both sides, so the state store evicts a buffered view once
    the purchase-side watermark passes ``v_ts + window_s`` — state is
    bounded by (watermark delay + join window), sharded across the
    cluster by the user_id equi-key. The watermark delay exceeds the
    join window, so with in-order replay no qualifying match is
    evicted early and the appended result equals the batch join
    (oracle-gated by plans.events.stream_interval_join_exec).
    """
    views = (
        _read_stream(spark, src_glob)
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        _read_stream(spark, src_glob)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    return views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts "
            f"AND p_ts < v_ts + INTERVAL {window_s} SECONDS"
        ),
        "inner",
    ).select("view_id", "purchase_id")


def stream_user_running_totals(
    spark: SparkSession, src_glob: str
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user event count + value sum across micro-batches. State is one
    small tuple per user, sharded by the groupBy key across the cluster;
    emits the updated total each batch (update mode).

    The value accumulator is INTEGER CENTS, not a float: an exact
    accumulator makes the final state independent of micro-batch
    boundaries and accumulation order, which is what lets
    ``stream_stateful_exec`` gate this operator against a batch SQL
    oracle — and is the right practice for any restart-tolerant
    streaming aggregate."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, sc = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # SQL ROUND: half away from zero, sign-aware (pandas
            # .round() is banker's and would differ on exact .5 cents;
            # floor(x+0.5) alone would mis-round negative halves)
            v = pdf["value"].mul(100)
            sc += int(
                np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
                .astype("int64")
                .sum()
            )
        state.update((n, sc))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [sc]}
        )

    return (
        _read_stream(spark, src_glob)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, sum_cents long",
            stateStructType="n long, sc long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_pattern_vshapes(
    spark: SparkSession, src_glob: str
) -> DataFrame:
    """Streaming row-pattern matching (the CEP / MATCH_RECOGNIZE
    family) via ``applyInPandasWithState``: a V-shape (down-then-up)
    detector over each (user, event_type) value stream. State per key
    is four longs — events seen, the last two cents values, and the
    running V-shape count — so pattern length bounds state, not
    stream length. Each batch's rows are folded in (ts, event_id)
    order; the time-sliced replay delivers batches in event-time
    order (slice boundaries are ``ts <= b`` / ``ts > b``, so tied
    timestamps never straddle a batch), which makes the incremental
    fold equal the batch-ordered fold exactly. Values accumulate as
    integer cents (the stream_user_running_totals discipline) so the
    fixpoint is micro-batch-boundary independent and the final state
    gates bit-for-bit against the batch twin (ev_pattern_vshape)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, p2, p1, nv = state.get if state.exists else (0, 0, 0, 0)
        # A key's micro-batch may arrive as MULTIPLE Arrow chunks
        # (arrow.maxRecordsPerBatch) in arbitrary shuffle order, so
        # the (ts, event_id) sort must span the whole batch, not each
        # chunk — chunk-local sorting would fold rows out of order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            # SQL ROUND: half away from zero, sign-aware (pandas
            # .round is banker's; plain floor(x+0.5) would round
            # -2.5 to -2 where F.round gives -3); matches
            # CAST(ROUND(value * 100) AS BIGINT) for any sign
            v = pdf["value"].mul(100)
            cents = (
                np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
                .astype("int64")
            )
            for c in cents:
                c = int(c)
                if n >= 2 and p2 > p1 and p1 < c:
                    nv += 1
                n += 1
                p2, p1 = p1, c
        state.update((n, p2, p1, nv))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "n_seen": [n],
                "n_vshapes": [nv],
            }
        )

    return (
        _read_stream(spark, src_glob)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, event_type string, n_seen long, "
                "n_vshapes long"
            ),
            stateStructType="n long, p2 long, p1 long, nv long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_cadence_moments(
    spark: SparkSession, src_glob: str
) -> DataFrame:
    """Streaming inter-event cadence moments per user — the stateful
    twin of the ev_cadence_cv batch entry: state per user is four
    longs (last event-time in micros + the three mergeable gap
    moments n/sum/sum-of-squares), each batch folded in
    (ts, event_id) order over the time-sliced replay. Gap seconds are
    integer floor division of non-negative micro deltas, so the
    moments are EXACT and the fixpoint is micro-batch-boundary
    independent — what lets stream_cadence_exec gate the bucketed
    cadence profile bit-for-bit against the batch oracle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        last, n_seen, ng, s1, s2 = (
            state.get if state.exists else (-1, 0, 0, 0, 0)
        )
        # Batch-wide sort (not per-chunk): one key's micro-batch can
        # span several Arrow chunks delivered in shuffle order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            ts_us = (
                pdf["ts"].astype("datetime64[us]").astype("int64")
            )
            for t in ts_us:
                t = int(t)
                if last >= 0:
                    g = (t - last) // 1_000_000
                    ng += 1
                    s1 += g
                    s2 += g * g
                last = t
                n_seen += 1
        state.update((last, n_seen, ng, s1, s2))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n_seen],
                "n_gaps": [ng],
                "s1": [s1],
                "s2": [s2],
            }
        )

    return (
        _read_stream(spark, src_glob)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, n_seen long, n_gaps long, s1 long, s2 long"
            ),
            stateStructType=(
                "last long, n_seen long, ng long, s1 long, s2 long"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_checksum_agg(
    spark: SparkSession, src_glob: str, hv, group_col: str = "event_type"
) -> DataFrame:
    """Running row-set checksum as a PLAIN streaming aggregate: the
    XOR and modular-sum accumulators are commutative and associative,
    so no watermark or custom state is needed — complete mode, state
    total O(groups). ``hv`` is the row-hash Column (supplied by the
    plan layer so the batch oracle and the stream share one hash
    definition)."""
    from pyspark.sql import functions as F

    return (
        _read_stream(spark, src_glob)
        .select(group_col, hv.alias("hv"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("CAST(bit_xor(hv) AS BIGINT)").alias("xor_check"),
            F.sum(F.col("hv") % 1000003).cast("long").alias("sum_check"),
        )
    )


def stream_tumbling_to_parquet(
    spark: SparkSession,
    src_glob: str,
    out_dir: str,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    timeout: int = 120,
) -> None:
    """Incremental materialization via ``foreachBatch``: the tumbling
    aggregate runs in update mode and each micro-batch APPENDS its
    updated (key, aggregate) rows to a parquet directory, stamped with
    the micro-batch id. The materialized view is then the last write
    per key (``latest_per_key``) — the upsert-into-a-data-lake pattern
    expressed against a plain parquet sink: appends are cheap and
    idempotent per batch id, and the merge is deferred to read time.
    State on the write path is the streaming agg's own (watermark
    bounded); the sink itself is stateless, so a 1000-executor writer
    needs no coordination beyond file commit.
    """
    agg = stream_tumbling_counts(spark, src_glob, watermark, window)

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout)


def latest_per_key(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read-side merge of the foreachBatch append log: keep the row
    from the highest batch id per (win_start, event_type) — last
    write wins, exactly the final streaming state for each key."""
    from pyspark.sql import Window

    log = spark.read.parquet(out_dir)
    w = Window.partitionBy("win_start", "event_type").orderBy(
        F.col("batch_id").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("win_start", "event_type", "n", "sum_value")
    )


def stream_append_to_parquet(
    spark: SparkSession,
    src_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    timeout: int = 120,
) -> None:
    """File-source → file-sink ingest seam: the replayed event files
    stream through a stateless normalizing projection (exact integer
    cents, same discipline as the stateful operators) into an
    append-mode PARQUET sink with a checkpoint — the exactly-once
    landing-zone pattern (checkpoint + file-sink manifest give
    end-to-end idempotence on restart). Each micro-batch commits its
    own small files; the follow-up ``sinks.compact_parquet`` rewrite is
    what makes the result scan-friendly — together they are the
    standard continuous-ingest + compaction loop of a 100-TB lake."""
    ev = _read_stream(spark, src_glob).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    q = (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout)


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "update", timeout: int = 120
):
    """Execute a streaming frame with AvailableNow into a memory sink;
    returns after the stream drains."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout)
    return q


def stream_session_ttl(
    spark: SparkSession,
    src_glob: str,
    gap_s: int = 21600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom session windows with TTL state eviction — the
    ``applyInPandasWithState`` + ``EventTimeTimeout`` pattern for an
    UNBOUNDED key universe: a user's state lives only while the
    watermark is within ``gap_s`` of their last event, then the session
    flushes and the state row is REMOVED. Total state is therefore
    bounded by users active inside the gap horizon, not by every key
    ever seen (the fix SCALE.md prescribes over NoTimeout).

    DISORDER-ROBUST: state is a list of TENTATIVE sessions
    (start_us, end_us, n) sorted by start, and a session is emitted
    only once the event-time watermark passes its end + gap — never on
    arrival. Any event the watermark admits, in any micro-batch order,
    lands as a singleton and is merged into its gap-neighbours (a late
    event falling in the gap between two tentative sessions merges
    them, counts summed), so emission equals batch gap-sessionization
    for ARBITRARY within-watermark disorder, not just time-ordered
    replay. Events at or before the watermark are dropped by Spark's
    late-row filter and can therefore never touch an already-emitted
    session (its end + gap <= watermark <= any admitted timestamp —
    an admitted row always starts a new session or joins a live one).
    State timestamps are integer microseconds (exact, order-safe);
    state size is bounded by sessions still inside the gap horizon."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_s * 1_000_000
    cols = ["user_id", "start_us", "end_us", "n_events"]

    def update(key, pdfs, state: GroupState):
        sess: list[list[int]] = []
        if state.exists:
            sts, ens, ns = state.get
            sess = [[int(s), int(e), int(c)] for s, e, c in zip(sts, ens, ns)]
        if not state.hasTimedOut:
            ts_us = (
                pd.concat([pdf["ts"] for pdf in pdfs], ignore_index=True)
                .astype("datetime64[us]")  # normalize ns/us Arrow units
                .astype("int64")
            )
            sess.extend([int(t), int(t), 1] for t in ts_us)
        # normalize: sort by start, merge any neighbours within the gap
        sess.sort()
        merged: list[list[int]] = []
        for s in sess:
            if merged and s[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [
            (key[0], st, en, n) for st, en, n in merged if en + gap_us <= wm_us
        ]
        keep = [s for s in merged if s[1] + gap_us > wm_us]
        if keep:
            state.update(
                (
                    [s[0] for s in keep],
                    [s[1] for s in keep],
                    [s[2] for s in keep],
                )
            )
            # ceil-ms timer so it can't fire a tick before finality;
            # clamp above the current watermark (Spark rejects timers
            # at or below it)
            t_ms = max(
                min((s[1] + gap_us + 999) // 1000 for s in keep),
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(t_ms)
        else:
            state.remove()
        yield pd.DataFrame(closed, columns=cols)

    return (
        _read_stream(spark, src_glob)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, start_us long, end_us long, n_events long"
            ),
            stateStructType="st array<long>, en array<long>, n array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .select(
            "user_id",
            F.timestamp_micros(F.col("start_us")).alias("session_start"),
            F.timestamp_micros(F.col("end_us")).alias("session_end"),
            "n_events",
        )
    )


def stream_tws_totals(spark: SparkSession, src_glob: str) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful successor to applyInPandasWithState:
    typed per-key state handles (ValueState here; List/Map state and
    timers are the same handle API) managed by the RocksDB state
    store. Same exact-integer-cents discipline as
    ``stream_user_running_totals``: an exact accumulator makes the
    final state micro-batch-invariant, hence batch-oracle-checkable.

    ENVIRONMENT-GATED in this container: the transformWithState state
    server speaks protobuf between the JVM and the Python driver
    worker, and ``google.protobuf`` is not installed here (verified:
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError at
    query start), so this operator cannot EXECUTE in the test
    environment — the same class of seam as the pyuvdata-gated
    ms/uvh5 readers. The implementation is complete and the executed
    oracle gate for the arbitrary-stateful family is carried by
    ``stream_stateful_exec`` (applyInPandasWithState, protobuf-free
    protocol); swap the registry entry to this operator on any
    cluster with protobuf present (``tests/test_streaming.py``
    skip-gates a parity test on the import).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("n", LongType(), True),
                    StructField("sc", LongType(), True),
                ]
            )
            self._tot = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, sc = (self._tot.get() or (0, 0)) if self._tot.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # floor(x*100 + 0.5) = SQL ROUND half-up for the
                # non-negative values here (pandas .round is banker's)
                sc += int(
                    pdf["value"].mul(100).add(0.5).pipe(np.floor)
                    .astype("int64").sum()
                )
            self._tot.update((n, sc))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_cents": [sc]}
            )

        def close(self) -> None:
            pass

    return (
        _read_stream(spark, src_glob)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id long, n_events long, sum_cents long",
            outputMode="Update",
            timeMode="None",
        )
    )


# rho = 1 + leading-zero count of the 26 post-bucket hash bits — the
# same generated integer CASE the batch ev_hll_merge entry shares with
# its oracle (regenerated here to keep the streaming module free of a
# plans import).
_HLL_RHO_CASE = (
    "CASE "
    + " ".join(
        f"WHEN rem >= {1 << k} THEN {26 - k}" for k in range(25, -1, -1)
    )
    + " ELSE 27 END"
)


def stream_hll_registers(spark: SparkSession, src_glob: str) -> DataFrame:
    """Streaming HyperLogLog register build: hash each user_id as it
    arrives, groupBy the 6-bit bucket, MAX(rho). Register MAX is
    monotone and commutative — exactly why sketches suit incremental
    execution: every trigger folds its batch into 64 longs of state,
    and the final complete-mode table must equal the batch-computed
    register table bit-for-bit regardless of file arrival order."""
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        _read_stream(spark, src_glob)
        .select((hv % 64).alias("bucket"), hv.alias("hv"))
        .select("bucket", F.expr("hv div 64").alias("rem"))
        .withColumn("rho", F.expr(_HLL_RHO_CASE))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
