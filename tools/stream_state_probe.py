"""Measure streaming state-store size vs watermark horizon at 1x and
10x event volume (VERDICT r3 item 7).

For each probed stream the events table is replayed as N sequential
files (maxFilesPerTrigger=1, AvailableNow), so the watermark advances
between micro-batches exactly as against a live source. After the
drain we read ``stateOperators.numRowsTotal`` from the recorded query
progress — the actual row count in the state store — and report its
MAX across micro-batches at both volumes.

The claim under test: state is bounded by the WATERMARK HORIZON (rows
whose event time is within horizon of the max seen), not by stream
length. 10x volume packs ~10x events into the same time span, so
per-horizon state may grow with event RATE — but the growth must track
the horizon population, never total rows ingested; replaying with more
files (smaller horizon slices) must not grow it.

``--rocksdb`` runs the same probe on the RocksDB state store provider
(the spillable store a 100-TB stream needs; stream_dedup_exec gates
its correctness against the batch oracle) so the state-volume
invariants are measured on the production store, not just the default
HDFS-backed in-memory map.

Usage: python tools/stream_state_probe.py [--rocksdb]
"""

from __future__ import annotations

import json
import sys
import tempfile
import uuid

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"


def max_state_rows(q) -> list[int]:
    rows = []
    for p in q.recentProgress:
        for op in p.get("stateOperators", []):
            rows.append(op.get("numRowsTotal", 0))
    return rows


def drain(df, name: str):
    q = (
        df.writeStream.format("noop")
        .queryName(name)
        .outputMode(
            "append" if ("dedup" in name or name.startswith("ij_")) else "update"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def probe(spark, events, n_files: int, tag: str) -> dict:
    from mwa_uvdata_pipeline_spark.streaming.events import (
        replay_events,
        stream_dedup,
        stream_tumbling_counts,
    )

    src = tempfile.mkdtemp(prefix=f"state_probe_{tag}_")
    replay_events(events, src, n_files=n_files)
    out = {"n_events": events.count(), "n_files": n_files}
    for name, fn in [
        ("tumbling_agg", stream_tumbling_counts),
        ("dedup", stream_dedup),
    ]:
        q = drain(fn(spark, f"{src}/part*"), f"{name}_{uuid.uuid4().hex[:6]}")
        rows = max_state_rows(q)
        out[name] = {"max_state_rows": max(rows or [0]), "batches": len(q.recentProgress)}
    return out


def probe_interval_join(
    spark, events, tag: str, watermark: str
) -> dict:
    """stream_interval_join state under a LATE-DATA FLOOD (VERDICT r8
    #9): the claim is state ~ rows inside (watermark delay + join
    window) of the stream head — horizon-bounded — NOT cumulative rows
    ingested. The flood fixture packs a multiple of the corpus into
    the final horizon window, so if eviction works, max state tracks
    the flood's horizon population and SHRINKS when the watermark
    shrinks at identical input."""
    import uuid

    from mwa_uvdata_pipeline_spark.streaming.events import (
        replay_events,
        stream_interval_join,
    )

    src = tempfile.mkdtemp(prefix=f"ij_probe_{tag}_")
    replay_events(events, src, n_files=8)
    q = drain(
        stream_interval_join(
            spark, f"{src}/part*", watermark=watermark
        ),
        f"ij_{uuid.uuid4().hex[:6]}",
    )
    rows = max_state_rows(q)
    return {
        "n_events": events.count(),
        "watermark": watermark,
        "max_state_rows": max(rows or [0]),
        "batches": len(q.recentProgress),
    }


def build_late_flood(spark, ev, copies: int = 5):
    """Base events + `copies` replicas whose timestamps are clamped
    into the last 25 minutes before the stream head — admissible
    (inside a 30-minute watermark) but all landing in one horizon
    window: the adversarial late flood."""
    from pyspark.sql import functions as F

    head = ev.agg(F.max("ts").alias("m")).first()["m"]
    flood = [ev]
    for i in range(1, copies + 1):
        flood.append(
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)
            ).withColumn(
                "ts",
                F.lit(head)
                - F.expr(f"INTERVAL {25 - (i * 4)} MINUTES")
                + F.expr("INTERVAL 0 SECONDS"),
            )
        )
    out = flood[0]
    for c in flood[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from mwa_uvdata_pipeline_spark.plans import load_events
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("stream-state-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    rocksdb = "--rocksdb" in sys.argv[1:]
    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    ev = load_events(spark, SRC)
    # 10x volume in the SAME time span: offset ids, jitter ts by <1s so
    # rows are distinct but the horizon population genuinely densifies
    copies = [ev]
    for i in range(1, 10):
        copies.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 1_000_000_000))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 97} MILLISECONDS"))
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.cache()
    big.count()

    r1 = probe(spark, ev, 8, "1x")
    r10 = probe(spark, big, 8, "10x")
    r10_more_files = probe(spark, big, 32, "10xf")

    flood = build_late_flood(spark, ev).cache()
    flood.count()
    ij = {
        "base_wm30": probe_interval_join(spark, ev, "b30", "30 minutes"),
        "flood_wm30": probe_interval_join(spark, flood, "f30", "30 minutes"),
        "flood_wm5": probe_interval_join(spark, flood, "f5", "5 minutes"),
    }
    print(
        json.dumps(
            {
                "provider": "rocksdb" if rocksdb else "default",
                "x1": r1,
                "x10": r10,
                "x10_32files": r10_more_files,
                "interval_join": ij,
            }
        )
    )


if __name__ == "__main__":
    main()
