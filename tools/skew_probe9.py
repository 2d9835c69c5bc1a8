"""Entry-specific skew probes for the round-8 entries that only had
uniform-growth datapoints (VERDICT r8 #6).

Each probe builds an ADVERSARIAL distribution at 1x and 10x and
reports wall ratio (min of 2 warm runs after warmup) — a plan whose
hot-key handling is sound stays near the uniform-growth ratio:

- ev_survival_table / one giant cohort day: EVERY signup collapses
  onto a single calendar day (the mass-marketing-launch cohort), so
  day-offset histogram mass concentrates; 10x grows users.
- o8_except_all / one hot duplicated row: 30% of lineitem carries one
  part key qualifying for BOTH sides of the EXCEPT ALL, so one value
  holds 30% of the count-tagged aggregate AND its survivor replay
  (Spark replicates max(cnt,0) copies of the hot row in ONE generator
  task — the serial step this probe sizes).
- pipeline_train_eval / one dominant language: 90% of train+test docs
  share one lang, concentrating the per-lang prior/total groups (the
  (lang, token) grid stays spread by token).
- m_video_scene_cuts / one long video: equal TOTAL frame budget,
  uniform (8-frame docs) vs concentrated (one 40k-frame video) via
  the decode_scene_cuts nf_for hook — per-doc frames are a serial
  fold, so wall is lower-bounded by the longest video; the probe
  measures that bound.

Usage: python tools/skew_probe9.py [probe ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/skew_probe9"


def _t(fn, runs: int = 2) -> float:
    fn()  # warmup
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def build_survival(spark, out: str, copies: int) -> None:
    """Events with every signup collapsed to one day; users grown."""
    from pyspark.sql import functions as F

    from mwa_uvdata_pipeline_spark.plans import load_events

    ev = load_events(spark, SRC)
    day0 = "TIMESTAMP_NTZ '2024-03-01 00:00:00'"
    ev = ev.withColumn(
        "ts",
        F.when(
            F.col("event_type") == "signup",
            # keep intra-day micros so t0 per user still varies
            F.expr(
                f"{day0} + make_interval(0,0,0,0,0,0,"
                " CAST(unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000"
                " AS DOUBLE) / 1000000)"
            ).cast("timestamp_ntz"),
        ).otherwise(F.col("ts")),
    )
    grown = ev
    for i in range(1, copies):
        grown = grown.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        )
    grown.write.mode("overwrite").parquet(f"{out}/events.parquet")


def build_exceptall(spark, out: str, copies: int) -> None:
    """Lineitem where 30% of rows share l_partkey=1 on BOTH sides."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    hot = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(10)) < 3
    li = (
        li.withColumn("l_partkey", F.when(hot, 1).otherwise(F.col("l_partkey")))
        .withColumn(
            "l_quantity", F.when(hot, 30.0).otherwise(F.col("l_quantity"))
        )
        .withColumn(
            "l_returnflag", F.when(hot, "R").otherwise(F.col("l_returnflag"))
        )
    )
    grown = li
    for i in range(1, copies):
        grown = grown.unionByName(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
            )
        )
    grown.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")


def build_nb(spark, out: str, copies: int) -> None:
    """Documents with 90% of rows forced to one language."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SRC}/documents.parquet")
    d = d.withColumn(
        "lang",
        F.when(F.pmod(F.col("doc_id"), F.lit(10)) < 9, "en").otherwise(
            F.col("lang")
        ),
    )
    grown = d
    for i in range(1, copies):
        grown = grown.unionByName(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    grown.write.mode("overwrite").parquet(f"{out}/documents.parquet")


def probe_plan(spark, name: str, builder) -> dict:
    from mwa_uvdata_pipeline_spark.plans import PLANS

    out = {}
    dirs = {}
    for tag, copies in (("1x", 1), ("10x", 10)):
        d = f"{DST}/{name}_{tag}"
        builder(spark, d, copies)
        dirs[tag] = d
    p = PLANS[name]
    t1 = _t(lambda: _noop(p.spark(spark, dirs["1x"])))
    t10 = _t(lambda: _noop(p.spark(spark, dirs["10x"])))
    out = {"t_1x": round(t1, 3), "t_10x": round(t10, 3),
           "ratio": round(t10 / max(t1, 1e-9), 2)}
    print(f"{name}: {out}", flush=True)
    return out


def probe_long_video(spark) -> dict:
    """Equal total frames: 5000 docs x 8 frames vs 1 doc x 40000."""
    from mwa_uvdata_pipeline_spark.operators.multimodal import (
        decode_scene_cuts,
    )

    uniform = spark.range(0, 5000).selectExpr("id AS doc_id")
    single = spark.range(0, 1).selectExpr("id AS doc_id")
    tu = _t(lambda: _noop(decode_scene_cuts(uniform, nf_for=lambda d: 8)))
    tl = _t(lambda: _noop(decode_scene_cuts(single, nf_for=lambda d: 40_000)))
    out = {
        "t_uniform_40k_frames": round(tu, 3),
        "t_one_video_40k_frames": round(tl, 3),
        "ratio": round(tl / max(tu, 1e-9), 2),
    }
    print(f"m_video_scene_cuts(long-video): {out}", flush=True)
    return out


def main() -> int:
    from mwa_uvdata_pipeline_spark.plans import load_all
    from mwa_uvdata_pipeline_spark.session import get_spark

    which = set(sys.argv[1:])
    spark = get_spark("skew-probe9")
    load_all()
    os.makedirs(DST, exist_ok=True)
    results = {}
    plan_probes = {
        "ev_survival_table": build_survival,
        "o8_except_all": build_exceptall,
        "pipeline_train_eval": build_nb,
    }
    for name, builder in plan_probes.items():
        if which and name not in which:
            continue
        results[name] = probe_plan(spark, name, builder)
    if not which or "m_video_scene_cuts" in which:
        results["m_video_scene_cuts_long"] = probe_long_video(spark)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
