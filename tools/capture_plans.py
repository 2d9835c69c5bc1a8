"""Capture ``explain("formatted")`` for bench-roster queries.

Writes ``plans/<round>/<query>_<tag>.txt`` for every bench-flagged plan
(or the names given on the command line), so optimization claims can
be reviewed as a plan diff without a local Spark session.

Usage: python tools/capture_plans.py <tag> [name ...]
  tag: before|after (or any label)
  PLAN_DIR env var overrides the output directory
  (default: <repo>/plans/r16).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mwa_uvdata_pipeline_spark.plans import load_all
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("capture-plans")
    plans = load_all()
    roster = names or [n for n, p in plans.items() if p.bench]

    out_dir = os.environ.get("PLAN_DIR", os.path.join(REPO, "plans", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    for name in roster:
        p = plans[name]
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            p.spark(spark, sf_dir).explain("formatted")
        txt = buf.getvalue()
        with open(f"{out_dir}/{name}_{tag}.txt", "w") as f:
            f.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
