"""Capture ``explain("formatted")`` for bench-roster queries.

Writes ``plans/r15/<query>_<tag>.txt`` for every bench-flagged plan
(or the names given on the command line), so optimization claims can
be reviewed as a plan diff without a local Spark session.

Usage: python tools/capture_plans.py <tag> [name ...]   (tag: before|after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mwa_uvdata_pipeline_spark.plans import load_all
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("capture-plans")
    plans = load_all()
    roster = names or [n for n, p in plans.items() if p.bench]

    out_dir = "/root/repo/plans/r15"
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
