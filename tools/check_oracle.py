"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, compares row count, column names, and
exact values (order-insensitive). Exact value equality here is stricter
than any reasonable driver hash, so green here ⇒ green there.

Usage: python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values; normalize cells."""
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    out = df.map(norm)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as e
    from mwa_uvdata_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        # several plans persist() intermediates they cannot unpersist
        # lazily; without this, cached edge/shingle tables accumulate
        # across the ~170-entry sweep and pressure executor memory
        spark.catalog.clearCache()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) no oracle")
            n_weak += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows spark={len(sdf)} duckdb={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
        if not problems:
            cs, cd = canonicalize(sdf), canonicalize(ddf)
            if not cs.equals(cd):
                neq = (cs != cd).any(axis=1)
                diff_rows = int(neq.sum())
                problems.append(f"{diff_rows} differing rows")
                ex = pd.concat(
                    [cs[neq].head(3).add_suffix("_spark"), cd[neq].head(3).add_suffix("_duck")],
                    axis=1,
                )
                problems.append("\n" + ex.to_string())
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
