"""Build an sf1-scale copy of the driver's sf0.1 testdata for the
one-time scale soak (round-12 verdict item #6): every fact-ish table
is replicated 10x with its keys shifted by replica * (max_key + 1) so
join fan-outs stay 1:1 per replica (orders/lineitem shift orderkey
together; lineitem's part/supp refs shift with part/supplier;
events shift event_id/user_id so per-user session state stays
bounded; documents shift doc_id so payload-synthesis work scales).
region/nation stay as-is (true dims).

Grown corpora are PERTURBED the same way tools/scale_probe.py
perturbs them, and for the same reason: naive replication makes
every document a 10-way exact near-dup, so dedup answers (pair
lists, containment candidates) grow ~quadratically BY CONSTRUCTION
and the soak measures answer growth, not plan growth (the first sf1
soak read dedup_containment at 62x for exactly this reason —
re-read with perturbation it is linear). Copy i tags every
non-leading token with c{i} (disjoint shingles = genuinely new
text, n_chars recomputed) and flips embedding dimension signs by
the bits of i (norm-preserving spread across LSH/IVF buckets).

Output is written OUTSIDE the repo (default /tmp/sf1) — the soak's
numbers go to SCALE.md, the data does not get committed.

Usage: python tools/make_sf1.py [out_dir] [factor]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> columns to shift by replica * (max(col0) + 1); col0's span
# is used for every listed column that shares its keyspace, so
# orders.o_orderkey and lineitem.l_orderkey move in lockstep.
PLAN: dict[str, list[tuple[str, str, str]]] = {
    # (column, span_table, span_column)
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [
        ("event_id", "events", "event_id"),
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}


def main() -> int:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    spans: dict[tuple[str, str], int] = {}
    for t, shifts in PLAN.items():
        for _, st, sc in shifts:
            if (st, sc) not in spans:
                spans[(st, sc)] = con.execute(
                    f"SELECT max({sc}) + 1 FROM "
                    f"read_parquet('{SRC}/{st}.parquet')"
                ).fetchone()[0]
    for t, shifts in PLAN.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if not shifts:
            sel = f"SELECT * FROM {src}"
        else:
            shifted = {c: spans[(st, sc)] for c, st, sc in shifts}
            cols = [c[0] for c in con.execute(
                f"DESCRIBE SELECT * FROM {src}").fetchall()]

            def expr(c: str) -> str:
                if c in shifted:
                    return (
                        f"CAST({c} + r.i * {shifted[c]} AS BIGINT) AS {c}"
                    )
                if t == "documents" and c == "text":
                    # copy 0 verbatim; copy i tags non-leading tokens
                    return (
                        "CASE WHEN r.i = 0 THEN text ELSE "
                        "regexp_replace(text, ' ', ' c' || r.i, 'g') "
                        "END AS text"
                    )
                if t == "documents" and c == "n_chars":
                    return (
                        "CAST(length(CASE WHEN r.i = 0 THEN text ELSE "
                        "regexp_replace(text, ' ', ' c' || r.i, 'g') "
                        "END) AS BIGINT) AS n_chars"
                    )
                if t == "embeddings" and c == "embedding":
                    # flip dim j's sign when bit (j mod 4) of i is set
                    return (
                        "CAST(list_transform(embedding, (x, j) -> "
                        "CASE WHEN ((r.i >> ((j - 1) % 4)) & 1) = 1 "
                        "THEN -x ELSE x END) AS FLOAT[]) AS embedding"
                    )
                return c

            exprs = ", ".join(expr(c) for c in cols)
            sel = (
                f"SELECT {exprs} FROM {src}, "
                f"(SELECT UNNEST(range(0, {factor})) AS i) r"
            )
        con.execute(
            f"COPY ({sel}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
