"""Pure-DataFrame Bloom filter: build a bitmap from a key column and
test membership JVM-side, with no UDF and no driver-side filter object.

Spark's own runtime bloom pruning (InjectRuntimeFilter) is an optimizer
internal and its ``might_contain`` expression is not registered as a
public SQL function, so an engine that wants an explicit, composable
semi-join prefilter — build once on the small side, apply at the scan
of the big side, exact-verify after — needs its own. Everything here is
built-in expressions (xxhash64 / bit_or / shiftleft / element_at), so
the membership test stays inside whole-stage codegen.

Scale posture: the filter is a FIXED-size array of ``m_bits/64`` longs
(one row), independent of the build side's cardinality — broadcasting
it is a bounded one-row nested-loop join. False positives are expected
and must be removed by an exact join afterwards; false negatives are
impossible (asserted in tests/test_bloom.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: xxhash64 seeded by the probe index."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def build_bloom(df: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 5) -> DataFrame:
    """One-row DataFrame with a ``words: array<bigint>`` bitmap column.

    Each key sets k bits; bits aggregate into 64-bit words via bit_or
    (map-side partials collapse duplicates), and the <= m_bits/64 word
    rows assemble into a dense array in a final single-row aggregate.
    """
    n_words = m_bits // 64
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    )
    words = (
        pos.select(
            F.expr("pos div 64").alias("widx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("widx", "word"))).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            f"w -> coalesce(wm[CAST(w AS BIGINT)], 0L))"
        ).alias("words")
    )


def might_contain(words: str, key: str, m_bits: int = 1 << 16, k: int = 5) -> Column:
    """Membership test against a :func:`build_bloom` bitmap column.

    Takes column NAMES and compiles one SQL expression (shiftleft's
    shift amount must be an expression, which the Python DSL function
    does not accept). True iff all k probed bits are set — guaranteed
    True for every key the filter was built from (same hash family,
    INT-typed probe seeds, on both sides).
    """
    tests = []
    for i in range(k):
        p = f"pmod(xxhash64({key}, {i}), {m_bits})"
        tests.append(
            f"(element_at({words}, CAST({p} div 64 AS INT) + 1) "
            f"& shiftleft(1L, CAST({p} % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(tests))
