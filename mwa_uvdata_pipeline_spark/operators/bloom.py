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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_params(words: str, key: str, m_bits: int, k: int) -> None:
    """Reject malformed identifiers / parameters before they reach a
    compiled SQL string (the names are interpolated into F.expr)."""
    for name in (words, key):
        if not _IDENT.match(name):
            raise ValueError(f"not a plain column identifier: {name!r}")
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16]: {k}")


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: xxhash64 seeded by the probe index."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def build_bloom(df: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 5) -> DataFrame:
    """One-row DataFrame with a ``words: array<bigint>`` bitmap column,
    plus the ``bloom_m_bits`` / ``bloom_k`` parameters it was built
    with — carried IN the row so the probe side can assert it probes
    with the same hash family (a silent m_bits/k mismatch would yield
    false NEGATIVES, wrongly pruning real rows).

    Each key sets k bits; bits aggregate into 64-bit words via bit_or
    (map-side partials collapse duplicates), and the <= m_bits/64 word
    rows assemble into a dense array in a final single-row aggregate.
    """
    _check_params("words", key, m_bits, k)
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
        ).alias("words"),
        F.lit(m_bits).alias("bloom_m_bits"),
        F.lit(k).alias("bloom_k"),
    )


def might_contain(words: str, key: str, m_bits: int = 1 << 16, k: int = 5) -> Column:
    """Membership test against a :func:`build_bloom` bitmap column.

    Takes column NAMES and compiles one SQL expression (shiftleft's
    shift amount must be an expression, which the Python DSL function
    does not accept). True iff all k probed bits are set — guaranteed
    True for every key the filter was built from (same hash family,
    INT-typed probe seeds, on both sides).

    The probe-time (m_bits, k) are ASSERTED against the
    ``bloom_m_bits`` / ``bloom_k`` the filter row carries: a mismatch
    raises at execution instead of silently pruning real rows (a
    wrong-family probe breaks the no-false-negative contract the
    exact-verify step relies on). Identifiers are validated before
    interpolation into the compiled expression.
    """
    _check_params(words, key, m_bits, k)
    guard = (
        f"(assert_true(bloom_m_bits = {m_bits} AND bloom_k = {k}, "
        f"'bloom probe params (m_bits={m_bits}, k={k}) do not match "
        f"the filter build params') IS NULL)"
    )
    tests = [guard]
    for i in range(k):
        p = f"pmod(xxhash64({key}, {i}), {m_bits})"
        tests.append(
            f"(element_at({words}, CAST({p} div 64 AS INT) + 1) "
            f"& shiftleft(1L, CAST({p} % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(tests))
