"""Skew tooling (SCALE.md: "skewed keys → salting or AQE skew-join").

AQE's skew-join splitting handles join-side skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``).
For *aggregation* skew — one hot group key receiving a large share of
rows — the standard fix is two-stage salted aggregation: shard the hot
key across ``n_salt`` reducers with a synthetic salt column, partially
aggregate, then combine partials. Correct for any algebraic aggregate
(sum/count/min/max; avg via sum+count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partials
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_col: Column,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-mitigating equi-join: spread each of the big side's key
    groups over ``n_salt`` sub-partitions and replicate the small side
    once per sub-key, so a hot join key occupies ``n_salt`` reducers
    instead of one.

    ``salt_col`` must VARY WITHIN a key group (e.g. a hash of the
    row's unique id) — salting by the join key itself would keep the
    hot key on one reducer. The result is salt-invariant: every big
    row still meets exactly one replica of its matching small row.
    Cost: small side inflates x n_salt, the standard trade against a
    straggling reducer. AQE's skew-join split handles this adaptively
    when sizes are observable; explicit salting is for the planned
    case (known-hot keys, or aggregation layered above the join where
    AQE cannot rewrite).
    """
    salt = F.pmod(salt_col, F.lit(n_salt)).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salt)]))
    )
    return big_s.join(small_s, [on, "_salt"]).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation: ``aggs`` maps output column →
    (op, input column) with op ∈ {sum, count, min, max}.

    Stage 1 groups by (keys..., salt) — the hot key's rows spread over
    ``n_salt`` reducers; stage 2 merges the ≤ n_salt partials per key.
    Stage 2's input is |distinct keys| x n_salt rows, so the second
    shuffle is negligible regardless of skew.
    """
    for name, (op, _col) in aggs.items():
        if op not in _PARTIAL:
            raise ValueError(f"{name}: op {op!r} is not algebraic-mergeable")
    salt = (F.rand(seed=42) * n_salt).cast("int").alias("_salt")
    partial = (
        df.select(*keys, salt, *{c for _, (_, c) in aggs.items() if c})
        .groupBy(*keys, "_salt")
        .agg(*[
            _PARTIAL[op](c or F.lit(1)).alias(f"_p_{name}")
            for name, (op, c) in aggs.items()
        ])
    )
    return partial.groupBy(*keys).agg(*[
        _MERGE[op](f"_p_{name}").alias(name) for name, (op, _c) in aggs.items()
    ])
