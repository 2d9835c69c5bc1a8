"""Relational parity surface (SURVEY.md §2 → §7 Phase 2) over the
TPC-H-ish driver tables.

Float determinism: the driver hash-compares Spark vs DuckDB values
exactly, and double SUMs are order-dependent. Every money aggregate is
therefore computed over integer cents (``ROUND(x*100)::BIGINT``) —
exact, associative, order-independent — and converted to double only at
the end with an identical division in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.plans import register, table


def cents(col: str | Column) -> Column:
    """Exact integer cents from a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def SQL_CENTS(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


# ---------------------------------------------------------------- scans

@register(
    "s4_predicate_scan",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-12-31'
      AND l_quantity < 10
    """,
    doc="S4 selective read: range + scalar predicates pushed to the parquet scan "
        "(reference processors.py:170-172,192-195 re-read-with-times).",
)
def s4_predicate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate").between("1998-01-01", "1998-12-31"))
        .where(F.col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "a4_distinct_time_grid",
    sql="SELECT DISTINCT o_orderdate AS order_date FROM orders",
    doc="S3/A4 metadata-style scan: distinct sorted time grid "
        "(reference processors.py:165 np.unique(time_array)).",
)
def a4_distinct_time_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").alias("order_date"))
        .distinct()
    )


# -------------------------------------------------------------- filters

@register(
    "f1_sel_members",
    sql="""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey FROM lineitem
    WHERE l_suppkey IN (1, 2, 3) AND l_partkey IN (10, 20, 30, 40, 50)
    """,
    doc="F1 sel_ants analog: both keys must be in the allow-list "
        "(reference configurators.py:74).",
)
def f1_sel_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_suppkey").isin(1, 2, 3) & F.col("l_partkey").isin(10, 20, 30, 40, 50))
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
    )


@register(
    "f2_skip_members",
    sql="""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey FROM lineitem
    WHERE l_suppkey NOT IN (1, 2, 3, 4, 5, 6) AND l_partkey NOT IN (10, 20, 30)
    """,
    doc="F2 skip_ants analog: drop rows touching the deny-list "
        "(reference configurators.py:75).",
)
def f2_skip_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(~F.col("l_suppkey").isin(1, 2, 3, 4, 5, 6) & ~F.col("l_partkey").isin(10, 20, 30))
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
    )


@register(
    "f3_sel_categories",
    sql="""
    SELECT l_returnflag, COUNT(*) AS n FROM lineitem
    WHERE l_returnflag IN ('A', 'R') GROUP BY l_returnflag
    """,
    doc="F3 sel_pols analog (reference configurators.py:76).",
)
def f3_sel_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "f4_range_band",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    """,
    doc="F4 freq_range analog: pushdown-eligible band predicate "
        "(reference configurators.py:77).",
)
def f4_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "f5_time_limit",
    sql="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate IN (
        SELECT DISTINCT l_shipdate FROM lineitem ORDER BY l_shipdate LIMIT 5)
    """,
    doc="F5 time_limit: first N distinct times then semi-join "
        "(reference configurators.py:78).",
)
def f5_time_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    first5 = li.select("l_shipdate").distinct().orderBy("l_shipdate").limit(5)
    return li.join(F.broadcast(first5), "l_shipdate", "left_semi").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )


@register(
    "f6_remove_flagged",
    sql="""
    SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem
    WHERE NOT EXISTS (
        SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey AND s_acctbal < 1000.0)
    """,
    doc="F6 remove_flagged_ants analog: broadcast anti-join against the "
        "flagged slice of a dimension (reference configurators.py:70, utils.py:160).",
)
def f6_remove_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    flagged = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 1000.0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return li.join(F.broadcast(flagged), "l_suppkey", "left_anti").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )


@register(
    "f7_theta_self",
    sql="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
    WHERE (l_partkey % 10) = (l_suppkey % 10)
    """,
    doc="F7 auto/cross spectrum analog: theta self-predicate "
        "(reference configurators.py:86-87).",
)
def f7_theta_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where((F.col("l_partkey") % 10) == (F.col("l_suppkey") % 10))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    )


# ---------------------------------------------------------------- joins

@register(
    "j1_broadcast_lookup",
    sql="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    bench=True,
    doc="J1 gpubox→channel lookup analog: broadcast equi-join fact→dim "
        "(reference utils.py:49-59).",
)
def j1_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias("sum_price"),
        )
    )


@register(
    "j2_multiway_join",
    sql="""
    SELECT r_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    bench=True,
    doc="J2 file↔metafits association generalized: 5-way star join, dims "
        "broadcast (reference utils.py:100-107).",
)
def j2_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            (F.sum(rev_cents).cast("double") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "j3_anti_completeness",
    sql="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="J3/V3 obsid↔metafits completeness analog: left-anti emptiness "
        "check (reference configurators.py:157-162,250-256).",
)
def j3_anti_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey")


@register(
    "j4_semi_join",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
    doc="J4 semi-join: customers with at least one large order "
        "(visibility⋈antenna-dim shape, reference configurators.py:70,74-75).",
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000.0)
    return cust.join(
        big, cust["c_custkey"] == big["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j5_symmetric_difference",
    sql="""
    SELECT COUNT(*) AS diff_count FROM (
        (SELECT DISTINCT l_suppkey AS k FROM lineitem
         EXCEPT ALL SELECT s_suppkey AS k FROM supplier)
        UNION ALL
        (SELECT s_suppkey AS k FROM supplier
         EXCEPT ALL SELECT DISTINCT l_suppkey AS k FROM lineitem)
    )
    """,
    doc="J5/O5/V7 set-equality via symmetric exceptAll "
        "(reference processors.py:98-103 pairwise df.equals).",
)
def j5_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k")).distinct()
    b = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return (
        a.exceptAll(b).unionAll(b.exceptAll(a)).agg(F.count(F.lit(1)).alias("diff_count"))
    )


@register(
    "j6_cross_join",
    sql="SELECT r_name, n_name FROM region CROSS JOIN nation",
    doc="Cross join (driver parity; no analog needed in the reference).",
)
def j6_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "region").crossJoin(
        table(spark, sf_dir, "nation").select("n_name")
    ).select("r_name", "n_name")


# ----------------------------------------------------------- aggregates

@register(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
               / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS DOUBLE)
               / 1000000.0 AS sum_charge,
           SUM(l_quantity) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="Flagship relational aggregate (TPC-H Q1 shape): A5-style hash "
        "aggregation with map-side partials; exercises the INS shape on "
        "relational data (SURVEY §2.4 A5).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "2000-09-02")
    price_c = cents("l_extendedprice")
    disc_pct = cents("l_discount")  # discount in percent points (0-100)
    tax_pct = cents("l_tax")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        (F.sum(price_c).cast("double") / 100.0).alias("sum_base_price"),
        (F.sum(price_c * (100 - disc_pct)).cast("double") / 10000.0).alias("sum_disc_price"),
        (F.sum(price_c * (100 - disc_pct) * (100 + tax_pct)).cast("double") / 1000000.0).alias("sum_charge"),
        (F.sum("l_quantity") / n.cast("double")).alias("avg_qty"),
        (F.sum(price_c).cast("double") / n.cast("double") / 100.0).alias("avg_price"),
        (F.sum(disc_pct).cast("double") / n.cast("double") / 100.0).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "a1_group_collect",
    sql="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS names,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
    doc="A1 group-by-extension analog: sorted collect_list per group "
        "(reference configurators.py:227-235).",
)
def a1_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("names"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "a2_rollup",
    sql="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
    FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    doc="A2 two-level grouping generalized to rollup "
        "(reference configurators.py:237-248).",
)
def a2_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "a3_total_size",
    sql="""
    SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price,
           COUNT(*) AS n_orders
    FROM orders
    """,
    doc="A3 total input size analog: global sum (reference configurators.py:263-265).",
)
def a3_total_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").agg(
        (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_count_distinct",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distinct aggregation (driver parity; SURVEY §2.4 note).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct(F.col("l_partkey")).alias("distinct_parts"),
            F.count_distinct(F.col("l_suppkey")).alias("distinct_supps"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "a8_occupancy_fraction",
    sql="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS big_fraction,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    doc="A8 flag-occupancy fraction shape: avg of a boolean per group "
        "(reference configurators.py:92 tb_aggro).",
)
def a8_occupancy_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (F.col("o_totalprice") > 200000.0).cast("int")
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            (F.sum(big).cast("double") / F.count(F.lit(1)).cast("double")).alias("big_fraction"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# -------------------------------------------------------------- windows

@register(
    "w1_lag_diff",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT)
             - LAG(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS diff_cents
    FROM orders
    """,
    doc="W1 time differencing shape on relational data: lag per key, "
        "ordered by time with a deterministic tiebreak "
        "(reference configurators.py:66 diff=True).",
)
def w1_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    c = cents("o_totalprice")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (c - F.lag(c).over(w)).alias("diff_cents"),
    )


@register(
    "w2_row_number",
    sql="""
    SELECT * FROM (
        SELECT o_orderkey, o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
    doc="W2 ranking: first N events per key (reference processors.py:165-172 "
        "time-slice enumeration shape).",
)
def w2_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@register(
    "w2_ntile_chunks",
    sql="""
    SELECT d AS order_date, NTILE(8) OVER (ORDER BY d) AS chunk
    FROM (SELECT DISTINCT o_orderdate AS d FROM orders)
    """,
    doc="W2 time-slice chunking: ntile over the distinct time grid "
        "(reference processors.py:165-172 step_size batching). The "
        "unpartitioned window is safe HERE because its input is the "
        "distinct date grid — bounded by the calendar, not the "
        "corpus — unlike x_sequence_gaps, which buckets first.",
)
def w2_ntile_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("order_date")
    return (
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").alias("order_date"))
        .distinct()
        .select("order_date", F.ntile(8).over(w).alias("chunk"))
    )


@register(
    "w3_moving_frame",
    sql="""
    SELECT l_orderkey, l_linenumber,
           SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_qty
    FROM lineitem
    """,
    doc="Frame-spec window: moving sum over a RANGE frame — value-based, "
        "so duplicate order keys cannot make the frame ambiguous "
        "(driver parity, SURVEY §2.5 note).",
)
def w3_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rangeBetween(-2, Window.currentRow)
    )
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.sum("l_quantity").over(w).alias("moving_qty")
    )


@register(
    "w4_agg_rejoin",
    sql="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) * cnt > sum_cents AS above_avg
    FROM orders JOIN (
        SELECT o_custkey AS k,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_cents,
               COUNT(*) AS cnt
        FROM orders GROUP BY o_custkey
    ) ON o_custkey = k
    """,
    doc="W4 time-broadcast shape: group aggregate joined back to flag rows "
        "above their group mean — all-integer compare, no float division "
        "(reference configurators.py:92).",
)
def w4_agg_rejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    stats = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(cents("o_totalprice")).alias("sum_cents"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        orders.join(F.broadcast(stats), orders["o_custkey"] == stats["k"])
        .select(
            "o_orderkey",
            ((cents("o_totalprice") * F.col("cnt")) > F.col("sum_cents")).alias("above_avg"),
        )
    )


# ------------------------------------------------------ sort/limit/set

@register(
    "o3_topk",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="O3 top-k with deterministic tiebreak (reference configurators.py:78 "
        "time_limit shape). TakeOrderedAndProject — no global sort.",
)
def o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "o4_union_slices",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n FROM (
        SELECT o_orderstatus FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ) GROUP BY o_orderstatus
    """,
    doc="O4/S5 union-of-slices ≡ whole read (reference processors.py:171-173 "
        "uvd += accumulate).",
)
def o4_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    lo = orders.where(F.col("o_orderdate") < "1998-01-01").select("o_orderstatus")
    hi = orders.where(F.col("o_orderdate") >= "1998-01-01").select("o_orderstatus")
    return lo.unionByName(hi).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "o6_except_types",
    sql="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
    doc="O6 set-difference (reference configurators.py:164-166 type-set math).",
)
def o6_except_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ords = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return cust.exceptAll(ords.distinct()).distinct()


@register(
    "o7_intersect",
    sql="""
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey AS k FROM orders
    """,
    doc="O7 set-intersection, completing the set-op family (O4 union, "
        "O5 equality, O6 difference): customers that placed at least "
        "one order, as INTERSECT rather than a semi-join. Spark plans "
        "intersect as a left-semi hash join over distinct inputs — "
        "same single-shuffle cost profile as EXCEPT.",
)
def o7_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ords = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return cust.intersect(ords)


@register(
    "w7_dist_rank",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey),
                 9) AS pr,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey),
                 9) AS cd
    FROM orders
    """,
    doc="Distribution-rank windows (percent_rank / cume_dist), "
        "completing the W5 ranking family: per-priority price "
        "percentile position of every order. The ordering key "
        "(o_totalprice, o_orderkey) is UNIQUE, so percent_rank = "
        "(rank-1)/(n-1) and cume_dist = rank/n, and the rank itself "
        "is computed in TWO levels: orders rank within their own "
        "price BAND (floor(price/1000) — band order is price order, "
        "so per-(priority, band) rank windows run hundreds-way "
        "parallel) and a per-priority band-offset window over the "
        "band-count table (one row per band) stitches the global "
        "rank — a naive per-priority window would sort 1/5 of ALL "
        "orders in one task at 100 TB. Rounded to 9 dp because both "
        "are ratios of integers and the engines' division must agree "
        "after rounding.",
)
def w7_dist_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("band"),
    )
    wband = Window.partitionBy("o_orderpriority", "band").orderBy(
        "o_totalprice", "o_orderkey"
    )
    counts = o.groupBy("o_orderpriority", "band").agg(
        F.count(F.lit(1)).alias("bc")
    )
    woff = Window.partitionBy("o_orderpriority").orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )  # frame = one row per price band, bounded by the price domain
    offsets = counts.select(
        "o_orderpriority",
        "band",
        F.coalesce(F.sum("bc").over(woff), F.lit(0)).alias("off"),
    )
    ntab = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rank = F.col("off") + F.row_number().over(wband)
    return (
        o.join(F.broadcast(offsets), ["o_orderpriority", "band"])
        .join(F.broadcast(ntab), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                F.when(
                    F.col("n") > 1,
                    (rank - 1).cast("double") / (F.col("n") - 1),
                ).otherwise(0.0),
                9,
            ).alias("pr"),
            F.round(rank.cast("double") / F.col("n"), 9).alias("cd"),
        )
    )


@register(
    "x_sequence_gaps",
    sql="""
    SELECT event_id + 1 AS gap_start, next_id - 1 AS gap_end,
           next_id - event_id - 1 AS n_missing
    FROM (SELECT event_id,
                 LEAD(event_id) OVER (ORDER BY event_id) AS next_id
          FROM events WHERE event_type <> 'error')
    WHERE next_id > event_id + 1
    """,
    doc="Sequence-gap detection (data-quality audit): ranges of "
        "missing ids in the event_id sequence — the gaps-and-islands "
        "complement of ev_sessionize (audited over the non-error "
        "stream, whose ids genuinely have holes where errors fell). "
        "A naive global-LEAD formulation puts the whole corpus in ONE "
        "window partition (Spark executes an unpartitioned window "
        "single-threaded); instead ids are bucketed by value range, "
        "LEAD runs per bucket in parallel, and bucket-boundary gaps "
        "come from a second window over the per-bucket min/max table "
        "— corpus/bucket_width rows, the only single-partition step. "
        "Same output, shuffle O(rows), parallelism corpus-wide; "
        "bucket_w is the knob (size it so the bucket table stays "
        "trivial, e.g. 1e8 ids per bucket at 100 TB).",
)
def x_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket_w = 4096  # small so the tests exercise >1 bucket; see doc
    ids = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") != "error")
        .select("event_id")
        .withColumn("b", F.expr(f"event_id div {bucket_w}"))
    )
    w_in = Window.partitionBy("b").orderBy("event_id")
    within = (
        ids.withColumn("next_id", F.lead("event_id").over(w_in))
        .where(F.col("next_id") > F.col("event_id") + 1)
        .select("event_id", "next_id")
    )
    bounds = ids.groupBy("b").agg(
        F.min("event_id").alias("first_id"), F.max("event_id").alias("last_id")
    )
    w_b = Window.orderBy("b")
    boundary = (
        bounds.withColumn("next_first", F.lead("first_id").over(w_b))
        .where(F.col("next_first") > F.col("last_id") + 1)
        .select(
            F.col("last_id").alias("event_id"),
            F.col("next_first").alias("next_id"),
        )
    )
    return within.unionByName(boundary).select(
        (F.col("event_id") + 1).alias("gap_start"),
        (F.col("next_id") - 1).alias("gap_end"),
        (F.col("next_id") - F.col("event_id") - 1).alias("n_missing"),
    )


# ------------------------------------------------------------- scalars

@register(
    "x1_regexp_extract",
    sql="""
    SELECT CAST(regexp_extract(o_orderpriority, '(\\d+)-', 1) AS INTEGER)
               AS priority_num,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
    doc="X1 channel_from_filename analog: regex capture → int "
        "(reference utils.py:61-78).",
)
def x1_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.regexp_extract("o_orderpriority", r"(\d+)-", 1)
            .cast("int")
            .alias("priority_num")
        )
        .groupBy("priority_num")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "x10_size_blocks",
    sql="""
    SELECT doc_id, CAST(FLOOR(n_chars / 100) AS BIGINT) AS blocks
    FROM documents
    """,
    doc="X10 MiB-block arithmetic analog (reference utils.py:173-188).",
)
def x10_size_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.floor(F.col("n_chars") / 100).cast("long").alias("blocks")
    )


# ------------------------------------------------------------ validation

@register(
    "v_report",
    sql="""
    SELECT 'V_orphan_lineitem_part' AS rule, COUNT(*) AS violations
    FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
    UNION ALL
    SELECT 'V_orphan_order_customer', COUNT(*)
    FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'V_nonpositive_quantity', COUNT(*) FROM lineitem WHERE l_quantity <= 0
    UNION ALL
    SELECT 'V_negative_price', COUNT(*) FROM lineitem WHERE l_extendedprice < 0
    """,
    doc="V1-V8 style validation report: each rule one row of "
        "(rule, violations) — multi-error accumulation "
        "(reference configurators.py:136-185).",
)
def v_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"))
    cust = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"))

    def one(rule: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(rule).alias("rule"), "violations"
        )

    return (
        one("V_orphan_lineitem_part", li.join(F.broadcast(part), "l_partkey", "left_anti"))
        .unionByName(one("V_orphan_order_customer", orders.join(F.broadcast(cust), "o_custkey", "left_anti")))
        .unionByName(one("V_nonpositive_quantity", li.where(F.col("l_quantity") <= 0)))
        .unionByName(one("V_negative_price", li.where(F.col("l_extendedprice") < 0)))
    )


@register(
    "agg_cube",
    sql="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    doc="CUBE grouping sets — the full lattice over A2's two-level "
        "grouping (rollup's sibling; free Catalyst built-in, "
        "SURVEY §2.4 note).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "w5_rank_lead",
    sql="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rk,
           DENSE_RANK() OVER w AS drk,
           LEAD(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="rank / dense_rank / lead in one per-customer window frame "
        "(SURVEY §2.5 driver-suite built-ins; complements w1 lag and "
        "w2 row_number/ntile).",
)
def w5_rank_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@register(
    "agg_percentile",
    sql="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 9) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 9) AS p90_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (A-family extension; "
        "Spark percentile == DuckDB quantile_cont linear interpolation).",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 9).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 9).alias("p90_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (A2's two-level grouping generalized "
        "beyond rollup/cube): per-returnflag, per-linestatus, and grand "
        "total in one pass — Spark expands to a single Expand + hash "
        "aggregate, one shuffle for all three groupings.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
    )


@register(
    "agg_histogram",
    sql="""
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 13
                ELSE CAST(FLOOR((o_totalprice - 0.0) / 50000.0)
                          AS BIGINT) + 1
           END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket (the oracle spells out "
        "the same floor arithmetic Spark's WidthBucket evaluates — "
        "width (600000-0)/12 = 50000 is exact in binary, so the bucket "
        "boundaries agree bit-for-bit): 12 fixed bins over "
        "order totals, count + exact integer mass per bin. Map-side "
        "bucket assignment, one tiny hash aggregate on the bounded "
        "bin key — the profile/quantile-sketch primitive for a first "
        "look at a 100-TB column's distribution (fixed bounds make "
        "the histogram mergeable across partitions and days).",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.width_bucket(
                "o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("sum_cents"),
        )
    )


@register(
    "s_partition_pruning",
    sql="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY 1, 2
    """,
    doc="Hive-style partition pruning end-to-end: events are laid out "
        "partitionBy(event_date) (the canonical lake layout for a "
        "time-keyed 100-TB fact table), then read back with a date "
        "predicate that must resolve at PLANNING time — the scan's "
        "PartitionFilters prune to 3 of ~30 directories and the "
        "non-matching days are never opened (asserted in "
        "test_partition_pruning.py; the data filter never reaches the "
        "row level because partition columns are directory names, not "
        "file columns). The oracle states the same filter over the "
        "unpartitioned table. The write is a one-time fixture per "
        "call — at scale the layout exists once and every daily query "
        "pays only its slice.",
)
def s_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir

    ev = table(spark, sf_dir, "events")
    out = fixture_dir(
        "ev_bydate",
        sf_dir,
        lambda d: ev.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(d),
    )
    part = spark.read.parquet(out).where(
        F.col("event_date").between("2024-01-10", "2024-01-12")
    )
    return (
        part.groupBy(
            # dates stringify identically in both engines (a raw DATE
            # round-trips as midnight TIMESTAMP through DuckDB's pandas
            # bridge and breaks the value compare)
            F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "s_schema_evolution",
    sql="""
    WITH v1 AS (
        SELECT user_id, value, CAST(NULL AS VARCHAR) AS event_type
        FROM events WHERE ts < TIMESTAMP '2024-01-15'
    ),
    v2 AS (
        SELECT user_id, value, event_type
        FROM events WHERE ts >= TIMESTAMP '2024-01-15'
    ),
    unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT COALESCE(event_type, '(pre-schema)') AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM unioned GROUP BY 1
    """,
    doc="Lake schema evolution: a table whose early files predate a "
        "column (v1: no event_type) and later files carry it (v2) is "
        "read as ONE table via mergeSchema — the reader unions the "
        "footers at planning time and back-fills missing columns with "
        "NULL per file, exactly the additive-column evolution every "
        "long-lived 100-TB dataset goes through (no rewrite of old "
        "files, reads stay footer-bounded). The aggregate buckets the "
        "NULL back-fill explicitly so the oracle (which states the "
        "same union) matches value-for-value.",
)
def s_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir, load_events

    ev = load_events(spark, sf_dir)

    def _build(d: str) -> None:
        ev.where(F.col("ts") < "2024-01-15").select(
            "user_id", "value"
        ).write.mode("overwrite").parquet(f"{d}/v1")
        ev.where(F.col("ts") >= "2024-01-15").select(
            "user_id", "value", "event_type"
        ).write.mode("overwrite").parquet(f"{d}/v2")

    out = fixture_dir("ev_schemaevo", sf_dir, _build)
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/v1", f"{out}/v2"
    )
    return (
        merged.groupBy(
            F.coalesce("event_type", F.lit("(pre-schema)")).alias("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
    )


@register(
    "s_json_source",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events GROUP BY 1
    """,
    doc="JSON-lines source round-trip (S2 multi-format dispatch, real "
        "path): events written as JSONL (timestamps ISO-8601, nested "
        "props kept as a raw JSON string), read back with an EXPLICIT "
        "schema — no inference pass, the production rule for a 100-TB "
        "JSON lake since schema inference is itself a full scan — and "
        "aggregated; must match the oracle over the parquet original, "
        "proving the serialize/parse round-trip is lossless including "
        "microsecond timestamps and the embedded JSON payload (sum_k "
        "extracts from props post-round-trip).",
)
def s_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir, load_events

    ev = load_events(spark, sf_dir)
    out = fixture_dir(
        "ev_jsonl", sf_dir, lambda d: ev.write.mode("overwrite").json(d)
    )
    ts_type = dict(ev.dtypes)["ts"]
    back = (
        spark.read.schema(
            f"event_id long, ts {ts_type}, user_id long, "
            f"event_type string, value double, props string"
        )
        .json(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.sum(
            F.get_json_object("props", "$.k").cast("long")
        ).alias("sum_k"),
    )


@register(
    "s_csv_source",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents
    FROM lineitem GROUP BY 1, 2
    """,
    doc="CSV source round-trip (S2 multi-format dispatch, real path): "
        "lineitem written as headered CSV and read back with an "
        "explicit schema (header used for naming only — no inference "
        "scan); the aggregate must match the oracle "
        "over the parquet original (timestamps round-trip through "
        "Spark's default ISO format on both write and read). CSV is "
        "splittable by line, so the read parallelizes across the "
        "cluster like any text source; money survives because the "
        "check is exact integer cents, the same discipline every "
        "entry uses.",
)
def s_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir

    li = table(spark, sf_dir, "lineitem")
    out = fixture_dir(
        "li_csv",
        sf_dir,
        lambda d: li.write.mode("overwrite").option("header", "true").csv(d),
    )
    schema = ", ".join(
        f"{name} {dtype}" for name, dtype in li.dtypes
    )
    back = (
        spark.read.schema(schema)
        .option("header", "true")
        .csv(out)
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("price_cents"),
    )


_N_CORRUPT = 7  # malformed lines injected; the oracle shares the literal


@register(
    "s_corrupt_records",
    sql=f"""
    SELECT CAST(COUNT(*) + {_N_CORRUPT} AS BIGINT) AS n_total,
           CAST({_N_CORRUPT} AS BIGINT) AS n_corrupt,
           CAST(COUNT(*) AS BIGINT) AS n_parsed,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    """,
    doc="Fault-tolerant ingestion (PERMISSIVE mode): the events JSONL "
        "plus 7 injected malformed lines is read with an explicit "
        "schema + _corrupt_record column — bad lines land in the "
        "quarantine column with every data field NULL instead of "
        "failing the job or being silently dropped (the only "
        "acceptable behaviors at 100 TB are quarantine-and-count or "
        "fail-fast, never skip-and-shrug). The audit row proves the "
        "accounting: total = parsed + corrupt, and the parsed rows' "
        "exact cents sum shows no good line was lost. Oracle shares "
        "the injection count as a literal over the clean table.",
)
def s_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir, load_events

    ev = load_events(spark, sf_dir)

    def _build(d: str) -> None:
        ev.write.mode("overwrite").json(f"{d}/clean")
        bad = spark.createDataFrame(
            [(f"{{broken json line {i}",) for i in range(_N_CORRUPT)],
            "raw string",
        )
        bad.coalesce(1).write.mode("overwrite").text(f"{d}/bad")

    out = fixture_dir("ev_corrupt", sf_dir, _build)
    ts_type = dict(ev.dtypes)["ts"]
    back = (
        spark.read.schema(
            f"event_id long, ts {ts_type}, user_id long, event_type string, "
            f"value double, props string, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json([f"{out}/clean", f"{out}/bad"])
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(
            F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_corrupt"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_parsed"),
        F.sum(
            F.when(
                F.col("_corrupt_record").isNull(),
                F.round(F.col("value") * 100).cast("long"),
            )
        ).alias("sum_cents"),
    )


@register(
    "x_decimal_exact",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR)
               AS gross,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1 - l_discount AS DECIMAL(18, 2)))
                AS VARCHAR) AS net
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact DECIMAL arithmetic — the other standard money "
        "discipline beside this repo's integer-cents convention: "
        "2-decimal doubles cast to DECIMAL(18,2), summed and "
        "multiplied with Spark's decimal precision-promotion rules "
        "(sum -> DECIMAL(28,2); product -> scale 4), which DuckDB "
        "mirrors; results compare as canonical strings so the gate "
        "checks the DECIMAL pipeline end-to-end rather than a "
        "round-trip through binary floats. Decimal aggregation is "
        "exact and associative like integer cents — safe under any "
        "partial-aggregation order at 100 TB — at ~2x the compute of "
        "int64 (128-bit arithmetic), which is why the hot entries "
        "here prefer cents.",
)
def x_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    keep = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("gross"),
        F.sum(price * keep).cast("string").alias("net"),
    )


def _morton(a: Column, b: Column, nbits: int = 8) -> Column:
    """Morton (Z-order) interleave of two ``nbits``-bit ints — pure
    bit-shift expressions, fully inside whole-stage codegen."""
    z: Column = F.lit(0)
    for j in range(nbits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)), 2 * j)
            + F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    return z


@register(
    "s_zorder_layout",
    sql="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    WHERE user_id BETWEEN 10 AND 20
      AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY user_id
    """,
    doc="Z-ORDER (Morton space-filling curve) layout — the lakehouse "
        "OPTIMIZE ZORDER BY staple for multi-dimension file skipping, "
        "which hive partitioning cannot give (partitioning localizes "
        "ONE key; sorting by a second key inside partitions localizes "
        "nothing for the first). Events are quantized to an 8-bit x "
        "8-bit (user_id, day) grid, the grid coordinates are "
        "bit-interleaved into a Morton key (pure shift/and codegen "
        "expressions), and the table is range-repartitioned + sorted "
        "on that key, so every output file covers a small square of "
        "the (user, time) plane and its parquet min/max stats are "
        "TIGHT on BOTH columns. A 2-D box predicate then skips most "
        "files/row-groups via ordinary pushed filters on the original "
        "columns — no query rewrite needed (tests/test_zorder.py "
        "asserts a minority of files intersect the box, vs 100% under "
        "a time-sorted layout). The oracle states the same box "
        "aggregate over the unpartitioned table, proving the rewrite "
        "is lossless. At 100 TB this is the layout maintenance job "
        "that turns a full-scan dashboard query into a few-file read.",
)
def s_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir, load_events

    ev = load_events(spark, sf_dir)

    def _build(d: str) -> None:
        max_u = ev.agg(F.max("user_id")).first()[0]  # one scalar
        ub = F.expr(f"int((user_id * 256) div {max_u + 1})")
        db = F.expr(
            "int((datediff(to_date(ts), DATE '2024-01-01') * 256) div 30)"
        )
        (
            ev.withColumn("z", _morton(ub, db))
            .repartitionByRange(16, "z")
            .sortWithinPartitions("z")
            .drop("z")
            .write.mode("overwrite")
            .parquet(d)
        )

    out = fixture_dir("ev_zorder", sf_dir, _build)
    box = (
        spark.read.parquet(out)
        .where(F.col("user_id").between(10, 20))
        .where(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz"))
        )
    )
    return box.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


@register(
    "s_orc_source",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY 1
    """,
    doc="ORC source round-trip (S2 multi-format dispatch, real path): "
        "events written as ORC — the second columnar format a lake "
        "actually mixes with parquet — and read back, aggregate gated "
        "against the oracle over the parquet original. ORC scans get "
        "the same columnar treatment as parquet (column pruning, "
        "predicate pushdown into stripe/row-group indexes, vectorized "
        "read, splittable stripes), so at 100 TB a mixed parquet+ORC "
        "lake reads through one code path with per-format pushdown "
        "intact; timestamps survive via ORC's native timestamp type.",
)
def s_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir, load_events

    ev = load_events(spark, sf_dir)
    out = fixture_dir(
        "ev_orc", sf_dir, lambda d: ev.write.mode("overwrite").orc(d)
    )
    back = spark.read.orc(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@register(
    "s_xml_source",
    sql="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
    FROM documents GROUP BY lang
    """,
    doc="XML source round-trip (S2 multi-format dispatch, Spark 4 "
        "native XML): documents written as XML (one <doc> element per "
        "row, writer escapes markup), read back with an EXPLICIT "
        "schema (no inference scan — the 100-TB rule) and "
        "ignoreSurroundingSpaces=false so text round-trips "
        "byte-exactly; aggregated per lang and matched against the "
        "oracle over the parquet original, with COUNT(DISTINCT "
        "md5(text)) proving content integrity through the "
        "escape/parse cycle.",
)
def s_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir

    docs = table(spark, sf_dir, "documents")
    out = fixture_dir(
        "docs_xml",
        sf_dir,
        lambda d: docs.write.mode("overwrite")
        .option("rowTag", "doc")
        .format("xml")
        .save(d),
    )
    back = (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .format("xml")
        .load(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )


@register(
    "x_skyline_2d",
    sql="""
    WITH o AS (SELECT o_orderkey, o_totalprice,
                      CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT)
                          AS dkey
               FROM orders),
    r AS (SELECT o_orderkey, o_totalprice, dkey,
                 MIN(dkey) OVER (ORDER BY o_totalprice, o_orderkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS best_prior
          FROM o)
    SELECT o_orderkey, o_totalprice, dkey
    FROM r WHERE best_prior IS NULL OR dkey < best_prior
    ORDER BY o_totalprice, o_orderkey
    """,
    doc="Skyline (Pareto frontier) — orders where no other order is "
        "BOTH cheaper and earlier, the classic multi-criteria "
        "operator relational engines lack natively. The oracle "
        "states the textbook form (sorted sweep keeping rows that "
        "improve the running date minimum); the Spark plan computes "
        "the SAME sweep with the banded two-level trick (w7 "
        "discipline): orders cummin their date within their own "
        "price BAND in parallel, a per-band best-date offset table "
        "(one row per band, price-domain bounded) carries the "
        "running minimum across bands, and a row survives iff it "
        "beats the stitched prior minimum — no single task ever "
        "sorts the full table. Tie policy: equal-price orders "
        "compare by orderkey order, matching the oracle's unique "
        "sort.",
)
def x_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyyMMdd").cast("long").alias("dkey"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("band"),
    )
    wband = (
        Window.partitionBy("band")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_band = o.withColumn("prior_in_band", F.min("dkey").over(wband))
    band_best = o.groupBy("band").agg(F.min("dkey").alias("band_min"))
    woff = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )  # frame: one row per price band
    offsets = band_best.select(
        "band", F.min("band_min").over(woff).alias("prior_bands_min")
    )
    r = in_band.join(F.broadcast(offsets), "band").withColumn(
        "best_prior",
        F.least(
            F.coalesce("prior_in_band", F.lit(1 << 62)),
            F.coalesce("prior_bands_min", F.lit(1 << 62)),
        ),
    )
    return (
        r.where(
            (F.col("best_prior") == (1 << 62))
            | (F.col("dkey") < F.col("best_prior"))
        )
        .select("o_orderkey", "o_totalprice", "dkey")
        .orderBy("o_totalprice", "o_orderkey")
    )


@register(
    "x_sql_udf",
    sql="""
    SELECT CASE WHEN l_discount < 0.03 THEN 'low'
                WHEN l_discount < 0.07 THEN 'mid'
                ELSE 'high' END AS tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS net_cents
    FROM lineitem GROUP BY 1
    """,
    doc="Spark 4 SQL scalar UDFs (CREATE FUNCTION ... RETURN expr — "
        "SQL-defined, catalog-registered, and INLINED by Catalyst "
        "into the calling plan, so unlike Python/Java UDFs they cost "
        "nothing and never block predicate pushdown or codegen): a "
        "discount-tier classifier and a net-revenue-cents function "
        "defined in SQL and used from a spark.sql aggregation. The "
        "oracle states the same expressions inline; exact-cents "
        "equality proves the UDF bodies are substituted verbatim. "
        "This is the §2.11 extension surface at its cheapest — logic "
        "shared across queries with zero execution overhead.",
)
def x_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_for_sql_udf"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_tier(d DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN d < 0.03 THEN 'low' "
        "WHEN d < 0.07 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_cents(p DOUBLE, "
        "d DOUBLE) RETURNS BIGINT "
        "RETURN CAST(ROUND(p * (1.0 - d) * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT disc_tier(l_discount) AS tier,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(net_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS net_cents
        FROM li_for_sql_udf GROUP BY 1
        """
    )


@register(
    "o8_except_all",
    sql="""
    SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 25
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="Bag-semantics set difference (EXCEPT ALL — each occurrence "
        "cancels ONE occurrence from the other side), completing the "
        "O-family beyond o6's set-semantics EXCEPT: multiplicity-"
        "preserving difference is what dedup accounting needs when "
        "the same key legitimately appears k times (k copies minus j "
        "matched copies must leave k-j, not zero). Spark compiles "
        "exceptAll to a count-tagged aggregate + generator replay — "
        "one shuffle on the value, no join — the same plan a manual "
        "count-and-replicate would build.",
)
def o8_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") >= 25).select(
        F.col("l_partkey").alias("partkey")
    )
    b = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("partkey")
    )
    return a.exceptAll(b)


@register(
    "s7_tsv_roundtrip",
    sql="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang, source
    """,
    doc="S7 TSV sink gated END-TO-END (converts the last tests-only "
        "source/sink row to an oracle gate): the per-(lang, source) "
        "document rollup is written through sinks.write_tsv "
        "(reference configurators.py:97 export_tsv — header'd "
        "tab-separated), read back through sinks.read_tsv with an "
        "EXPLICIT schema (no inference scan), and returned — so the "
        "driver's value hash covers the full write/parse cycle "
        "against the oracle computed straight from parquet: a "
        "delimiter, header, quoting, or type-mapping bug in either "
        "sink half breaks exact equality. The round-tripped table is "
        "an AGGREGATE (bounded by the lang x source domain), which "
        "is what S7 exports in the reference too (INS spectra, not "
        "raw payloads); the writer itself stays executor-parallel "
        "(one part-file per partition) for large frames.",
)
def s7_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.plans import fixture_dir
    from mwa_uvdata_pipeline_spark.sinks import read_tsv, write_tsv

    agg = (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )
    out = fixture_dir("s7_tsv", sf_dir, lambda d: write_tsv(agg, d))
    return read_tsv(
        spark,
        out,
        schema="lang string, source string, n_docs long, sum_chars long",
    )


@register(
    "x8_batch_plan",
    sql="""
    WITH sz AS (SELECT source,
                       CAST(SUM(n_chars) AS BIGINT) AS size_units
                FROM documents GROUP BY source)
    SELECT source, size_units,
           CAST(size_units * 7 AS BIGINT) AS predicted,
           CAST(CASE WHEN size_units * 7 < 1000000 THEN 1
                     ELSE (size_units * 7 // 1000000) * 2
                END AS BIGINT) AS n_batches
    FROM sz
    """,
    doc="X8 memory/batch arithmetic gated cross-engine (converts the "
        "tests-only X8 row): the reference's compute_optimal_batches "
        "heuristic (utils.py:20-47 — predicted peak = 7x input, one "
        "batch if it fits, else (predicted // avail) * 2, with the "
        "SURVEY §8.1 NameError fixed as intent) applied per source "
        "over the corpus size profile, entirely in integer SQL both "
        "engines evaluate exactly. tests/test_round10.py additionally "
        "pins every row of this plan against the ACTUAL Python "
        "sources.compute_optimal_batches, so the SQL twin, the "
        "Spark column math, and the driver-side planning helper are "
        "provably the same rule. Scale: one map-side-combined "
        "aggregate to the bounded source domain, then row-local "
        "arithmetic.",
)
def x8_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    sz = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("size_units"))
    )
    return sz.select(
        "source",
        "size_units",
        (F.col("size_units") * 7).cast("long").alias("predicted"),
        F.expr(
            "CAST(CASE WHEN size_units * 7 < 1000000 THEN 1"
            " ELSE (size_units * 7 div 1000000) * 2 END AS BIGINT)"
        ).alias("n_batches"),
    )


@register(
    "x9_output_suffix",
    sql="""
    WITH combo AS (
        SELECT DISTINCT lang, source,
               (length(lang) * 7 + length(source)) % 3 AS st_i,
               (length(lang) + length(source)) % 3 AS nsel,
               length(source) % 3 AS npol
        FROM documents),
    named AS (
        SELECT lang, source, nsel, npol,
               CASE st_i WHEN 0 THEN 'all' WHEN 1 THEN 'auto'
                    ELSE 'cross' END AS spectrum_type
        FROM combo),
    parts AS (
        SELECT lang, source, spectrum_type, nsel, npol,
               list_filter([
                   CASE WHEN spectrum_type != 'all'
                        THEN spectrum_type END,
                   CASE WHEN nsel > 0 THEN 'sel' || array_to_string(
                        list_transform(range(1, nsel + 1),
                                       i -> CAST(i AS VARCHAR)), '-')
                        END,
                   CASE WHEN npol > 0 THEN array_to_string(
                        list_slice(['xx', 'yy'], 1, npol), '') END
               ], p -> p IS NOT NULL) AS ps
        FROM named)
    SELECT lang, source, spectrum_type,
           CAST(nsel AS BIGINT) AS nsel, CAST(npol AS BIGINT) AS npol,
           CASE WHEN len(ps) > 0
                THEN '.' || array_to_string(ps, '.')
                ELSE '' END AS suffix
    FROM parts
    UNION ALL
    SELECT 'default', 'default', 'all',
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), ''
    """,
    doc="X9 output-name suffix derivation gated cross-engine "
        "(converts the tests-only X9 row): the reference's "
        "suffix-from-options rule (configurators.py:125-134 — "
        "spectrum tag only when not 'all', 'sel<i-...>' antenna "
        "tags, concatenated pol tags, dot-joined with a leading dot, "
        "empty for all-defaults) applied to a BOUNDED combination "
        "frame derived from the distinct (lang, source) domain, so "
        "the empty-suffix case and every tag arm are exercised. "
        "tests/test_round10.py pins each row against the ACTUAL "
        "Python SelectOptions.suffix(), tying the SQL rule to the "
        "implementation the pipeline names its outputs with. Scale: "
        "the combination frame is attribute-domain bounded; the "
        "suffix build is row-local string work.",
)
def x9_output_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    combo = (
        table(spark, sf_dir, "documents")
        .select("lang", "source")
        .distinct()
        .select(
            "lang",
            "source",
            ((F.length("lang") * 7 + F.length("source")) % 3).alias("st_i"),
            ((F.length("lang") + F.length("source")) % 3).alias("nsel"),
            (F.length("source") % 3).alias("npol"),
        )
        .withColumn(
            "spectrum_type",
            F.expr(
                "CASE st_i WHEN 0 THEN 'all' WHEN 1 THEN 'auto'"
                " ELSE 'cross' END"
            ),
        )
    )
    parts = F.filter(
        F.array(
            F.when(
                F.col("spectrum_type") != "all", F.col("spectrum_type")
            ),
            F.when(
                F.col("nsel") > 0,
                F.concat(
                    F.lit("sel"),
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(1), F.col("nsel")),
                            lambda i: i.cast("string"),
                        ),
                        "-",
                    ),
                ),
            ),
            F.when(
                F.col("npol") > 0,
                F.array_join(
                    F.slice(F.array(F.lit("xx"), F.lit("yy")), 1, F.col("npol")),
                    "",
                ),
            ),
        ),
        lambda p: p.isNotNull(),
    )
    derived = combo.select(
        "lang",
        "source",
        "spectrum_type",
        F.col("nsel").cast("long").alias("nsel"),
        F.col("npol").cast("long").alias("npol"),
        F.when(
            F.size(parts) > 0,
            F.concat(F.lit("."), F.array_join(parts, ".")),
        )
        .otherwise("")
        .alias("suffix"),
    )
    # the data domain's string lengths may never produce the
    # all-defaults combination, so gate the empty-suffix arm with an
    # explicit row (both engines carry it — see the UNION ALL twin)
    default_row = spark.range(1).select(
        F.lit("default").alias("lang"),
        F.lit("default").alias("source"),
        F.lit("all").alias("spectrum_type"),
        F.lit(0).cast("long").alias("nsel"),
        F.lit(0).cast("long").alias("npol"),
        F.lit("").alias("suffix"),
    )
    return derived.unionAll(default_row)
