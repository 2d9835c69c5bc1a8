"""Multi-join headline queries and temporal join operators.

The reference exercises only broadcast-equi / anti join shapes
(SURVEY.md §2.3, ``utils.py:49-59``, ``configurators.py:157-162``); the
driver suite additionally grades the standard relational join family at
scale. These plans add the classic TPC-H-shaped multi-join aggregates
(pricing/priority/volume/forecast) as bench headliners, plus the two
temporal join operators a training-data pipeline needs that Spark lacks
as built-ins — as-of join and bounded range join — each expressed as a
scale-safe composition (single shuffle / bucketed equi-join, never an
O(n²) theta join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mwa_uvdata_pipeline_spark.plans import epoch_us, register, table
from mwa_uvdata_pipeline_spark.plans.relational import SQL_CENTS, cents


_REV = (
    f"CAST(SUM({SQL_CENTS('l_extendedprice')} "
    f"* (100 - {SQL_CENTS('l_discount')})) AS DOUBLE) / 10000.0"
)


@register(
    "q3_shipping_priority",
    sql=f"""
    SELECT l_orderkey,
           {_REV} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
    doc="TPC-H Q3 shape: customer⋈orders⋈lineitem with selective dim "
        "filters, hash agg, deterministic top-k (ties broken on the "
        "unique orderkey). customer is broadcast; orders⋈lineitem "
        "shuffles on the shared orderkey only.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_agg())
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def _rev_agg():
    """Exact fixed-point revenue: SUM(price_cents * (100 - disc_pct)) is an
    integer sum, order-independent across engines; divide once at the end."""
    return (
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast(
            "double"
        )
        / 10000.0
    ).alias("revenue")


@register(
    "q5_local_volume",
    sql=f"""
    SELECT n_name,
           {_REV} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    bench=True,
    doc="TPC-H Q5 shape: six-table join with every dimension "
        "(supplier/nation/region/customer) broadcast; only the "
        "orders⋈lineitem fact-fact join shuffles.",
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .groupBy("n_name")
        .agg(_rev_agg())
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q6_forecast_revenue",
    sql=f"""
    SELECT CAST(SUM({SQL_CENTS('l_extendedprice')}
                    * {SQL_CENTS('l_discount')}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate — every predicate "
        "pushes to the parquet row-group statistics; no shuffle beyond "
        "the single-row final agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double")
                / 10000.0
            ).alias("revenue")
        )
    )


@register(
    "j7_asof_join",
    sql="""
    WITH tagged AS (
        SELECT user_id, ts, event_id,
               event_type = 'purchase' AS is_purchase,
               CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS view_us
        FROM events
        WHERE event_type IN ('purchase', 'view')
    ), filled AS (
        SELECT user_id, ts, event_id, is_purchase,
               MAX(view_us) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_view_us
        FROM tagged
    )
    SELECT event_id, user_id, epoch_us(ts) AS purchase_us, last_view_us
    FROM filled WHERE is_purchase
    """,
    doc="As-of join (nearest prior match): for each purchase event, the "
        "most recent preceding view by the same user. Implemented as the "
        "scale-safe union-and-window pattern — one shuffle on user_id, "
        "no range-condition join, no row explosion; the per-user running "
        "MAX carries the right side forward. At 100 TB this is a single "
        "repartition by key + sorted window, never an O(n_l x n_r) pair "
        "enumeration.",
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = table(spark, sf_dir, "events")
    us = epoch_us(raw)
    ev = raw.where(F.col("event_type").isin("purchase", "view")).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").alias("is_purchase"),
        F.when(F.col("event_type") == "view", us).alias("view_us"),
        us.alias("event_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("last_view_us", F.max("view_us").over(w))
        .where("is_purchase")
        .select(
            "event_id",
            "user_id",
            F.col("event_us").alias("purchase_us"),
            "last_view_us",
        )
    )


@register(
    "j8_range_join",
    sql="""
    SELECT p.event_id, COUNT(c.event_id) AS n_clicks_10m
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 10 MINUTE
     AND c.ts < p.ts
    GROUP BY p.event_id
    """,
    doc="Bounded range join: clicks in the 10 minutes before each "
        "purchase, same user. The oracle states it as an inequality "
        "join; the Spark plan banded-buckets time (bucket = 600 s) so it "
        "runs as an equi-join on (user_id, bucket) — each purchase "
        "probes exactly two buckets, the exact range predicate refines "
        "after the match. Shuffle volume is O(rows), independent of the "
        "time-range width relative to data span, so the plan survives a "
        "100x scale-up where a theta join would cross-product each "
        "user's history.",
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = epoch_us(ev)
    window_s = 600
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        us.alias("p_us"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        us.alias("c_us"),
        (us / F.lit(window_s * 1_000_000)).cast("long").alias("bucket"),
    )
    # each purchase probes its own bucket and the one before it
    probes = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("p_us") / F.lit(window_s * 1_000_000)).cast("long"),
                (F.col("p_us") / F.lit(window_s * 1_000_000)).cast("long") - 1,
            )
        ),
    )
    matched = probes.join(
        clicks,
        (probes.user_id == clicks.c_user_id) & (probes.bucket == clicks.bucket),
        "left",
    ).where(
        F.col("c_us").isNull()
        | (
            (F.col("c_us") >= F.col("p_us") - window_s * 1_000_000)
            & (F.col("c_us") < F.col("p_us"))
        )
    )
    return (
        matched.groupBy("event_id")
        .agg(F.count("c_us").alias("n_clicks_10m"))
        .join(purchases.select("event_id"), "event_id", "right")
        .na.fill({"n_clicks_10m": 0})
        .select("event_id", "n_clicks_10m")
    )


def _bucketed_pair(spark: SparkSession, sf_dir: str):
    """orders + lineitem rewritten as bucketed tables on the join key.

    ``bucketBy(8, key).sortBy(key)`` persists the hash-partitioning in
    the table layout, so an equi-join between the two reads is
    co-located: the physical plan has NO Exchange on either join side
    (asserted in tests/test_round6.py). At 100 TB this is the standard
    answer to a repeated fact-fact join — pay the partitioning once at
    write time, amortize it over every subsequent join/agg on that key,
    and skip the dominant shuffle entirely. Rebuilt lazily per session
    (the catalog is session-scoped); written to a scratch dir as
    EXTERNAL tables so re-registration never trips the managed-table
    nonempty-location guard.
    """
    import re

    from mwa_uvdata_pipeline_spark.plans import scratch_dir

    tag = re.sub(r"\W+", "_", sf_dir).strip("_")
    names = {t: f"bkt_{t}_{tag}" for t in ("orders", "lineitem")}
    if not all(spark.catalog.tableExists(n) for n in names.values()):
        out = scratch_dir("bucketed_")
        for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
            (
                table(spark, sf_dir, tbl)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{out}/{tbl}")
                .mode("overwrite")
                .saveAsTable(names[tbl])
            )
    return spark.table(names["orders"]), spark.table(names["lineitem"])


@register(
    "j10_bucketed_join",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    bench=True,
    doc="Shuffle-free co-located fact-fact join: orders and lineitem "
        "bucketed 8-ways on the join key at write time, then merge-"
        "joined with ZERO Exchange on either input (the one exchange in "
        "the plan is the 5-group final agg). The write-once/join-many "
        "pattern that replaces the biggest shuffle of a 100-TB pipeline "
        "with a layout contract; plan asserted in tests/test_round6.py.",
)
def j10_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = _bucketed_pair(spark, sf_dir)
    # merge hint: at oracle scale the small side would auto-broadcast,
    # which also avoids the shuffle but does not demonstrate (or test)
    # the bucketing contract that survives at fact-fact scale
    return (
        l.hint("merge")
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
    )


_CDC_INS_OFF = 2_000_000_000  # inserted keys land in their own id space


@register(
    "x_cdc_apply",
    sql=f"""
    WITH base AS (
        SELECT o_orderkey, {SQL_CENTS('o_totalprice')} AS c
        FROM orders WHERE o_orderkey % 7 <> 0),
    changes AS (
        SELECT o_orderkey AS k, 'U' AS op,
               {SQL_CENTS('o_totalprice')} + 100 AS c
        FROM orders WHERE o_orderkey % 7 = 1
        UNION ALL
        SELECT o_orderkey, 'D', CAST(NULL AS BIGINT)
        FROM orders WHERE o_orderkey % 7 = 2
        UNION ALL
        SELECT o_orderkey + {_CDC_INS_OFF}, 'I', {SQL_CENTS('o_totalprice')}
        FROM orders WHERE o_orderkey % 7 = 0)
    SELECT COALESCE(b.o_orderkey, ch.k) AS o_orderkey,
           CASE WHEN ch.op IN ('U', 'I') THEN ch.c ELSE b.c END
               AS price_cents,
           CASE WHEN ch.op = 'U' THEN 'upd'
                WHEN ch.op = 'I' THEN 'ins'
                ELSE 'base' END AS src
    FROM base b FULL OUTER JOIN changes ch ON b.o_orderkey = ch.k
    WHERE ch.op IS NULL OR ch.op <> 'D'
    """,
    doc="CDC apply / MERGE INTO semantics as a plain DataFrame op: a "
        "change-set of inserts, updates and deletes (keyed, one op per "
        "key) applied to a snapshot via ONE full-outer join on the "
        "key — update rows take the change-side values, deletes drop "
        "the base row, inserts survive with no base match, untouched "
        "base rows pass through. This is the batch upsert every "
        "lakehouse table format (Delta/Iceberg/Hudi MERGE) executes "
        "under the hood; expressed directly it needs no table-format "
        "runtime and inherits Spark's join machinery — at 100 TB "
        "bucket both sides on the key (sinks.write_bucketed) and the "
        "merge runs with no shuffle on the snapshot side. The "
        "change-set here is derived deterministically from the orders "
        "key space (%7 slices: updates +1.00 on existing keys, deletes "
        "of existing keys, inserts in a disjoint id space).",
)
def x_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", cents("o_totalprice").alias("c")
    )
    changes = (
        orders.where(F.col("o_orderkey") % 7 == 1)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit("U").alias("op"),
            (cents("o_totalprice") + F.lit(100)).alias("cc"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 7 == 2).select(
                F.col("o_orderkey").alias("k"),
                F.lit("D").alias("op"),
                F.lit(None).cast("long").alias("cc"),
            )
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 7 == 0).select(
                (F.col("o_orderkey") + F.lit(_CDC_INS_OFF)).alias("k"),
                F.lit("I").alias("op"),
                cents("o_totalprice").alias("cc"),
            )
        )
    )
    merged = base.join(changes, base["o_orderkey"] == changes["k"], "full_outer")
    return (
        merged.where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce(base["o_orderkey"], F.col("k")).alias("o_orderkey"),
            F.when(F.col("op").isin("U", "I"), F.col("cc"))
            .otherwise(F.col("c"))
            .alias("price_cents"),
            F.when(F.col("op") == "U", F.lit("upd"))
            .when(F.col("op") == "I", F.lit("ins"))
            .otherwise(F.lit("base"))
            .alias("src"),
        )
    )


_PR_OFF = 1_000_000_000  # supplier node ids offset into their own space


@register(
    "graph_pagerank",
    sql=f"""
    WITH fwd AS (SELECT DISTINCT l_partkey AS u,
                        l_suppkey + {_PR_OFF} AS v
                 FROM lineitem),
    e AS (SELECT u, v FROM fwd UNION ALL SELECT v AS u, u AS v FROM fwd),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY u),
    r0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
    r1 AS (SELECT e.v AS node,
                  CAST(150000 + (85 * CAST(SUM(r0.r // deg.d) AS BIGINT))
                       // 100 AS BIGINT) AS r
           FROM e JOIN deg USING (u) JOIN r0 ON r0.node = e.u
           GROUP BY e.v),
    r2 AS (SELECT e.v AS node,
                  CAST(150000 + (85 * CAST(SUM(r1.r // deg.d) AS BIGINT))
                       // 100 AS BIGINT) AS r
           FROM e JOIN deg USING (u) JOIN r1 ON r1.node = e.u
           GROUP BY e.v),
    r3 AS (SELECT e.v AS node,
                  CAST(150000 + (85 * CAST(SUM(r2.r // deg.d) AS BIGINT))
                       // 100 AS BIGINT) AS r
           FROM e JOIN deg USING (u) JOIN r2 ON r2.node = e.u
           GROUP BY e.v)
    SELECT node, r AS rank_micro FROM r3
    """,
    bench=True,
    doc="PageRank (3 power iterations, damping 0.85) over the "
        "undirected part↔supplier bipartite graph, in EXACT integer "
        "arithmetic: ranks are micro-units and every step is integer "
        "division/multiplication/sum, so both engines converge to "
        "bit-identical values — no float accumulation-order hazard, "
        "which is what makes an iterative numeric fixpoint "
        "oracle-checkable at all. Per iteration: one contribution join "
        "edges⋈ranks (co-partitioned on the node key) + one hash agg — "
        "O(E) shuffle per round, the same shape GraphX materializes; "
        "complements the connected-components operator "
        "(operators/graph.py) for iterative-algorithm coverage. Each "
        "round's rank table is persisted and MATERIALIZED before the "
        "next round (previous round evicted), so the executed lineage "
        "is always one join+agg deep — the per-iteration truncation "
        "an iterative job needs at 100 TB, where a full-depth lineage "
        "re-execution after executor loss would replay every round.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_PR_OFF)).alias("v"),
    ).distinct()
    edges = fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ranks = deg.select(
        F.col("u").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    # every iteration reuses the (edge, degree) relation; without a
    # persist the distinct + degree agg lineage would re-execute once
    # per power iteration (measured 3.7s -> ~1.9s warm at sf0.1)
    e_deg = edges.join(deg, "u").persist()
    iters = []
    for _ in range(3):
        ranks = (
            e_deg.join(ranks, e_deg["u"] == ranks["node"])
            .select("v", F.expr("r div d").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("v").alias("node"),
                (F.lit(150_000) + F.expr("(85 * s) div 100"))
                .cast("long")
                .alias("r"),
            )
            .persist()
        )
        iters.append(ranks)
    # ONE materialization after the loop: computing the last round
    # builds every per-round cache along the way (each round's stages
    # read the previous round's just-built cache), so executed lineage
    # — and failure recomputation — is one join+agg deep per round,
    # at the cost of a single extra job rather than one per round.
    # Earlier rounds' caches are then dropped; the final consumer reads
    # only the last cache (PLANS.md shows the plan as one cache read).
    ranks.count()
    for r in iters[:-1]:
        r.unpersist()
    return ranks.select("node", F.col("r").alias("rank_micro"))


@register(
    "x_unpivot",
    sql=f"""
    SELECT 'quantity' AS measure,
           CAST(SUM({SQL_CENTS('l_quantity')}) AS BIGINT) AS sum_cents
    FROM lineitem
    UNION ALL
    SELECT 'price', CAST(SUM({SQL_CENTS('l_extendedprice')}) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'discount', CAST(SUM({SQL_CENTS('l_discount')}) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'tax', CAST(SUM({SQL_CENTS('l_tax')}) AS BIGINT)
    FROM lineitem
    """,
    doc="Unpivot (melt): the four lineitem measures stacked into "
        "(measure, value) rows and totaled per measure. The oracle "
        "states it as 4 scans + UNION ALL; the Spark plan uses the "
        "stack() generator so the table is scanned ONCE and each row "
        "expands to 4 — at 100 TB that is a 4x scan saving, and the "
        "output aggregate groups on a 4-value key so the shuffle is "
        "negligible (map-side partials collapse everything).",
)
def x_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.expr(
            "stack(4, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount, 'tax', l_tax) AS (measure, value)"
        )
    )
    return stacked.groupBy("measure").agg(
        F.sum(cents("value")).cast("long").alias("sum_cents")
    )


@register(
    "q13_order_histogram",
    sql="""
    SELECT n_orders, COUNT(*) AS n_custs
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
    GROUP BY n_orders
    """,
    doc="TPC-H Q13 shape: customer⋈orders left-outer join feeding a "
        "double aggregation (per-customer order count, then the count "
        "histogram). The outer join preserves order-less customers as "
        "n_orders=0; the second agg groups on a tiny-cardinality key so "
        "its shuffle is negligible — cost is one fact-fact shuffle on "
        "custkey shared by the join and the first agg.",
)
def q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_custs"))


@register(
    "q17_small_quantity",
    sql=f"""
    SELECT CAST(SUM({SQL_CENTS('l_extendedprice')}) AS DOUBLE) / 100.0 / 7.0
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk,
                 SUM({SQL_CENTS('l_quantity')}) AS sum_qty_cents,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY l_partkey) t ON pk = l_partkey
    WHERE p_brand = 'Brand#11'
      AND 5 * {SQL_CENTS('l_quantity')} * cnt < sum_qty_cents
    """,
    doc="TPC-H Q17 shape (correlated scalar subquery decorrelated): "
        "lineitems below 20% of their part's average quantity. The "
        "naive agg-then-rejoin shuffles lineitem twice (the probe "
        "branch carries the broadcast part filter below its exchange, "
        "so the two exchanges differ and Catalyst cannot reuse them — "
        "verified in the executed plan); instead the brand filter "
        "applies first (broadcast semi-join), then ONE shuffle on "
        "partkey feeds an unbounded window that computes the per-part "
        "sum/count in place. The threshold compare is exact integer "
        "math (5*qty*cnt < sum), so no cross-engine float-rounding "
        "flakiness at the boundary.",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#11"
    ).select("p_partkey")
    qty_cents = cents("l_quantity")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
        .select("l_partkey", qty_cents.alias("qty_cents"), cents("l_extendedprice").alias("price_cents"))
        .withColumn("sum_qty_cents", F.sum("qty_cents").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .where(5 * F.col("qty_cents") * F.col("cnt") < F.col("sum_qty_cents"))
        .agg(
            (F.sum("price_cents").cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q18_large_orders",
    sql=f"""
    SELECT c_name, o_orderkey, o_orderdate,
           CAST(SUM({SQL_CENTS('l_quantity')}) AS DOUBLE) / 100.0 AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM({SQL_CENTS('l_quantity')}) > 25000)
    GROUP BY c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
    bench=True,
    doc="TPC-H Q18 shape: orders whose total quantity exceeds a HAVING "
        "threshold. The HAVING is an unbounded window sum over ONE "
        "lineitem shuffle on l_orderkey (not aggregate → semi-join, "
        "which would shuffle lineitem twice); the surviving rows stay "
        "hash-partitioned by orderkey, so the orders join and the final "
        "per-order aggregate add no lineitem re-shuffle — orderkey "
        "functionally determines the other group keys, so "
        "hash(orderkey) satisfies the grouping distribution. customer "
        "is broadcast.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    qty_cents = cents("l_quantity")
    w = Window.partitionBy("l_orderkey")
    big_items = (
        li.select("l_orderkey", qty_cents.alias("qty_cents"))
        .withColumn("s", F.sum("qty_cents").over(w))
        .where(F.col("s") > 25000)
    )
    return (
        big_items.join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg((F.sum("qty_cents").cast("double") / 100.0).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@register(
    "q2_min_cost_supplier",
    bench=True,
    sql=f"""
    WITH pf AS (SELECT p_partkey FROM part WHERE p_size = 15),
    j AS (SELECT l_partkey, l_suppkey,
                 {SQL_CENTS('l_extendedprice')} AS price_cents
          FROM lineitem JOIN pf ON l_partkey = p_partkey),
    m AS (SELECT *, MIN(price_cents) OVER (PARTITION BY l_partkey)
                        AS min_cents
          FROM j)
    SELECT DISTINCT m.l_partkey AS p_partkey, s_name, n_name,
           CAST(min_cents AS DOUBLE) / 100.0 AS min_price
    FROM m
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE price_cents = min_cents
    """,
    doc="TPC-H Q2 shape (min-scalar-subquery join, lineitem standing in "
        "for partsupp): for each size-15 part, the supplier(s) offering "
        "its minimum price, with nation name. The correlated MIN "
        "decorrelates into an unbounded window over ONE lineitem shuffle "
        "on partkey (not agg-then-rejoin, which would shuffle the probe "
        "branch again); the part filter applies first as a broadcast "
        "semi-join, supplier and nation broadcast as dims. Price compare "
        "is exact integer cents, so min-equality never float-flakes; "
        "ties keep every minimal supplier, as Q2's ORDER/LIMIT would.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pf = table(spark, sf_dir, "part").where(F.col("p_size") == 15).select("p_partkey")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    sdim = sup.join(
        F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", "s_name", "n_name")
    w = Window.partitionBy("l_partkey")
    m = (
        li.join(F.broadcast(pf), li["l_partkey"] == pf["p_partkey"], "left_semi")
        .select("l_partkey", "l_suppkey", cents("l_extendedprice").alias("price_cents"))
        .withColumn("min_cents", F.min("price_cents").over(w))
        .where(F.col("price_cents") == F.col("min_cents"))
    )
    return (
        m.join(F.broadcast(sdim), m["l_suppkey"] == sdim["s_suppkey"])
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            (F.col("min_cents").cast("double") / 100.0).alias("min_price"),
        )
        .distinct()
    )


@register(
    "q4_order_priority",
    bench=True,
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (EXISTS with a date band, late-shipment "
        "predicate standing in for commit<receipt): orders in one "
        "quarter having at least one lineitem shipped more than 60 days "
        "after the order date, counted per priority. The EXISTS "
        "decorrelates to a LEFT SEMI join on the orderkey equi-key with "
        "the inequality as a residual join condition — shuffled hash "
        "semi-join keyed on orderkey, never a per-order probe loop; the "
        "selective quarter filter prunes the orders scan first.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sel = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q20_heavy_suppliers",
    bench=True,
    sql=f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, {SQL_CENTS('l_quantity')} AS qty_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'),
    tot AS (SELECT *, SUM(qty_cents) OVER (PARTITION BY l_partkey)
                          AS part_cents
            FROM shipped),
    sp AS (SELECT l_partkey, l_suppkey, CAST(SUM(qty_cents) AS BIGINT)
                      AS sp_cents,
                  CAST(MAX(part_cents) AS BIGINT) AS part_cents
           FROM tot GROUP BY l_partkey, l_suppkey),
    heavy AS (SELECT DISTINCT l_suppkey FROM sp
              WHERE 10 * sp_cents > 3 * part_cents)
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_3', 'NATION_7'))
    """,
    doc="TPC-H Q20 shape (nested semi-joins, lineitem standing in for "
        "partsupp availability): suppliers in two nations who shipped "
        "more than 30%% of some part's 1997 volume. Inner block: the "
        "per-part total is an unbounded window over ONE lineitem shuffle "
        "on partkey, and the (part, supplier) rollup reuses that "
        "partitioning (hash(partkey) satisfies the (part, supp) "
        "clustering) — no second lineitem exchange, verified in the "
        "plan. Outer block: two LEFT SEMI joins against the tiny heavy "
        "set and the broadcast nation filter. Threshold compare is "
        "integer math (10*sp > 3*total).",
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select("n_nationkey")
    )
    w = Window.partitionBy("l_partkey")
    shipped = li.where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", cents("l_quantity").alias("qty_cents"))
    sp = (
        shipped.withColumn("part_cents", F.sum("qty_cents").over(w))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("qty_cents").alias("sp_cents"),
            F.max("part_cents").alias("part_cents"),
        )
    )
    heavy = (
        sp.where(10 * F.col("sp_cents") > 3 * F.col("part_cents"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"], "left_semi")
        .join(heavy, sup["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q7_volume_shipping",
    sql=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
           {_REV} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): revenue "
        "by (supplier nation, customer nation, year) for the ordered "
        "nation pair in either direction. supplier⋈nation and "
        "customer⋈nation collapse to two broadcast dims pre-filtered to "
        "the two nations, so the inner joins prune both fact sides "
        "before the single orders⋈lineitem shuffle on orderkey; the "
        "disjunctive pair predicate is a residual on the pruned rows. "
        "Revenue is fixed-point cents.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    nat = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = (
        table(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    rev_cents = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg((F.sum(rev_cents).cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "q14_promo_effect",
    sql=f"""
    SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO'
                  THEN {SQL_CENTS('l_extendedprice')}
                       * (100 - {SQL_CENTS('l_discount')}) ELSE 0 END)
                AS DOUBLE)
           / SUM({SQL_CENTS('l_extendedprice')}
                 * (100 - {SQL_CENTS('l_discount')})) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14 shape (promotion effect): percent of one month's "
        "revenue from PROMO-type parts. part is a broadcast dim onto "
        "the date-pruned lineitem scan, conditional aggregation in one "
        "pass, no shuffle beyond the final single-row reduce. Both "
        "engines divide the same exact integers, so the double "
        "quotient is bit-identical.",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            ((100 * F.sum(promo)).cast("double") / F.sum(rev)).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q16_supplier_variety",
    sql="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (supplier variety per part class, lineitem "
        "standing in for partsupp): distinct suppliers per (brand, "
        "type, size) over selected sizes, excluding negative-balance "
        "suppliers. The NOT IN decorrelates to a broadcast LEFT ANTI "
        "join (s_suppkey is non-null so NOT IN ≡ anti-join); part "
        "filters broadcast-prune the scan; COUNT DISTINCT is a "
        "two-level hash agg on (group keys, suppkey) — no joins after "
        "the prune, one shuffle keyed by the group columns.",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_sup = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    sql=f"""
    SELECT {_REV} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19 shape (disjunctive predicate revenue): an OR of "
        "three (brand, size, quantity-band) conjunctions straddling "
        "the join. Catalyst splits the disjunction: the part-only "
        "disjuncts (brand OR brand OR brand, size <= 15) push below "
        "the broadcast to prune the dim, the lineitem-only bound "
        "(quantity <= 30) pushes into the fact scan, and the full OR "
        "evaluates as the join residual — the plan a hand-written "
        "union-of-three-joins would only match with three scans.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & (q >= 20) & (q <= 30)
        )
    )
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    return j.where(cond).agg(
        (F.sum(rev).cast("double") / 10000.0).alias("revenue")
    )


@register(
    "q21_waiting_suppliers",
    bench=True,
    sql="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (waiting suppliers; shipdate > orderdate+30 "
        "standing in for receipt > commit): suppliers who, in a "
        "finished multi-supplier order, shipped late and LAST. The "
        "correlated EXISTS + NOT EXISTS pair decorrelates to "
        "per-order window math instead of two lineitem self-joins: "
        "after the single orders⋈lineitem shuffle on orderkey, a "
        "window over the same partitioning collects the order's "
        "(shipdate, suppkey) rows — order groups are tiny and bounded "
        "— and per row, EXISTS ≡ another supplier present, NOT EXISTS "
        "≡ max shipdate among OTHER suppliers <= own. One fact "
        "shuffle, zero self-joins, supplier dim broadcast at the end.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy("l_orderkey")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    enriched = (
        j.withColumn(
            "order_rows",
            F.collect_list(F.struct("l_shipdate", "l_suppkey")).over(w),
        )
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "others_max",
            F.array_max(
                F.expr(
                    "transform(filter(order_rows,"
                    " x -> x.l_suppkey != l_suppkey), x -> x.l_shipdate)"
                )
            ),
        )
    )
    qualified = enriched.where(
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        & (F.col("n_supp") >= 2)
        & (F.col("others_max") <= F.col("l_shipdate"))
    )
    return (
        qualified.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q22_dormant_customers",
    sql="""
    WITH cust AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
        WHERE c_nationkey IN (3, 7, 11, 14, 17, 20, 23)),
    s AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS tot,
                 COUNT(*) AS npos
          FROM cust WHERE bal_cents > 0)
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(bal_cents) AS DOUBLE) / 100.0 AS totacctbal
    FROM cust, s
    WHERE bal_cents * npos > tot
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape (dormant high-balance customers; nationkey "
        "standing in for the phone country code): customers from "
        "listed nations with above-average positive balance and no "
        "order since 2000 (every synthetic customer has SOME "
        "order, so recency keeps the gate non-vacuous). The scalar "
        "AVG subquery becomes a broadcast 1-row "
        "(sum, count) aggregate and the comparison cross-multiplies "
        "in exact integer cents (bal * n > total ≡ bal > avg) — no "
        "float average to ulp-flip row membership across engines. The "
        "NOT EXISTS is a LEFT ANTI join shuffled on custkey.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(3, 7, 11, 14, 17, 20, 23))
        .select(
            "c_custkey", "c_nationkey", cents("c_acctbal").alias("bal_cents")
        )
    )
    stats = cust.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("tot"), F.count(F.lit(1)).alias("npos")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(stats))
        .where(F.col("bal_cents") * F.col("npos") > F.col("tot"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents").cast("double") / 100.0).alias("totacctbal"),
        )
    )


@register(
    "q8_market_share",
    bench=True,
    sql=f"""
    WITH vol AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {SQL_CENTS('l_extendedprice')}
                   * (100 - {SQL_CENTS('l_discount')}) AS vol4,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                              THEN vol4 ELSE 0 END) AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(vol4) AS BIGINT) AS DOUBLE) AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): NATION_7's share of "
        "PROMO-part revenue sold into ASIA per order-year. Eight-table "
        "join where every dimension chain (part filter, "
        "customer→nation→region, supplier→nation) broadcasts; the only "
        "shuffle is the orders⋈lineitem fact-fact join on orderkey. "
        "Share = ratio of two exact integer sums (conditional "
        "numerator via CASE), divided once as double — identical IEEE "
        "result in both engines, no per-row float accumulation.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = table(spark, sf_dir, "nation")
    cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n1.join(
                    F.broadcast(region),
                    n1["n_regionkey"] == region["r_regionkey"],
                    "left_semi",
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    sup = table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key")
    ).select("s_suppkey", "supp_nation")
    vol4 = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("vol4")
    rows = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_semi")
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol4,
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("vol4")).otherwise(F.lit(0))
    ).cast("long")
    den = F.sum("vol4").cast("long")
    return (
        rows.groupBy("o_year")
        .agg((num.cast("double") / den.cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    bench=True,
    sql=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM({SQL_CENTS('l_extendedprice')}
                         * (100 - {SQL_CENTS('l_discount')})
                         - {SQL_CENTS('p_retailprice')}
                           * {SQL_CENTS('l_quantity')}) AS BIGINT)
                AS DOUBLE) / 10000.0 AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit; p_retailprice*quantity "
        "standing in for ps_supplycost*quantity since the trimmed "
        "schema has no partsupp): per supplier-nation per order-year, "
        "sum of discounted revenue minus retail cost over parts whose "
        "name contains 'bolt'. part (name-filtered) and "
        "supplier⋈nation broadcast; orders⋈lineitem is the single "
        "fact-fact shuffle on orderkey. Profit accumulates in exact "
        "integer 10^-4-dollar units (cents×pct and cents×cents are "
        "both 10^-4 scale), one divide at the end.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    nat = table(spark, sf_dir, "nation")
    sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit4 = cents("l_extendedprice") * (100 - cents("l_discount")) - cents(
        "p_retailprice"
    ) * cents("l_quantity")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit4.alias("profit4"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("profit4").cast("double") / 10000.0).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q10_returned_items",
    bench=True,
    sql=f"""
    SELECT c_custkey, c_name,
           {_REV} AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): top-20 customers "
        "by revenue lost to returns in one quarter. The quarter filter "
        "prunes orders before the fact-fact shuffle on orderkey; the "
        "returnflag filter prunes lineitem at the scan "
        "(PushedFilters); customer and nation broadcast onto the "
        "aggregated custkey rollup. Deterministic top-k: ties broken "
        "on the unique custkey. Revenue is the exact fixed-point sum.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    nat = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    )
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(_rev_agg())
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment"
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q11_important_parts",
    sql=f"""
    WITH nat_li AS (
        SELECT l_partkey, {SQL_CENTS('l_extendedprice')} AS price_cents
        FROM lineitem
        WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                                  WHERE n_name = 'NATION_7'))),
    tot AS (SELECT CAST(SUM(price_cents) AS BIGINT) AS tot_cents,
                   COUNT(DISTINCT l_partkey) AS n_parts
            FROM nat_li)
    SELECT l_partkey AS p_partkey,
           CAST(CAST(SUM(price_cents) AS BIGINT) AS DOUBLE) / 100.0 AS value
    FROM nat_li, tot
    GROUP BY l_partkey, tot_cents, n_parts
    HAVING CAST(SUM(price_cents) AS BIGINT) * n_parts > 2 * tot_cents
    ORDER BY value DESC, p_partkey
    """,
    doc="TPC-H Q11 shape (important stock; lineitem value standing in "
        "for partsupp supplycost*availqty): parts whose NATION_7 "
        "shipped value exceeds twice the average part's share — "
        "scale-free where Q11's fixed fraction (spec: 0.0001/SF) "
        "empties at larger SFs. The "
        "scalar global-sum subquery becomes a broadcast 1-row "
        "aggregate cross-joined onto the per-part rollup — one "
        "lineitem shuffle on partkey for the rollup, one partial-agg "
        "reduction for the total, no recompute of the filtered scan "
        "thanks to semi-join pushdown on the broadcast supplier set. "
        "The HAVING compares exact integers cross-multiplied "
        "(sum*500 > total ≡ sum > 0.2%% of total).",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey")
    )
    nat_li = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("l_partkey", cents("l_extendedprice").alias("price_cents"))
    )
    tot = nat_li.agg(
        F.sum("price_cents").alias("tot_cents"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        nat_li.groupBy("l_partkey")
        .agg(F.sum("price_cents").alias("part_cents"))
        .join(F.broadcast(tot))
        .where(F.col("part_cents") * F.col("n_parts") > 2 * F.col("tot_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("part_cents").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


@register(
    "q12_ship_delay",
    sql="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 60
                THEN '60+' ELSE '30-59' END AS delay_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND date_diff('day', o_orderdate, l_shipdate) >= 30
    GROUP BY delay_band
    ORDER BY delay_band
    """,
    doc="TPC-H Q12 shape (shipping-mode priority; ship-delay bands "
        "standing in for shipmode since the trimmed schema has no "
        "l_shipmode/commitdate/receiptdate): lineitems shipped in 1997 "
        "at least 30 days after ordering, banded by delay, counting "
        "high- vs low-priority orders per band via conditional "
        "aggregation. Single orders⋈lineitem shuffle on orderkey; the "
        "delay predicate is a residual on the join output; the "
        "two-value band key makes the final agg a 2-group reduction.",
)
def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_shipdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(delay >= 30)
        .select(
            F.when(delay >= 60, "60+").otherwise("30-59").alias("delay_band"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("delay_band")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("delay_band")
    )


@register(
    "q15_top_supplier",
    sql=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({SQL_CENTS('l_extendedprice')}
                        * (100 - {SQL_CENTS('l_discount')})) AS BIGINT)
                   AS rev4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey),
    m AS (SELECT CAST(MAX(rev4) AS BIGINT) AS max4 FROM revenue)
    SELECT s_suppkey, s_name,
           CAST(rev4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no, m
    WHERE rev4 = max4
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier via a revenue view): the "
        "supplier(s) with maximum revenue in 1997Q1. The correlated "
        "MAX-over-view subquery decorrelates to a broadcast 1-row MAX "
        "cross-joined onto the per-supplier rollup (one lineitem "
        "shuffle on suppkey; the rollup is NOT recomputed for the max "
        "— Spark reuses the exchange). Equality compares exact "
        "integer 10^-4-dollar units, so max-ties are kept identically "
        "in both engines; supplier dim broadcasts onto the tiny "
        "winners set.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = (
        li.select(
            "l_suppkey",
            (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("v4"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("v4").alias("rev4"))
    )
    m = rev.agg(F.max("rev4").alias("max4"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(m))
        .where(F.col("rev4") == F.col("max4"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev4").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "graph_triangles",
    sql="""
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_quantity >= 30 AND b.l_quantity >= 30
    ),
    t AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    n AS (
        SELECT a AS node FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM n GROUP BY node
    """,
    bench=True,
    doc="Per-node triangle counting over the bulk co-purchase graph "
        "(parts sharing an order with quantity >= 30; the quantity "
        "predicate reaches the parquet scan, and pair generation is "
        "bounded per order by the ~7-line TPC-H order size). The "
        "unfiltered graph is birthday-paradox dense (41M wedges at "
        "sf0.1); the quantity gate keeps the wedge census within the "
        "headline-bench budget while the graph stays non-trivial at "
        "every sf. The oracle states the naive "
        "id-ordered three-way self-join; the Spark plan uses the "
        "degree-ordered orientation (each edge points low-degree -> "
        "high-degree, ties by id), the standard O(E^1.5) wedge bound: "
        "wedge fan-out per node is out-degree^2 under the orientation "
        "that minimizes hub out-degrees, so a celebrity node with "
        "degree d contributes d wedges, not d^2. Per-node counts are "
        "orientation-invariant, so both formulations agree exactly. "
        "All joins are equi-joins on node keys (wedge join on the apex, "
        "closure join on the (b, c) pair); no theta join anywhere.",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _g_fwd: ONE groupBy shuffle + in-memory expansion of the bounded
    # (~7-part) per-order set, instead of a lineitem⋈lineitem
    # sort-merge self-join (two shuffle legs over the full fact table).
    # Persisted: consumed by the degree agg AND both sides of the
    # orientation join.
    edges = _g_fwd(spark, sf_dir).persist()
    deg = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    # orient low-degree -> high-degree (lexicographic on (degree, id));
    # carry the destination's (degree, id) key so the wedge join can
    # order its two legs without another degree lookup
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_d"),
    ).persist()  # three consumers: both wedge legs + the closing join
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("b"), F.col("dst_d").alias("bd")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("c"), F.col("dst_d").alias("cd")
    )
    wedges = e1.join(e2, "src").where(
        (F.col("bd") < F.col("cd"))
        | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).select(
        F.array(F.col("src"), F.col("b"), F.col("c")).alias("nodes")
    )
    return (
        tri.select(F.explode("nodes").alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


# final-step OLS arithmetic over the exact integer co-moments, written
# ONCE and parsed by BOTH engines (F.expr below, oracle SQL above): the
# int64 sums are exact in either engine, int64 -> double conversion is
# IEEE-deterministic, and *, /, sqrt are correctly rounded, so identical
# expression trees over identical integers yield bit-identical doubles.
_LR_D = {c: f"CAST({c} AS DOUBLE)" for c in ("n", "sx", "sy", "sxy", "sxx", "syy")}
_LR_COV = f"({_LR_D['n']} * {_LR_D['sxy']} - {_LR_D['sx']} * {_LR_D['sy']})"
_LR_VARX = f"({_LR_D['n']} * {_LR_D['sxx']} - {_LR_D['sx']} * {_LR_D['sx']})"
_LR_VARY = f"({_LR_D['n']} * {_LR_D['syy']} - {_LR_D['sy']} * {_LR_D['sy']})"
_LR_SLOPE = f"({_LR_COV} / {_LR_VARX})"
_LR_INTERCEPT = f"(({_LR_D['sy']} - {_LR_SLOPE} * {_LR_D['sx']}) / {_LR_D['n']})"
_LR_R = f"({_LR_COV} / sqrt({_LR_VARX} * {_LR_VARY}))"


@register(
    "ml_linreg",
    sql=f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM (
            SELECT l_returnflag,
                   CAST(ROUND(l_quantity) AS BIGINT) AS x,
                   CAST(ROUND(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        )
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy,
           {_LR_SLOPE} AS slope,
           {_LR_INTERCEPT} AS intercept,
           {_LR_R} AS r
    FROM m
    """,
    doc="Distributed OLS (price ~ quantity per return flag) via the "
        "normal equations over EXACT integer co-moments: one map-side "
        "partial aggregation computes (n, Σx, Σy, Σxy, Σx², Σy²) as "
        "int64 — the six-number mergeable sufficient statistic, so the "
        "shuffle moves 6 longs per group regardless of fact volume, the "
        "distributed-ML primitive (the same statistic trains the model "
        "at 100 TB with zero extra passes). Slope/intercept/Pearson r "
        "are derived in a final single-row-per-group step whose double "
        "expression tree is shared VERBATIM with the oracle SQL, making "
        "an inherently floating-point model fit exactly "
        "oracle-checkable (int64 sums are exact, int->double conversion "
        "and IEEE *,/,sqrt are deterministic). Integer headroom is "
        "audited: y<=105000, y²·N ≈ 6.6e15 at sf0.1 << 2^63.",
)
def ml_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.select(
        "l_returnflag", "n", "sx", "sy",
        F.expr(_LR_SLOPE).alias("slope"),
        F.expr(_LR_INTERCEPT).alias("intercept"),
        F.expr(_LR_R).alias("r"),
    )


@register(
    "x_bloom_prune",
    sql=f"""
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM({SQL_CENTS('l_extendedprice')}) AS BIGINT) AS rev_cents
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_9'
    )
    GROUP BY l_suppkey
    """,
    doc="Runtime bloom pruning as an explicit operator "
        "(operators/bloom.py): the supplier keys of one nation build a "
        "fixed 2^16-bit bitmap (one row of 1024 longs, size independent "
        "of dim cardinality), the fact scan drops non-members with a "
        "codegen'd bitwise test BEFORE the shuffle, and an exact "
        "broadcast semi-join removes the bloom's false positives. The "
        "oracle is the plain semi-join — the bloom is transparent by "
        "construction (no false negatives). At 100 TB this is the "
        "pattern that prunes a fact shuffle by a selective dim "
        "predicate when the optimizer's own runtime filter does not "
        "fire (DPP-less file sources, UDF-hidden predicates): shuffle "
        "volume becomes |matching rows| + FP rate, not |fact|.",
)
def x_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mwa_uvdata_pipeline_spark.operators.bloom import build_bloom, might_contain

    nat = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    dim = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    bloom = build_bloom(dim, "s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    pruned = li.join(F.broadcast(bloom)).where(
        might_contain("words", "l_suppkey")
    )
    exact = pruned.join(
        F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    return exact.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(cents("l_extendedprice")).alias("rev_cents"),
    )


# association-rule strength metrics, written once and parsed by both
# engines (same exact-int -> double determinism argument as _LR_*)
_AR_CONF = "(CAST(supp_ab AS DOUBLE) / CAST(supp_a AS DOUBLE))"
_AR_LIFT = (
    "((CAST(supp_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)) "
    "/ (CAST(supp_a AS DOUBLE) * CAST(supp_b AS DOUBLE)))"
)


@register(
    "x_assoc_rules",
    sql=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(COUNT(*) AS BIGINT) AS supp_ab
        FROM op a
        JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    directed AS (
        SELECT u AS ante, v AS cons, supp_ab FROM pairs
        UNION ALL
        SELECT v AS ante, u AS cons, supp_ab FROM pairs
    ),
    supp AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS supp_1
        FROM op GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM lineitem)
    SELECT ante, cons, supp_ab,
           sa.supp_1 AS supp_a, sb.supp_1 AS supp_b,
           {_AR_CONF} AS confidence,
           {_AR_LIFT} AS lift
    FROM directed
    JOIN supp sa ON ante = sa.l_partkey
    JOIN supp sb ON cons = sb.l_partkey
    CROSS JOIN n
    """,
    bench=True,
    doc="Market-basket association rules (the pair tier of FP-growth): "
        "antecedent->consequent part pairs co-purchased in >= 2 orders, "
        "scored with support / confidence / lift. Pair candidates come "
        "from the same bounded per-basket expansion as graph_triangles "
        "(one groupBy shuffle, no fact self-join); item supports are "
        "one hash-agg over the distinct (order, part) pairs; the "
        "basket total is a broadcast 1-row aggregate. Confidence and "
        "lift derive from exact int64 counts through a double "
        "expression tree shared verbatim with the oracle. At 100 TB "
        "the support threshold is the scale lever — it prunes the "
        "pair table BEFORE the metric joins, and per-basket expansion "
        "cost stays |basket|^2 with baskets bounded by domain rules.",
)
def x_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # ONE fact scan feeds everything: baskets (order -> part set) is
    # persisted, and pairs, per-item supports AND the basket total all
    # derive from it — the previous shape scanned lineitem five times
    # (two Union pair branches, two supp broadcast builds, the
    # n_orders leg). explode(ps) over a basket is exactly the distinct
    # (order, part) row set, and count(baskets) is exactly
    # countDistinct(l_orderkey), so the derived legs are value-equal.
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .persist()
    )
    pairs = (
        baskets.select(F.explode(F.expr(_PAIR_EXPAND_SQL)).alias("e"))
        .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("supp_ab"))
        .where(F.col("supp_ab") >= 2)
    )
    # both rule directions from ONE pair subtree (the Union form
    # planned the whole mining pipeline twice)
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("u").alias("ante"),
                    F.col("v").alias("cons"),
                    F.col("supp_ab").alias("supp_ab"),
                ),
                F.struct(
                    F.col("v").alias("ante"),
                    F.col("u").alias("cons"),
                    F.col("supp_ab").alias("supp_ab"),
                ),
            )
        ).alias("d")
    ).select("d.ante", "d.cons", "d.supp_ab")
    # persisted: the ante and cons broadcast builds are separate
    # subtrees, so without this the explode+agg over the basket cache
    # runs once per build (event-log: two ~0.9s 32-task stages)
    supp = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("supp_1"))
        .persist()
    )
    n = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return (
        directed.join(
            supp.select(F.col("l_partkey").alias("ante"),
                        F.col("supp_1").alias("supp_a")),
            "ante",
        )
        .join(
            supp.select(F.col("l_partkey").alias("cons"),
                        F.col("supp_1").alias("supp_b")),
            "cons",
        )
        .join(F.broadcast(n))
        .select(
            "ante", "cons", "supp_ab", "supp_a", "supp_b",
            F.expr(_AR_CONF).alias("confidence"),
            F.expr(_AR_LIFT).alias("lift"),
        )
    )


_G_EDGES_SQL = """
    fwd AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_quantity >= 30 AND b.l_quantity >= 30
    ),
    e AS (SELECT u, v FROM fwd UNION ALL SELECT v, u FROM fwd)
"""


# unordered-pair expansion of a per-basket item set `ps` — each pair
# once, normalized (u < v); shared by every basket-derived graph/rule
# entry so the slice arithmetic lives in exactly one place
_PAIR_EXPAND_SQL = (
    "flatten(transform(ps, (x, i) -> "
    "transform(slice(ps, i + 2, size(ps)), "
    "y -> struct(least(x, y) AS u, greatest(x, y) AS v))))"
)


def _g_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward (u < v, distinct) bulk co-purchase edges: parts sharing
    an order with quantity >= 30, via one groupBy + bounded in-basket
    expansion (no fact self-join)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_partkey")
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode(F.expr(_PAIR_EXPAND_SQL)).alias("p"))
        .select("p.u", "p.v")
        .distinct()
    )


def _g_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected bulk co-purchase edge list (both directions)."""
    fwd = _g_fwd(spark, sf_dir)
    return fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))


@register(
    "graph_bfs_hops",
    sql=f"""
    WITH RECURSIVE {_G_EDGES_SQL},
    r(node, d) AS (
        SELECT u AS node, 0 AS d FROM e WHERE u < 10
        UNION ALL
        SELECT e.v, r.d + 1 FROM r JOIN e ON e.u = r.node WHERE r.d < 3
    )
    SELECT node, CAST(MIN(d) AS BIGINT) AS dist
    FROM r GROUP BY node
    """,
    doc="Bounded BFS (3 hops) from a seed set over the bulk "
        "co-purchase graph: per-node minimum hop distance. The oracle "
        "states it as depth-bounded recursive path enumeration; the "
        "Spark plan is level-synchronous BFS — per round ONE frontier⋈"
        "edges equi-join and a min-dist aggregate, the frontier "
        "deduplicated before expanding so work per round is "
        "O(frontier-adjacent edges), never the oracle's path count "
        "(which grows as degree^depth). The reachability/ego-network "
        "primitive; 3 rounds = 3 shuffles, each co-partitioned on the "
        "node key.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _g_edges(spark, sf_dir).persist()
    seeds = (
        edges.where(F.col("u") < 10)
        .select(F.col("u").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    best = seeds
    frontier = seeds
    for d in range(1, 4):
        reached = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .withColumn("dist", F.lit(d).cast("long"))
        )
        # next frontier: nodes not already reached at a smaller depth
        frontier = reached.join(
            best.select("node"), "node", "left_anti"
        ).persist()
        best = best.union(frontier)
    return best.groupBy("node").agg(F.min("dist").alias("dist"))


@register(
    "graph_kcore_peel",
    sql=f"""
    WITH {_G_EDGES_SQL},
    d0 AS (SELECT u, COUNT(*) AS deg FROM e GROUP BY u),
    k0 AS (SELECT u FROM d0 WHERE deg >= 5),
    e1 AS (SELECT e.u, e.v FROM e
           JOIN k0 a ON e.u = a.u JOIN k0 b ON e.v = b.u),
    d1 AS (SELECT u, COUNT(*) AS deg FROM e1 GROUP BY u),
    k1 AS (SELECT u FROM d1 WHERE deg >= 5),
    e2 AS (SELECT e1.u, e1.v FROM e1
           JOIN k1 a ON e1.u = a.u JOIN k1 b ON e1.v = b.u),
    d2 AS (SELECT u, COUNT(*) AS deg FROM e2 GROUP BY u),
    k2 AS (SELECT u FROM d2 WHERE deg >= 5),
    e3 AS (SELECT e2.u, e2.v FROM e2
           JOIN k2 a ON e2.u = a.u JOIN k2 b ON e2.v = b.u)
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e3 GROUP BY u
    """,
    doc="k-core peeling (k=5, 3 synchronized rounds): repeatedly drop "
        "nodes with degree < 5 and re-induce the subgraph — the "
        "degeneracy-based community/spam filter that strips hangers-on "
        "before expensive graph ML. Each round is one degree hash-agg "
        "+ two semi-shaped joins re-inducing the edge set, all "
        "equi-joins on node keys; the oracle unrolls the SAME three "
        "rounds as nested CTEs, so both engines compute the identical "
        "fixed-round peel (full-fixpoint peeling is the same loop run "
        "until the survivor set stops changing — rounds here are "
        "synchronized, so round counts match across engines by "
        "construction).",
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _g_edges(spark, sf_dir).persist()
    e = edges
    for _ in range(3):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= 5).select("u")
        # each round's edge set feeds BOTH the next degree agg and the
        # next induction joins; without the persist round r re-executes
        # rounds 1..r-1 (2^rounds lineage blow-up — measured 9.3s -> ~2s
        # warm at sf0.1)
        e = (
            e.join(keep, "u")
            .join(keep.withColumnRenamed("u", "v"), "v")
            .select("u", "v")
            .persist()
        )
    return e.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    ).select(F.col("u").alias("node"), "core_degree")


@register(
    "graph_jaccard_linkpred",
    sql="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_quantity >= 30 AND b.l_quantity >= 30
    ),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY u),
    lowdeg AS (SELECT e.u, e.v FROM e
               JOIN deg ON e.v = deg.node WHERE deg.d <= 64),
    wedge AS (
        SELECT e1.u AS a, e2.u AS b,
               CAST(COUNT(*) AS BIGINT) AS common
        FROM lowdeg e1 JOIN lowdeg e2
          ON e1.v = e2.v AND e1.u < e2.u
        GROUP BY e1.u, e2.u),
    nonedge AS (
        SELECT w.a, w.b, w.common FROM wedge w
        LEFT JOIN e0 ON w.a = e0.u AND w.b = e0.v
        WHERE e0.u IS NULL),
    scored AS (
        SELECT n.a, n.b, n.common,
               CAST(n.common * 1000000 //
                    (da.d + db.d - n.common) AS BIGINT) AS jaccard_ppm
        FROM nonedge n
        JOIN deg da ON n.a = da.node
        JOIN deg db ON n.b = db.node)
    SELECT a, b, common, jaccard_ppm FROM scored
    ORDER BY jaccard_ppm DESC, a, b LIMIT 50
    """,
    doc="Common-neighbor link prediction on the co-purchase graph — "
        "the 'parts that SHOULD ship together but have not yet' "
        "recommendation query: for every non-adjacent pair sharing a "
        "neighbor, the Jaccard score |N(a) n N(b)| / |N(a) u N(b)| in "
        "integer ppm (one floor division, exact). The wedge "
        "enumeration groups by the shared neighbor exactly like "
        "graph_triangles' candidate stage, the anti join removes "
        "existing edges, and degree lookups are two joins against the "
        "node-count-sized degree table; global top-50 is a "
        "TakeOrdered. The quadratic term is CAPPED by design: only "
        "shared neighbors of degree <= 64 generate wedges (the "
        "standard hub filter — a part in thousands of baskets says "
        "nothing about pairwise affinity, which is why Adamic-Adar "
        "down-weights hubs to ~0), so wedge volume is <= 64 x |E| "
        "and the plan stays linear at any graph size (this "
        "generator's degrees are scale-invariant, max 61, so the cap "
        "is idle insurance here: measured 2.2x at a true 10x graph, "
        "11.8x at 30x — sub-linear per unit — with wedge volume "
        "tracking sum(deg^2) exactly). Full degrees still feed the "
        "denominator.",
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = _g_fwd(spark, sf_dir).persist()
    e = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = (
        e.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .persist()  # consumers: hub filter + both denominator legs
    )
    lowdeg = e.join(
        deg.where(F.col("d") <= 64).select(F.col("node").alias("v")), "v"
    ).select("u", "v")
    wedge = (
        lowdeg.alias("e1")
        .join(lowdeg.alias("e2"), F.col("e1.v") == F.col("e2.v"))
        .where(F.col("e1.u") < F.col("e2.u"))
        .groupBy(F.col("e1.u").alias("a"), F.col("e2.u").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    nonedge = wedge.join(
        fwd.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        nonedge.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            F.expr(
                "CAST(common * 1000000 div (da + db - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "a", "b")
        .limit(50)
    )


@register(
    "x_content_hash",
    sql="""
    WITH h AS (
        SELECT CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS ship_year,
               CAST(list_sum(list_transform(
                   generate_series(1, 8),
                   i -> (strpos('0123456789abcdef',
                         substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                                    CAST(l_linenumber AS VARCHAR) || '|' ||
                                    CAST(CAST(ROUND(l_quantity * 100)
                                         AS BIGINT) AS VARCHAR)), i, 1))
                         - 1) * 16 ** (8 - i))) AS BIGINT) AS hv
        FROM lineitem)
    SELECT ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(hv) AS BIGINT) AS content_hash
    FROM h GROUP BY ship_year
    """,
    doc="Orderless table content checksum — the anti-entropy primitive "
        "replica/migration audits run (same idea as Iceberg snapshot "
        "summaries or pg_comparator): each row canonicalizes its key "
        "columns to a '|'-joined string (floats pre-quantized to "
        "integer cents so both engines render identical text), hashes "
        "to a 32-bit md5 prefix, and the per-partition checksum is "
        "the plain SUM — commutative and mergeable, so shard "
        "checksums roll up to the table checksum in any order, and "
        "two tables differ iff some partition's sum differs (up to "
        "hash collisions). One projection + one hash agg; the "
        "cheapest possible cross-cluster table comparison.",
)
def x_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.round(F.col("l_quantity") * 100).cast("long").cast("string"),
    )
    hv = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    return (
        li.select(
            F.year("l_shipdate").cast("long").alias("ship_year"),
            hv.alias("hv"),
        )
        .groupBy("ship_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("hv").cast("long").alias("content_hash"),
        )
    )


@register(
    "graph_bfs_recursive",
    sql="""
    WITH RECURSIVE e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        WHERE a.l_quantity >= 30 AND b.l_quantity >= 30
    ),
    bfs(node, hop) AS (
        SELECT MIN(u), 0 FROM e
        UNION ALL
        SELECT e.v, bfs.hop + 1
        FROM bfs JOIN e ON e.u = bfs.node
        WHERE bfs.hop < 3
    )
    SELECT CAST(hop AS INTEGER) AS hop,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM (SELECT node, MIN(hop) AS hop FROM bfs GROUP BY node)
    GROUP BY hop
    """,
    doc="Recursive-CTE BFS (Spark 4 WITH RECURSIVE): hop distances "
        "from the smallest part in the co-purchase graph as a "
        "declarative fixpoint, each step one equi-join of the "
        "frontier against the edge list; the outer MIN(hop) "
        "collapses walks to BFS distances. HONEST limitation, "
        "stated: Spark's recursive CTEs currently allow only UNION "
        "ALL (no per-level distinct), so the recursion enumerates "
        "depth-bounded WALKS — volume deg^3 with the hop < 3 guard, "
        "fine for neighborhood queries, wrong for corpus-scale "
        "reachability, which stays with graph_bfs_hops' "
        "frontier-dedup DataFrame loop. DuckDB runs the identical "
        "UNION ALL text, so the gate compares like for like.",
)
def graph_bfs_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("bfsr_lineitem")
    return spark.sql(
        """
        WITH RECURSIVE e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM bfsr_lineitem a
            JOIN bfsr_lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey
            WHERE a.l_quantity >= 30 AND b.l_quantity >= 30
        ),
        bfs(node, hop) AS (
            SELECT MIN(u), 0 FROM e
            UNION ALL
            SELECT e.v, bfs.hop + 1
            FROM bfs JOIN e ON e.u = bfs.node
            WHERE bfs.hop < 3
        )
        SELECT CAST(hop AS INT) AS hop,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM (SELECT node, MIN(hop) AS hop FROM bfs GROUP BY node)
        GROUP BY hop
        """
    )


@register(
    "graph_modularity",
    sql="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_quantity >= 30 AND b.l_quantity >= 30),
    bu AS (SELECT e0.u, e0.v, pu.p_brand AS bu, pv.p_brand AS bv
           FROM e0 JOIN part pu ON e0.u = pu.p_partkey
                   JOIN part pv ON e0.v = pv.p_partkey),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
    ein AS (SELECT bu AS brand, CAST(COUNT(*) AS BIGINT) AS e_in
            FROM bu WHERE bu = bv GROUP BY bu),
    deg AS (SELECT brand, CAST(SUM(c) AS BIGINT) AS d FROM (
                SELECT bu AS brand, COUNT(*) AS c FROM bu GROUP BY bu
                UNION ALL
                SELECT bv AS brand, COUNT(*) AS c FROM bu GROUP BY bv)
            GROUP BY brand)
    SELECT deg.brand,
           CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
           deg.d,
           CAST(4 * m.m * COALESCE(ein.e_in, 0) - deg.d * deg.d
                AS BIGINT) AS q_num,
           CAST(4 * m.m * m.m AS BIGINT) AS q_den
    FROM deg LEFT JOIN ein ON deg.brand = ein.brand, m
    """,
    doc="Graph modularity of an attribute partition — does the brand "
        "dimension explain co-purchase structure? Newman's Q for the "
        "partition induced by p_brand, kept as an exact rational: "
        "per-community q_num = 4m*E_in - d_c^2 over the common "
        "denominator 4m^2 (sum q_num/q_den over rows = Q; no float "
        "division inside the plan at all). The edge list joins the "
        "broadcastable part dimension twice; within-community edges "
        "and community degrees are two hash aggs over brand-count-"
        "sized tables. The pattern generalizes to ANY dimension "
        "column (category, supplier nation) as a partition-quality "
        "score.",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = _g_fwd(spark, sf_dir).persist()
    brands = table(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand")
    )
    bu = (
        fwd.join(
            F.broadcast(
                brands.select(
                    F.col("p_partkey").alias("u"),
                    F.col("p_brand").alias("bu"),
                )
            ),
            "u",
        )
        .join(
            F.broadcast(
                brands.select(
                    F.col("p_partkey").alias("v"),
                    F.col("p_brand").alias("bv"),
                )
            ),
            "v",
        )
        .persist()
    )
    m = fwd.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ein = (
        bu.where(F.col("bu") == F.col("bv"))
        .groupBy(F.col("bu").alias("brand"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    deg = (
        bu.select(F.col("bu").alias("brand"))
        .unionByName(bu.select(F.col("bv").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return (
        deg.join(ein, "brand", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
            "d",
            (
                4 * F.col("m") * F.coalesce("e_in", F.lit(0))
                - F.col("d") * F.col("d")
            )
            .cast("long")
            .alias("q_num"),
            (4 * F.col("m") * F.col("m")).cast("long").alias("q_den"),
        )
    )


@register(
    "ml_ridge_2d",
    sql="""
    WITH q AS (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x1,
                      CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
                      CAST(ROUND(l_extendedprice) AS BIGINT) AS y
               FROM lineitem),
    mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x1) AS BIGINT) AS sx1,
                  CAST(SUM(x2) AS BIGINT) AS sx2,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1,
                  CAST(SUM(x2 * x2) AS BIGINT) AS sx2x2,
                  CAST(SUM(x1 * x2) AS BIGINT) AS sx1x2,
                  CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
                  CAST(SUM(x2 * y) AS BIGINT) AS sx2y
           FROM q),
    c AS (SELECT n,
                 CAST(n AS DOUBLE) * sx1x1 - CAST(sx1 AS DOUBLE) * sx1
                     AS s11,
                 CAST(n AS DOUBLE) * sx2x2 - CAST(sx2 AS DOUBLE) * sx2
                     AS s22,
                 CAST(n AS DOUBLE) * sx1x2 - CAST(sx1 AS DOUBLE) * sx2
                     AS s12,
                 CAST(n AS DOUBLE) * sx1y - CAST(sx1 AS DOUBLE) * sy
                     AS s1y,
                 CAST(n AS DOUBLE) * sx2y - CAST(sx2 AS DOUBLE) * sy
                     AS s2y
          FROM mo)
    SELECT n, s11, s22, s12, s1y, s2y,
           ROUND(((s22 + 1000000) * s1y - s12 * s2y)
                 / ((s11 + 1000000) * (s22 + 1000000) - s12 * s12), 9)
               AS beta_qty,
           ROUND(((s11 + 1000000) * s2y - s12 * s1y)
                 / ((s11 + 1000000) * (s22 + 1000000) - s12 * s12), 9)
               AS beta_disc
    FROM c
    """,
    doc="Multivariate ridge regression via mergeable co-moments — "
        "price ~ (quantity, discount) with an L2 regularizer: the "
        "NINE integer sufficient statistics (n, first and second "
        "cross moments, inputs pre-quantized to exact integers) are "
        "the only thing the shuffle carries at any fact volume, "
        "merge by addition across shards, and the 2x2 normal-"
        "equation system (n-scaled centered moments + ridge constant "
        "on the diagonal) is solved in closed form — the determinant "
        "and numerators as fixed-order double expression trees "
        "shared with the oracle, rounded to 9 dp. The multivariate "
        "step beyond ml_linreg's single-feature OLS; the same "
        "pattern extends to any small feature count (d^2 moments).",
)
def ml_ridge_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    mo = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum("x2").cast("long").alias("sx2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("sx2y"),
    )
    # centering products would overflow int64 at scale (n * sum(x*y)
    # crosses 2^63 around 10x sf0.1) — the probe caught this — so the
    # RAW sums stay integer-exact through the shuffle and only the
    # centering step runs in double, one fixed-order product each
    nD = F.col("n").cast("double")
    c = mo.select(
        "n",
        (nD * F.col("sx1x1") - F.col("sx1").cast("double") * F.col("sx1"))
        .alias("s11"),
        (nD * F.col("sx2x2") - F.col("sx2").cast("double") * F.col("sx2"))
        .alias("s22"),
        (nD * F.col("sx1x2") - F.col("sx1").cast("double") * F.col("sx2"))
        .alias("s12"),
        (nD * F.col("sx1y") - F.col("sx1").cast("double") * F.col("sy"))
        .alias("s1y"),
        (nD * F.col("sx2y") - F.col("sx2").cast("double") * F.col("sy"))
        .alias("s2y"),
    )
    det = (
        (F.col("s11") + 1000000) * (F.col("s22") + 1000000)
        - F.col("s12") * F.col("s12")
    )
    b1 = (
        (F.col("s22") + 1000000) * F.col("s1y")
        - F.col("s12") * F.col("s2y")
    ) / det
    b2 = (
        (F.col("s11") + 1000000) * F.col("s2y")
        - F.col("s12") * F.col("s1y")
    ) / det
    return c.select(
        "n",
        "s11",
        "s22",
        "s12",
        "s1y",
        "s2y",
        F.round(b1, 9).alias("beta_qty"),
        F.round(b2, 9).alias("beta_disc"),
    )


# sign-aware truncating integer division, written once so Spark's
# `div` and DuckDB's `//` agree regardless of either engine's native
# negative-operand convention (same discipline as ml_pca_power's
# normalization step)
def _SDIV(num: str, den: str) -> str:
    return (
        f"CASE WHEN {num} >= 0 THEN {num} div ({den}) "
        f"ELSE -((-{num}) div ({den})) END"
    )


def _SDIV_DUCK(num: str, den: str) -> str:
    return (
        f"CASE WHEN {num} >= 0 THEN {num} // ({den}) "
        f"ELSE -((-{num}) // ({den})) END"
    )


def _logreg_train_ctes(where: str = "") -> str:
    """Unrolled 3-iteration GD training CTE chain (through ``it3``,
    the final 1-row weight vector) — shared by the ml_logreg_gd twin
    (no filter) and the ml_auc_holdout twin (md5 train split). Same
    quantized arithmetic everywhere: micro-unit weights, per-combo
    rounded rational sigmoid, sign-aware truncating update."""
    # rational fast-sigmoid 0.5 + z / (2 (1 + |z|)): every step is an
    # IEEE exact-rounded op (+ * / abs), so unlike exp() — where the
    # JVM and libm are each allowed 1-ulp slack — the double is
    # bit-identical in both engines by construction
    z = "((w.b0 + w.b1 * st.x1 + w.b2 * st.x2) / 1000000.0)"
    pm = (
        f"CAST(ROUND(1000000.0 * (0.5 + {z} "
        f"/ (2.0 * (1.0 + abs({z}))))) AS BIGINT)"
    )
    grad = f"""
        SELECT CAST(SUM(r) AS BIGINT) AS g0,
               CAST(SUM(r * x1) AS BIGINT) AS g1,
               CAST(SUM(r * x2) AS BIGINT) AS g2
        FROM (SELECT st.x1, st.x2,
                     st.n * {pm} - st.sy * 1000000 AS r
              FROM st, {{w}} w)"""
    step = f"""
        SELECT w.b0 - ({_SDIV_DUCK('g.g0', '4096 * tot.nt')}) AS b0,
               w.b1 - ({_SDIV_DUCK('g.g1', '4096 * tot.nt')}) AS b1,
               w.b2 - ({_SDIV_DUCK('g.g2', '4096 * tot.nt')}) AS b2
        FROM {{w}} w, {{g}} g, tot"""
    return f"""
    WITH li AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                       CAST(ROUND(l_quantity) AS BIGINT) AS x1,
                       CAST(ROUND(l_discount * 100) AS BIGINT) AS x2
                FROM lineitem{where}),
    st AS (SELECT x1, x2, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(y) AS BIGINT) AS sy
           FROM li GROUP BY x1, x2),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM st),
    it0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1,
                   CAST(0 AS BIGINT) AS b2),
    gr1 AS ({grad.format(w='it0')}),
    it1 AS ({step.format(w='it0', g='gr1')}),
    gr2 AS ({grad.format(w='it1')}),
    it2 AS ({step.format(w='it1', g='gr2')}),
    gr3 AS ({grad.format(w='it2')}),
    it3 AS ({step.format(w='it2', g='gr3')})"""


def _logreg_oracle() -> str:
    """Twin of ml_logreg_gd: the shared training chain over the full
    table, weights emitted as (term, weight_micro, n_rows) rows."""
    return _logreg_train_ctes() + """,
    fin AS (SELECT it3.*, tot.nt FROM it3, tot)
    SELECT 'b0_intercept' AS term, b0 AS weight_micro, nt AS n_rows
    FROM fin
    UNION ALL
    SELECT 'b1_qty' AS term, b1 AS weight_micro, nt AS n_rows FROM fin
    UNION ALL
    SELECT 'b2_disc' AS term, b2 AS weight_micro, nt AS n_rows FROM fin
    """


@register(
    "ml_logreg_gd",
    bench=True,
    sql=_logreg_oracle(),
    doc="Distributed logistic regression by batch gradient descent — "
        "the quality-classifier trainer of an LLM curation pipeline "
        "(fastText-style keep/drop scoring), expressed as the "
        "sufficient-statistics compaction: the ONE full-data pass "
        "hash-aggregates the fact table to its (x1, x2) value-domain "
        "grid (<= 51 x 11 = 561 combos with per-combo count and "
        "positive count — mergeable, map-side-combined, shuffle "
        "volume independent of corpus size), and all three unrolled "
        "GD iterations run on that bounded grid against a broadcast "
        "1-row weight vector. Determinism contract: weights live in "
        "integer micro-units; the link is the rational fast-sigmoid "
        "0.5 + z/(2(1+|z|)) — chosen over exp() because every one of "
        "its ops (+ * / abs) is IEEE exact-rounded, so the double is "
        "bit-identical across engines where exp() carries a 1-ulp "
        "per-libm license; p is quantized per combo (round(1e6*p), "
        "HALF_UP — both engines round positive ties away from zero); "
        "gradients are exact integer sums; and the dyadic learning-"
        "rate update (eta = 2^-12, inside the guaranteed-descent "
        "regime for this link's curvature, mean gradient) is a "
        "sign-aware truncating division shared with the oracle — so "
        "Spark and DuckDB walk bit-identical weight trajectories, "
        "pinned against a pure-Python re-derivation in tests. At "
        "100 TB only the compaction touches the data; iteration cost "
        "is O(domain), and more features widen the grid, not the "
        "shuffle (bin continuous features first, the standard large-"
        "scale GLM move). Int64 headroom: |sum(r*x1)| <= 5e7 * nt "
        "caps nt at ~1.8e11 rows; beyond that, rescale pm to milli "
        "or pre-divide r by the eta denominator per combo before "
        "summing (same documented posture as ml_pca_power's Gram "
        "rescale).",
)
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
    )
    st = (
        li.groupBy("x1", "x2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("sy"),
        )
        .persist()  # read twice: the nt total and the grid build
    )
    tot = st.agg(F.sum("n").cast("long").alias("nt"))
    # grid is the hot input: one read per GD iteration (3 reads)
    grid = st.crossJoin(F.broadcast(tot)).persist()

    w = spark.range(1).select(
        F.lit(0).cast("long").alias("b0"),
        F.lit(0).cast("long").alias("b1"),
        F.lit(0).cast("long").alias("b2"),
    )
    for _ in range(3):
        z = (
            F.col("b0")
            + F.col("b1") * F.col("x1")
            + F.col("b2") * F.col("x2")
        ).cast("double") / 1000000.0
        # same op-for-op rational sigmoid as the oracle (see
        # _logreg_oracle: exact-rounded IEEE ops only, no exp())
        sig = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
        pm = F.round(F.lit(1000000.0) * sig).cast("long")
        r = F.col("n") * pm - F.col("sy") * F.lit(1000000)
        g = (
            grid.crossJoin(F.broadcast(w))
            .select(
                r.alias("r"),
                "x1",
                "x2",
                "nt",
                "b0",
                "b1",
                "b2",
            )
            .groupBy()
            .agg(
                F.sum("r").cast("long").alias("g0"),
                F.sum(F.col("r") * F.col("x1")).cast("long").alias("g1"),
                F.sum(F.col("r") * F.col("x2")).cast("long").alias("g2"),
                F.min("nt").alias("nt"),  # constant across the grid
                F.min("b0").alias("b0"),
                F.min("b1").alias("b1"),
                F.min("b2").alias("b2"),
            )
        )
        w = g.select(
            (F.col("b0") - F.expr(_SDIV("g0", "4096 * nt")))
            .cast("long")
            .alias("b0"),
            (F.col("b1") - F.expr(_SDIV("g1", "4096 * nt")))
            .cast("long")
            .alias("b1"),
            (F.col("b2") - F.expr(_SDIV("g2", "4096 * nt")))
            .cast("long")
            .alias("b2"),
        )
    return w.crossJoin(F.broadcast(tot)).selectExpr(
        "stack(3, 'b0_intercept', b0, 'b1_qty', b1, 'b2_disc', b2) "
        "AS (term, weight_micro)",
        "nt AS n_rows",
    )


@register(
    "graph_assortativity",
    sql="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_quantity >= 30 AND b.l_quantity >= 30),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY u),
    ends AS (SELECT du.d AS x, dv.d AS y
             FROM e JOIN deg du ON e.u = du.node
                    JOIN deg dv ON e.v = dv.node),
    mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                  CAST(SUM(x) AS BIGINT) AS sx,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(x * y) AS BIGINT) AS sxy,
                  CAST(SUM(x * x) AS BIGINT) AS sxx,
                  CAST(SUM(y * y) AS BIGINT) AS syy
           FROM ends)
    SELECT m, sx, sy, sxy, sxx, syy,
           ROUND((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(m AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(m AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 9)
               AS assortativity
    FROM mo
    """,
    doc="Degree assortativity — do bulk-order parts co-purchase with "
        "similarly-connected parts? Newman's r = Pearson correlation "
        "of endpoint degrees over the directed edge list, reduced to "
        "SIX integer co-moments (both edge directions included, so "
        "the coefficient is symmetric): the shuffle carries six longs "
        "at any graph size, centering runs as fixed-order doubles "
        "(the ml_ridge_2d overflow lesson applied from the start), "
        "and the coefficient is one rounded expression. Degree "
        "lookups are two joins against the node-count-sized degree "
        "table.",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = _g_fwd(spark, sf_dir).persist()
    e = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ends = (
        e.join(deg.select(F.col("node").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    mo = ends.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    mD = F.col("m").cast("double")
    r = (
        (mD * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / F.sqrt(
            (mD * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            * (mD * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
        )
    )
    return mo.select(
        "m", "sx", "sy", "sxy", "sxx", "syy",
        F.round(r, 9).alias("assortativity"),
    )


@register(
    "graph_label_propagation",
    sql=f"""
    WITH {_G_EDGES_SQL},
    l0 AS (SELECT DISTINCT u AS node FROM e),
    i0 AS (SELECT node, node AS lbl FROM l0),
    i1 AS (SELECT e.u AS node, MIN(LEAST(lu.lbl, lv.lbl)) AS lbl
           FROM e JOIN i0 lu ON lu.node = e.u
                  JOIN i0 lv ON lv.node = e.v
           GROUP BY e.u),
    i2 AS (SELECT e.u AS node, MIN(LEAST(lu.lbl, lv.lbl)) AS lbl
           FROM e JOIN i1 lu ON lu.node = e.u
                  JOIN i1 lv ON lv.node = e.v
           GROUP BY e.u),
    i3 AS (SELECT e.u AS node, MIN(LEAST(lu.lbl, lv.lbl)) AS lbl
           FROM e JOIN i2 lu ON lu.node = e.u
                  JOIN i2 lv ON lv.node = e.v
           GROUP BY e.u)
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM i3 GROUP BY lbl
    ORDER BY n_nodes DESC, community LIMIT 20
    """,
    doc="Synchronized label propagation (3 rounds, min-label rule) "
        "over the bulk co-purchase graph — the hash-min primitive "
        "behind scalable connected components (Kiveris et al., "
        "'Connected Components in MapReduce', SOCC'14) and the "
        "deterministic core of label-propagation community "
        "detection: every node starts labeled with its own id and "
        "each round adopts the minimum label in its closed "
        "neighborhood, so after k rounds labels have flooded k hops "
        "and the label histogram IS the emerging community structure. "
        "Fixed round count keeps both engines bit-identical (the "
        "graph_kcore_peel synchronization discipline — the oracle "
        "unrolls the SAME three rounds as CTEs; min-label makes each "
        "round order-independent where classic mode-based LPA is "
        "tie-unstable). Scale shape: per round ONE edges⋈labels "
        "equi-join pair plus a min hash-agg, all co-partitioned on "
        "the node key — O(E) per round with map-side-combinable MIN, "
        "never a frontier blow-up; the label table the rounds carry "
        "is node-sized, edges are persisted once and reused. Output "
        "is TakeOrdered(20) of the community histogram.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _g_edges(spark, sf_dir).persist()
    lab = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(3):
        # min over least(own, neighbor) == min(own, min-of-neighbors):
        # nodes come from e's u side, so every node has >= 1 edge and
        # the inner joins lose nobody; persist stops round r replaying
        # rounds 1..r-1 (the kcore lineage lesson)
        lu = lab.select(F.col("node").alias("u"), F.col("lbl").alias("lu"))
        lv = lab.select(F.col("node").alias("v"), F.col("lbl").alias("lv"))
        lab = (
            edges.join(lu, "u")
            .join(lv, "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min(F.least("lu", "lv")).alias("lbl"))
            .persist()
        )
    return (
        lab.groupBy(F.col("lbl").cast("long").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "community")
        .limit(20)
    )


@register(
    "graph_local_bridges",
    sql="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_quantity >= 30 AND b.l_quantity >= 30),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    tri_edge AS (
        SELECT LEAST(e1.u, e1.v) AS u, GREATEST(e1.u, e1.v) AS v
        FROM e0 e1 JOIN e w1 ON e1.u = w1.u
                   JOIN e w2 ON e1.v = w2.u AND w1.v = w2.v),
    closed AS (SELECT DISTINCT u, v FROM tri_edge)
    SELECT CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM closed) AS BIGINT)
               AS n_in_triangle,
           CAST((SELECT COUNT(*) FROM e0) -
                (SELECT COUNT(*) FROM closed) AS BIGINT) AS n_bridges
    """,
    doc="Local bridges — edges belonging to NO triangle, Granovetter's "
        "weak ties whose removal disconnects neighborhoods (the "
        "structural-importance audit community detection pairs with "
        "modularity). An edge is closed iff its endpoints share a "
        "neighbor: each edge probes its SMALLER-degree endpoint's "
        "adjacency and semi-joins the (neighbor, other-endpoint) "
        "pair against the edge list — candidate volume is "
        "sum(min(du, dv)) over edges, the E^1.5 triangle-counting "
        "bound, with no approximation. Output is the bridge census, "
        "the summary a 100-TB graph job would emit.",
)
def graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = _g_fwd(spark, sf_dir).persist()
    e = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()  # consumers: degree agg, probe adjacency, membership
    deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    with_deg = fwd.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
    ).join(
        deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v"
    )
    # probe the SMALLER-degree endpoint's adjacency: candidate volume
    # is sum over edges of min(d(u), d(v)) <= E^1.5 — the exact
    # closure test at the triangle-counting cost bound, no hub cap
    p_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    probes = with_deg.select(
        "u",
        "v",
        F.when(p_first, F.col("u")).otherwise(F.col("v")).alias("p"),
        F.when(p_first, F.col("v")).otherwise(F.col("u")).alias("o"),
    )
    adj = e.select(F.col("u").alias("p"), F.col("v").alias("w"))
    cand = probes.join(adj, "p").where(F.col("w") != F.col("o"))
    member = e.select(F.col("u").alias("w"), F.col("v").alias("o"))
    closed = cand.join(member, ["w", "o"], "left_semi").select(
        "u", "v"
    ).distinct()
    n_e = fwd.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_c = closed.agg(
        F.count(F.lit(1)).cast("long").alias("n_in_triangle")
    )
    return (
        n_e.crossJoin(F.broadcast(n_c))
        .select(
            "n_edges",
            "n_in_triangle",
            (F.col("n_edges") - F.col("n_in_triangle")).alias("n_bridges"),
        )
    )


@register(
    "graph_degree_hist",
    sql=f"""
    WITH {_G_EDGES_SQL},
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY u),
    b AS (SELECT node, d,
                 CAST(FLOOR(LOG2(CAST(d AS DOUBLE))) AS BIGINT) AS bucket
          FROM deg)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(d) AS BIGINT) AS sum_degree,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree
    FROM b GROUP BY bucket
    """,
    doc="Log2-binned degree distribution of the co-purchase graph — "
        "the first diagnostic run on any production graph (the "
        "power-law tail this histogram exposes is exactly what makes "
        "naive wedge joins blow up; graph_triangles' degree "
        "orientation and graph_jaccard_linkpred's hub filter exist "
        "because of it). One hash agg for degrees, one for the "
        "histogram — output is log(max-degree) rows regardless of "
        "graph size. floor(log2(d)) on an exact integer degree is "
        "deterministic in double for d < 2^53 in both engines "
        "(log2 of a long is exact-input; floor collapses any "
        "sub-ulp disagreement except at exact powers of two, where "
        "log2 IS exact).",
)
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    deg = (
        _g_edges(spark, sf_dir)
        .groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    bucket = F.floor(F.log2(F.col("d").cast("double"))).cast("long")
    return deg.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("d").cast("long").alias("sum_degree"),
        F.min("d").cast("long").alias("min_degree"),
        F.max("d").cast("long").alias("max_degree"),
    )


@register(
    "ml_decision_stump",
    sql="""
    WITH f AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS disc,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos FROM f),
    vals AS (
        SELECT 'qty' AS feature, qty AS v, COUNT(*) AS c,
               CAST(SUM(y) AS BIGINT) AS p
        FROM f GROUP BY qty
        UNION ALL
        SELECT 'disc', disc, COUNT(*), CAST(SUM(y) AS BIGINT)
        FROM f GROUP BY disc),
    cum AS (
        SELECT feature, v, tot.n, tot.pos,
               SUM(c) OVER (PARTITION BY feature ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS nl,
               SUM(p) OVER (PARTITION BY feature ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS pl
        FROM vals CROSS JOIN tot),
    splits AS (
        SELECT feature, v AS threshold, nl, pl, n, pos,
               (CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE)
                    / CAST(nl AS DOUBLE)
                + CAST(pos - pl AS DOUBLE)
                      * CAST((n - nl) - (pos - pl) AS DOUBLE)
                      / CAST(n - nl AS DOUBLE)) AS gini_num
        FROM cum WHERE nl > 0 AND nl < n),
    best AS (
        SELECT feature, threshold, nl AS n_left, pl AS pos_left,
               n, pos, ROUND(gini_num / n, 9) AS gini,
               ROW_NUMBER() OVER (ORDER BY gini_num, feature, threshold)
                   AS rn
        FROM splits)
    SELECT feature, CAST(threshold AS BIGINT) AS threshold,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(pos_left AS BIGINT) AS pos_left,
           CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos, gini
    FROM best WHERE rn = 1
    """,
    doc="Decision-stump training as relational dataflow — the best "
        "(feature, threshold <= v) split predicting returned items by "
        "weighted Gini impurity, the base learner of boosted trees "
        "and THE standard feature-quality probe on tabular training "
        "data. Per-feature per-value class counts come from one hash "
        "agg each (the candidate set is the feature's VALUE DOMAIN — "
        "50 quantities, 11 discounts — not the row count), the "
        "left/right class totals for every candidate threshold come "
        "from a cumulative window over that bounded value table, and "
        "the weighted impurity n_l*g_l + n_r*g_r is minimized with a "
        "deterministic (impurity, feature, threshold) tiebreak. "
        "Impurity is evaluated as a fixed IEEE-double sequence over "
        "exact integer counts (p*(n-p)/n per side), so both engines "
        "rank splits identically. At 100 TB: two scans (class counts, "
        "nothing else touches rows), windows over <=61 rows.",
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).persist()  # two per-feature count aggs over the same frame
    tot = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )

    def counts(col: str) -> DataFrame:
        return f.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c"), F.sum("y").cast("long").alias("p")
        ).select(F.lit(col).alias("feature"), "v", "c", "p")

    vals = counts("qty").unionByName(counts("disc"))
    wc = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )  # frame: one feature's value domain (<= 50 rows)
    cum = (
        vals.crossJoin(F.broadcast(tot))
        .select(
            "feature",
            "v",
            "n",
            "pos",
            F.sum("c").over(wc).alias("nl"),
            F.sum("p").over(wc).alias("pl"),
        )
        .where((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
    )
    gini_num = (
        F.col("pl").cast("double")
        * (F.col("nl") - F.col("pl")).cast("double")
        / F.col("nl").cast("double")
        + (F.col("pos") - F.col("pl")).cast("double")
        * ((F.col("n") - F.col("nl")) - (F.col("pos") - F.col("pl")))
            .cast("double")
        / (F.col("n") - F.col("nl")).cast("double")
    )
    splits = cum.select(
        "feature",
        F.col("v").alias("threshold"),
        F.col("nl").alias("n_left"),
        F.col("pl").alias("pos_left"),
        "n",
        "pos",
        gini_num.alias("gini_num"),
    )
    wbest = Window.orderBy("gini_num", "feature", "threshold")
    return (
        splits.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select(
            "feature",
            F.col("threshold").cast("long").alias("threshold"),
            F.col("n_left").cast("long").alias("n_left"),
            F.col("pos_left").cast("long").alias("pos_left"),
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("gini_num") / F.col("n"), 9).alias("gini"),
        )
    )


@register(
    "agg_weighted_median",
    sql="""
    WITH v AS (SELECT l_returnflag AS flag,
                      CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          AS cents,
                      CAST(l_quantity AS BIGINT) AS w
               FROM lineitem),
    g AS (SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
          FROM v GROUP BY flag, cents),
    t AS (SELECT flag, CAST(SUM(w) AS BIGINT) AS tw,
                 CAST((SUM(w) + 1) // 2 AS BIGINT) AS k
          FROM g GROUP BY flag),
    c AS (SELECT g.flag, g.cents, t.tw, t.k,
                 SUM(g.w) OVER (PARTITION BY g.flag ORDER BY g.cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
          FROM g JOIN t USING (flag))
    SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN cum >= k THEN cents END) AS BIGINT)
               AS wmedian_cents
    FROM c GROUP BY flag
    """,
    doc="EXACT weighted median per group — the robust-aggregation "
        "primitive (median price per UNIT sold, each price weighted "
        "by its quantity): the smallest value whose cumulative weight "
        "reaches ceil(W/2), in exact integer cents and integer "
        "weights. Shape: one (group, value) hash agg collapses the "
        "fact table to its value domain, a single-row-per-group total "
        "join, and the cumulative window runs over the VALUE DOMAIN "
        "(distinct prices per flag), never the fact rows — the same "
        "never-sort-the-group discipline as the two-pass quantile "
        "family, with weights replacing counts. At 100 TB only the "
        "first hash agg touches rows.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    g = v.groupBy("flag", "cents").agg(F.sum("w").cast("long").alias("w"))
    t = g.groupBy("flag").agg(
        F.sum("w").cast("long").alias("tw"),
        F.expr("CAST((sum(w) + 1) div 2 AS BIGINT)").alias("k"),
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )  # frame: one group's distinct values (value-domain bounded)
    c = g.join(F.broadcast(t), "flag").withColumn(
        "cum", F.sum("w").over(wcum)
    )
    return c.groupBy("flag").agg(
        F.max("tw").cast("long").alias("total_weight"),
        F.min(F.when(F.col("cum") >= F.col("k"), F.col("cents")))
            .cast("long").alias("wmedian_cents"),
    )


@register(
    "x_table_checksum",
    sql="""
    WITH h AS (
        SELECT o_orderpriority,
               CAST(CAST('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|'
                   || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           AS VARCHAR) || '|'
                   || strftime(o_orderdate, '%Y-%m-%d')
               ), 1, 15) AS BIGINT) AS BIGINT) AS hv
        FROM orders)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(hv) AS BIGINT) AS xor_check,
           CAST(SUM(hv % 1000003) AS BIGINT) AS sum_check
    FROM h GROUP BY o_orderpriority
    """,
    doc="Order-independent table checksum — the migration/replication "
        "validation primitive (row-set equality across engines or "
        "copies without sorting either side): a cross-engine row hash "
        "(md5 of a canonical field rendering, 15 hex chars -> 60-bit "
        "int, the established conv/md5 bridge) folded with the two "
        "classic commutative accumulators, XOR (detects any single "
        "row flip) and a modular sum (detects XOR-cancelling pair "
        "swaps), per partition-sized group. One scan, one hash agg, "
        "zero windows; the checksum table is as small as the group "
        "domain, so two 100-TB copies compare by exchanging a few "
        "rows.",
)
def x_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # F.concat, not concat_ws: a NULL field must NULL the row hash
    # exactly like the oracle's '||' (concat_ws would skip the field
    # and checksum a shorter rendering, diverging on NULL-bearing rows)
    row = F.concat(
        F.col("o_orderkey").cast("string"),
        F.lit("|"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("|"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    hv = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return (
        o.select("o_orderpriority", hv.alias("hv"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("CAST(bit_xor(hv) AS BIGINT)").alias("xor_check"),
            F.sum(F.col("hv") % 1000003).cast("long").alias("sum_check"),
        )
    )


@register(
    "j12_runtime_filter",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
    doc="Runtime bloom-filter join pruning (Spark 3.3+ "
        "InjectRuntimeFilter): a selective dim-side predicate "
        "(1-URGENT orders) makes the optimizer build a bloom filter "
        "over the creation side's join keys and push "
        "BloomFilterMightContain into the FACT scan — rows that "
        "cannot join are dropped before the shuffle, the row-level "
        "sibling of partition-level DPP and the optimizer-automated "
        "version of x_bloom_prune's hand-built filter. The plan is "
        "declared as a plain join + filter; injection is a pure "
        "optimizer decision governed by size thresholds (at bench SF "
        "the application side is below the scan threshold, so the "
        "filter only appears at scale — tests/test_round8.py asserts "
        "injection under scale-representative session confs via "
        "newSession). Correctness is threshold-independent: the "
        "oracle states the same join.",
)
def j12_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).cast("long")
                .alias("total_qty"),
        )
    )


_ADA_SCALE = 1 << 20  # weight renormalization target per round


def _ada_train_ctes(where: str = "TRUE") -> str:
    """The WITH-chain (f ... best3) of the unrolled 3-round AdaBoost
    trajectory over lineitem rows satisfying `where`: renormalize to
    _ADA_SCALE by truncating division, integer reweight by the
    weighted-error split, all operands non-negative so plain // ==
    the Spark `div`. Shared by the trainer twin and the eval twin."""
    S = _ADA_SCALE
    parts = [f"""
    WITH f AS (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x1,
                      CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
                      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
               FROM lineitem WHERE {where}),
    w1 AS MATERIALIZED (SELECT x1, x2, y, CAST(COUNT(*) AS BIGINT) AS w
           FROM f GROUP BY x1, x2, y)"""]
    for r in (1, 2, 3):
        parts.append(f""",
    tot{r} AS MATERIALIZED (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM w{r}),
    wn{r} AS MATERIALIZED (SELECT c.x1, c.x2, c.y,
                     CAST(c.w * {S} // t.wt AS BIGINT) AS w
              FROM w{r} c, tot{r} t),
    tn{r} AS MATERIALIZED (SELECT CAST(SUM(w) AS BIGINT) AS wn FROM wn{r}),
    vals{r} AS MATERIALIZED (
        SELECT 'qty' AS feature, x1 AS v,
               CAST(SUM(CASE WHEN y = 1 THEN w ELSE 0 END) AS BIGINT)
                   AS a,
               CAST(SUM(CASE WHEN y = 0 THEN w ELSE 0 END) AS BIGINT)
                   AS b
        FROM wn{r} GROUP BY x1
        UNION ALL
        SELECT 'disc', x2,
               CAST(SUM(CASE WHEN y = 1 THEN w ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN y = 0 THEN w ELSE 0 END) AS BIGINT)
        FROM wn{r} GROUP BY x2),
    cum{r} AS MATERIALIZED (
        SELECT feature, v,
               SUM(a) OVER (PARTITION BY feature ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS al,
               SUM(b) OVER (PARTITION BY feature ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS bl,
               SUM(a) OVER (PARTITION BY feature) AS wa,
               SUM(b) OVER (PARTITION BY feature) AS wb
        FROM vals{r}),
    errs{r} AS MATERIALIZED (
        SELECT feature, v AS threshold, CAST(1 AS BIGINT) AS pol,
               CAST(bl + (wa - al) AS BIGINT) AS e
        FROM cum{r}
        UNION ALL
        SELECT feature, v, CAST(-1 AS BIGINT),
               CAST(al + (wb - bl) AS BIGINT)
        FROM cum{r}),
    best{r} AS MATERIALIZED (
        SELECT feature, threshold, pol, e
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY e, feature,
                                           threshold, pol) AS rn
              FROM errs{r})
        WHERE rn = 1)""")
        if r < 3:
            parts.append(f""",
    w{r + 1} AS MATERIALIZED (
        SELECT c.x1, c.x2, c.y,
               CAST(CASE
                    WHEN b.e <= 0 OR b.e >= t.wn THEN c.w
                    WHEN (CASE WHEN (CASE WHEN b.feature = 'qty'
                                          THEN c.x1 ELSE c.x2 END)
                                        <= b.threshold
                               THEN b.pol ELSE -b.pol END)
                             <> 2 * c.y - 1
                         THEN c.w * (t.wn - b.e)
                    ELSE c.w * b.e END AS BIGINT) AS w
        FROM wn{r} c, best{r} b, tn{r} t)""")
    return "".join(parts)


def _adaboost_oracle() -> str:
    """Per-round stump rows from the shared training chain."""
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round, b.feature,
               CAST(b.threshold AS BIGINT) AS threshold,
               b.pol AS polarity,
               CAST(b.e * 1000000 // t.wn AS BIGINT) AS err_micro,
               t.wn AS w_total
        FROM best{r} b, tn{r} t"""
        for r in (1, 2, 3)
    )
    return _ada_train_ctes() + "\n" + rows


def _ada_xy(li: DataFrame) -> DataFrame:
    """(x1, x2, y) projection of lineitem for the AdaBoost task."""
    return li.select(
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
    )


def _ada_params(grid: DataFrame) -> DataFrame:
    """Final 1-row AdaBoost params frame (wt{r}, feat{r}, thr{r},
    pol{r}, e{r}, wn{r} for r = 1..3) over a (x1, x2, y, c) grid.

    FUSED (round 9): the grid is value-domain bounded (<= 1122
    cells), so the entire 3-round trajectory is ONE aggregation
    (collect the cells into an array, map-side combined) followed by
    a pipeline of pure array expressions — transform for the
    renormalize/reweight steps, aggregate for the totals and the
    per-candidate weighted errors, array_sort on (e, feature,
    threshold, pol) structs for the oracle's exact ROW_NUMBER
    tiebreak. Two exchanges TOTAL (grid compaction + the 1-row
    collect agg) versus the round-8 version's 14: every boosting
    round was a stack/groupBy/two-window/rank chain re-scanning the
    cached grid, which made warm time pure stage overhead (3.2s for
    microseconds of math). The per-candidate error scan is
    O(|domain|^2) ~ 137k fused-expression steps in one task — the
    cells never leave the JVM. Round bodies stay SQL strings (one
    parse each; the py4j Column-chain lesson from round 8)."""
    S = _ADA_SCALE

    def fval(f: str = "fv.f") -> str:
        return f"(CASE WHEN {f} = 'qty' THEN x.x1 ELSE x.x2 END)"

    def errs(r: int, pol: int) -> str:
        # weighted error of stump (fv.f, v, pol): pol for vals <= v,
        # -pol above — misclassified mass where prediction <> 2y-1.
        # Equals the oracle's cumulative form: pol=+1 -> bl+(wa-al),
        # pol=-1 -> al+(wb-bl).
        pred = f"(CASE WHEN {fval()} <= v THEN {pol} ELSE {-pol} END)"
        return (
            f"aggregate(wncells{r}, CAST(0 AS BIGINT), (acc, x) ->"
            f" acc + (CASE WHEN {pred} <> 2 * x.y - 1 THEN x.w"
            f" ELSE CAST(0 AS BIGINT) END))"
        )

    params = grid.agg(
        F.collect_list(
            F.struct(
                F.col("x1"), F.col("x2"), F.col("y"), F.col("c").alias("w")
            )
        ).alias("cells1"),
        F.sum("c").cast("long").alias("wt1"),
    )
    for r in (1, 2, 3):
        params = params.selectExpr(
            "*",
            # renormalize this round's raw weights to the 2^20 total
            f"transform(cells{r}, x -> struct(x.x1 AS x1, x.x2 AS x2,"
            f" x.y AS y, CAST(x.w * {S} div wt{r} AS BIGINT) AS w))"
            f" AS wncells{r}",
        ).selectExpr(
            "*",
            f"aggregate(wncells{r}, CAST(0 AS BIGINT),"
            f" (acc, x) -> acc + x.w) AS wn{r}",
        ).selectExpr(
            "*",
            # every (feature, threshold, polarity) candidate as an
            # (e, feature, threshold, pol) struct; array_sort compares
            # structs field-by-field = the oracle's ORDER BY e,
            # feature, threshold, pol — element [0] is the best stump
            f"""array_sort(flatten(transform(
                array(named_struct('f', 'qty'), named_struct('f', 'disc')),
                fv -> flatten(transform(
                  array_sort(array_distinct(transform(
                      wncells{r}, x -> {fval()}))),
                  v -> array(
                    named_struct('e', {errs(r, 1)}, 'feature', fv.f,
                                 'threshold', v,
                                 'pol', CAST(1 AS BIGINT)),
                    named_struct('e', {errs(r, -1)}, 'feature', fv.f,
                                 'threshold', v,
                                 'pol', CAST(-1 AS BIGINT))))))))[0]
             AS best{r}""",
        ).selectExpr(
            "*",
            f"best{r}.feature AS feat{r}",
            f"CAST(best{r}.threshold AS BIGINT) AS thr{r}",
            f"best{r}.pol AS pol{r}",
            f"best{r}.e AS e{r}",
        )
        if r < 3:
            # next round's raw weights (reweight skipped for a
            # degenerate stump, both engines) and its renormalization
            # total, which needs no data pass: sum(raw) = 2*E*(W-E)
            mis = (
                f"(CASE WHEN (CASE WHEN feat{r} = 'qty' THEN x.x1"
                f" ELSE x.x2 END) <= thr{r} THEN pol{r}"
                f" ELSE -pol{r} END) <> 2 * x.y - 1"
            )
            params = params.selectExpr(
                "*",
                f"CASE WHEN e{r} <= 0 OR e{r} >= wn{r} THEN wn{r}"
                f" ELSE 2 * e{r} * (wn{r} - e{r}) END AS wt{r + 1}",
                f"transform(wncells{r}, x -> struct(x.x1 AS x1,"
                f" x.x2 AS x2, x.y AS y, CAST(CASE"
                f" WHEN e{r} <= 0 OR e{r} >= wn{r} THEN x.w"
                f" WHEN {mis} THEN x.w * (wn{r} - e{r})"
                f" ELSE x.w * e{r} END AS BIGINT) AS w))"
                f" AS cells{r + 1}",
            )
    # drop the cell arrays before the frame is broadcast by callers
    keep = [
        f"{p}{r}"
        for r in (1, 2, 3)
        for p in ("wt", "feat", "thr", "pol", "e", "wn")
    ]
    return params.selectExpr(*keep)



@register(
    "ml_adaboost_stumps",
    bench=True,
    sql=_adaboost_oracle(),
    doc="AdaBoost over decision stumps as relational dataflow — the "
        "boosted-ensemble trainer (3 unrolled rounds, both split "
        "polarities) on the same returned-items task as "
        "ml_decision_stump, with the discrete-AdaBoost reweighting "
        "run in EXACT integers: per-round the (x1, x2, y) cell "
        "weights are renormalized to a 2^20 total by truncating "
        "division, the best (feature, threshold, polarity) stump is "
        "picked by minimum integer weighted error over the value-"
        "domain cumulative tables (deterministic (e, feature, "
        "threshold, polarity) tiebreak), and misclassified cells are "
        "multiplied by (W - E) while correct cells get E — the exact "
        "rational (1-eps)/eps reweight cleared of denominators, so "
        "no exp()/ln() ever enters and both engines walk the same "
        "quantized weight trajectory (the oracle unrolls the "
        "identical 3 rounds as CTEs). Degenerate stumps (E = 0 or "
        "E = W) skip the reweight in both engines. Scale shape: the "
        "ONE full-data pass is the (x1, x2, y) grid compaction "
        "(<= 1122 cells, map-side combined, shuffle independent of "
        "corpus size — the ml_logreg_gd posture); every round is "
        "O(domain) work over broadcast 1-row stats. Int64 headroom: "
        "renormalized weights are <= 2^20, so reweight products are "
        "<= 2^41 and the next round's w * 2^20 is <= 2^61; the "
        "round-1 compaction needs cell counts below 2^43 (~8.8e12 "
        "rows per cell) before pre-scaling is required. Emits one "
        "row per round: the stump, its weighted error in micro-units "
        "and the round's weight total.",
)
def ml_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _ada_xy(table(spark, sf_dir, "lineitem"))
    # the ONE full-data pass; the fused _ada_params consumes it once
    # (no persist needed — rounds run as array expressions, r9)
    grid = li.groupBy("x1", "x2", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    params = _ada_params(grid)
    # the final 1-row params frame carries every round's stump; emit
    # all three rows from ONE chain (a per-round union would rebuild
    # the whole params lineage once per output row)
    rows = ", ".join(
        f"CAST({r} AS BIGINT), feat{r}, thr{r}, pol{r},"
        f" CAST(e{r} * 1000000 div wn{r} AS BIGINT), wn{r}"
        for r in (1, 2, 3)
    )
    return params.selectExpr(
        f"stack(3, {rows}) AS (round, feature, threshold, polarity,"
        " err_micro, w_total)"
    )

_ADA_SPLIT_SQL = (
    "substring(md5(CAST(l_orderkey AS VARCHAR) || '|'"
    " || CAST(l_linenumber AS VARCHAR)), 1, 2)"
)


def _ada_split_col():
    """Spark twin of _ADA_SPLIT_SQL: the (orderkey, linenumber) md5
    bucket prefix both engines use for deterministic train/test
    splitting."""
    return F.substring(
        F.md5(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("|"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        2,
    )


def _adaboost_eval_oracle() -> str:
    """Twin of ml_adaboost_eval: the shared training chain restricted
    to the md5 train split, then the 3-stump majority vote scored on
    the held-out test split as a confusion row."""
    preds = []
    for r in (1, 2, 3):
        preds.append(
            f"(CASE WHEN (CASE WHEN b{r}.feature = 'qty' THEN t.x1"
            f" ELSE t.x2 END) <= b{r}.threshold THEN b{r}.pol"
            f" ELSE -b{r}.pol END)"
        )
    vote = " + ".join(preds)
    return _ada_train_ctes(where=f"{_ADA_SPLIT_SQL} < 'cd'") + f""",
    test AS (
        SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem WHERE {_ADA_SPLIT_SQL} >= 'e6'),
    scored AS (
        SELECT t.y,
               CASE WHEN ({vote}) > 0 THEN 1 ELSE 0 END AS pred
        FROM test t, best1 b1, best2 b2, best3 b3),
    cm AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN y = 1 AND pred = 1
                                      THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS tp,
               CAST(COALESCE(SUM(CASE WHEN y = 0 AND pred = 1
                                      THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS fp,
               CAST(COALESCE(SUM(CASE WHEN y = 1 AND pred = 0
                                      THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS fn,
               CAST(COALESCE(SUM(CASE WHEN y = 0 AND pred = 0
                                      THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS tn
        FROM scored)
    SELECT CAST(t1.wt AS BIGINT) AS n_train,
           CAST(cm.tp + cm.fp + cm.fn + cm.tn AS BIGINT) AS n_test,
           cm.tp, cm.fp, cm.fn, cm.tn,
           CAST((cm.tp + cm.tn) * 1000000
                // GREATEST(cm.tp + cm.fp + cm.fn + cm.tn, 1)
                AS BIGINT) AS acc_ppm
    FROM cm, tot1 t1
    """


@register(
    "ml_adaboost_eval",
    sql=_adaboost_eval_oracle(),
    doc="Holdout evaluation of the boosted ensemble — the eval twin "
        "that makes ml_adaboost_stumps HONEST (the pipeline_train_eval "
        "discipline): the 3 stumps are trained ONLY on the "
        "deterministic md5 train split (~80% of lineitem rows, keyed "
        "on (orderkey, linenumber)), and the UNWEIGHTED majority vote "
        "of the three stumps is scored ONLY on the held-out ~10% "
        "split, emitting the confusion counts and an exact integer "
        "ppm accuracy — so the number measures generalization, not "
        "memorization. The vote of three ±1 stumps is never zero, so "
        "the decision is total and both engines agree cell-for-cell "
        "(the oracle re-walks the identical quantized training "
        "trajectory on the same split and scores the same vote). "
        "Scale shape: one train-split grid compaction (<= 1122 "
        "cells), the _ada_params broadcast-state rounds, then ONE "
        "test-split pass against the broadcast 1-row model — the "
        "classic train-once-score-everywhere layout.",
)
def ml_adaboost_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    split = _ada_split_col()
    grid = (
        _ada_xy(li.where(split < "cd"))
        .groupBy("x1", "x2", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # the ONE train-split pass; the fused _ada_params consumes it
        # once, so no persist (r9)
    )
    params = _ada_params(grid)
    preds = []
    for r in (1, 2, 3):
        preds.append(
            f"(CASE WHEN (CASE WHEN feat{r} = 'qty' THEN x1 ELSE x2"
            f" END) <= thr{r} THEN pol{r} ELSE -pol{r} END)"
        )
    vote = " + ".join(preds)
    scored = (
        _ada_xy(li.where(split >= "e6"))
        .crossJoin(F.broadcast(params))
        .selectExpr(
            "y",
            f"CASE WHEN ({vote}) > 0 THEN 1 ELSE 0 END AS pred",
        )
    )
    # n_train comes from the params frame, NOT from an agg over test
    # rows (min over an empty test split would NULL it while the
    # oracle reads the real train total); all confusion counters are
    # coalesced to 0 so an empty split yields the same all-zero row
    # in both engines
    cm = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("tp"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("fp"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("fn"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("tn"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN y = pred THEN 1 ELSE 0 END), 0)"
            " * 1000000 div greatest(count(1), 1) AS BIGINT)"
        ).alias("acc_ppm"),
    )
    return cm.crossJoin(
        F.broadcast(params.selectExpr("wt1 AS n_train"))
    ).select("n_train", "n_test", "tp", "fp", "fn", "tn", "acc_ppm")


# test-split scoring CTEs shared by ml_auc_holdout and
# ml_calibration_bins: the held-out (x1, x2) grid and its quantized
# micro-probability score under the it3 trained weights
_LOGREG_Z_TEST = "((w.b0 + w.b1 * t.x1 + w.b2 * t.x2) / 1000000.0)"
_LOGREG_PM_TEST = (
    f"CAST(ROUND(1000000.0 * (0.5 + {_LOGREG_Z_TEST} "
    f"/ (2.0 * (1.0 + abs({_LOGREG_Z_TEST}))))) AS BIGINT)"
)
_LOGREG_TEST_CTES = f""",
    tg AS (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x1,
                  CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                           END) AS BIGINT) AS sy
           FROM lineitem WHERE {_ADA_SPLIT_SQL} >= 'e6'
           GROUP BY 1, 2),
    sc AS (SELECT {_LOGREG_PM_TEST} AS s, t.sy AS p, t.n - t.sy AS ng
           FROM tg t, it3 w)"""


def _logreg_train_split_weights(
    spark: SparkSession, li: DataFrame, split
) -> DataFrame:
    """The ml_logreg_gd quantized GD loop run on the md5 train split:
    grid-compact the split to (x1, x2, n, sy), walk the 3 unrolled
    iterations against a broadcast 1-row weight frame, return the
    final (b0, b1, b2) micro-unit weights. Shared by ml_auc_holdout
    and ml_calibration_bins so both eval twins score the SAME model."""
    xy = li.where(split < "cd").select(
        F.when(F.col("l_returnflag") == "R", 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
    )
    st = (
        xy.groupBy("x1", "x2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("sy"),
        )
        .persist()  # read twice: the nt total and the grid build
    )
    tot = st.agg(F.sum("n").cast("long").alias("nt"))
    grid = st.crossJoin(F.broadcast(tot)).persist()  # one read per round
    w = spark.range(1).select(
        F.lit(0).cast("long").alias("b0"),
        F.lit(0).cast("long").alias("b1"),
        F.lit(0).cast("long").alias("b2"),
    )
    for _ in range(3):
        z = (
            F.col("b0")
            + F.col("b1") * F.col("x1")
            + F.col("b2") * F.col("x2")
        ).cast("double") / 1000000.0
        # op-for-op the oracle's rational sigmoid (exact-rounded IEEE
        # ops only — the ml_logreg_gd determinism contract)
        sig = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
        pm = F.round(F.lit(1000000.0) * sig).cast("long")
        r = F.col("n") * pm - F.col("sy") * F.lit(1000000)
        g = (
            grid.crossJoin(F.broadcast(w))
            .select(r.alias("r"), "x1", "x2", "nt", "b0", "b1", "b2")
            .groupBy()
            .agg(
                F.sum("r").cast("long").alias("g0"),
                F.sum(F.col("r") * F.col("x1")).cast("long").alias("g1"),
                F.sum(F.col("r") * F.col("x2")).cast("long").alias("g2"),
                F.min("nt").alias("nt"),
                F.min("b0").alias("b0"),
                F.min("b1").alias("b1"),
                F.min("b2").alias("b2"),
            )
        )
        w = g.select(
            (F.col("b0") - F.expr(_SDIV("g0", "4096 * nt")))
            .cast("long")
            .alias("b0"),
            (F.col("b1") - F.expr(_SDIV("g1", "4096 * nt")))
            .cast("long")
            .alias("b1"),
            (F.col("b2") - F.expr(_SDIV("g2", "4096 * nt")))
            .cast("long")
            .alias("b2"),
        )
    return w


def _logreg_test_scores(li: DataFrame, split, w: DataFrame) -> DataFrame:
    """Score the held-out split's (x1, x2) grid under broadcast
    weights: one row per cell with the quantized micro-probability
    ``s``, positives ``p`` and negatives ``ng`` (the Spark half of
    _LOGREG_TEST_CTES)."""
    tg = (
        li.where(split >= "e6")
        .select(
            F.when(F.col("l_returnflag") == "R", 1)
            .otherwise(0)
            .cast("long")
            .alias("y"),
            F.round("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        )
        .groupBy("x1", "x2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    zt = (
        F.col("b0")
        + F.col("b1") * F.col("x1")
        + F.col("b2") * F.col("x2")
    ).cast("double") / 1000000.0
    sigt = F.lit(0.5) + zt / (F.lit(2.0) * (F.lit(1.0) + F.abs(zt)))
    return tg.crossJoin(F.broadcast(w)).select(
        F.round(F.lit(1000000.0) * sigt).cast("long").alias("s"),
        F.col("sy").alias("p"),
        (F.col("n") - F.col("sy")).alias("ng"),
    )


def _auc_oracle() -> str:
    """Twin of ml_auc_holdout: the shared logreg training chain on the
    md5 train split, then exact rank-based AUC of the quantized scores
    over the held-out test split."""
    return _logreg_train_ctes(
        where=f" WHERE {_ADA_SPLIT_SQL} < 'cd'"
    ) + _LOGREG_TEST_CTES + """,
    ss AS (SELECT s, CAST(SUM(p) AS BIGINT) AS ps,
                  CAST(SUM(ng) AS BIGINT) AS ns
           FROM sc GROUP BY s),
    cum AS (SELECT s, ps, ns,
                   CAST(COALESCE(SUM(ns) OVER (ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS nb
            FROM ss),
    agg AS (SELECT CAST(COALESCE(SUM(ps), 0) AS BIGINT) AS p_total,
                   CAST(COALESCE(SUM(ns), 0) AS BIGINT) AS n_total,
                   CAST(COALESCE(SUM(ps * (2 * nb + ns)), 0) AS BIGINT)
                       AS auc_num
            FROM cum)
    SELECT p_total, n_total, auc_num,
           CAST(2 * p_total * n_total AS BIGINT) AS auc_den,
           CAST(auc_num * 1000000
                // GREATEST(2 * p_total * n_total, 1) AS BIGINT)
               AS auc_ppm
    FROM agg
    """


@register(
    "ml_auc_holdout",
    sql=_auc_oracle(),
    doc="Exact ROC-AUC of the logistic-regression scorer on the "
        "held-out split — the threshold-free ranking metric a "
        "quality-classifier pipeline reports alongside "
        "ml_adaboost_eval's fixed-threshold confusion row (AUC = "
        "P(score(pos) > score(neg)), ties at half weight — the "
        "Mann-Whitney U statistic). Kept EXACT in integers end to "
        "end: the ml_logreg_gd weights are re-derived on the md5 "
        "train split (same quantized trajectory, shared CTE text), "
        "test scores are the same round(1e6*sigmoid) micro-units, "
        "and 2*AUC*P*N = sum over score levels of "
        "pos_s * (2*neg_below_s + neg_s) — emitted as the exact "
        "(auc_num, auc_den) rational plus a truncated ppm. Scale "
        "shape: train is the logreg grid compaction (<= 561 cells, "
        "3 broadcast-state GD rounds); test is ONE (x1, x2) grid "
        "compaction — scores depend only on the feature cell, so the "
        "rank-sum never sorts rows: the cumulative-negatives window "
        "runs over <= 561 DISTINCT SCORE LEVELS (value-domain "
        "bounded, the ev_time_to_convert pass-3 discipline), and a "
        "continuous-score variant would bin scores first (the "
        "standard sketch-AUC move). Int64 headroom: auc_num <= "
        "2*P*N caps the test split at ~4.3e9 rows before the "
        "rational must move to DECIMAL(38,0) — a documented one-line "
        "cast at that scale.",
)
def ml_auc_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    split = _ada_split_col()
    w = _logreg_train_split_weights(spark, li, split)
    sc = _logreg_test_scores(li, split, w)
    ss = sc.groupBy("s").agg(
        F.sum("p").cast("long").alias("ps"),
        F.sum("ng").cast("long").alias("ns"),
    )
    # cumulative negatives STRICTLY below each score level: the frame
    # holds <= 561 distinct score levels (one per feature cell), so
    # this unpartitioned ordered window is value-domain bounded
    wd = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = ss.select(
        "ps",
        "ns",
        F.coalesce(F.sum("ns").over(wd), F.lit(0))
        .cast("long")
        .alias("nb"),
    )
    agg = cum.agg(
        F.coalesce(F.sum("ps"), F.lit(0)).cast("long").alias("p_total"),
        F.coalesce(F.sum("ns"), F.lit(0)).cast("long").alias("n_total"),
        F.coalesce(
            F.sum(F.col("ps") * (F.lit(2) * F.col("nb") + F.col("ns"))),
            F.lit(0),
        )
        .cast("long")
        .alias("auc_num"),
    )
    return agg.select(
        "p_total",
        "n_total",
        "auc_num",
        (F.lit(2) * F.col("p_total") * F.col("n_total"))
        .cast("long")
        .alias("auc_den"),
        F.expr(
            "CAST(auc_num * 1000000"
            " div GREATEST(2 * p_total * n_total, 1) AS BIGINT)"
        ).alias("auc_ppm"),
    )


def _calibration_oracle() -> str:
    """Twin of ml_calibration_bins: the shared train + test-scoring
    chain, then the 1%-bin reliability table."""
    return _logreg_train_ctes(
        where=f" WHERE {_ADA_SPLIT_SQL} < 'cd'"
    ) + _LOGREG_TEST_CTES + """,
    b AS (SELECT LEAST(s // 10000, 99) AS bucket,
                 CAST(SUM(p + ng) AS BIGINT) AS n,
                 CAST(SUM(p) AS BIGINT) AS n_pos,
                 CAST(SUM((p + ng) * s) AS BIGINT) AS sum_s
          FROM sc GROUP BY 1)
    SELECT CAST(bucket AS BIGINT) AS bucket, n, n_pos,
           CAST(n_pos * 1000000 // n AS BIGINT) AS observed_ppm,
           CAST(sum_s // n AS BIGINT) AS predicted_mean_micro,
           CAST(n_pos * 1000000 // n - sum_s // n AS BIGINT)
               AS gap_micro
    FROM b
    """


@register(
    "ml_calibration_bins",
    sql=_calibration_oracle(),
    doc="Calibration (reliability-diagram) audit of the logreg scorer "
        "on the held-out split — the eval companion ml_auc_holdout "
        "cannot replace: AUC measures RANKING, this measures whether "
        "the predicted probabilities MEAN what they say (a curation "
        "pipeline thresholding at p>=0.9 needs calibrated p, not just "
        "well-ordered p). The same shared trained weights score the "
        "same md5 holdout; scores bucket into 1%-wide probability bins "
        "(micro-units div 10000, top edge folded into bucket 99) and "
        "each occupied bucket reports exact integers: count, "
        "positives, observed rate (ppm), mean predicted score "
        "(micro), and the signed calibration gap. Scale shape: train "
        "is the shared <=561-cell grid compaction + broadcast-state "
        "GD rounds; test scoring is cell-level against broadcast "
        "1-row weights, so the bin agg runs over <=561 cells and "
        "the output is <=100 rows at any corpus size — the whole "
        "reliability table costs two md5-split scans, full stop.",
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    split = _ada_split_col()
    w = _logreg_train_split_weights(spark, li, split)
    sc = _logreg_test_scores(li, split, w)
    return (
        sc.groupBy(
            F.least(F.expr("s div 10000"), F.lit(99))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.sum(F.col("p") + F.col("ng")).cast("long").alias("n"),
            F.sum("p").cast("long").alias("n_pos"),
            F.sum((F.col("p") + F.col("ng")) * F.col("s"))
            .cast("long")
            .alias("sum_s"),
        )
        .select(
            "bucket",
            "n",
            "n_pos",
            F.expr("CAST(n_pos * 1000000 div n AS BIGINT)").alias(
                "observed_ppm"
            ),
            F.expr("CAST(sum_s div n AS BIGINT)").alias(
                "predicted_mean_micro"
            ),
            F.expr(
                "CAST(n_pos * 1000000 div n - sum_s div n AS BIGINT)"
            ).alias("gap_micro"),
        )
    )
