"""Round-8 operator properties: the two-pass histogram quantile
machinery equals direct ranking for arbitrary value distributions, the
Pareto histogram shortcut equals direct top-k, and the V-shape pattern
fold is order-exact."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from mwa_uvdata_pipeline_spark.plans import load_all


def _quantiles_direct(vals: list[int], ps=(25, 50, 75)) -> dict[int, int]:
    """Lower quantile by direct rank: k = ceil(p*n/100)-th smallest."""
    s = sorted(vals)
    n = len(s)
    return {p: s[(p * n + 99) // 100 - 1] for p in ps}


def test_two_pass_quantiles_equal_direct_rank(spark):
    """agg_exact_quantiles_2pass vs per-group python direct rank on
    the live table — including groups whose quantiles collide in one
    bin and groups spanning many bins."""
    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    by_group: dict[str, list[int]] = {}
    for r in rows:
        by_group.setdefault(r["event_type"], []).append(r["cents"])
    got = {
        r["event_type"]: (r["p25_cents"], r["p50_cents"], r["p75_cents"])
        for r in load_all()["agg_exact_quantiles_2pass"]
        .spark(spark, SF_SMALL)
        .collect()
    }
    for g, vals in by_group.items():
        want = _quantiles_direct(vals)
        assert got[g] == (want[25], want[50], want[75]), g


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=15, deadline=None)
    @given(
        vals=st.lists(
            st.integers(-(10**6), 10**6), min_size=1, max_size=300
        ),
        binw=st.sampled_from([1, 7, 100, 10**5]),
    )
    def test_two_pass_quantile_algebra_property(spark, vals, binw):
        """The bin-locate + in-bin-rank algebra (the heart of both
        2-pass entries) equals direct ranking for ANY values and ANY
        bin width — negative values included. (Both floor division
        and Spark's truncating `div` produce MONOTONE bins on signed
        values — truncation just makes bin 0 twice as wide — so
        either binning is valid; this property pins the floor-division
        variant.)"""
        df = spark.createDataFrame(
            [(int(v),) for v in vals], "cents long"
        )
        # monotone binning for signed values: floor division
        binc = F.floor(F.col("cents") / binw).cast("long")
        hist = df.groupBy(binc.alias("bin")).agg(
            F.count(F.lit(1)).alias("c")
        )
        wcum = Window.orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = hist.select(
            "bin",
            "c",
            F.sum("c").over(wcum).alias("cumc"),
            F.sum("c").over(Window.partitionBy()).alias("n"),
        )
        n = len(vals)
        for p in (25, 50, 75):
            k = (p * n + 99) // 100
            tgt = cum.where(
                (F.col("cumc") >= k) & (F.col("cumc") - F.col("c") < k)
            ).collect()
            assert len(tgt) == 1
            row = tgt[0]
            before = row["cumc"] - row["c"]
            wbin = Window.orderBy("cents")
            inbin = (
                df.where(binc == row["bin"])
                .withColumn("rk", F.row_number().over(wbin))
                .where(F.col("rk") + F.lit(before) == k)
                .collect()
            )
            assert len(inbin) == 1
            assert inbin[0]["cents"] == sorted(vals)[k - 1], (p, binw)

    @settings(max_examples=15, deadline=None)
    @given(
        counts=st.lists(st.integers(1, 50), min_size=1, max_size=120),
    )
    def test_pareto_histogram_equals_direct_topk(spark, counts):
        """The count-of-counts top-decile mass (ev_pareto_concentration
        algebra) equals summing the actual top-k per-user counts for
        any activity distribution — ties at the threshold included."""
        n_users = len(counts)
        k = (n_users + 9) // 10
        want = sum(sorted(counts, reverse=True)[:k])
        df = spark.createDataFrame(
            [(i, int(c)) for i, c in enumerate(counts)], "u long, c long"
        )
        h = df.groupBy("c").agg(
            F.count(F.lit(1)).alias("nu"), F.sum("c").alias("se")
        )
        wdesc = Window.orderBy(F.desc("c")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = h.select(
            "c",
            "nu",
            "se",
            F.sum("nu").over(wdesc).alias("cum_u"),
            F.sum("se").over(wdesc).alias("cum_e"),
        )
        thr = cum.where(
            (F.col("cum_u") >= k) & (F.col("cum_u") - F.col("nu") < k)
        ).collect()
        assert len(thr) == 1
        r = thr[0]
        got = r["cum_e"] - r["se"] + (k - (r["cum_u"] - r["nu"])) * r["c"]
        assert got == want

    @settings(max_examples=12, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(st.integers(-1000, 1000), st.integers(1, 50)),
            min_size=1,
            max_size=80,
        )
    )
    def test_weighted_median_value_domain_algebra(spark, pairs):
        """The value-domain cumulative-weight formulation
        (agg_weighted_median) equals the expanded-multiset lower
        median for any (value, weight) list."""
        expanded = sorted(v for v, w in pairs for _ in range(w))
        k = (len(expanded) + 1) // 2
        want = expanded[k - 1]
        df = spark.createDataFrame(
            [(int(v), int(w)) for v, w in pairs], "cents long, w long"
        )
        g = df.groupBy("cents").agg(F.sum("w").alias("w"))
        wcum = Window.orderBy("cents").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        got = (
            g.withColumn("cum", F.sum("w").over(wcum))
            .where(F.col("cum") >= k)
            .agg(F.min("cents"))
            .first()[0]
        )
        assert got == want


def test_survival_table_invariants(spark):
    """The KM table's accounting must close: at-risk starts at the
    subject total, decreases by exactly the prior day's exits, and the
    exits sum to the subject count."""
    from mwa_uvdata_pipeline_spark.plans import load_all

    rows = sorted(
        load_all()["ev_survival_table"].spark(spark, SF_SMALL).collect(),
        key=lambda r: r["day_offset"],
    )
    assert rows
    total = rows[0]["n_at_risk"]
    at_risk = total
    exits = 0
    for r in rows:
        assert r["n_at_risk"] == at_risk
        assert r["n_converted"] >= 0 and r["n_censored"] >= 0
        at_risk -= r["n_converted"] + r["n_censored"]
        exits += r["n_converted"] + r["n_censored"]
    assert at_risk == 0 and exits == total


if _HYP:

    @settings(max_examples=20, deadline=None)
    @given(series=st.lists(st.integers(0, 9), min_size=0, max_size=40))
    def test_vshape_fold_equals_window_formulation(series):
        """The streaming state fold (stream_pattern_vshapes) equals the
        three-point window predicate for any value series, at every
        batch split point."""
        want = sum(
            1
            for i in range(2, len(series))
            if series[i - 2] > series[i - 1] and series[i - 1] < series[i]
        )
        for split in range(len(series) + 1):
            n, p2, p1, nv = 0, 0, 0, 0
            for chunk in (series[:split], series[split:]):
                for c in chunk:
                    if n >= 2 and p2 > p1 and p1 < c:
                        nv += 1
                    n += 1
                    p2, p1 = p1, c
            assert nv == want, split


def test_time_to_convert_zero_converters(spark, tmp_path):
    """With signups but NO purchases the plan must still emit one row
    (n_signups, 0, NULL median/min/max) like the oracle's scalar
    subqueries — a raw 0-row median frame would collapse the
    crossJoin to zero rows and silently lose n_signups."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i), i, "signup", 1.0, "{}")
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "noconv")
    df.write.parquet(f"{d}/events.parquet")
    out = load_all()["ev_time_to_convert"].spark(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_signups"] == 4 and r["n_converted"] == 0
    assert r["median_dt_us"] is None
    assert r["min_dt_us"] is None and r["max_dt_us"] is None


def test_runtime_bloom_filter_injects_at_scale_confs(spark):
    """j12_runtime_filter's declared plan must attract an
    optimizer-injected bloom filter on the fact scan under
    scale-representative confs (tiny local tables sit below the
    default thresholds, so a fresh session pins them; session confs
    are newSession-scoped, leaving the shared fixture untouched)."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    df = load_all()["j12_runtime_filter"].spark(ns, SF_SMALL)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom" in plan.lower()
    # and the un-tuned shared session still computes the same rows
    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(
            tuple,
            load_all()["j12_runtime_filter"].spark(spark, SF_SMALL)
            .collect(),
        )
    )
    assert a == b and len(a) > 0


def test_logreg_gd_matches_python_trajectory(spark):
    """ml_logreg_gd's quantized GD must walk the exact weight
    trajectory a pure-Python re-derivation walks from the same rows
    (micro-unit weights, rational sigmoid rounded HALF_UP — the tie
    rule Spark's BigDecimal round and DuckDB's away-from-zero round
    share for positive values — sign-aware truncating update), and
    the link's own convex loss must not increase across the three
    unrolled iterations."""
    from decimal import ROUND_HALF_UP, Decimal
    rows = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select(
            F.when(F.col("l_returnflag") == "R", 1)
            .otherwise(0)
            .alias("y"),
            F.round("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        )
        .collect()
    )
    stats: dict[tuple[int, int], list[int]] = {}
    for r in rows:
        c = stats.setdefault((r["x1"], r["x2"]), [0, 0])
        c[0] += 1
        c[1] += r["y"]
    nt = sum(c[0] for c in stats.values())

    def sdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    def round_half_up(x: float) -> int:
        # Spark's ROUND on a double is HALF_UP over the shortest
        # decimal repr (BigDecimal.valueOf); repr() is that repr
        return int(
            Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    def loss(w) -> float:
        # the antiderivative of the rational link's GD residual
        # (dL/dz = sigma(z) - y): convex, so descent is well-defined
        b0, b1, b2 = w
        total = 0.0
        for (x1, x2), (n, sy) in stats.items():
            z = (b0 + b1 * x1 + b2 * x2) / 1e6
            prim = 0.5 * z + 0.5 * math.copysign(
                abs(z) - math.log1p(abs(z)), z
            )
            total += n * prim - sy * z
        return total / nt

    w = (0, 0, 0)
    losses = [loss(w)]
    for _ in range(3):
        g = [0, 0, 0]
        for (x1, x2), (n, sy) in stats.items():
            z = (w[0] + w[1] * x1 + w[2] * x2) / 1e6
            sig = 0.5 + z / (2.0 * (1.0 + abs(z)))
            pm = round_half_up(1000000.0 * sig)
            r = n * pm - sy * 1000000
            g[0] += r
            g[1] += r * x1
            g[2] += r * x2
        w = tuple(w[j] - sdiv(g[j], 4096 * nt) for j in range(3))
        losses.append(loss(w))

    got = {
        r["term"]: (r["weight_micro"], r["n_rows"])
        for r in load_all()["ml_logreg_gd"].spark(spark, SF_SMALL).collect()
    }
    assert got == {
        "b0_intercept": (w[0], nt),
        "b1_qty": (w[1], nt),
        "b2_disc": (w[2], nt),
    }
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:])), losses


def test_holt_fold_matches_python_recursion(spark):
    """ev_forecast_holt's JVM higher-order fold must walk the exact
    integer Holt trajectory (micro state, dyadic alpha=1/4 beta=1/8,
    sign-aware truncating shifts) a pure-Python recursion walks over
    the same gap-filled daily series, including zero-filled gap days."""
    from datetime import timedelta

    def sdiv(a: int, bits: int) -> int:
        # the plans.tpch._SDIV truncation convention as Python shifts
        return a >> bits if a >= 0 else -((-a) >> bits)

    def holt_want(rows) -> dict:
        series: dict[str, dict] = {}
        for r in rows:
            if r["event_type"] is None:
                continue  # NULL keys are filtered by plan AND oracle
            series.setdefault(r["event_type"], {})[r["day"]] = r["n"]
        want = {}
        for et, days in series.items():
            d0, d1 = min(days), max(days)
            n_days = (d1 - d0).days + 1
            ys = [
                days.get(d0 + timedelta(days=i), 0)
                for i in range(n_days)
            ]
            l, b = ys[0] * 1000000, 0
            for y in ys[1:]:
                nl = sdiv(y * 1000000 + 3 * (l + b), 2)
                b = sdiv((nl - l) + 7 * b, 3)
                l = nl
            for h in range(1, 8):
                want[(et, h)] = (l + h * b, l, b, n_days)
        return want

    def holt_got(sf_dir: str) -> dict:
        return {
            (r["event_type"], r["horizon"]): (
                r["yhat_micro"],
                r["level_micro"],
                r["trend_micro"],
                r["n_days"],
            )
            for r in load_all()["ev_forecast_holt"]
            .spark(spark, sf_dir)
            .collect()
        }

    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = holt_got(SF_SMALL)
    assert got == holt_want(rows) and len(got) > 0


def test_holt_gap_days_and_null_series_key(spark, tmp_path):
    """The fixture corpus has no zero-activity days, so this synthetic
    table exercises the entry's headline property directly: gap days
    are zero-filled (decaying the trend), and NULL event_type rows are
    dropped entirely rather than forming a zeroed phantom series (the
    non-null-safe grid join would zero a kept NULL group in Spark
    while SQL equi-joins drop it — the filter pins one semantic)."""
    import datetime

    rows = []
    eid = 0
    # 'burst': active days 1,2 then a 3-day gap, one event on day 6
    for day, n in [(1, 8), (2, 6), (6, 1)]:
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 3, day), eid, "burst",
                 1.0, "{}")
            )
            eid += 1
    # NULL series key spanning 3 days — must not appear in the output
    for day in (1, 2, 3):
        rows.append(
            (eid, datetime.datetime(2024, 3, day), eid, None, 1.0, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "gappy")
    df.write.parquet(f"{d}/events.parquet")

    out = load_all()["ev_forecast_holt"].spark(spark, d).collect()
    assert {r["event_type"] for r in out} == {"burst"}
    by_h = {r["horizon"]: r for r in out}
    assert set(by_h) == set(range(1, 8))
    assert by_h[1]["n_days"] == 6  # gap days are on the grid

    def sdiv(a: int, bits: int) -> int:
        return a >> bits if a >= 0 else -((-a) >> bits)

    l, b = 8 * 1000000, 0
    for y in (6, 0, 0, 0, 1):
        nl = sdiv(y * 1000000 + 3 * (l + b), 2)
        b = sdiv((nl - l) + 7 * b, 3)
        l = nl
    assert b < 0  # the zero-filled gap drags the trend negative
    for h in range(1, 8):
        r = by_h[h]
        assert (r["yhat_micro"], r["level_micro"], r["trend_micro"]) == (
            l + h * b,
            l,
            b,
        )


def test_cusum_fold_matches_python_recursion(spark):
    """ev_changepoint_cusum's JVM fold must walk the exact two-sided
    integer CUSUM trajectory (micro deviations, k = mu/4, h = 4*mu,
    truncating integer mean) a pure-Python recursion walks over the
    same gap-filled daily series."""
    from datetime import timedelta

    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict[str, dict] = {}
    for r in rows:
        if r["event_type"] is None:
            continue
        series.setdefault(r["event_type"], {})[r["day"]] = r["n"]
    want = {}
    for et, days in series.items():
        d0, d1 = min(days), max(days)
        n_days = (d1 - d0).days + 1
        ys = [days.get(d0 + timedelta(days=i), 0) for i in range(n_days)]
        mu = (sum(ys) * 1000000) // n_days  # non-negative: // == trunc
        k, h = mu // 4, 4 * mu
        sp = sn = maxp = maxn = n_al = 0
        first = -1
        for idx, y in enumerate(ys):
            dev = y * 1000000 - mu
            sp = max(0, sp + dev - k)
            sn = max(0, sn - dev - k)
            maxp, maxn = max(maxp, sp), max(maxn, sn)
            if sp > h or sn > h:
                n_al += 1
                if first < 0:
                    first = idx
        want[et] = (n_days, mu, maxp, maxn, first, n_al)

    got = {
        r["event_type"]: (
            r["n_days"],
            r["mean_micro"],
            r["max_cusum_pos"],
            r["max_cusum_neg"],
            r["first_alarm_idx"],
            r["n_alarm_days"],
        )
        for r in load_all()["ev_changepoint_cusum"]
        .spark(spark, SF_SMALL)
        .collect()
    }
    assert got == want and len(got) > 0


def test_cusum_detects_level_shift(spark, tmp_path):
    """The fixture corpus is rate-stationary (no alarms), so this
    synthetic series — 10 days at 4/day then 10 days at 36/day —
    exercises the alarm machinery directly: the low regime drives the
    negative CUSUM over h, the shifted regime drives the positive
    side over h, and first_alarm_idx lands in the low regime."""
    import datetime

    rows = []
    eid = 0
    for idx in range(20):
        n = 4 if idx < 10 else 36
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 3, 1 + idx), eid,
                 "shift", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "shifted")
    df.write.parquet(f"{d}/events.parquet")

    out = load_all()["ev_changepoint_cusum"].spark(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    # mu = 20M, k = 5M, h = 80M; low days push sn by 11M/day (alarm
    # from idx 7), shifted days push sp by 11M/day (alarm from idx 17)
    assert r["n_days"] == 20 and r["mean_micro"] == 20_000_000
    assert r["max_cusum_pos"] > 80_000_000
    assert r["max_cusum_neg"] > 80_000_000
    assert r["first_alarm_idx"] == 7
    assert r["n_alarm_days"] > 0


def test_mrr_eval_matches_python_rederivation(spark):
    """sim_mrr_eval's metric tuple must equal a from-scratch Python
    re-derivation of the same semantics over the same corpus: sign-LSH
    candidate generation at the adaptive widths, exact left-to-right
    float dot, round(6), (cos DESC, nn_id) ranking, first-relevant
    rank folded into 1/2520 MRR units."""
    from mwa_uvdata_pipeline_spark.plans.text import (
        _emb_lsh_bits,
        _emb_stats,
        _lsh_tables,
    )

    rows = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
            for r in rows}
    bits = _emb_lsh_bits(_emb_stats(spark, SF_SMALL)[0])
    n_tables = _lsh_tables(bits)

    def keys(e):
        out = []
        for t in range(n_tables):
            k = 0
            for j in range(bits):
                if e[(t * bits + j) % 64] > 0:
                    k += 1 << j
            out.append((t, k))
        return out

    buckets: dict = {}
    for vid, (_, e) in vecs.items():
        for tk in keys(e):
            buckets.setdefault(tk, []).append(vid)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm = {vid: dot(e, e) ** 0.5 for vid, (_, e) in vecs.items()}
    n_q = hits = mrr = rel_tot = 0
    for vid, (qlab, qe) in vecs.items():
        if vid % 10 != 0:
            continue
        n_q += 1
        cand = set()
        for tk in keys(qe):
            cand.update(buckets.get(tk, ()))
        cand.discard(vid)
        ranked = sorted(
            (
                (-round(dot(qe, vecs[c][1]) / (nrm[vid] * nrm[c]), 6), c)
                for c in cand
            )
        )[:10]
        frk = None
        for rk, (_, c) in enumerate(ranked, 1):
            if vecs[c][0] == qlab:
                rel_tot += 1
                if frk is None:
                    frk = rk
        if frk is not None:
            hits += 1
            mrr += 2520 // frk
    got = load_all()["sim_mrr_eval"].spark(spark, SF_SMALL).collect()[0]
    assert (
        got["n_queries"],
        got["hits_at10"],
        got["mrr_x2520_sum"],
        got["rel_in_top10"],
    ) == (n_q, hits, mrr, rel_tot)
    assert n_q > 0 and hits > 0


def test_adaboost_matches_python_trajectory(spark):
    """ml_adaboost_stumps' three output rows must equal a pure-Python
    re-derivation of the quantized discrete-AdaBoost trajectory over
    the same (x1, x2, y) cells: renormalize cell weights to 2^20 by
    truncating division, pick the min-integer-weighted-error stump
    with the (e, feature, threshold, polarity) tiebreak, reweight
    misclassified cells by (W - E) and correct cells by E. Also pins
    the boosting invariant: with both polarities in the search space
    the chosen stump's error never exceeds half the weight total."""
    rows = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select(
            F.round("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    S = 1 << 20
    w: dict[tuple[int, int, int], int] = {}
    for r in rows:
        k = (r["x1"], r["x2"], r["y"])
        w[k] = w.get(k, 0) + 1

    expect = []
    for rnd in (1, 2, 3):
        wt = sum(w.values())
        wn = {k: v * S // wt for k, v in w.items()}
        wtot = sum(wn.values())
        cands = []
        for fi, lab in ((0, "qty"), (1, "disc")):
            vals: dict[int, list[int]] = {}
            for (x1, x2, y), v in wn.items():
                c = vals.setdefault((x1, x2)[fi], [0, 0])
                c[y] += v
            wb = sum(c[0] for c in vals.values())
            wa = sum(c[1] for c in vals.values())
            al = bl = 0
            for t in sorted(vals):
                al += vals[t][1]
                bl += vals[t][0]
                cands.append((bl + (wa - al), lab, t, 1))
                cands.append((al + (wb - bl), lab, t, -1))
        e, feat, thr, pol = min(
            cands, key=lambda c: (c[0], c[1], c[2], c[3])
        )
        expect.append((rnd, feat, thr, pol, e * 1000000 // wtot, wtot))
        assert 2 * e <= wtot, (rnd, e, wtot)  # weak-learner invariant
        if rnd < 3 and 0 < e < wtot:
            nxt = {}
            for (x1, x2, y), v in wn.items():
                pred = pol if ((x1, x2)[feat == "disc"] <= thr) else -pol
                nxt[(x1, x2, y)] = (
                    v * (wtot - e) if pred != 2 * y - 1 else v * e
                )
            w = nxt
        elif rnd < 3:
            w = wn

    got = sorted(
        (
            r["round"], r["feature"], r["threshold"], r["polarity"],
            r["err_micro"], r["w_total"],
        )
        for r in load_all()["ml_adaboost_stumps"].spark(spark, SF_SMALL).collect()
    )
    assert got == expect
    # the reweight must actually move weight: round 2's stump differs
    # from round 1's unless round 1 was degenerate (it is not here)
    assert expect[0][1:4] != expect[1][1:4]


def test_recall_at_k_panel_and_floor(spark):
    """sim_recall_at_k's evaluation panel must be exactly the 16
    smallest-md5 vec_ids, every query must have a full exact top-10
    (corpus >> 10), the overlap must be bounded by both legs, and the
    aggregate measured recall of the production LSH path must hold
    its pinned floor (0.35 at this scale — measured 0.40; the gate
    exists so an LSH regression is caught by CI, not by a consumer)."""
    import hashlib

    rows = load_all()["sim_recall_at_k"].spark(spark, SF_SMALL).collect()
    assert len(rows) == 16
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id")
        .collect()
    }
    panel = sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:16]
    assert sorted(r["q_id"] for r in rows) == sorted(panel)
    for r in rows:
        assert r["n_exact"] == 10
        assert 0 <= r["n_overlap"] <= min(r["n_exact"], r["n_lsh"])
        assert r["recall_permille"] == r["n_overlap"] * 1000 // r["n_exact"]
    tot_o = sum(r["n_overlap"] for r in rows)
    tot_e = sum(r["n_exact"] for r in rows)
    assert tot_o * 100 >= 35 * tot_e, (tot_o, tot_e)


def test_forecast_backtest_matches_python_rederivation(spark):
    """ev_forecast_backtest must equal a pure-Python re-derivation:
    run the integer Holt recursion over each type's train prefix
    (all but the last 7 gap-filled days), forecast linearly, score
    MAE/bias sums in micro-units against the holdout, and compare
    the naive last-train-value baseline. Types shorter than 8 days
    drop out."""
    from datetime import timedelta

    def sdiv(a: int, bits: int) -> int:
        return a >> bits if a >= 0 else -((-a) >> bits)

    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict[str, dict] = {}
    for r in rows:
        if r["event_type"] is None:
            continue
        series.setdefault(r["event_type"], {})[r["day"]] = r["n"]
    want = {}
    for et, days in series.items():
        d0, d1 = min(days), max(days)
        n_days = (d1 - d0).days + 1
        if n_days < 8:
            continue
        ys = [days.get(d0 + timedelta(days=i), 0) for i in range(n_days)]
        train, test = ys[:-7], ys[-7:]
        l, b = train[0] * 1000000, 0
        for y in train[1:]:
            nl = sdiv(y * 1000000 + 3 * (l + b), 2)
            b = sdiv((nl - l) + 7 * b, 3)
            l = nl
        ylast = train[-1]
        mae = sum(abs(l + h * b - y * 1000000) for h, y in enumerate(test, 1))
        nmae = sum(abs(ylast * 1000000 - y * 1000000) for y in test)
        bias = sum(l + h * b - y * 1000000 for h, y in enumerate(test, 1))
        want[et] = (len(train), mae, nmae, bias)
    got = {
        r["event_type"]: (
            r["n_train_days"],
            r["holt_mae_sum_micro"],
            r["naive_mae_sum_micro"],
            r["holt_bias_sum_micro"],
        )
        for r in load_all()["ev_forecast_backtest"].spark(spark, SF_SMALL).collect()
    }
    assert got == want and len(got) > 0


def test_lsh_recall_matches_python_and_floor(spark):
    """dedup_lsh_recall must equal a from-scratch re-derivation:
    exact DF-capped Jaccard >= 0.6 truth pairs, production band0
    (min of the two md5 lanes) equality as 'caught'. The measured
    band recall also holds a 0.8 floor at this scale — the gate that
    tells the pipeline whether LSH-only dedup is trustworthy."""
    import hashlib

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    sh: dict[int, set] = {}
    for d, t in docs.items():
        ts = t.split(" ")
        sh[d] = {
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        } if len(ts) >= 3 else set()
    df: dict[str, int] = {}
    for s_set in sh.values():
        for s in s_set:
            df[s] = df.get(s, 0) + 1
    capped = {d: {s for s in ss if df[s] <= 128} for d, ss in sh.items()}
    ids = sorted(docs)
    true_pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(capped[a] & capped[b])
            union = len(capped[a]) + len(capped[b]) - inter
            if union and inter / union >= 0.6:
                true_pairs.add((a, b))
    def band(d):
        hs = [hashlib.md5(s.encode()).hexdigest() for s in sh[d]]
        return (min(h[0:8] for h in hs) + min(h[8:16] for h in hs)) if hs else ""
    caught = sum(1 for a, b in true_pairs if band(a) == band(b))
    got = load_all()["dedup_lsh_recall"].spark(spark, SF_SMALL).collect()[0]
    assert (got["n_true_pairs"], got["n_caught"]) == (len(true_pairs), caught)
    assert got["recall_permille"] == caught * 1000 // max(len(true_pairs), 1)
    assert len(true_pairs) > 0 and got["recall_permille"] >= 800


def test_adaboost_eval_matches_python_rederivation(spark):
    """ml_adaboost_eval must equal a from-scratch Python re-derivation:
    train the quantized 3-round AdaBoost on the md5 train split only,
    score the unweighted 3-stump majority vote on the held-out split,
    and reproduce the confusion counts and integer ppm accuracy."""
    import hashlib

    rows = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    S = 1 << 20

    def split(r):
        key = f"{r['l_orderkey']}|{r['l_linenumber']}"
        return hashlib.md5(key.encode()).hexdigest()[:2]

    train = [r for r in rows if split(r) < "cd"]
    test = [r for r in rows if split(r) >= "e6"]
    w: dict[tuple[int, int, int], int] = {}
    for r in train:
        k = (r["x1"], r["x2"], r["y"])
        w[k] = w.get(k, 0) + 1
    stumps = []
    for _rnd in (1, 2, 3):
        wt = sum(w.values())
        wn = {k: v * S // wt for k, v in w.items()}
        wtot = sum(wn.values())
        cands = []
        for fi, lab in ((0, "qty"), (1, "disc")):
            vals: dict[int, list[int]] = {}
            for (x1, x2, y), v in wn.items():
                c = vals.setdefault((x1, x2)[fi], [0, 0])
                c[y] += v
            wb = sum(c[0] for c in vals.values())
            wa = sum(c[1] for c in vals.values())
            al = bl = 0
            for t in sorted(vals):
                al += vals[t][1]
                bl += vals[t][0]
                cands.append((bl + (wa - al), lab, t, 1))
                cands.append((al + (wb - bl), lab, t, -1))
        e, feat, thr, pol = min(cands, key=lambda c: (c[0], c[1], c[2], c[3]))
        stumps.append((feat, thr, pol))
        if 0 < e < wtot:
            nxt = {}
            for (x1, x2, y), v in wn.items():
                pred = pol if ((x1, x2)[feat == "disc"] <= thr) else -pol
                nxt[(x1, x2, y)] = v * (wtot - e) if pred != 2 * y - 1 else v * e
            w = nxt
        else:
            w = wn
    tp = fp = fn = tn = 0
    for r in test:
        v = sum(
            (pol if ((r["x1"], r["x2"])[feat == "disc"] <= thr) else -pol)
            for feat, thr, pol in stumps
        )
        pred = 1 if v > 0 else 0
        if r["y"] == 1 and pred == 1:
            tp += 1
        elif r["y"] == 0 and pred == 1:
            fp += 1
        elif r["y"] == 1 and pred == 0:
            fn += 1
        else:
            tn += 1
    got = load_all()["ml_adaboost_eval"].spark(spark, SF_SMALL).collect()[0]
    n_test = tp + fp + fn + tn
    assert (
        got["n_train"], got["n_test"], got["tp"], got["fp"],
        got["fn"], got["tn"], got["acc_ppm"],
    ) == (
        len(train), n_test, tp, fp, fn, tn,
        (tp + tn) * 1000000 // max(n_test, 1),
    )
    assert n_test > 0 and len(train) > 0


def test_adaboost_degenerate_stump_carries_weights(spark, tmp_path):
    """A perfectly separable dataset makes round 1's stump exact
    (E = 0): the fixture corpus never hits this branch, so this
    synthetic table pins it — the guard must CARRY the normalized
    weights (no reweight by zero), every later round re-picks the
    same stump with err_micro = 0, and the eval twin's majority vote
    scores the test split perfectly."""
    rows = []
    # y == 1 exactly when quantity <= 10: separable on the qty axis
    for i in range(40):
        q = float(1 + i % 20)
        rows.append((i // 7, i % 7, q, 0.05, "R" if q <= 10 else "N"))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_discount double, l_returnflag string",
    )
    d = str(tmp_path / "sep")
    df.write.parquet(f"{d}/lineitem.parquet")
    out = sorted(
        (r["round"], r["feature"], r["threshold"], r["polarity"],
         r["err_micro"])
        for r in load_all()["ml_adaboost_stumps"].spark(spark, d).collect()
    )
    assert len(out) == 3
    for rnd, feature, threshold, polarity, err in out:
        assert (feature, threshold, polarity, err) == ("qty", 10, 1, 0), out
    ev = load_all()["ml_adaboost_eval"].spark(spark, d).collect()[0]
    if ev["n_test"] > 0:  # md5 split of 40 rows may land few test rows
        assert ev["fp"] == 0 and ev["fn"] == 0
        assert ev["acc_ppm"] == 1000000


def test_backtest_drops_short_series(spark, tmp_path):
    """ev_forecast_backtest must DROP series shorter than 8 calendar
    days (no 7-day holdout exists) and keep longer ones — the
    fixture corpus has no short types, so this synthetic table pins
    the filter on both engines' shared semantics."""
    import datetime

    rows = []
    eid = 0
    for day in range(12):  # 'long' spans 12 days
        for _ in range(day + 1):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + day), eid % 5,
                 "long", 1.0, "{}")
            )
            eid += 1
    for day in range(5):  # 'short' spans 5 days only
        rows.append(
            (eid, datetime.datetime(2024, 1, 1 + day), eid % 5,
             "short", 1.0, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "mixed")
    df.write.parquet(f"{d}/events.parquet")
    out = load_all()["ev_forecast_backtest"].spark(spark, d).collect()
    assert [r["event_type"] for r in out] == ["long"]
    r = out[0]
    assert r["n_train_days"] == 5  # 12 days - 7 holdout
    # the naive baseline on a monotone series: |ylast - y| summed
    # over days 6..12 (counts 6..12, ylast = 5) in micro-units
    assert r["naive_mae_sum_micro"] == sum(
        abs(5 - y) for y in range(6, 13)
    ) * 1000000


def test_kanonymity_matches_python_rederivation(spark):
    """t_kanonymity must equal a from-scratch Python re-derivation of
    the QI-cell census, and its invariants must hold: violating-cell
    and at-risk-document counts are monotone in k, min_cell_n and
    n_cells are k-invariant, and n_docs_at_risk is consistent with
    the census."""
    rows = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("lang", "source", "n_chars")
        .collect()
    )
    cells: dict = {}
    for r in rows:
        key = (r["lang"], r["source"], r["n_chars"] // 100)
        cells[key] = cells.get(key, 0) + 1
    want = {}
    for k in (2, 5, 10):
        below = [n for n in cells.values() if n < k]
        want[k] = (len(below), sum(below), min(cells.values()), len(cells))
    got = {
        r["k"]: (
            r["n_cells_below"], r["n_docs_at_risk"],
            r["min_cell_n"], r["n_cells"],
        )
        for r in load_all()["t_kanonymity"].spark(spark, SF_SMALL).collect()
    }
    assert got == want
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[a][0] <= got[b][0] and got[a][1] <= got[b][1]


def test_minhash_calibration_matches_python_and_monotone(spark):
    """dedup_minhash_calibration must equal a from-scratch Python
    re-derivation (band candidates, lane agreement, exact uncapped
    Jaccard in truncated ppm) and the calibration claim must hold:
    mean exact Jaccard rises with lane agreement."""
    import hashlib

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    sh: dict[int, set] = {}
    for d, t in docs.items():
        ts = t.split(" ")
        sh[d] = {
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        } if len(ts) >= 3 else set()
    lanes = {}
    for d, ss in sh.items():
        if not ss:
            continue
        hs = [hashlib.md5(s.encode()).hexdigest() for s in ss]
        lanes[d] = tuple(min(h[8 * i: 8 * i + 8] for h in hs) for i in range(4))
    buckets: dict = {}
    for d, ln in lanes.items():
        buckets.setdefault(ln[0] + ln[1], []).append(d)
    groups: dict[int, list[int]] = {}
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                agree = 2 + (lanes[a][2] == lanes[b][2]) + (lanes[a][3] == lanes[b][3])
                inter = len(sh[a] & sh[b])
                if inter == 0:
                    continue  # no posting-join row -> pair absent
                union = len(sh[a]) + len(sh[b]) - inter
                groups.setdefault(agree, []).append(inter * 1000000 // union)
    want = {
        agree: (
            len(ppms), sum(ppms) // len(ppms), min(ppms), max(ppms)
        )
        for agree, ppms in groups.items()
    }
    got = {
        r["agreement"]: (
            r["n_pairs"], r["mean_j_ppm"], r["min_j_ppm"], r["max_j_ppm"]
        )
        for r in load_all()["dedup_minhash_calibration"]
        .spark(spark, SF_SMALL)
        .collect()
    }
    assert got == want and len(got) > 0
    levels = sorted(got)
    for a, b in zip(levels, levels[1:]):
        assert got[a][1] < got[b][1]  # calibration: mean J rises
