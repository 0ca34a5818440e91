"""Skyline + interval-concurrency invariants (operators/analytics.py) on
hand-built frames where the answer is known by inspection — the sf0.01
DuckDB hash match lives in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.analytics import (
    interval_concurrency,
    skyline_2d,
)


def test_skyline_keeps_duplicate_optima_and_drops_dominated(spark):
    rows = [
        # (id, price, size)
        (1, 10.0, 5),   # frontier
        (2, 10.0, 5),   # duplicate of 1 — neither dominates, both kept
        (3, 10.0, 4),   # same price, smaller size — dominated by 1
        (4, 20.0, 9),   # frontier (pricier but bigger)
        (5, 25.0, 9),   # dominated by 4 (same size, pricier)
        (6, 5.0, 1),    # frontier (cheapest)
        (7, 30.0, 8),   # dominated by 4 on both axes
    ]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    got = sorted(
        r["id"] for r in skyline_2d(df, "price", "size").collect()
    )
    assert got == [1, 2, 4, 6]


def test_skyline_brute_force_agreement(spark):
    """Window formulation == quadratic dominance filter on a real table
    slice (part at smoke scale)."""
    from tests.conftest import SF_SMOKE

    p = spark.read.parquet(f"{SF_SMOKE}/part.parquet").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    fast = {
        r["p_partkey"]
        for r in skyline_2d(p, "p_retailprice", "p_size").collect()
    }
    rows = p.collect()
    slow = {
        a["p_partkey"]
        for a in rows
        if not any(
            b["p_retailprice"] <= a["p_retailprice"]
            and b["p_size"] >= a["p_size"]
            and (
                b["p_retailprice"] < a["p_retailprice"]
                or b["p_size"] > a["p_size"]
            )
            for b in rows
        )
    }
    assert fast == slow


def test_interval_concurrency_known_answer(spark):
    rows = [
        # (key, id, start, end)
        ("a", 1, 0, 10),
        ("a", 2, 5, 15),    # overlaps 1 -> conc 2 at t=5
        ("a", 3, 10, 20),   # touches 1's end: must NOT make conc 3
        ("b", 4, 0, 1),
        ("b", 5, 1, 2),     # touching only -> max stays 1
    ]
    df = spark.createDataFrame(rows, ["k", "id", "s", "e"])
    got = {
        r["k"]: (r["max_conc"], r["n_intervals"], r["peak_t"])
        for r in interval_concurrency(df, "k", "s", "e", "id").collect()
    }
    assert got == {"a": (2, 3, 5), "b": (1, 2, 0)}


def test_interval_concurrency_bounds(spark):
    """Concurrency is at least 1 and at most the interval count; the
    peak instant lies inside the observed time range."""
    df = spark.range(0, 500).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("id"),
        (F.col("id") * 3 % 101).alias("s"),
        (F.col("id") * 3 % 101 + 5 + F.col("id") % 11).alias("e"),
    )
    for r in interval_concurrency(df, "k", "s", "e", "id").collect():
        assert 1 <= r["max_conc"] <= r["n_intervals"]
        assert 0 <= r["peak_t"] <= 111


def test_event_transitions_row_stochastic(spark):
    """Transition probabilities sum to 1 per source state and the pair
    count equals n_events - n_users (one lead pair per consecutive
    event within a user)."""
    from customer_segmentation_pyspark_spark.queries import (
        q_event_transitions,
    )
    from tests.conftest import SF_SMOKE

    out = q_event_transitions(spark, SF_SMOKE)
    sums = (
        out.groupBy("src")
        .agg(F.round(F.sum("prob"), 4).alias("p"), F.sum("n").alias("n"))
        .collect()
    )
    assert sums and all(abs(r["p"] - 1.0) < 1e-3 for r in sums)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    expected_pairs = ev.count() - ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in sums) == expected_pairs


def test_char_entropy_known_values(spark):
    from customer_segmentation_pyspark_spark.operators.textops import (
        char_entropy,
    )

    df = spark.createDataFrame(
        [("aaaa",), ("ab",), ("aabb",), ("abcd",)], ["text"]
    )
    got = [
        round(r["e"], 9)
        for r in df.select(
            F.round(char_entropy(F.col("text")), 9).alias("e")
        ).collect()
    ]
    # constant -> 0 bits, fair coin -> 1 bit, 4 uniform chars -> 2 bits
    assert got == [0.0, 1.0, 1.0, 2.0]


def test_snapshot_diff_partitions_both_snapshots(spark):
    """added+changed+unchanged == |new|, removed+changed+unchanged ==
    |old|, and the four statuses are disjoint by construction."""
    from customer_segmentation_pyspark_spark.queries import q_snapshot_diff
    from tests.conftest import SF_SMOKE

    res = {r["status"]: r["n_rows"]
           for r in q_snapshot_diff(spark, SF_SMOKE).collect()}
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_old = o.where(F.col("o_orderkey") % 7 != 0).count()
    n_new = o.where(F.col("o_orderkey") % 5 != 0).count()
    assert res.get("added", 0) + res.get("changed", 0) + res.get(
        "unchanged", 0
    ) == n_new
    assert res.get("removed", 0) + res.get("changed", 0) + res.get(
        "unchanged", 0
    ) == n_old
    assert res.get("changed", 0) > 0 and res.get("added", 0) > 0


def test_mixture_sample_binding_lang_keeps_everything(spark):
    """The water-filling capacity is set by the scarcest language (min
    n/w) — its sample rate is exactly 1.0, so every one of its docs
    survives; no language over-samples."""
    from customer_segmentation_pyspark_spark.queries import (
        MIXTURE_WEIGHTS,
        q_mixture_sample,
    )
    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    per = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
        if r["lang"] in MIXTURE_WEIGHTS
    }
    binding = min(per, key=lambda l: per[l] / MIXTURE_WEIGHTS[l])
    got = {r["lang"]: r["n_sampled"]
           for r in q_mixture_sample(spark, SF_SMOKE).collect()}
    assert got[binding] == per[binding]
    assert all(got[l] <= per[l] for l in got)


def test_cdc_apply_semantics(spark):
    """Tombstoned keys are gone, updated keys carry the v2 payload, and
    untouched keys survive with their insert version."""
    from customer_segmentation_pyspark_spark.queries import q_cdc_apply
    from tests.conftest import SF_SMOKE

    rows = {r["k"]: r for r in q_cdc_apply(spark, SF_SMOKE).collect()}
    assert rows, "snapshot is empty"
    assert not any(k % 7 == 0 for k in rows), "tombstones leaked"
    for k, r in rows.items():
        if k % 3 == 0:
            assert r["op"] == "U" and r["version"] == 2
        else:
            assert r["op"] == "I" and r["version"] == 1


def test_key_skew_profile_monotone(spark):
    """Counts are non-increasing, shares are positive, and the running
    cumulative share is non-decreasing and <= 1."""
    from customer_segmentation_pyspark_spark.queries import (
        q_key_skew_profile,
    )
    from tests.conftest import SF_SMOKE

    rows = q_key_skew_profile(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    cum = [r["cum_pct"] for r in rows]
    assert all(b >= a for a, b in zip(cum, cum[1:]))
    assert cum[-1] <= 1.0 + 1e-9


def test_mann_whitney_matches_python(spark):
    """U and z agree with a plain-Python midrank implementation on the
    fixture data (ties included)."""
    import math
    from collections import Counter

    from customer_segmentation_pyspark_spark.queries import (
        REGISTRY,
    )
    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_ORACLE

    got = REGISTRY["mann_whitney"].fn(spark, SF_ORACLE).collect()[0]
    o = load_table(spark, SF_ORACLE, "orders")
    c = load_table(spark, SF_ORACLE, "customer")
    rows = (
        o.join(
            c.filter(
                c.c_mktsegment.isin("BUILDING", "MACHINERY")
            ).select("c_custkey", "c_mktsegment"),
            o.o_custkey == c.c_custkey,
        )
        .select("c_mktsegment", "o_totalprice")
        .collect()
    )
    vals = sorted((r["o_totalprice"], r["c_mktsegment"]) for r in rows)
    counts = Counter(v for v, _ in vals)
    # midranks
    midrank = {}
    pos = 1
    for v in sorted(counts):
        t = counts[v]
        midrank[v] = pos + (t - 1) / 2.0
        pos += t
    r1 = sum(midrank[v] for v, g in vals if g == "BUILDING")
    n1 = sum(1 for _, g in vals if g == "BUILDING")
    n2 = len(vals) - n1
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    tie_sum = sum(t**3 - t for t in counts.values())
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(sigma2)
    assert got["n1"] == n1 and got["n2"] == n2
    assert abs(got["u_stat"] - round(u1, 2)) < 1e-9
    assert abs(got["z_score"] - round(z, 6)) < 1e-6


def test_ks_d_matches_python(spark):
    """KS D equals the max ECDF gap computed in plain Python."""
    from customer_segmentation_pyspark_spark.queries import REGISTRY
    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_ORACLE

    got = REGISTRY["ks_test"].fn(spark, SF_ORACLE).collect()[0]
    o = load_table(spark, SF_ORACLE, "orders")
    c = load_table(spark, SF_ORACLE, "customer")
    rows = (
        o.join(
            c.filter(
                c.c_mktsegment.isin("BUILDING", "MACHINERY")
            ).select("c_custkey", "c_mktsegment"),
            o.o_custkey == c.c_custkey,
        )
        .select("c_mktsegment", "o_totalprice")
        .collect()
    )
    a = sorted(r["o_totalprice"] for r in rows if r["c_mktsegment"] == "BUILDING")
    b = sorted(r["o_totalprice"] for r in rows if r["c_mktsegment"] == "MACHINERY")
    xs = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, x) / len(a)
            - bisect.bisect_right(b, x) / len(b)
        )
        for x in xs
    )
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert abs(got["ks_d"] - round(d, 6)) < 1e-9


def test_survival_km_matches_python_reference(spark):
    """The KM query's curve on the sf0.001 fixture equals a plain-Python
    Kaplan-Meier (same censoring rule), and survival is non-increasing
    with S(first event time) < 1."""
    from collections import Counter

    from customer_segmentation_pyspark_spark.queries import REGISTRY
    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    rows = (
        o.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
        )
        .collect()
    )
    horizon = max(r["l"] for r in rows)
    lives = [
        ((r["l"] - r["f"]).days + 1, 1 if (horizon - r["l"]).days > 90 else 0)
        for r in rows
    ]
    d = Counter(t for t, e in lives if e)
    leaving = Counter(t for t, _ in lives)
    total = len(lives)
    surv, seen, expected = 1.0, 0, {}
    for t in sorted(leaving):
        n_risk = total - seen
        if d[t] > 0:
            surv *= 1.0 - d[t] / n_risk
        expected[t] = (n_risk, d[t], round(surv, 6))
        seen += leaving[t]

    got = {
        r["t_days"]: (r["n_risk"], r["d_events"], r["survival"])
        for r in REGISTRY["survival_km"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expected
    curve = [v[2] for _, v in sorted(got.items())]
    assert curve == sorted(curve, reverse=True)
    assert curve[-1] < 1.0


def test_survival_km_all_churned_reaches_exact_zero(spark, tmp_path):
    """When every at-risk customer at the max lifetime has churned,
    d == n_risk there and S(t) must be EXACTLY 0.0 in both engines —
    the ln(0) branch (Spark NULL / DuckDB error) is handled via an
    explicit -inf term."""
    import datetime as dt

    import duckdb

    from customer_segmentation_pyspark_spark.queries import REGISTRY

    # two customers, both with lifetimes ending long before the
    # horizon-setting customer 3 (whose single-day lifetime churns too)
    rows = [
        (1, dt.datetime(1995, 1, 1)),
        (1, dt.datetime(1995, 1, 10)),
        (2, dt.datetime(1995, 1, 1)),
        (2, dt.datetime(1995, 1, 10)),
        (3, dt.datetime(1996, 6, 1)),
    ]
    o = spark.createDataFrame(rows, "o_custkey bigint, o_orderdate timestamp")
    sf_dir = str(tmp_path)
    o.write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["t_days"]: (r["n_risk"], r["d_events"], r["survival"])
        for r in REGISTRY["survival_km"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"'{sf_dir}/orders.parquet/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(REGISTRY["survival_km"].oracle).fetchall()
    }
    assert got == want
    # lifetime 1 (customer 3): censored at horizon? No — horizon IS its
    # last order, so it is censored; lifetimes 10: both churn -> at
    # t=10 d == n_risk == 2 -> S(10) = 0 exactly
    assert got[10][2] == 0.0


def test_dq_split_routes_and_preserves_rows(spark):
    """dq_split: valid+quarantined partition the input exactly; the
    quarantine carries the right failed-check names; enforce_or_fail
    raises with per-check counts and passes clean frames through."""
    import pytest

    from customer_segmentation_pyspark_spark.operators.analytics import (
        dq_enforce_or_fail,
        dq_split,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -1.0, "ok"), (3, 5.0, None), (4, -2.0, None)],
        "id long, amount double, tag string",
    )
    rules = {
        "amount_nonneg": F.col("amount") < 0,
        "tag_nonnull": F.col("tag").isNull(),
    }
    valid, quarantined = dq_split(df, rules)
    assert {r["id"] for r in valid.collect()} == {1}
    got = {
        r["id"]: tuple(r["_failed_checks"]) for r in quarantined.collect()
    }
    assert got == {
        2: ("amount_nonneg",),
        3: ("tag_nonnull",),
        4: ("amount_nonneg", "tag_nonnull"),
    }
    assert valid.columns == df.columns  # quarantine column stripped

    with pytest.raises(ValueError, match="amount_nonneg"):
        dq_enforce_or_fail(df, rules)
    clean = df.filter("id = 1")
    assert dq_enforce_or_fail(clean, rules) is clean
