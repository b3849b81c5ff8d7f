"""Unit tests for the OLAP extras not fully coverable by the SQL oracle:
as-of join edge semantics (tolerance, no-match, tie) and the
approx_count_distinct sketch tolerance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_checked(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), "a"),
            ("u1", _ts("2024-01-01 12:00:00"), "b"),
            ("u2", _ts("2024-01-01 09:00:00"), "c"),  # before any right row
            ("u3", _ts("2024-01-01 09:00:00"), "d"),  # key missing on right
        ],
        "user string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 1.0),
            ("u1", _ts("2024-01-01 10:00:00"), 2.0),  # tie: inclusive match
            ("u1", _ts("2024-01-01 11:00:00"), 3.0),
            ("u2", _ts("2024-01-01 11:00:00"), 4.0),
        ],
        "user string, ts timestamp, snap double",
    )
    out = {
        (r["user"], r["tag"]): r["snap"]
        for r in asof_join(left, right, on="ts", by=["user"]).collect()
    }
    assert out == {
        ("u1", "a"): 2.0,  # tie at 10:00 matches (inclusive backward)
        ("u1", "b"): 3.0,
        ("u2", "c"): None,  # nothing at-or-before
        ("u3", "d"): None,  # key absent
    }


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 12:00:00"), "x")],
        "user string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), 1.0)],
        "user string, ts timestamp, snap double",
    )
    with_tol = asof_join(
        left, right, on="ts", by=["user"], tolerance="1 hour"
    ).collect()[0]
    without_tol = asof_join(left, right, on="ts", by=["user"]).collect()[0]
    assert with_tol["snap"] is None  # 2h stale > 1h tolerance
    assert without_tol["snap"] == 1.0


def test_asof_join_name_collision_suffix(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 12:00:00"), 9.0)],
        "user string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), 1.5)],
        "user string, ts timestamp, value double",
    )
    row = asof_join(left, right, on="ts", by=["user"]).collect()[0]
    assert row["value"] == 9.0 and row["value_right"] == 1.5


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    row = e.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.05 * row["exact"])


def test_approx_sketch_query_within_tolerance(spark, sf_dir):
    """The registered approx_sketch_stats query (rows-only driver check)
    must bound both sketches against the exact aggregates."""
    from covid_data_pipeline_spark.harness.registry import QUERIES

    approx = {
        r["event_type"]: r
        for r in QUERIES["approx_sketch_stats"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in QUERIES["distinct_exact_and_percentiles"].fn(spark, sf_dir).collect()
    }
    assert approx.keys() == exact.keys()
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["users_approx"] - e["users_exact"]) <= max(3, 0.05 * e["users_exact"])
        assert abs(a["p50_approx"] - e["p50"]) <= 0.05 * max(1.0, abs(e["p50"]))
        assert abs(a["p95_approx"] - e["p95"]) <= 0.05 * max(1.0, abs(e["p95"]))


def test_rolling_hll_tracks_exact_within_error(spark, sf_dir):
    """The sketch-merging rolling distinct must land within HLL error
    (lgConfigK=12 default ⇒ ~1.6% rse; allow 5%) of the exact twin on
    every day."""
    from covid_data_pipeline_spark.harness.registry import QUERIES

    exact = {
        r["day"]: r["users_7d"]
        for r in QUERIES["rolling_distinct_users_7d"].fn(spark, sf_dir).collect()
    }
    est = {
        r["day"]: r["users_7d_est"]
        for r in QUERIES["rolling_distinct_users_7d_hll"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(est)
    for day, n in exact.items():
        assert abs(est[day] - n) <= max(2, 0.05 * n), (day, n, est[day])


def test_concentration_metrics_boundaries(spark):
    """Gini/HHI construction from revenue_concentration_metrics on
    planted distributions: perfectly equal -> Gini 0, HHI = 1e8/n;
    single-earner -> Gini -> (n-1)/n, HHI = 1e8."""
    import tempfile

    from covid_data_pipeline_spark.harness.registry import QUERIES

    def run(rows):
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(f"{d}/orders.parquet")
            return QUERIES["revenue_concentration_metrics"].fn(
                spark, d
            ).collect()[0]

    equal = run([(i, i, 100.0) for i in range(10)])
    assert equal["gini_bp"] == 0
    assert equal["hhi_pp100m"] == 100_000_000 // 10

    # one customer earns everything (others epsilon-free zero rows are
    # impossible through orders, so give them a cent)
    skew = run([(0, 0, 10_000.0)] + [(i, i, 0.01) for i in range(1, 10)])
    assert skew["gini_bp"] > 8900        # -> (n-1)/n = 0.9
    assert skew["hhi_pp100m"] > 99_000_000


def test_skyline_matches_bruteforce_and_partitioning_invariant(spark):
    """skyline_2d == brute-force strict-dominance filter on a random
    distinct point set, under two different partitionings."""
    import random

    from covid_data_pipeline_spark.operators.skyline import skyline_2d

    rng = random.Random(7)
    pts = {(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(300)}
    pts = sorted(pts)
    expected = {
        (x, y)
        for x, y in pts
        if not any(
            (qx <= x and qy >= y and (qx < x or qy > y)) for qx, qy in pts
        )
    }
    for n_part in (1, 7):
        df = spark.createDataFrame(pts, "x int, y int").repartition(n_part)
        got = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()}
        assert got == expected, f"n_part={n_part}"
