"""Planted-case tests for operators/temporal.py: point-in-time
enrichment tie/no-match semantics, snapshot-diff change taxonomy, and
linear-interpolation arithmetic (values chosen exact in binary)."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow

import datetime as dt

from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.temporal import (
    interpolate_daily,
    pit_enrich,
    snapshot_diff,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_pit_enrich_at_or_before_and_ties(spark):
    dim = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 10, "A"),
            (1, _ts("2024-01-03T00:00:00"), 11, "B"),
            # two dim rows at the SAME ts: larger tie id must win
            (1, _ts("2024-01-03T00:00:00"), 12, "C"),
            (2, _ts("2024-01-05T00:00:00"), 13, "Z"),
        ],
        "user_id long, ts timestamp, event_id long, seg string",
    ).withColumn("seg_ts", F.col("ts"))
    fact = spark.createDataFrame(
        [
            (1, _ts("2024-01-02T00:00:00"), 100),  # between A and B -> A
            (1, _ts("2024-01-03T00:00:00"), 101),  # exactly at B/C ts -> C
            (1, _ts("2024-01-04T00:00:00"), 102),  # after -> C
            (2, _ts("2024-01-04T00:00:00"), 103),  # before any dim -> NULL
            (3, _ts("2024-01-04T00:00:00"), 104),  # key absent in dim -> NULL
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = pit_enrich(
        fact,
        dim,
        keys=["user_id"],
        fact_ts="ts",
        dim_ts="ts",
        payload_cols=["seg", "seg_ts"],
        fact_tie="event_id",
        dim_tie="event_id",
    )
    got = {r["event_id"]: r["seg"] for r in out.collect()}
    assert got == {100: "A", 101: "C", 102: "C", 103: None, 104: None}
    assert out.count() == fact.count()  # PIT join never drops/dups facts


def test_pit_enrich_stable_under_repartition(spark):
    dim = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), i, f"s{i}") for i in range(20)],
        "user_id long, ts timestamp, event_id long, seg string",
    )
    fact = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), 999)],
        "user_id long, ts timestamp, event_id long",
    )
    for n in (1, 7):
        out = pit_enrich(
            fact.repartition(n),
            dim.repartition(n),
            keys=["user_id"],
            fact_ts="ts",
            dim_ts="ts",
            payload_cols=["seg"],
            fact_tie="event_id",
            dim_tie="event_id",
        )
        # all 20 dim rows tie on ts; event_id 19 must win deterministically
        assert [r["seg"] for r in out.collect()] == ["s19"]


def test_snapshot_diff_taxonomy(spark):
    old = spark.createDataFrame(
        [(1, 5, None), (2, 7, 70), (3, 9, 90)],
        "k long, a int, b int",
    )
    new = spark.createDataFrame(
        [(1, 5, None), (2, 8, 70), (4, 1, 10)],
        "k long, a int, b int",
    )
    out = snapshot_diff(old, new, keys=["k"], compare_cols=["a", "b"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    # k=1 unchanged (NULL == NULL is not a change), k=2 update,
    # k=3 delete, k=4 insert
    assert got == {1: "unchanged", 2: "update", 3: "delete", 4: "insert"}
    row4 = out.where("k = 4").first()
    assert row4["old_a"] is None and row4["new_a"] == 1


def test_interpolate_daily_exact_points(spark):
    d = dt.date
    daily = spark.createDataFrame(
        [
            ("x", d(2024, 1, 1), 100),
            # gap 2024-01-02..03 -> 100 + (400-100)*k/3
            ("x", d(2024, 1, 4), 400),
            # gap 2024-01-05 -> midpoint of 400 and 500
            ("x", d(2024, 1, 6), 500),
            ("y", d(2024, 1, 1), 7),  # singleton span: no gaps
        ],
        "key string, day date, v long",
    )
    out = interpolate_daily(daily, keys=["key"], day_col="day", val_col="v")
    rows = {(r["key"], r["day"]): r for r in out.collect()}
    assert len(rows) == 7  # 6 days for x + 1 for y
    assert rows[("x", d(2024, 1, 2))]["interp_value"] == 200.0
    assert rows[("x", d(2024, 1, 3))]["interp_value"] == 300.0
    assert rows[("x", d(2024, 1, 5))]["interp_value"] == 450.0
    assert rows[("x", d(2024, 1, 4))]["interp_value"] == 400.0
    assert rows[("x", d(2024, 1, 4))]["observed"] is True
    assert rows[("x", d(2024, 1, 5))]["observed"] is False
    assert rows[("y", d(2024, 1, 1))]["interp_value"] == 7.0


def test_pit_plan_has_no_inequality_join(spark):
    """The PIT join must not appear as a (broadcast) nested-loop join in
    the physical plan — that is the whole point of the operator."""
    dim = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 1, "A")],
        "user_id long, ts timestamp, event_id long, seg string",
    )
    fact = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), 2)],
        "user_id long, ts timestamp, event_id long",
    )
    out = pit_enrich(
        fact, dim, ["user_id"], "ts", "ts", ["seg"], "event_id", "event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def _scd2_rows(df):
    return sorted(
        (
            r["cust_id"], r["tier"], str(r["city"]),
            str(r["valid_from"]), str(r["valid_to"]), r["is_current"],
        )
        for r in df.collect()
    )


def test_scd2_apply_three_days(spark):
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import scd2_apply

    d = lambda n: dt.date(2024, 1, n)  # noqa: E731

    def snap(rows):
        return spark.createDataFrame(
            rows, "cust_id long, tier string, city string"
        )

    # day 1: initial build
    h1 = scd2_apply(None, snap([(1, "gold", "nyc"), (2, "basic", None)]),
                    ["cust_id"], ["tier", "city"], d(1))
    assert _scd2_rows(h1) == [
        (1, "gold", "nyc", "2024-01-01", "None", True),
        (2, "basic", "None", "2024-01-01", "None", True),
    ]

    # day 2: 1 changes tier, 2 unchanged (NULL city stays NULL-safe),
    # 3 is new
    h2 = scd2_apply(
        h1,
        snap([(1, "platinum", "nyc"), (2, "basic", None), (3, "basic", "sf")]),
        ["cust_id"], ["tier", "city"], d(2),
    )
    assert _scd2_rows(h2) == [
        (1, "gold", "nyc", "2024-01-01", "2024-01-02", False),
        (1, "platinum", "nyc", "2024-01-02", "None", True),
        (2, "basic", "None", "2024-01-01", "None", True),
        (3, "basic", "sf", "2024-01-02", "None", True),
    ]

    # idempotence: re-applying day 2's snapshot changes nothing
    h2b = scd2_apply(
        h2,
        snap([(1, "platinum", "nyc"), (2, "basic", None), (3, "basic", "sf")]),
        ["cust_id"], ["tier", "city"], d(2),
    )
    assert _scd2_rows(h2b) == _scd2_rows(h2)

    # day 3: 2 disappears — close_missing=True closes it; 1 changes again
    h3 = scd2_apply(
        h2,
        snap([(1, "platinum", "la"), (3, "basic", "sf")]),
        ["cust_id"], ["tier", "city"], d(3),
        close_missing=True,
    )
    rows3 = _scd2_rows(h3)
    assert (2, "basic", "None", "2024-01-01", "2024-01-03", False) in rows3
    assert (1, "platinum", "nyc", "2024-01-02", "2024-01-03", False) in rows3
    assert (1, "platinum", "la", "2024-01-03", "None", True) in rows3
    # every key has at most one open row; intervals chain contiguously
    opens = [r for r in rows3 if r[5]]
    assert len({r[0] for r in opens}) == len(opens)

    # default keeps missing keys open
    h3k = scd2_apply(
        h2, snap([(3, "basic", "sf")]), ["cust_id"], ["tier", "city"], d(3)
    )
    assert (2, "basic", "None", "2024-01-01", "None", True) in _scd2_rows(h3k)


def test_scd2_apply_partitioning_invariant(spark):
    import datetime as dt
    import random

    from covid_data_pipeline_spark.operators.temporal import scd2_apply

    rng = random.Random(5)
    snap1 = [(i, rng.choice(["a", "b"]), rng.choice(["x", None])) for i in range(200)]
    snap2 = [
        (i, rng.choice(["a", "b", "c"]), rng.choice(["x", "y", None]))
        for i in range(0, 250)
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "cust_id long, tier string, city string"
    )
    h1 = scd2_apply(None, mk(snap1), ["cust_id"], ["tier", "city"], dt.date(2024, 1, 1))
    a = scd2_apply(h1, mk(snap2), ["cust_id"], ["tier", "city"], dt.date(2024, 1, 2))
    b = scd2_apply(
        h1.repartition(17), mk(snap2).repartition(3),
        ["cust_id"], ["tier", "city"], dt.date(2024, 1, 2),
    )
    assert _scd2_rows(a) == _scd2_rows(b)


def test_theilsen_resists_outlier_days(spark):
    """The Theil–Sen construction used by events_theilsen_trend: median
    pairwise slope shrugs off a corrupted day that swings OLS."""
    import datetime as dt

    from covid_data_pipeline_spark.harness.registry import QUERIES

    # build a mini events table: type 'lin' grows +2/day; one day is a
    # 100x backfill spike
    rows = []
    base = dt.datetime(2024, 1, 1)
    for day in range(10):
        n = 10 + 2 * day if day != 5 else 1000
        for i in range(n):
            rows.append((len(rows), base + dt.timedelta(days=day, seconds=i), 1, "lin", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = QUERIES["events_theilsen_trend"].fn(spark, d).collect()
    r = next(x for x in out if x["event_type"] == "lin")
    # median slope = exactly +2/day despite the spike
    assert r["slope_num"] / r["slope_den"] == 2.0


def test_scd2_apply_matches_python_reference_hypothesis(spark):
    """Property: applying a random sequence of snapshots equals a
    straightforward pure-python SCD2 build over the same sequence."""
    import datetime as dtm

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from covid_data_pipeline_spark.operators.temporal import scd2_apply

    keys = st.integers(0, 4)
    attr = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
    snapshot = st.dictionaries(keys, attr, max_size=5)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(snaps=st.lists(snapshot, min_size=1, max_size=4))
    def run(snaps):
        # python reference: per key, track the open row; close on change
        ref = []  # (key, attr, valid_from_day, valid_to_day, is_current)
        open_rows: dict = {}
        for day, snap in enumerate(snaps, start=1):
            for k, v in snap.items():
                if k not in open_rows:
                    open_rows[k] = (v, day)
                elif open_rows[k][0] != v:
                    ov, od = open_rows.pop(k)
                    ref.append((k, ov, od, day, False))
                    open_rows[k] = (v, day)
        for k, (v, d) in open_rows.items():
            ref.append((k, v, d, None, True))

        hist = None
        for day, snap in enumerate(snaps, start=1):
            sdf = spark.createDataFrame(
                [(k, v) for k, v in snap.items()] or [(None, None)],
                "cust_id long, tier string",
            ).filter(F.col("cust_id").isNotNull())
            hist = scd2_apply(
                hist, sdf, ["cust_id"], ["tier"], dtm.date(2024, 1, day)
            )
        skey = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
        got = sorted(
            (
                (
                    r["cust_id"],
                    r["tier"],
                    r["valid_from"].day,
                    r["valid_to"].day if r["valid_to"] else None,
                    r["is_current"],
                )
                for r in hist.collect()
            ),
            key=skey,
        )
        assert got == sorted(ref, key=skey)

    run()


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


def test_holt_linear_matches_hand_rolled_recurrence(spark):
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import holt_linear

    counts = [4, 6, 5, 9, 12]
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((dt.datetime(2024, 3, 1 + i, 8, j), "a"))
    rows.append((dt.datetime(2024, 3, 1, 9), "only_one_day"))
    got = {r["event_type"]: r for r in holt_linear(_mk_events(spark, rows)).collect()}

    lvl, trd = float(counts[0]), float(counts[1] - counts[0])
    for y in counts[1:]:
        nl = 0.5 * y + 0.5 * (lvl + trd)
        trd = 0.5 * (nl - lvl) + 0.5 * trd
        lvl = nl
    assert got["a"]["level"] == round(lvl, 4)
    assert got["a"]["trend"] == round(trd, 4)
    assert got["a"]["forecast_7d"] == round(lvl + 7 * trd, 4)
    # a single-day series cannot initialize the trend: dropped
    assert "only_one_day" not in got


def test_cusum_flags_planted_level_shift_only_after_it(spark):
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import (
        cusum_changepoints,
    )

    # 20 quiet days at ~10/day, then 10 shifted days at ~30/day
    counts = [10, 11, 9, 10, 10, 11, 9, 10, 10, 10,
              11, 9, 10, 10, 11, 9, 10, 10, 11, 9] + [30] * 10
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((dt.datetime(2024, 1, 1 + i, 7, j % 60), "x"))
    out = sorted(
        cusum_changepoints(_mk_events(spark, rows)).collect(),
        key=lambda r: r["day"],
    )
    assert len(out) == 30
    # the global mean sits between regimes, so the quiet regime may
    # legitimately breach on the NEGATIVE side; the planted upward shift
    # must breach on the positive side, and only after it happens
    pos_breached = [
        r["day"].day
        for r in out
        if r["breach"] and r["cusum_pos"] > r["cusum_neg"]
    ]
    assert pos_breached, "planted shift must breach the positive CUSUM"
    assert min(pos_breached) >= 21
    assert out[-1]["breach"]  # and the shift stays flagged
    assert all(r["cusum_pos"] >= 0 and r["cusum_neg"] >= 0 for r in out)


def test_cusum_deterministic_under_repartition(spark):
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import (
        cusum_changepoints,
    )

    rows = [
        (dt.datetime(2024, 2, 1 + (i % 25), 6, i % 60), "t") for i in range(900)
    ]
    df = _mk_events(spark, rows)
    a = sorted(map(tuple, cusum_changepoints(df).collect()))
    b = sorted(map(tuple, cusum_changepoints(df.repartition(13)).collect()))
    assert a == b


def test_growth_accounting_hand_traced_lifecycle(spark):
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import (
        growth_accounting,
    )

    # Mondays: wk1=Jan 1 2024, wk2=Jan 8, wk3=Jan 15, wk4=Jan 22
    # A: wk1, wk2, wk4 (retained then resurrected)
    # B: wk1 only (churns in wk2);  C: wk2, wk3 (churns in wk4)
    act = {"A": [1, 8, 22], "B": [1], "C": [8, 15]}
    rows = [
        (dt.datetime(2024, 1, d, 12), u)
        for u, days in act.items()
        for d in days
    ]
    out = {
        r["week"].isoformat(): r
        for r in growth_accounting(
            spark.createDataFrame(rows, "ts timestamp, user_id string")
        ).collect()
    }
    def vals(wk):
        r = out[wk]
        return (r["new_users"], r["retained_users"], r["resurrected_users"],
                r["active_users"], r["churned_users"])
    assert vals("2024-01-01") == (2, 0, 0, 2, 0)
    assert vals("2024-01-08") == (1, 1, 0, 2, 1)   # B churned
    assert vals("2024-01-15") == (0, 1, 0, 1, 1)   # A churned (returns later)
    assert vals("2024-01-22") == (0, 0, 1, 1, 1)   # C churned, A resurrected
    # identity: every week, new + retained + resurrected == active
    for r in out.values():
        assert (
            r["new_users"] + r["retained_users"] + r["resurrected_users"]
            == r["active_users"]
        )


def test_holt_winters_matches_numpy_reference(spark):
    """holt_winters_seasonal replays the textbook additive recurrence:
    check level/trend/forecasts against a plain-Python fold over a
    planted 3-season weekly series with trend + seasonality."""
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import (
        holt_winters_seasonal,
    )

    season = [5, 1, 2, 8, 3, 9, 4]
    counts = [season[t % 7] + t for t in range(21)]  # trend slope 1
    rows = [
        (dt.datetime(2024, 1, 1 + t, 12, 0, 0) , "a", i)
        for t, c in enumerate(counts)
        for i in range(c)
    ]
    df = spark.createDataFrame(
        [(ts, et) for ts, et, _ in rows], "ts timestamp, event_type string"
    )
    got = holt_winters_seasonal(df, period=7).collect()
    assert len(got) == 1
    r = got[0]

    # plain-Python reference fold
    m, a = 7, 0.5
    y = [float(c) for c in counts]
    lvl = sum(y[:7]) / 7.0
    trd = (sum(y[7:14]) - sum(y[:7])) / 49.0
    seas = [v - lvl for v in y[:7]]
    for t in range(7, 21):
        s_m = seas[0]
        nl = a * (y[t] - s_m) + a * (lvl + trd)
        nt = a * (nl - lvl) + a * trd
        ns = a * (y[t] - nl) + a * s_m
        seas = seas[1:] + [ns]
        lvl, trd = nl, nt
    assert r["level"] == round(lvl, 4)
    assert r["trend"] == round(trd, 4)
    assert r["forecast_1"] == round(lvl + trd + seas[0], 4)
    assert r["forecast_p"] == round(lvl + 7.0 * trd + seas[6], 4)
    # level has tracked the planted upward drift past the first-season
    # mean (exact trend value oscillates at alpha=gamma=0.5 on a series
    # this short — the equality asserts above are the real contract)
    assert r["level"] > sum(y[:7]) / 7.0


def test_holt_winters_drops_short_series(spark):
    """Types with fewer than 2*period observed days are dropped (the
    init needs two full seasons)."""
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import (
        holt_winters_seasonal,
    )

    rows = [
        (dt.datetime(2024, 1, 1 + t, 12), "short") for t in range(13)
    ] + [
        (dt.datetime(2024, 1, 1 + t, 12), "long") for t in range(14)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = holt_winters_seasonal(df, period=7).collect()
    assert [r["event_type"] for r in got] == ["long"]


def test_kaplan_meier_hand_case(spark):
    """KM steps match the hand-computed product-limit estimate,
    censored subjects stay in the risk set without emitting steps."""
    import math

    from covid_data_pipeline_spark.operators.temporal import kaplan_meier

    subj = [
        (1, True), (1, True), (2, True),
        (3, False), (3, True), (3, True),
        (5, False), (5, True),
        (7, False), (9, False),
    ]
    df = spark.createDataFrame(subj, "t long, event boolean")
    rows = {
        r["t"]: r for r in kaplan_meier(df, "t", "event").collect()
    }
    # steps only at event times with a nonzero factor
    assert sorted(rows) == [1, 2, 3, 5]
    assert (rows[1]["n_risk"], rows[1]["n_events"]) == (10, 2)
    assert (rows[2]["n_risk"], rows[2]["n_events"]) == (8, 1)
    assert (rows[3]["n_risk"], rows[3]["n_events"]) == (7, 2)
    assert (rows[5]["n_risk"], rows[5]["n_events"]) == (4, 1)
    surv = {1: 0.8, 2: 0.7, 3: 0.5, 5: 0.375}
    for t, s in surv.items():
        assert abs(rows[t]["km_survival"] - s) < 2e-4
    # the exact contract: BIGINT cumsum of rounded micro-nat logs
    micros = {
        t: round(math.log((r["n_risk"] - r["n_events"]) / r["n_risk"]) * 1e6)
        for t, r in rows.items()
    }
    acc = 0
    for t in sorted(rows):
        acc += micros[t]
        assert rows[t]["log_surv_micronats"] == acc


def test_repair_cumulative_monotone_hand_case(spark):
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import (
        repair_cumulative_monotone,
    )

    d = dt.date
    rows = [
        ("k", d(2024, 1, 1), 10),
        ("k", d(2024, 1, 2), 15),
        ("k", d(2024, 1, 3), 12),   # downward correction
        ("k", d(2024, 1, 4), 18),
        ("k", d(2024, 1, 5), 17),   # another dip
        ("z", d(2024, 1, 1), 5),    # independent series untouched
    ]
    out = repair_cumulative_monotone(
        spark.createDataFrame(rows, "k string, day date, cum long"),
        keys=["k"], day_col="day", cum_col="cum",
    ).collect()
    got = {(r["k"], str(r["day"])): (r["repaired"], r["was_corrected"]) for r in out}
    assert got[("k", "2024-01-03")] == (15, True)
    assert got[("k", "2024-01-04")] == (18, False)
    assert got[("k", "2024-01-05")] == (18, True)
    assert got[("z", "2024-01-01")] == (5, False)
    # repaired deltas are all non-negative
    ks = sorted((r["day"], r["repaired"]) for r in out if r["k"] == "k")
    assert all(b[1] >= a[1] for a, b in zip(ks, ks[1:]))


def test_hw_anomalies_flag_planted_spike_only(spark):
    """A clean seasonal+trend series yields no flags; the same series
    with one spiked day flags (at least) that day, and every flagged
    day sits within the spike's state-perturbation window."""
    import datetime as dt

    from covid_data_pipeline_spark.operators.temporal import (
        holt_winters_residuals,
    )

    season = [5, 1, 2, 8, 3, 9, 4]

    def mk(spike_day=None):
        rows = []
        for t in range(28):
            cnt = season[t % 7] + t + (60 if t == spike_day else 0)
            for j in range(cnt):
                rows.append((dt.datetime(2024, 3, 1 + t, 9, j % 60), "a"))
        return spark.createDataFrame(
            rows, "ts timestamp, event_type string"
        )

    clean = holt_winters_residuals(mk(None), period=7).collect()
    assert clean and not any(r["is_anomaly"] for r in clean)
    spiked = holt_winters_residuals(mk(20), period=7).collect()
    flagged = sorted(r["day"].day for r in spiked if r["is_anomaly"])
    assert 21 in flagged  # 2024-03-21 == t=20
    assert all(21 <= d <= 28 for d in flagged)  # nothing before the spike


def test_sax_words_exact_symbols(spark):
    """SAX on a hand-checkable series: equi-depth order-stat
    breakpoints, strictly-greater symbol indexing, segment-ordered
    word."""
    from covid_data_pipeline_spark.operators.temporal import sax_words

    # one key, 8 segments (paa_width=1), totals 1..8
    rows = [("k", t, t + 1) for t in range(8)]
    df = spark.createDataFrame(rows, "g STRING, t BIGINT, v BIGINT")
    out = sax_words(df, ["g"], "t", "v", paa_width=1, alphabet=4).collect()
    assert len(out) == 1
    r = out[0]
    # n=8, ranks ceil(i*8/4) = 2,4,6 -> breakpoints 2,4,6 ->
    # totals 1,2 |3,4 |5,6 |7,8 -> aabbccdd
    assert r["n_segments"] == 8
    assert r["sax_word"] == "aabbccdd"

    # PAA: width 2 merges pairs -> totals 3,7,11,15; n=4 ranks 1,2,3
    out2 = sax_words(df, ["g"], "t", "v", paa_width=2, alphabet=4).collect()[0]
    assert out2["sax_word"] == "abcd"

    import pytest as _pt
    with _pt.raises(ValueError):
        sax_words(df, ["g"], "t", "v", paa_width=0)
    with _pt.raises(ValueError):
        sax_words(df, ["g"], "t", "v", paa_width=1, alphabet=1)


def test_sax_breakpoint_rank_is_distributed(spark):
    """ADVICE r8: the order-statistic breakpoints must come from the
    distributed value_order_rank, not a partition-less global
    row_number window over the |keys x segments| rollup — every
    row_number Window in the plan must carry a partition spec (same
    guard as merge_intervals_global)."""
    from covid_data_pipeline_spark.operators.temporal import sax_words

    rows = [(f"k{i % 50}", t, (i * 37 + t) % 101) for i in range(200)
            for t in range(4)]
    df = spark.createDataFrame(rows, "g STRING, t BIGINT, v BIGINT")
    out = sax_words(df, ["g"], "t", "v", paa_width=2, alphabet=4)
    out.collect()  # AQE: execute before reading the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number" in line and "Window" in line:
            groups = line.count("], [")
            assert groups >= 2, f"partition-less row_number window: {line}"
