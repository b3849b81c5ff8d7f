"""Sequence-analytics properties: churn training-set leakage safety and
GSP subsequence-support correctness vs a brute-force reference. Oracle
hash parity is covered by test_oracle_parity."""

from __future__ import annotations

from itertools import product

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.registry import QUERIES


BASE_EPOCH_DAY = 19726  # 19726 % 7 == 0: the start of an epoch week


def _events(spark, rows):
    """rows: (uid, day_offset, minute, type); day_offset counts from an
    epoch-week boundary so offsets 0-6 are one epoch week and 7-13 the
    next (the churn query buckets by epoch_day // 7, NOT calendar
    weeks)."""
    from datetime import date, timedelta

    def ds(off):
        return (date(1970, 1, 1) + timedelta(BASE_EPOCH_DAY + off)).isoformat()

    return spark.createDataFrame(
        [
            (i, uid, f"{ds(d)} 00:{m:02d}:00", t, 1.0, None)
            for i, (uid, d, m, t) in enumerate(rows)
        ],
        "event_id bigint, user_id bigint, ts_s string, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def _write_sf(spark, tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    _events(spark, rows).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_churn_features_never_peek_into_label_week(spark, tmp_path):
    # offsets 0-6 = feature epoch week, 7-13 = label epoch week (max).
    # user 1: active both weeks; user 2: feature week only; user 3:
    # label week ONLY — must not appear as a training row.
    rows = [
        (1, 0, 0, "view"), (1, 1, 0, "purchase"), (1, 9, 0, "view"),
        (2, 2, 0, "view"), (2, 3, 1, "view"),
        (3, 11, 0, "purchase"),
    ]
    sf = _write_sf(spark, tmp_path, rows)
    out = {
        r["user_id"]: r
        for r in QUERIES["events_churn_training_set"].fn(spark, sf).collect()
    }
    assert set(out) == {1, 2}  # user 3 has no feature-window history
    assert out[1]["label_active"] is True
    assert out[2]["label_active"] is False
    # user 1's features must count ONLY the 2 pre-label events
    assert out[1]["n_events"] == 2
    assert out[1]["n_purchases"] == 1


def test_gsp_support_matches_bruteforce(spark, tmp_path):
    # deterministic corpus; brute-force subsequence support as truth
    types = ["view", "click", "purchase"]
    seqs = {
        uid: [types[(uid * 3 + i * i) % 3] for i in range(8)]
        for uid in range(1, 13)
    }
    rows = [
        (uid, 1 + i // 24, i % 24, t)
        for uid, seq in seqs.items()
        for i, t in enumerate(seq)
    ]
    sf = _write_sf(spark, tmp_path, rows)
    got = {
        (r["a"], r["b"], r["c"]): r["support"]
        for r in QUERIES["events_sequential_patterns"].fn(spark, sf).collect()
    }

    def has_subseq(seq, pat):
        it = iter(seq)
        return all(any(x == p for x in it) for p in pat)

    nu = len(seqs)
    for pat in product(types, repeat=3):
        sup = sum(has_subseq(s, pat) for s in seqs.values())
        ab_sup = sum(has_subseq(s, pat[:2]) for s in seqs.values())
        expected = sup if sup * 20 >= nu and ab_sup * 20 >= nu else None
        if expected:
            assert got.get(pat) == expected, (pat, got.get(pat), expected)
        else:
            assert pat not in got, pat
