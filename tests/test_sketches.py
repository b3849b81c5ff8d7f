"""Portable HLL (operators/sketches.py): accuracy on both estimator
branches, mergeability, partitioning invariance, and DuckDB replay of
registers + estimate (the property that makes the sketch oracle-able).
"""

from __future__ import annotations

import duckdb
import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.sketches import (
    hll_estimate,
    hll_estimate_sql,
    hll_merge,
    hll_oracle_ctes,
    hll_registers,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    # 80k distinct ids in two halves — big enough to leave the
    # linear-counting branch at p=12 (2.5 * 4096 = 10240).
    return spark.range(0, 80_000).select(
        F.col("id"),
        (F.col("id") % 2).alias("half"),
    )


def test_raw_branch_accuracy(spark, ids_df):
    est = hll_estimate(
        hll_registers(ids_df, "id", [], p=12), [], p=12
    ).collect()[0]["distinct_est"]
    # Standard error is 1.04/sqrt(4096) ~ 1.6%; allow 5%.
    assert est > 10_240, "expected the raw-estimate branch"
    assert abs(est - 80_000) / 80_000 < 0.05


def test_small_range_branch_accuracy(spark):
    df = spark.range(0, 500)
    est = hll_estimate(
        hll_registers(df, "id", [], p=12), [], p=12
    ).collect()[0]["distinct_est"]
    # Linear counting at n << m is typically well under 2%.
    assert abs(est - 500) / 500 < 0.05


def test_merge_equals_from_scratch(spark, ids_df):
    """Union of per-half sketches == sketch of the union (mergeability,
    exactly — not approximately)."""
    per_half = hll_registers(ids_df, "id", ["half"], p=10)
    merged = hll_merge(per_half.drop("half"), [])
    direct = hll_registers(ids_df, "id", [], p=10)
    a = {(r["bucket"], r["rho"]) for r in merged.collect()}
    b = {(r["bucket"], r["rho"]) for r in direct.collect()}
    assert a == b


def test_partitioning_invariance(spark, ids_df):
    e1 = hll_estimate(hll_registers(ids_df, "id", [], p=12), [], p=12)
    e2 = hll_estimate(
        hll_registers(ids_df.repartition(23), "id", [], p=12), [], p=12
    )
    assert e1.collect()[0]["distinct_est"] == e2.collect()[0]["distinct_est"]


def test_null_keys_excluded(spark):
    df = spark.range(0, 100).select(
        F.when(F.col("id") < 10, None).otherwise(F.col("id")).alias("id")
    )
    est = hll_estimate(
        hll_registers(df, "id", [], p=12), [], p=12
    ).collect()[0]["distinct_est"]
    assert abs(est - 90) / 90 < 0.05


def test_theta_overlap_accuracy(spark):
    """Two 20k-id sets with a planted 10k intersection: the KMV/theta
    estimate lands within ~3 standard errors."""
    from covid_data_pipeline_spark.operators.sketches import (
        bottomk_hashes,
        theta_pair_overlap,
    )

    a = spark.range(0, 20_000).select(
        F.lit("a").alias("g"), F.col("id").alias("key")
    )
    b = spark.range(10_000, 30_000).select(
        F.lit("b").alias("g"), F.col("id").alias("key")
    )
    sk = bottomk_hashes(a.unionByName(b), "key", ["g"], k=512)
    row = theta_pair_overlap(sk, "g", k=512).collect()[0]
    assert row["group_a"] == "a" and row["group_b"] == "b"
    # relative SE ~ 1/sqrt(k * jaccard-ish fraction); 25% slack is >3 SE
    assert abs(row["overlap_est"] - 10_000) / 10_000 < 0.25


def test_theta_overlap_partition_invariant(spark):
    from covid_data_pipeline_spark.operators.sketches import (
        bottomk_hashes,
        theta_pair_overlap,
    )

    df = spark.range(0, 5_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1_700).alias("key"),
    )
    r1 = sorted(map(tuple, theta_pair_overlap(
        bottomk_hashes(df, "key", ["g"], k=128), "g", k=128).collect()))
    r2 = sorted(map(tuple, theta_pair_overlap(
        bottomk_hashes(df.repartition(29), "key", ["g"], k=128),
        "g", k=128).collect()))
    assert r1 == r2


def test_hash_sample_quantiles_accuracy(spark):
    """Uniform[0, 100k) values: sampled p50/p90/p99 within a few
    percent of truth at k=2048."""
    from covid_data_pipeline_spark.operators.sketches import (
        hash_sample_quantiles,
    )

    df = spark.range(0, 100_000).select(
        F.lit("g").alias("g"),
        F.col("id").alias("rid"),
        # decorrelate value from the sampling hash via a multiplicative
        # permutation of the id space
        ((F.col("id") * 48271) % 100_000).cast("double").alias("v"),
    )
    row = hash_sample_quantiles(df, "rid", "v", ["g"], k=2048).collect()[0]
    assert row["n_sample"] == 2048
    for name, truth in (("p50", 50_000), ("p90", 90_000), ("p99", 99_000)):
        assert abs(row[name] - truth) / 100_000 < 0.05, (name, row[name])


def test_hash_sample_smaller_than_k_is_exact(spark):
    from covid_data_pipeline_spark.operators.sketches import (
        hash_sample_quantiles,
    )

    df = spark.range(1, 101).select(
        F.lit("g").alias("g"),
        F.col("id").alias("rid"),
        F.col("id").cast("double").alias("v"),
    )
    row = hash_sample_quantiles(df, "rid", "v", ["g"], k=2048).collect()[0]
    # n < k: the "sample" is the full data, ranks are exact order stats
    assert row["n_sample"] == 100
    assert row["p50"] == 50.0 and row["p90"] == 90.0 and row["p99"] == 99.0


def test_duckdb_replays_registers_and_estimate(spark, tmp_path, ids_df):
    """The whole point: an independent engine regenerates the identical
    register relation AND the identical rounded estimate."""
    path = str(tmp_path / "ids.parquet")
    ids_df.write.mode("overwrite").parquet(path)
    reg = hll_registers(ids_df, "id", ["half"], p=12)
    est = hll_estimate(reg, ["half"], p=12)
    s_reg = {(r["half"], r["bucket"], r["rho"]) for r in reg.collect()}
    s_est = {(r["half"], r["distinct_est"]) for r in est.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    ctes = hll_oracle_ctes("t", "id", "half", "half", p=12, prefix="tt")
    d_reg = set(con.execute(f"WITH {ctes} SELECT * FROM tt_reg").fetchall())
    d_est = set(
        con.execute(
            "WITH " + ctes + hll_estimate_sql("tt_reg", "half", p=12)
        ).fetchall()
    )
    con.close()
    assert s_reg == d_reg
    assert s_est == d_est


def test_cm_never_underestimates_and_bounds_overestimate(spark):
    """100k rows over 5k zipf-ish keys into a 4x256 sketch: every
    estimate >= truth (CM guarantee) and the mean overestimate stays
    near the n/width collision bound."""
    from covid_data_pipeline_spark.operators.sketches import (
        cm_lookup,
        cm_sketch,
    )

    df = spark.range(0, 100_000).select(
        (F.col("id") % (F.col("id") % 71 + 1)).alias("key")
    )
    sk = cm_sketch(df, "key", depth=4, width=256)
    probes = df.select("key").distinct()
    est = cm_lookup(sk, probes, "key", depth=4, width=256)
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("t"))
    j = {r["key"]: (r["t"], r["freq_est"])
         for r in exact.join(est, "key").collect()}
    assert all(e >= t for t, e in j.values())
    n = 100_000
    mean_over = sum(e - t for t, e in j.values()) / len(j)
    # expected collision mass per row ~ n/width = 390; min over 4 rows
    # is far smaller — allow 2x the single-row bound as a sanity ceiling
    assert mean_over < 2 * n / 256


def test_cm_partition_invariant_and_mergeable(spark):
    from covid_data_pipeline_spark.operators.sketches import (
        cm_lookup,
        cm_sketch,
    )

    df = spark.range(0, 20_000).select((F.col("id") % 500).alias("key"))
    probes = df.select("key").distinct()

    def run(d):
        sk = cm_sketch(d, "key", depth=4, width=128)
        return {
            r["key"]: r["freq_est"]
            for r in cm_lookup(sk, probes, "key", depth=4,
                               width=128).collect()
        }

    assert run(df) == run(df.repartition(31))
    # mergeability: counter-wise SUM of two halves == from-scratch
    h1, h2 = df.where("id < 10000"), df.where("id >= 10000")
    stacked = cm_sketch(h1, "key", depth=4, width=128).unionByName(
        cm_sketch(h2, "key", depth=4, width=128)
    )
    merged = stacked.groupBy("d", "slot").agg(F.sum("cnt").alias("cnt"))
    direct = cm_sketch(df, "key", depth=4, width=128)
    assert (
        {tuple(r) for r in merged.collect()}
        == {tuple(r) for r in direct.collect()}
    )


def test_ams_f2_exact_on_uniform_keys(spark):
    from covid_data_pipeline_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    # every key unique -> F2 == n; each estimator is (sum of n random
    # signs)^2 with E = n; fixed hash, so gate the measured value.
    df = spark.range(0, 20_000).select(F.col("id").alias("k"))
    sk = ams_f2_sketch(df, "k", depth=16)
    assert sk.count() == 16
    est = ams_f2_estimate(sk, depth=16).collect()[0]["f2_est"]
    assert abs(est - 20_000) / 20_000 < 0.5  # sqrt(2/16) ~ 35% std


def test_ams_f2_partition_invariant_and_additive(spark):
    from covid_data_pipeline_spark.operators.sketches import ams_f2_sketch

    df = spark.range(0, 5_000).select((F.col("id") % 37).alias("k"))
    a = {
        r["j"]: int(r["x"])
        for r in ams_f2_sketch(df, "k", depth=8).collect()
    }
    b = {
        r["j"]: int(r["x"])
        for r in ams_f2_sketch(df.repartition(13), "k", depth=8).collect()
    }
    assert a == b  # map-side combine order can't change integer sums

    # signed sums are additive over disjoint row sets: sketching the
    # halves and summing signed accumulators == sketching the union.
    # x = s^2 is not additive, so compare via the recomputed union.
    half1 = df.where(F.col("k") < 18)
    half2 = df.where(F.col("k") >= 18)
    import math

    s_union = {
        r["j"]: math.isqrt(int(r["x"]))  # |s|; sign lost in square
        for r in ams_f2_sketch(df, "k", depth=8).collect()
    }
    # reconstruct union x from halves is only possible pre-square;
    # assert the squares of disjoint KEY sets instead: keys never
    # interact, so x_union != x_a + x_b in general — but the signed
    # sums do satisfy |s_u| <= |s_a| + |s_b| (triangle inequality).
    s_a = {
        r["j"]: math.isqrt(int(r["x"]))
        for r in ams_f2_sketch(half1, "k", depth=8).collect()
    }
    s_b = {
        r["j"]: math.isqrt(int(r["x"]))
        for r in ams_f2_sketch(half2, "k", depth=8).collect()
    }
    for j in s_union:
        assert s_union[j] <= s_a.get(j, 0) + s_b.get(j, 0)


def test_ams_f2_skew_sensitivity(spark):
    from covid_data_pipeline_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    # one heavy key dominates: F2 ~= heavy^2; the estimator must track
    # it (this is what distinguishes F2 from plain counts).
    heavy = spark.range(0, 10_000).select(F.lit("hot").alias("k"))
    light = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    df = heavy.unionByName(light)
    est = ams_f2_estimate(
        ams_f2_sketch(df, "k", depth=16), depth=16
    ).collect()[0]["f2_est"]
    exact = 10_000**2 + 100
    assert abs(est - exact) / exact < 0.5


def test_ams_f2_estimate_depth_mismatch_raises(spark):
    """ADVICE r7: a depth mismatch with the sketch used to silently
    scale the F2 estimate; the divisor now comes from the sketch's own
    per-group estimator count, and passing depth makes it a hard
    check."""
    from pyspark.errors import SparkRuntimeException

    from covid_data_pipeline_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    df = spark.createDataFrame(
        [(str(i % 7),) for i in range(100)], "k STRING"
    )
    sk = ams_f2_sketch(df, "k", depth=8)
    # divisor derived from the sketch: depth arg omitted, still /8
    est = ams_f2_estimate(sk).collect()[0]["f2_est"]
    est8 = ams_f2_estimate(sk, depth=8).collect()[0]["f2_est"]
    assert est == est8
    with pytest.raises(SparkRuntimeException):
        ams_f2_estimate(sk, depth=16).collect()


def test_cm_inner_product_never_underestimates(spark):
    """CM join-size guarantee: est >= exact inner product; exact when
    width has no collisions."""
    from covid_data_pipeline_spark.operators.sketches import (
        cm_inner_product,
        cm_sketch,
    )

    a = spark.createDataFrame([(str(i % 5),) for i in range(50)], "k STRING")
    b = spark.createDataFrame([(str(i % 7),) for i in range(70)], "k STRING")
    # exact inner product: keys '0'..'4' have a=10 each; b=10 each
    # -> sum over common keys {0..4} of 10*10 = 500
    wide = cm_inner_product(
        cm_sketch(a, "k", depth=4, width=8192),
        cm_sketch(b, "k", depth=4, width=8192),
    ).collect()[0]["join_size_est"]
    assert wide == 500  # no collisions at width 8192 over 7 keys
    narrow = cm_inner_product(
        cm_sketch(a, "k", depth=4, width=4),
        cm_sketch(b, "k", depth=4, width=4),
    ).collect()[0]["join_size_est"]
    assert narrow >= 500  # collisions only add cross terms
    # disjoint key sets -> true join size 0; the depth frame must
    # surface the zero, not drop it through the inner join
    c = spark.createDataFrame([("x",), ("y",)], "k STRING")
    zero = cm_inner_product(
        cm_sketch(a, "k", depth=4, width=8192),
        cm_sketch(c, "k", depth=4, width=8192),
    ).collect()[0]["join_size_est"]
    assert zero == 0
