"""Round-11 optimization-shape tests.

Each r11 optimization is pinned by its plan shape so a refactor cannot
silently reintroduce the removed work: the window-based CC star round
(one exchange per star, no duplicated subtree), the DSIR feature pass
carrying the target flag (no second source scan), and dbscan's
lineage-cut per-point neighbor-count relation (no source re-entry in
the consuming plan)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _nodes(plan: str, name: str) -> int:
    """Count physical operators in the numbered details section, where
    each node appears exactly once as '(n) Name'."""
    import re

    return len(re.findall(r"^\(\d+\) " + name + r"\b", plan, re.M))


def test_cc_star_round_is_three_exchanges(spark):
    """One large+small star round = window(src) + window(greatest) +
    trailing distinct — exactly 3 exchanges and 2 windows, straight-line
    (the r10 groupBy+join form planned 11 exchanges because Catalyst
    re-executed the probe-side subtrees)."""
    from covid_data_pipeline_spark.operators.graph import (
        _large_star,
        _small_star,
    )

    e = (
        spark.range(1000)
        .select(
            F.col("id").alias("src"),
            F.pmod(F.col("id") * 7 + 3, F.lit(1000)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=False)
    )
    plan = _plan(_small_star(_large_star(e)))
    assert _nodes(plan, "Exchange") <= 3
    assert _nodes(plan, "Window") == 2
    # the checkpointed edge relation is the only leaf, read for each
    # symmetrize orientation + the small-star pass — never re-derived
    assert _nodes(plan, "Range") == 0


def test_cc_star_round_edge_set_unchanged(spark):
    """The window round emits the same edge SET as the r10 groupBy+join
    formulation (the equivalence the rewrite rests on), on a graph with
    multi-edges, reversed duplicates and self-loop-adjacent ids."""
    from covid_data_pipeline_spark.operators.graph import (
        _large_star,
        _small_star,
        _symmetrize,
    )

    rows = [(1, 2), (2, 1), (2, 3), (5, 4), (4, 6), (9, 9), (7, 3), (3, 7), (2, 3)]
    e = spark.createDataFrame(rows, "src long, dst long").where(
        F.col("src") != F.col("dst")
    )

    def old_round(edges):
        sym = _symmetrize(edges)
        mins = (
            sym.groupBy("src")
            .agg(F.min("dst").alias("_mn"))
            .select("src", F.least("_mn", F.col("src")).alias("m"))
        )
        ls = (
            sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        oriented = (
            ls.select(
                F.greatest("src", "dst").alias("a"),
                F.least("src", "dst").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        mins2 = oriented.groupBy("a").agg(F.min("b").alias("m"))
        smaller = (
            oriented.join(mins2, "a")
            .where(F.col("b") != F.col("m"))
            .select(F.col("b").alias("src"), F.col("m").alias("dst"))
        )
        self_edge = mins2.select(
            F.col("a").alias("src"), F.col("m").alias("dst")
        )
        return smaller.unionByName(self_edge).distinct()

    got = {(r["src"], r["dst"]) for r in _small_star(_large_star(e)).collect()}
    want = {(r["src"], r["dst"]) for r in old_round(e).collect()}
    assert got == want


def test_dsir_weights_single_source_pass(spark):
    """The is_target flag rides the checkpointed feature pass, so the
    source relation is never re-entered for a flags join: the consuming
    plan reads only the checkpoint (zero LocalTableScan of the input)."""
    from covid_data_pipeline_spark.operators.selection import dsir_weights

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", True), (2, "delta epsilon zeta", False),
         (3, "alpha delta beta", True)],
        "doc_id long, text string, is_en boolean",
    )
    out = dsir_weights(docs, F.col("is_en"), n_buckets=64)
    plan = _plan(out)
    assert "ExistingRDD" in plan
    assert _nodes(plan, "LocalTableScan") == 0
    got = {r["doc_id"] for r in out.collect()}
    assert got == {1, 2, 3}


def test_dbscan_consumers_read_checkpointed_neighbor_counts(spark):
    """`core` feeds four consumers; with `labeled` lineage-cut the final
    plan must not re-derive the eps-graph or the source points (zero
    Range re-entries — every branch reads a checkpoint)."""
    from covid_data_pipeline_spark.operators.geo import dbscan

    pts = spark.range(200).select(
        F.col("id").alias("pid"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000))).alias("x"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10_000))).alias("y"),
    )
    out = dbscan(pts, "pid", "x", "y", eps=2_000, min_pts=3)
    plan = _plan(out)
    assert "ExistingRDD" in plan
    assert _nodes(plan, "Range") == 0
    roles = {r["role"] for r in out.collect()}
    assert roles <= {"core", "border", "noise"} and "core" in roles
