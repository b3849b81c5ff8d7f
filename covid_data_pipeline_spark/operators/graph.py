"""Connected components over an edge list — the clustering step of a
dedup pipeline (candidate pairs → duplicate groups → canonical doc).

The reference stops at pairwise duplicate detection (its dedup is a
NOT-EXISTS anti-join, /root/reference/airflow/dags/sql/alert_*.sql
pattern); transitive grouping is the missing piece any corpus-scale
dedup needs: if A~B and B~C, all three must collapse to one canonical
id even when A~C was never emitted as a pair.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
standard shuffle-native formulation:

* ``large-star``: every node connects its strictly-larger neighbors to
  the minimum of its neighborhood (incl. itself).
* ``small-star``: every node connects its smaller-or-equal neighbors
  (and itself) to the minimum of that set.

Each operation is one shuffle on node id (a groupBy-min plus an
equi-join that AQE plans as a broadcast when the min-table is small);
the pair provably converges in O(log n) rounds regardless of graph
diameter — unlike naive label propagation, whose round count is the
component diameter (fatal for chain-shaped graphs at 100 TB). Rounds
``localCheckpoint`` eagerly: without lineage truncation the plan tree
doubles per iteration and the driver, not the data, becomes the
bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "largest_components"]


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Both orientations of each edge, self-loops dropped."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst"))


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, m = min(N(u) ∪ {u})."""
    sym = _symmetrize(edges)
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("_mn", F.col("src")).alias("m"))
    )
    # No trailing distinct: _small_star's oriented.distinct() dedups the
    # same key space one step later, so a distinct here is a pure extra
    # shuffle per round (the only thing it could save is shuffle volume
    # on multi-edges, which the following distinct pays for anyway).
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge larger→smaller; (v, m) for v in N∪{u}, v ≠ m."""
    oriented = (
        edges.select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
    smaller = (
        oriented.join(mins, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select(F.col("a").alias("src"), F.col("m").alias("dst"))
    return smaller.unionByName(self_edge).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with its component's minimum node id.

    Parameters
    ----------
    edges : undirected edge list (duplicate / reversed / self edges fine)
    src, dst : edge endpoint columns (any orderable type, typically id)
    nodes : optional one-column DataFrame of node ids; nodes with no
        surviving edge (isolated, or only self-loops) appear in the
        output as their own singleton component. Without it the result
        covers only nodes incident to a real edge.
    max_iter : safety bound; convergence needs ~2·log2(n) rounds.

    Returns ``(node, component)``. Deterministic: the label is the
    component min, independent of partitioning or iteration order.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col(src) != F.col(dst)
    )
    e = e.localCheckpoint(eager=False)

    # One-job convergence probe: (row count, order-independent hash sum).
    # A star round is a no-op iff the edge multiset is unchanged; equal
    # signatures make that overwhelmingly likely, and the single
    # exceptAll below CONFIRMS it exactly — so the exact (2-shuffle)
    # equality test runs once at convergence instead of every round that
    # happens to keep the count stable. Checkpoints are LAZY: the probe
    # aggregate is the action that materializes each round's checkpoint,
    # so a round costs exactly one job (probe) instead of three
    # (eager checkpoint + count + exceptAll). On job-overhead-bound
    # graphs (small iterative steps) driver actions are the dominant
    # cost; at real scale the saved job is a full extra pass over the
    # edge set.
    def _sig(df: DataFrame) -> tuple:
        # Decimal accumulator: a long sum of xxhash64 overflows under
        # ANSI mode; decimal(38,0) absorbs any realistic edge count.
        r = df.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return (r["c"], r["h"])

    sig = _sig(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        sig2 = _sig(e2)
        converged = sig2 == sig and e2.exceptAll(e).isEmpty()
        e, sig = e2, sig2
        if converged:
            break
    # At convergence e is a star forest: src → component root (= min).
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    labels = members.unionByName(roots).distinct()
    if nodes is not None:
        node_col = nodes.columns[0]
        all_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
        labels = (
            all_nodes.join(labels, "node", "left")
            .select("node", F.coalesce("component", "node").alias("component"))
        )
    return labels


def largest_components(labels: DataFrame, top_k: int = 10) -> DataFrame:
    """Component size histogram head — the dedup-audit view (which
    boilerplate cluster is eating the corpus). One partial+final agg,
    then a TakeOrderedAndProject (no global sort materializes)."""
    return (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.col("size").desc(), F.col("component"))
        .limit(top_k)
    )
