"""Integer-lattice Lloyd k-means (operators/clustering.py): planted
well-separated clusters are recovered exactly, results are invariant to
input partitioning, and empty clusters keep their previous centroids.
Cross-engine hash parity is covered by test_oracle_parity
(kmeans_cluster_embeddings)."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): slow tier; full suite
# runs per round via `pytest tests/ -m ""`.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.clustering import (
    kmeans_lloyd,
    quantize_vectors,
    seed_centroids,
)


def _blob_of(vid: int, n: int, k: int) -> int:
    """Blob id = position of ``vid`` in the md5-string order mod k —
    the SAME order seed_centroids uses, so the first k seeds land in k
    distinct blobs (one each). Lloyd from one-seed-per-blob must then
    recover the planted partition exactly; with arbitrary seeds it may
    (correctly) settle in a merged-blob local optimum instead."""
    import hashlib

    order = sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    return order.index(vid) % k


def _planted(spark, sep=100.0, n=75, dims=8, k=3):
    """k well-separated blobs: blob j sits at sep*j on every axis,
    points jitter deterministically by +/-0.5 via id arithmetic."""
    rows = []
    for vid in range(n):
        j = _blob_of(vid, n, k)
        jit = ((vid * 2654435761) % 1000) / 1000.0 - 0.5
        rows.append((vid, j, [sep * j + jit] * dims))
    return spark.createDataFrame(
        rows, "vec_id bigint, blob int, embedding array<double>"
    )


def test_planted_clusters_recovered(spark):
    df = _planted(spark)
    out = kmeans_lloyd(
        df.select("vec_id", "embedding"), k=3, iters=3
    ).collect()
    blob = {r["vec_id"]: r["blob"] for r in df.select("vec_id", "blob").collect()}
    # every planted blob maps to exactly one output cluster id
    blob_to_cid = {}
    for r in out:
        blob_to_cid.setdefault(blob[r["vec_id"]], set()).add(r["cluster_id"])
    assert all(len(cids) == 1 for cids in blob_to_cid.values()), blob_to_cid
    assert len({next(iter(c)) for c in blob_to_cid.values()}) == 3


def test_partitioning_invariance(spark):
    df = _planted(spark)
    a = sorted(
        (r["vec_id"], r["cluster_id"], r["dist"])
        for r in kmeans_lloyd(df, k=3, iters=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster_id"], r["dist"])
        for r in kmeans_lloyd(df.repartition(7), k=3, iters=2).collect()
    )
    assert a == b


def test_seeds_are_md5_deterministic(spark):
    df = _planted(spark)
    q = quantize_vectors(df)
    assert seed_centroids(q, 4) == seed_centroids(q.repartition(5), 4)


def test_empty_cluster_keeps_centroid(spark):
    # two coincident far points seed two clusters; after one update one
    # cluster goes empty and must retain its seed coordinates instead
    # of dying (k=3 over 2 distinct locations).
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [50.0, 50.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kmeans_lloyd(df, k=3, iters=2)
    assert out.count() == 3
    # all three inputs still assigned, distances exact integers >= 0
    assert out.where(F.col("dist") < 0).count() == 0


def test_pca_power_recovers_planted_direction(spark):
    """Points stretched along a known axis: the power trajectory's
    scores must order like the true projection (top-axis recovery)."""
    import numpy as np

    from covid_data_pipeline_spark.operators.clustering import (
        pca_power_scores,
    )

    rng = np.random.default_rng(7)
    n, d = 400, 16
    t = rng.normal(size=n)
    direction = np.zeros(d)
    direction[3] = 1.0
    X = np.outer(t, direction) * 5.0 + rng.normal(size=(n, d)) * 0.2
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    got = {
        r["vec_id"]: r["pc1_score"]
        for r in pca_power_scores(df, dim=d, iters=6).collect()
    }
    g = np.array([got[i] for i in range(n)], dtype=float)
    corr = abs(np.corrcoef(g, t)[0, 1])
    assert corr > 0.99, corr


def test_pca_power_partition_invariant(spark):
    import numpy as np

    from covid_data_pipeline_spark.operators.clustering import (
        pca_power_scores,
    )

    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 8))
    rows = [(i, [float(v) for v in X[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    a = sorted(
        map(tuple, pca_power_scores(df, dim=8, iters=4).collect())
    )
    b = sorted(
        map(
            tuple,
            pca_power_scores(df.repartition(13), dim=8, iters=4).collect(),
        )
    )
    assert a == b  # exact integers: batching/partitioning invisible


def test_pca_power_rejects_bad_weights(spark):
    import pytest as _pytest

    from covid_data_pipeline_spark.operators.clustering import (
        pca_power_scores,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 1.0])], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    with _pytest.raises(ValueError):
        pca_power_scores(df, dim=2, iters=2, dim_weights=[1])


def test_pca_power_empty_input(spark):
    """ADVICE r7: an empty corpus used to KeyError building the cov
    dict from the empty moments aggregate."""
    from covid_data_pipeline_spark.operators.clustering import (
        pca_power_scores,
    )

    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    out = pca_power_scores(empty, dim=4)
    assert out.columns == ["vec_id", "pc1_score"]
    assert out.count() == 0
