"""feature_hash_vectors: fixed dim, deterministic, single-token docs
hit exactly one signed coordinate, L1 mass bounded by token count."""

from __future__ import annotations

from covid_data_pipeline_spark.operators.features import (
    feature_hash_vectors,
)


def test_feature_hashing_contract(spark):
    docs = [
        (1, "alpha"),
        (2, "alpha alpha beta"),
        (3, "alpha alpha beta"),  # duplicate text -> identical vector
        (4, "gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in feature_hash_vectors(df, dim=32).collect()}
    assert all(len(r["features"]) == 32 for r in out.values())
    assert out[1]["n_tokens"] == 1
    assert out[2]["n_tokens"] == 3
    # single token: exactly one nonzero coordinate, value +-1
    nz = [v for v in out[1]["features"] if v != 0.0]
    assert nz in ([1.0], [-1.0])
    # determinism across rows
    assert out[2]["features"] == out[3]["features"]
    # L1 mass <= token count (signed collisions can only cancel)
    for r in out.values():
        assert sum(abs(v) for v in r["features"]) <= r["n_tokens"]
    # 'alpha alpha beta' = 2*alpha_vec + beta_vec
    a = out[1]["features"]
    comb = [r2 - 2 * r1 for r1, r2 in zip(a, out[2]["features"])]
    assert sum(abs(v) for v in comb) == 1.0  # the beta coordinate
