"""Source readers: JSON-lines round-trip with declared schema."""

from __future__ import annotations

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.sources.readers import read_json


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    path = str(tmp_path / "docs_json")
    d.write.mode("overwrite").json(path)
    back = read_json(spark, path, schema=d.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_json_inference_matches_declared(spark, sf_dir, tmp_path):
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = str(tmp_path / "docs_json2")
    d.write.mode("overwrite").json(path)
    inferred = read_json(spark, path)
    assert set(inferred.columns) == {"doc_id", "lang"}
    assert inferred.count() == d.count()
