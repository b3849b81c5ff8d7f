"""Source readers and landing ingest: JSON round-trip, URL landing."""

from __future__ import annotations

import pathlib

import pytest

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.sources.ingest import land_url, landing_key
from covid_data_pipeline_spark.sources.readers import read_csv, read_json


def test_landing_key_layout():
    assert landing_key("2021-03-07") == "year=2021/month=3/2021-03-07.csv"


def test_land_url_then_spark_reads(spark, tmp_path):
    src = tmp_path / "src.csv"
    src.write_text("a,b\n1,x\n2,y\n")
    landed = land_url(
        pathlib.Path(src).as_uri(), str(tmp_path / "landing"), "2021-03-07"
    )
    assert landed.endswith("year=2021/month=3/2021-03-07.csv")
    df = read_csv(spark, landed)
    assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, "y")]


def test_register_views_sql_surface(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import register_views

    register_views(spark, sf_dir)
    row = spark.sql(
        "SELECT COUNT(*) AS c FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]
    assert row["c"] > 0


def test_cluster_profile_shapes(spark):
    from covid_data_pipeline_spark.session import cluster_profile

    prof = cluster_profile(executors=1000, cores_per_executor=4)
    assert prof["spark.sql.shuffle.partitions"] == "8000"
    # Every key must be a real Spark conf (settable without error).
    for k in prof:
        assert k.startswith("spark.")


def test_land_url_missing_source_raises(tmp_path):
    with pytest.raises(Exception):
        land_url(
            (tmp_path / "nope.csv").as_uri(), str(tmp_path / "landing"), "2021-03-07"
        )
    # No partial file left behind.
    assert not (tmp_path / "landing" / "year=2021").exists() or not list(
        (tmp_path / "landing" / "year=2021").rglob("*.csv")
    )


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


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from covid_data_pipeline_spark.sources.readers import read_orc

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "docs_orc")
    d.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))
    # Predicate + projection reach the ORC scan.
    q = back.filter(back.lang == "en").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:120]


def test_csv_quarantine_splits_bad_rows(spark, tmp_path):
    import pyspark.sql.types as T

    from covid_data_pipeline_spark.sources.readers import read_csv_quarantine

    p = tmp_path / "mixed.csv"
    p.write_text(
        "id,qty,price\n"
        "1,3,9.5\n"
        "2,notanumber,1.0\n"
        "3,7,2.25\n"
        "4,5\n"  # too few columns -> malformed (Spark quarantines short rows)
        "5,8,oops\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("qty", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(p), schema)
    good_ids = sorted(r["id"] for r in good.collect())
    bad_lines = sorted(r["raw_line"] for r in bad.collect())
    assert good_ids == [1, 3]
    assert bad_lines == ["2,notanumber,1.0", "4,5", "5,8,oops"]
    assert good.columns == ["id", "qty", "price"]


def test_binary_files_scan_and_glob(spark, tmp_path):
    """binaryFile scan: one row per file, glob filters non-matching
    files before their bytes are read, nested dirs found recursively."""
    from covid_data_pipeline_spark.sources.readers import read_binary_files

    (tmp_path / "nested").mkdir()
    (tmp_path / "a.jpg").write_bytes(b"\xff\xd8fakejpegbytes")
    (tmp_path / "nested" / "b.jpg").write_bytes(b"\xff\xd8more")
    (tmp_path / "notes.txt").write_bytes(b"not media")

    df = read_binary_files(spark, str(tmp_path), glob="*.jpg")
    rows = {pathlib.Path(r["path"]).name: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.jpg"}
    assert bytes(rows["a.jpg"]["content"]) == b"\xff\xd8fakejpegbytes"
    assert rows["b.jpg"]["length"] == 6


def test_media_dir_lands_in_media_schema_and_featurizes(spark, tmp_path):
    """Files on disk → MEDIA_SCHEMA rows → fake featurize: the full
    multimodal ingest chain with stable content-independent ids."""
    from covid_data_pipeline_spark.operators.multimodal import (
        decode_and_featurize_images,
    )
    from covid_data_pipeline_spark.sources.readers import read_media_dir

    (tmp_path / "x.PNG").write_bytes(b"payload-one")
    (tmp_path / "y.png").write_bytes(b"payload-two")

    media = read_media_dir(spark, str(tmp_path), media_type="image")
    rows = media.collect()
    assert len(rows) == 2
    assert {r["meta"]["format"] for r in rows} == {"png"}
    assert all(r["meta"]["media_type"] == "image" for r in rows)
    assert all(r["media_id"] >= 0 for r in rows)
    # ids are path-stable: re-reading yields the identical id set
    again = {r["media_id"] for r in read_media_dir(spark, str(tmp_path), "image").collect()}
    assert again == {r["media_id"] for r in rows}

    feats = decode_and_featurize_images(media, fake=True).collect()
    assert len(feats) == 2
    assert all(len(f["features"]) == 8 for f in feats)
    assert {f["n_bytes"] for f in feats} == {11}


def test_json_quarantine_splits_bad_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from covid_data_pipeline_spark.sources.readers import read_json_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "qty": 3}\n'
        "not json at all\n"
        '{"id": 2, "qty": "NaNope"}\n'
        '{"id": 3, "qty": 7}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
    )
    good, bad = read_json_quarantine(spark, str(p), schema)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    bad_lines = [r["raw_line"] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "not json at all" in bad_lines
    assert any("NaNope" in b for b in bad_lines)
    assert good.columns == ["id", "qty"]


def test_max_records_per_file_rolls_output_files(spark, tmp_path):
    from covid_data_pipeline_spark.sources.writers import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    wh.max_records_per_file = 100
    wh.replace(spark.range(0, 950).toDF("id").coalesce(1), "l.t")
    files = [
        f for f in pathlib.Path(wh.path("l.t")).rglob("*.parquet")
        if not f.name.startswith(("_", "."))
    ]
    # one task, 950 rows, 100-row cap -> 10 files; without the cap: 1
    assert len(files) == 10
    assert wh.read("l.t").count() == 950


def test_read_parquet_evolved_merges_added_column(spark, tmp_path):
    from covid_data_pipeline_spark.sources.readers import read_parquet_evolved

    v1 = tmp_path / "v1"
    v2 = tmp_path / "v2"
    spark.range(0, 3).toDF("id").write.parquet(str(v1))
    spark.range(3, 6).toDF("id").withColumn(
        "score", F.col("id") * 2.0
    ).write.parquet(str(v2))

    df = read_parquet_evolved(spark, str(v1), str(v2))
    assert set(df.columns) == {"id", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[0] is None and rows[5] == 10.0
    assert len(rows) == 6


def test_table_report_reflects_layout(spark, tmp_path):
    from covid_data_pipeline_spark.sources.writers import Warehouse, table_report

    wh = Warehouse(spark, str(tmp_path))
    wh.max_records_per_file = 100
    wh.replace(spark.range(0, 400).toDF("id").coalesce(1), "l.t")
    rep = table_report(wh, "l.t")
    assert rep["num_files"] == 4
    assert rep["rows"] == 400
    assert rep["avg_rows_per_file"] == 100
    assert rep["total_bytes"] > 0 and rep["avg_file_bytes"] > 0


def test_multi_format_round_trip_equivalence(spark, sf_dir, tmp_path):
    """Engine format coverage: the same relation written as parquet,
    ORC, JSON-lines, and CSV reads back value-identical (modulo the
    text formats' need for explicit schemas) — a user can land data in
    any of the four and the operator library sees identical rows."""
    from pyspark.sql import functions as F

    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )
    want = sorted(map(tuple, src.collect()))
    for fmt, opts in [
        ("parquet", {}),
        ("orc", {}),
        ("json", {}),
        ("csv", {"header": "true"}),
    ]:
        path = str(tmp_path / f"rt_{fmt}")
        src.write.format(fmt).options(**opts).mode("overwrite").save(path)
        back = (
            spark.read.format(fmt)
            .options(**opts)
            .schema(src.schema)  # text formats: no silent re-inference
            .load(path)
        )
        got = sorted(map(tuple, back.collect()))
        assert got == want, f"{fmt} round-trip diverged"
