"""Python Data Source API: synthetic events source (sources/pyds.py).

Covers the three contracts: batch partitioned read (determinism, row
counts, partition fan-out), filter pushdown (event_type equality
absorbed by the generator, other predicates left to Spark), and the
bounded deterministic stream (micro-batch offsets, batch-vs-stream row
parity)."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from covid_data_pipeline_spark.sources.pyds import (
    EVENT_TYPES,
    SyntheticEventsReader,
    _Opts,
    register_synthetic_source,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_synthetic_source(spark)


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_count_and_schema(spark):
    df = _read(spark, numPartitions=4, rowsPerPartition=250)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    # event_ids are the dense range 0..999 — exactly one row per id
    assert df.select(F.count_distinct("event_id")).first()[0] == 1000
    assert df.agg(F.min("event_id"), F.max("event_id")).first() == (0, 999)


def test_partition_fan_out(spark):
    df = _read(spark, numPartitions=6, rowsPerPartition=10)
    assert df.rdd.getNumPartitions() == 6


def test_deterministic_across_reads(spark):
    a = _read(spark, numPartitions=3, rowsPerPartition=100, seed=7)
    b = _read(spark, numPartitions=3, rowsPerPartition=100, seed=7)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    c = _read(spark, numPartitions=3, rowsPerPartition=100, seed=8)
    assert not a.exceptAll(c).isEmpty()  # seed actually matters


def test_filter_pushdown_event_type(spark):
    # absorbFilters relations are single-purpose (one query shape) —
    # see the pyds module docstring for the scan-caching hazard.
    base = _read(spark, numPartitions=4, rowsPerPartition=500, seed=1)
    expected = base.where(F.col("event_type") == "click")
    pushed = _read(
        spark, numPartitions=4, rowsPerPartition=500, seed=1,
        absorbFilters=True,
    ).where(F.col("event_type") == "click")
    rows = pushed.collect()
    assert {r.event_type for r in rows} == {"click"}
    assert sorted(r.event_id for r in rows) == sorted(
        r.event_id for r in expected.collect()
    )


def test_shared_relation_not_poisoned_by_pushdown(spark):
    """Regression (r7): with absorption ON, a relation's filterless
    queries can reuse the most-recently-built pushed-filter scan
    (Spark 4.1 scan caching) and silently drop rows. The default
    (absorbFilters=false) must keep a shared DataFrame correct across
    filtered-then-plain query sequences."""
    ev = _read(spark, numPartitions=4, rowsPerPartition=500, seed=1)
    n_err = ev.where(F.col("event_type") == "error").count()
    assert 0 < n_err < 2000
    assert ev.count() == 2000  # plain scan after filtered scan: full
    n_click = ev.where(F.col("event_type") == "click").count()
    assert ev.select("user_id").count() == 2000
    assert 0 < n_click < 2000


def test_pushdown_contract_unit():
    """pushFilters absorbs exactly one event_type EqualTo and returns the
    rest as unsupported."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    reader = SyntheticEventsReader(
        _Opts({
            "numpartitions": "1", "rowsperpartition": "10",
            "absorbfilters": "true",
        })
    )
    leftover = list(
        reader.pushFilters(
            [EqualTo(("event_type",), "view"), GreaterThan(("user_id",), 5)]
        )
    )
    assert reader.event_type_eq == "view"
    assert len(leftover) == 1 and leftover[0].attribute == ("user_id",)
    batch = next(reader.read(reader.partitions()[0]))
    assert set(batch.column("event_type").to_pylist()) <= {"view"}


def test_value_domain(spark):
    df = _read(spark, numPartitions=2, rowsPerPartition=200)
    stats = df.agg(
        F.min("value"), F.max("value"), F.count_distinct("event_type")
    ).first()
    assert 0.0 <= stats[0] and stats[1] < 1000.0
    assert stats[2] == len(EVENT_TYPES)
    ks = df.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
    assert ks.where(F.col("k").isNull() | (F.col("k") < 0) | (F.col("k") > 99)).isEmpty()


def test_stream_matches_batch(spark, tmp_path):
    """3 micro-batches of 40 rows == the first 120 rows of the batch
    read; the stream then reports caught-up so processAllAvailable
    returns."""
    q = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 40)
        .option("maxRows", 120)
        .option("seed", 5)
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("pyds_stream")
    assert streamed.count() == 120
    batch = _read(spark, numPartitions=1, rowsPerPartition=120, seed=5)
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_stream_through_tumbling_window_matches_batch(spark, tmp_path):
    """The synthetic stream drives the engine's watermarked tumbling
    aggregation and lands on the same rows as the batch twin over the
    identical generated data — source, window operator, and
    batch/stream polymorphism verified together."""
    from pyspark.sql import functions as F

    from covid_data_pipeline_spark.streaming.windows import tumbling_agg

    aggs = dict(
        ts_col="ts",
        duration="1 hour",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("events_cnt")],
    )
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 500)
        .option("maxRows", 2000)
        .option("stepSeconds", 30)
        .option("seed", 11)
        .load()
    )
    q = (
        tumbling_agg(stream, watermark="10 minutes", **aggs)
        .writeStream.format("memory")
        .queryName("pyds_tumbling")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("pyds_tumbling").select(
        "event_type", "events_cnt", "window_start", "window_end"
    )
    batch = tumbling_agg(
        _read(spark, numPartitions=1, rowsPerPartition=2000, stepSeconds=30, seed=11),
        **aggs,
    ).select(
        "event_type",
        "events_cnt",
        F.col("window_start").cast("timestamp_ltz").alias("window_start"),
        F.col("window_end").cast("timestamp_ltz").alias("window_end"),
    )
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()
