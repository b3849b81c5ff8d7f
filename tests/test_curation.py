"""End-to-end curation plan: every stage's effect on planted docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_data_pipeline_spark.plans.curation import CurationConfig, curate_documents

GOOD = (
    "the federal reserve announced a quarter point rate adjustment today "
    "citing persistent inflation in services and housing sectors while "
    "labor markets remain historically tight according to officials"
)
OTHER = (
    "astronomers reported a newly confirmed exoplanet orbiting a nearby "
    "red dwarf star with an estimated surface temperature compatible "
    "with liquid water oceans according to the survey team"
)
BENCH = (
    "question what is the capital of france answer paris is the capital "
    "and largest city of france situated on the seine river"
)


def _curate(spark, rows, bench_rows=None, cfg=CurationConfig()):
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    bench = (
        spark.createDataFrame([(t,) for t in bench_rows], "text STRING")
        if bench_rows
        else None
    )
    return curate_documents(docs, benchmark=bench, cfg=cfg)


def test_stages_drop_the_right_docs(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),  # exact dup of 1 → dropped
        (3, GOOD + " extra trailing token"),  # near-dup of 1 → dropped
        (4, OTHER),  # clean survivor
        (5, "tiny"),  # fails quality/token gate
        (6, OTHER + " " + BENCH),  # contains benchmark 8-gram → dropped
    ]
    out = _curate(spark, rows, bench_rows=[BENCH])
    survivors = {r["doc_id"] for r in out.collect()}
    assert survivors == {1, 4}


def test_output_is_deterministic_and_packed(spark):
    rows = [(i, f"{OTHER} unique suffix number {i} with several extra tokens") for i in range(40)]
    a = _curate(spark, rows)
    b_input = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(13)
    b = curate_documents(b_input)
    ka = sorted((r["doc_id"], r["split"], r["bin_id"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["split"], r["bin_id"]) for r in b.collect())
    assert ka == kb
    assert {r["split"] for r in a.collect()} <= {"train", "valid", "test"}
    # Bins respect the token budget (each doc is far under it, so bin 0
    # must hold more than one doc per split).
    assert all(r["bin_id"] >= 0 for r in a.collect())


def test_observation_metrics_match_recomputed_counts(spark, sf_dir):
    """Stage counts via df.observe ride the single curation action; they
    must equal independently recomputed counts (which pay a re-run —
    exactly what the metrics path avoids in production)."""
    from covid_data_pipeline_spark.harness.tables import table
    from covid_data_pipeline_spark.plans.curation import (
        CurationConfig,
        curate_documents,
    )

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    metrics = {}
    out = curate_documents(docs, bench, CurationConfig(), metrics=metrics)
    final = out.count()  # one action fires every observation

    assert set(metrics) >= {
        "input", "quality", "exact_dedup", "neardup_kept", "decontaminated"
    }
    rows = {k: o.get["rows"] for k, o in metrics.items()}
    assert rows["input"] == docs.count()
    assert (
        rows["input"] >= rows["quality"] >= rows["exact_dedup"]
        >= rows["neardup_kept"] >= rows["decontaminated"] == final
    )
    # and the plain (metrics=None) path still returns the same corpus
    plain = curate_documents(docs, bench, CurationConfig())
    assert plain.count() == final
