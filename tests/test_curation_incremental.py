"""Incremental curation (plans/curation_incremental.py): after every
refresh, the incrementally-maintained curated table must equal
curate_documents() run from scratch on the full raw corpus — including
the retraction case where a new document bridges two old near-dup
clusters and an already-published canonical must be withdrawn."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from covid_data_pipeline_spark.plans.curation import CurationConfig, curate_documents
from covid_data_pipeline_spark.plans.curation_incremental import IncrementalCurator
from covid_data_pipeline_spark.sources.snapshots import SnapshotWarehouse

# bands == num_hashes (1-row bands): candidate recall at J >= 0.6 is
# ~1 - 4e-9, so the planted bridge merge below is deterministic in
# practice AND both engines of the equality check share the exact same
# LSH seeds anyway (equality never depends on recall).
CFG = CurationConfig(
    min_quality=0.0,
    min_tokens=1,
    shingle_k=3,
    num_hashes=16,
    bands=16,
    jaccard_threshold=0.6,
    pack_budget_tokens=64,
)

# shingle-block building bricks (each 12 tokens)
_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
_B = "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
_C = "one two three four five six seven eight nine ten eleven twelve"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def wh(spark, tmp_path):
    return SnapshotWarehouse(spark, str(tmp_path / "wh"))


def _bench(spark):
    # exact 10-token prefix of doc 7's text -> doc 7 is contaminated
    return spark.createDataFrame(
        [("contaminated prefix words that appear verbatim in document seven only",)],
        "text string",
    )


def _increment1():
    return [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "pack my box with five dozen liquor jugs for the long winter"),
        (2, "sphinx of black quartz judge my vow said the curious scribe"),
        (3, "how vexingly quick daft zebras jump over fences in the park"),
        (5, _A + " " + _B),          # cluster seed: blocks A+B
        (6, _B + " " + _C),          # NOT a near-dup of 5 (J = 1/3)
        (7, "contaminated prefix words that appear verbatim in document seven only today"),
        (8, "waltz bad nymph for quick jigs vex the sleepy bartender nightly"),
    ]


def _increment2():
    return [
        (20, "pack my box with five dozen liquor jugs for the long winter"),  # exact dup of 1
        (21, "sphinx of black quartz judge my vow said the curious scribe today"),  # near-dup of 2
        (22, "jackdaws love my big sphinx of quartz said nobody ever truly"),
        (23, "the five boxing wizards jump quickly over the frozen river bank"),
    ]


def _increment3():
    # bridge: A+B+C overlaps both 5 (J=2/3) and 6 (J=2/3) -> merges
    # their clusters; component min = 5, so the ALREADY-PUBLISHED doc 6
    # must be retracted from the curated table
    return [(30, _A + " " + _B + " " + _C)]


def _curated_rows(df):
    return {
        (r["doc_id"], r["split"], r["n_tokens"], r["bin_id"])
        for r in df.collect()
    }


def _assert_equals_full(spark, cur, wh):
    full = curate_documents(
        wh.read("rawdocs").select("doc_id", "text"),
        benchmark=_bench(spark),
        cfg=CFG,
    ).select("doc_id", "split", "n_tokens", "bin_id")
    assert _curated_rows(cur.read()) == _curated_rows(full)


def test_incremental_equals_full_recompute(spark, wh):
    cur = IncrementalCurator(
        wh, "rawdocs", "curated", cfg=CFG, benchmark=_bench(spark)
    )
    wh.append(_docs(spark, _increment1()), "rawdocs")
    r1 = cur.refresh()
    assert r1["mode"] == "full"
    _assert_equals_full(spark, cur, wh)
    out1 = {r["doc_id"] for r in cur.read().collect()}
    assert 7 not in out1          # decontaminated
    assert {5, 6} <= out1         # separate clusters both alive

    wh.append(_docs(spark, _increment2()), "rawdocs")
    r2 = cur.refresh()
    assert r2["mode"] == "incremental"
    _assert_equals_full(spark, cur, wh)
    out2 = {r["doc_id"] for r in cur.read().collect()}
    assert 20 not in out2         # exact dup of 1, dropped
    assert 21 not in out2         # near-dup of 2, dropped
    assert {22, 23} <= out2

    wh.append(_docs(spark, _increment3()), "rawdocs")
    r3 = cur.refresh()
    assert r3["mode"] == "incremental"
    _assert_equals_full(spark, cur, wh)
    out3 = {r["doc_id"] for r in cur.read().collect()}
    # the bridge merged {5} and {6}: 5 stays canonical, 6 RETRACTED
    assert 5 in out3 and 6 not in out3 and 30 not in out3

    # cursor current -> noop
    assert cur.refresh()["mode"] == "noop"
    # prior curated snapshots remain readable (time travel over output)
    assert 6 in {
        r["doc_id"]
        for r in wh.read("curated", version=r2["curated_version"]).collect()
    }


def test_monotone_id_contract_enforced(spark, wh):
    cur = IncrementalCurator(wh, "rawdocs", "curated", cfg=CFG)
    wh.append(_docs(spark, _increment1()), "rawdocs")
    cur.refresh()
    wh.append(_docs(spark, [(3, "replayed id three text here")]), "rawdocs")
    with pytest.raises(ValueError, match="monotone"):
        cur.refresh()


def test_append_only_contract_enforced(spark, wh):
    cur = IncrementalCurator(wh, "rawdocs", "curated", cfg=CFG)
    wh.append(_docs(spark, _increment1()), "rawdocs")
    cur.refresh()
    wh.replace(_docs(spark, _increment1()), "rawdocs")
    with pytest.raises(ValueError, match="append-only"):
        cur.refresh()


def test_crash_between_state_and_output_commit_is_repaired(spark, wh):
    """A refresh that dies after appending state but before the curate@
    output commit must NOT wedge the curator: the next refresh rolls
    the partial state back and replays the delta cleanly."""
    cur = IncrementalCurator(
        wh, "rawdocs", "curated", cfg=CFG, benchmark=_bench(spark)
    )
    wh.append(_docs(spark, _increment1()), "rawdocs")
    cur.refresh()

    orig_commit = wh._commit
    armed = {"on": True}

    def exploding_commit(table, files, op, **kw):
        if armed["on"] and op.startswith("curate@"):
            raise RuntimeError("simulated crash before output commit")
        return orig_commit(table, files, op, **kw)

    wh._commit = exploding_commit
    try:
        wh.append(_docs(spark, _increment2()), "rawdocs")
        with pytest.raises(RuntimeError, match="simulated crash"):
            cur.refresh()
        # states ran ahead of the cursor; a second crashy run still fails
        # the same way (repair + replay + crash again), never a wedge
        with pytest.raises(RuntimeError, match="simulated crash"):
            cur.refresh()
        armed["on"] = False
        out = cur.refresh()
        assert out["mode"] == "incremental"
    finally:
        wh._commit = orig_commit
    _assert_equals_full(spark, cur, wh)
    # and the curator keeps working on the NEXT increment too
    wh.append(_docs(spark, _increment3()), "rawdocs")
    cur.refresh()
    _assert_equals_full(spark, cur, wh)
