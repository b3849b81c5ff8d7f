"""Dataset-card generator: headline corpus statistics in two passes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.plans.dataset_card import build_dataset_card

SF = "/root/testdata/sf0.001"


def test_card_totals_and_distributions_consistent(spark):
    docs = table(spark, SF, "documents")
    card = build_dataset_card(docs)
    n = docs.count()
    assert card["totals"]["docs"] == n
    assert card["totals"]["tokens"] > 0
    assert sum(v["docs"] for v in card["by_lang"].values()) == n
    assert sum(v["docs"] for v in card["by_source"].values()) == n
    assert sum(v["tokens"] for v in card["by_lang"].values()) == card["totals"]["tokens"]
    lt = card["length_tokens"]
    assert lt["min"] <= lt["p25"] <= lt["p50"] <= lt["p75"] <= lt["max"]
    assert 0 <= card["pii_docs_pct"] <= 100
    assert 0 <= card["detected_lang_agreement_pct"] <= 100
    json.dumps(card)  # JSON-shaped by contract


def test_card_counts_planted_dups_and_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog", "en", "web"),
            (2, "The quick brown fox jumps over the dog", "en", "web"),  # dup
            (3, "contact me at alice@example.com for details", "en", "mail"),
            (4, "totally unique text with no issues at all here", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    card = build_dataset_card(docs)
    assert card["exact_dup_pct"] == 50.0  # 2 of 4 docs share a fingerprint
    assert card["pii_docs_pct"] == 25.0
    assert card["by_source"]["mail"]["docs"] == 1
