"""Query registry: the driver contract's backing store.

Each :class:`QuerySpec` pairs a PySpark implementation (``fn(spark,
sf_dir) -> DataFrame``) with the equivalent ANSI SQL for the DuckDB
oracle (``oracle``), per the __spark_entry__ contract. Column names are
aliased identically on both sides (the driver sorts columns by name and
hashes values). ``oracle=None`` marks genuinely non-SQL-expressible
operators — the driver records a rows-only check for those.

Float policy: any aggregated/derived DOUBLE is ROUNDed (usually to 2) on
BOTH sides so cross-engine summation-order noise cannot flip the value
hash. Window ORDER BYs always carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from covid_data_pipeline_spark.harness.tables import load_tables, table  # noqa: F401

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL, or None for rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py's headline set
    # Required for oracle=None: one line on WHY the query cannot be
    # SQL-replayed (rendered in QUERIES.md; tripwire in _load_all).
    rows_only_reason: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    rows_only_reason: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench,
            rows_only_reason=rows_only_reason,
        )
        return fn

    return deco


# The external driver verifies a 50-query window in registration order.
# Round-7 rotation (VERDICT r6 ask #1): keep the 8-query regression core
# as a drift canary and fill the other 42 slots from
# VERIFIED.json::suggested_window_r7 — never-driver-verified queries:
# docs_nfc_normalize (displaced from r6) rejoins first, then the
# text/split/pack/BPE/DSIR families and the IVF/PQ bench twins.
# Everything not listed keeps its module registration order after
# these; oracle-less (rows-only) queries always sort last.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- regression core (driver-proven r1-r6; canary against drift) ---
    "mart_analytics",
    "agg_rollup",
    "filter_project",
    "join_left_composite",
    "surrogate_key_dim",
    "window_lag_alert",
    "curation_pipeline_docs",
    "tpch_q12_priority_shipping",
    # --- never-driver-verified fills (VERIFIED.json::suggested_window_r7) ---
    "docs_nfc_normalize",
    "docs_cdc_chunks",
    "kneser_ney_bigram_lm",
    "phrase_search_docs",
    "docs_feature_hashing",
    "docs_flesch_readability",
    "zipf_law_fit",
    "lang_id_confusion",
    "docs_pmi_collocations",
    "lang_token_fertility",
    "corpus_report_card",
    "sample_per_group_docs",
    "mixture_sample_docs",
    "mixture_resample_docs",
    "train_order_shuffle",
    "pack_length_bucketed",
    "pack_bin_manifest",
    "group_aware_split_docs",
    "cluster_aware_split_docs",
    "split_token_stats",
    "temporal_split_events",
    "kfold_assign_docs",
    "label_balanced_embeddings",
    "temperature_rebalance_docs",
    "temperature_rebalance_tokens",
    "bpe_learn_merges",
    "bpe_compression_curve",
    "dsir_importance_weights",
    "dsir_select_topk",
    "docs_quantile_normalize",
    "docs_isotonic_calibration",
    "customers_l_diversity",
    "dedup_winnowing",
    "events_acf_daily",
    "events_conformal_intervals",
    "item_similarity_topk",
    "similarity_topk_ivf",
    "similarity_topk_ivf_pretrained",
    "similarity_topk_pq",
    "similarity_topk_pq_pretrained",
    "hits_knn_docs",
    "media_neardup_phash",
)

# Every query module must import cleanly: a blanket try/except here once
# let an ImportError silently drop whole modules (and shrink the driver's
# verification surface). The count assertion is the tripwire for any
# regression that swallows registrations some other way.
MIN_EXPECTED_QUERIES = 312


def _load_all() -> None:
    # Import for side effect: each module registers its QuerySpecs.
    from covid_data_pipeline_spark.harness import (  # noqa: F401
        queries_core,
        queries_dedup,
        queries_events,
        queries_geo,
        queries_olap,
        queries_similarity,
        queries_temporal,
        queries_text,
        queries_tpch,
        queries_training,
    )

    assert len(QUERIES) >= MIN_EXPECTED_QUERIES, (
        f"query registry shrank: {len(QUERIES)} < {MIN_EXPECTED_QUERIES} — "
        "a module stopped registering"
    )
    missing = [n for n in WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"WINDOW_PRIORITY names unknown queries: {missing}"
    no_oracle_in_window = [
        n for n in WINDOW_PRIORITY if QUERIES[n].oracle is None
    ]
    assert not no_oracle_in_window, (
        f"driver-window queries must be oracle-backed: {no_oracle_in_window}"
    )
    unjustified = [
        n for n, s in QUERIES.items()
        if s.oracle is None and not s.rows_only_reason
    ]
    assert not unjustified, (
        f"rows-only queries must carry a rows_only_reason: {unjustified}"
    )

    def _rank(item: tuple[str, QuerySpec]) -> tuple[int, int]:
        name, spec = item
        if name in WINDOW_PRIORITY:
            return (0, WINDOW_PRIORITY.index(name))
        # stable: dict preserves module registration order within ties
        return (1 if spec.oracle is not None else 2, 0)

    ordered = sorted(QUERIES.items(), key=_rank)
    QUERIES.clear()
    QUERIES.update(ordered)


_load_all()
