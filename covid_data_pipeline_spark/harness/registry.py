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
# Round-8 closeout (VERDICT r7 ask #1): keep the 8-query regression core
# as a drift canary, land ALL 32 never-driver-verified oracle queries
# (VERIFIED.json::suggested_window_r8 — 13 pre-r7 leftovers, 4 sketch,
# 15 late-r7 geo/bloom/interval/AMS/PCA), and spend the last 10 slots on
# drift re-checks of long-unverified r1-r3 greens (one per family:
# TPC-H, dedup, graph, ANN, sessionization, SCD2, multimodal, PageRank,
# rolling window, lang-id). Lands every query that was oracle-backed at
# the start of round 8 driver-proven; the 8 round-8 additions (mirror-
# green at sf0.01 + sf0.001) are pre-staged in suggested_window_r9.
# Everything not listed keeps its module registration order after
# these; oracle-less (rows-only) queries always sort last.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- regression core (driver-proven r1-r7; canary against drift) ---
    "mart_analytics",
    "agg_rollup",
    "filter_project",
    "join_left_composite",
    "surrogate_key_dim",
    "window_lag_alert",
    "curation_pipeline_docs",
    "tpch_q12_priority_shipping",
    # --- never-driver-verified fills (VERIFIED.json::suggested_window_r8) ---
    "quality_classifier_scores",
    "textrank_keywords",
    "heaps_law_fit",
    "docs_ks_drift",
    "attribution_position",
    "events_mannwhitney",
    "rake_keywords_docs",
    "nb_lang_confusion",
    "similarity_mmr_rerank",
    "events_logrank_cohorts",
    "docs_pii_redaction",
    "customers_scd2_history",
    "events_conversion_ab",
    "rolling_distinct_users_7d_hll_portable",
    "users_overlap_theta",
    "events_value_quantiles_sketch",
    "events_cm_user_freq",
    "geo_cell_density",
    "geo_radius_pairs",
    "geo_nearest_neighbor",
    "geo_dbscan_clusters",
    "bloom_prefilter_orders",
    "interval_merge_activity",
    "interval_coverage_users",
    "interval_overlap_error_windows",
    "events_f2_ams",
    "geo_nearest_supplier",
    "embeddings_pca_power",
    "interval_gaps_users",
    "events_f2_ams_by_type",
    "geo_morans_i",
    "geo_gearys_c",
    # --- drift re-checks: r1-r3 greens not re-verified since ---
    "tpch_q9_product_profit",
    "dedup_duplicate_groups",
    "graph_components_docs",
    "similarity_topk_lsh",
    "events_session_window",
    "scd2_user_type_history",
    "media_fingerprint",
    "pagerank_knn_docs",
    "moving_avg_7d",
    "lang_id_heuristic",
)

# Every query module must import cleanly: a blanket try/except here once
# let an ImportError silently drop whole modules (and shrink the driver's
# verification surface). The count assertion is the tripwire for any
# regression that swallows registrations some other way.
MIN_EXPECTED_QUERIES = 326


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
