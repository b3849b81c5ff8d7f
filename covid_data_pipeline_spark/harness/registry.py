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
# Round-4 rotation (VERDICT r3 ask #1): rounds 1-3 driver-proved 111
# distinct queries. Keep the 8-query regression core as a drift canary
# and fill the other 42 slots from VERIFIED.json::never_driver_verified
# in registry order (all local-mirror green per
# driver_mirror_report.json / tests/test_oracle_parity.py). Everything
# not listed keeps its module registration order after these;
# oracle-less (rows-only) queries always sort last.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- regression core (driver-proven r1-r3; canary against drift) ---
    "mart_analytics",
    "agg_rollup",
    "filter_project",
    "join_left_composite",
    "surrogate_key_dim",
    "window_lag_alert",
    "curation_pipeline_docs",
    "tpch_q12_priority_shipping",
    # --- dedup / curation pack (never driver-verified) ---
    "customers_masked_egress",
    "dedup_groups_keep_best",
    "dedup_passages_global",
    "dedup_keep_best",
    "dedup_token_savings",
    "containment_quotes",
    "split_leakage_audit",
    # --- event analytics pack ---
    "events_json_props",
    "events_variant_props",
    "events_sessionize_batch",
    "ewma_daily_events",
    "skew_profile_events",
    "rolling_distinct_users_7d",
    "daily_active_buyers",
    "events_daily_trend",
    "funnel_sessionized",
    "funnel_conversion_lag",
    "daily_distinct_users_bitmap",
    "event_type_lift",
    "funnel_daily_conversion",
    "event_dwell_percentiles",
    "event_path_trigrams",
    "retention_matrix_daily",
    "events_mad_outliers",
    "events_srm_check",
    "events_did_experiment",
    "events_funnel",
    "distinct_exact_and_percentiles",
    # --- OLAP / DQ / scalar-function packs ---
    "dq_report_orders",
    "string_functions",
    "array_functions",
    "date_math_functions",
    "agg_salted_skewproof",
    "top_n_global",
    "histogram_prices",
    "above_avg_balance",
    "unpivot_returnflag_metrics",
    "window_lead_first_last",
    "collect_events_per_user",
    "cross_join_region_nation",
    "full_outer_customer_supplier_nations",
    "revenue_share_by_nation",
)

# Every query module must import cleanly: a blanket try/except here once
# let an ImportError silently drop whole modules (and shrink the driver's
# verification surface). The count assertion is the tripwire for any
# regression that swallows registrations some other way.
MIN_EXPECTED_QUERIES = 255


def _load_all() -> None:
    # Import for side effect: each module registers its QuerySpecs.
    from covid_data_pipeline_spark.harness import (  # noqa: F401
        queries_core,
        queries_dedup,
        queries_events,
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
