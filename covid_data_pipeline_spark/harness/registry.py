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


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its QuerySpecs.
    from covid_data_pipeline_spark.harness import queries_core  # noqa: F401

    try:
        from covid_data_pipeline_spark.harness import queries_text  # noqa: F401
        from covid_data_pipeline_spark.harness import queries_dedup  # noqa: F401
        from covid_data_pipeline_spark.harness import queries_similarity  # noqa: F401
        from covid_data_pipeline_spark.harness import queries_events  # noqa: F401
        from covid_data_pipeline_spark.harness import queries_olap  # noqa: F401
        from covid_data_pipeline_spark.harness import queries_tpch  # noqa: F401
        from covid_data_pipeline_spark.harness import queries_training  # noqa: F401
    except ImportError:  # modules land incrementally during the build
        pass


_load_all()
