"""Schema conformance: evolve messy, header-drifting sources to a target schema.

Reproduces the semantics of the reference's ``normalize_to_target_schema``
(/root/reference/airflow/dags/scripts/process_covid_raw.py:23-59) as a
reusable, schema-agnostic operator:

  1. sanitize column names (strip; ``/``, space, ``-`` → ``_``)
  2. resolve historical header aliases (e.g. ``Latitude`` → ``Lat``)
  3. parse timestamp fields by coalescing several historical formats
  4. cast everything else to the target type
  5. fill absent columns with typed NULLs

All steps compose into ONE ``select`` — a single Catalyst projection, so
column pruning and predicate pushdown still reach the scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The three Last_Update formats observed across JHU CSV history
# (reference process_covid_raw.py:47-51).
DEFAULT_TIMESTAMP_FORMATS: tuple[str, ...] = (
    "M/d/yyyy H:mm",
    "yyyy-MM-dd HH:mm:ss",
)


def sanitize_column_names(df: DataFrame) -> DataFrame:
    """Strip whitespace and normalize ``/``, space, ``-`` to ``_`` in names.

    Single ``toDF`` call — metadata-only, no shuffle, no projection cost.
    """
    clean = [
        c.strip().replace("/", "_").replace(" ", "_").replace("-", "_")
        for c in df.columns
    ]
    return df.toDF(*clean)


def parse_timestamp_multi(
    col: Column | str, formats: Sequence[str] = DEFAULT_TIMESTAMP_FORMATS
) -> Column:
    """Coalesce of ``to_timestamp`` attempts: default parse first, then each
    explicit format. NULL only if every format fails (reference
    process_covid_raw.py:47-51)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_to_timestamp, not to_timestamp: under ANSI mode (Spark 4 default)
    # a failed parse must yield NULL for the next format in the chain, not
    # throw — the reference ran non-ANSI Spark 3.5 where this was implicit.
    attempts = [F.try_to_timestamp(c)] + [F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats]
    return F.coalesce(*attempts)


def conform(
    df: DataFrame,
    target_schema: T.StructType,
    aliases: Mapping[str, Sequence[str]] | None = None,
    timestamp_formats: Sequence[str] = DEFAULT_TIMESTAMP_FORMATS,
) -> DataFrame:
    """Project ``df`` onto ``target_schema``.

    ``aliases`` maps a target field name to the historical source names that
    should feed it (first present wins). Missing fields become typed NULLs;
    timestamp fields get multi-format parsing when the source side is a
    string. Name resolution is case-insensitive, matching Spark's default
    resolution the reference relies on (SURVEY.md §1.3).
    """
    df = sanitize_column_names(df)
    aliases = aliases or {}
    by_lower = {c.lower(): c for c in df.columns}

    cols: list[Column] = []
    for field in target_schema.fields:
        candidates = [field.name, *aliases.get(field.name, ())]
        source_name = next(
            (by_lower[c.lower()] for c in candidates if c.lower() in by_lower), None
        )
        if source_name is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        src = F.col(source_name)
        src_type = df.schema[source_name].dataType
        if isinstance(field.dataType, T.TimestampType) and isinstance(
            src_type, T.StringType
        ):
            cols.append(parse_timestamp_multi(src, timestamp_formats).alias(field.name))
        else:
            # try_cast: malformed values become NULL (the reference's
            # non-ANSI cast semantics) instead of failing the job.
            cols.append(src.try_cast(field.dataType).alias(field.name))
    return df.select(*cols)
