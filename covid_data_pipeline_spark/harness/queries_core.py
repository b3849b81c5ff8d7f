"""Core relational queries — one per SURVEY.md §2 operator row.

Each query is built from the engine's operator modules (not ad-hoc
DataFrame code) so the driver's correctness gate exercises the same code
paths the covid pipeline uses. Oracle SQL is DuckDB dialect; aliases
match the Spark side exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.scalar import (
    bucketize,
    map_values,
    per_100k,
    rate_percent,
    surrogate_key,
)
from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.operators.relational import (
    anti_join,
    dim_join,
    distinct_rows,
    map_values_join,
    null_safe_sum_rollup,
    semi_join,
)
from covid_data_pipeline_spark.operators.windows import top_k_per_group, with_deltas

# ---------------------------------------------------------------------------
# Flagship: the mart analytics shape (J2 join → A1 rollup → W1 lag-delta →
# F11-F14 metrics → P9 risk bucket) over orders×customer×nation.
# Mirrors reference process_covid_data_mart.py:50-115 semantics.
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         n_name AS nation_name,
         ROUND(SUM(o_totalprice), 2) AS total_sales,
         COUNT(*) AS orders_cnt
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT order_date, nation_name, total_sales, orders_cnt,
       LAG(total_sales) OVER w AS prev_sales,
       GREATEST(COALESCE(ROUND(total_sales - LAG(total_sales) OVER w, 2), 0), 0)
         AS new_sales,
       CASE WHEN total_sales > 1000000 THEN 'High'
            WHEN total_sales > 300000 THEN 'Medium'
            ELSE 'Low' END AS sales_bucket
FROM daily
WINDOW w AS (PARTITION BY nation_name ORDER BY order_date)
"""


@register("mart_analytics", _FLAGSHIP_ORACLE, tags=("J2", "A1", "W1", "F11", "P9"), bench=True)
def mart_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    daily = (
        dim_join(o, c, on=o.o_custkey == c.c_custkey, how="inner")
        # bcast: const(25) nation dim
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .withColumn("order_date", F.to_date("o_orderdate"))
        .groupBy("order_date", F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
            F.count(F.lit(1)).alias("orders_cnt"),
        )
    )
    out = with_deltas(
        daily,
        partition_by=["nation_name"],
        order_by=["order_date"],
        cols=["total_sales"],
        clamp=True,
        prev_suffix="_lag",
        delta_prefix="delta_",
    )
    return out.select(
        "order_date",
        "nation_name",
        "total_sales",
        "orders_cnt",
        F.col("total_sales_lag").alias("prev_sales"),
        F.round("delta_total_sales", 2).alias("new_sales"),
        bucketize("total_sales", [(1_000_000, "High"), (300_000, "Medium")], "Low").alias(
            "sales_bucket"
        ),
    )


# ---------------------------------------------------------------------------
# A1 — null-safe groupBy-sum rollup (ODS shape, process_covid_ods.py:61-69).
# TPC-H Q1-flavored so it doubles as the bench workhorse.
# ---------------------------------------------------------------------------


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(COALESCE(l_quantity, 0)), 2) AS sum_qty,
           CAST(ROUND(SUM(COALESCE(CAST(l_extendedprice AS DECIMAL(18,4)), 0)), 2)
                AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS source_records_cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1",),
    bench=True,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decimal money arithmetic: summation-order-independent, so the
    # value hash is stable under any partitioning (see queries_tpch.py).
    li = (
        table(spark, sf_dir, "lineitem")
        .withColumn("l_extendedprice", F.col("l_extendedprice").cast("decimal(18,4)"))
        .withColumn(
            "disc_price",
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")),
        )
    )
    rolled = null_safe_sum_rollup(
        li,
        group_by=["l_returnflag", "l_linestatus"],
        sum_cols=["l_quantity", "l_extendedprice", "disc_price"],
    )
    return rolled.select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity", 2).alias("sum_qty"),
        F.round("l_extendedprice", 2).cast("double").alias("sum_base_price"),
        F.round("disc_price", 2).cast("double").alias("sum_disc_price"),
        "source_records_cnt",
    )


# ---------------------------------------------------------------------------
# P5/P6/F2/F11 — filter + projection with arithmetic; predicates must reach
# the parquet scan (PushedFilters), verified in tests.
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_shipdate AS DATE) AS ship_date,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_quantity > 45
      AND l_discount IS NOT NULL
    """,
    tags=("P5", "P6", "F2"),
    bench=True,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") > 45)
            & F.col("l_discount").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.to_date("l_shipdate").alias("ship_date"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                2,
            ).alias("charged"),
        )
    )


# ---------------------------------------------------------------------------
# P9/F14 — CASE bucketing (risk categories, process_covid_data_mart.py:106-111).
# ---------------------------------------------------------------------------


@register(
    "case_bucket",
    """
    SELECT CASE WHEN p_size > 40 THEN 'Critical'
                WHEN p_size > 25 THEN 'High'
                WHEN p_size > 10 THEN 'Medium'
                ELSE 'Low' END AS size_bucket,
           COUNT(*) AS parts_cnt,
           ROUND(SUM(p_retailprice), 2) AS sum_price
    FROM part
    GROUP BY 1
    """,
    tags=("P9", "F14"),
)
def case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.withColumn(
            "size_bucket",
            bucketize("p_size", [(40, "Critical"), (25, "High"), (10, "Medium")], "Low"),
        )
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("parts_cnt"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# P8 — value normalization: CASE-chain variant and broadcast-join variant
# (reference country rename, process_covid_ods.py:42-59). Both registered;
# identical oracle proves they agree with each other too.
# ---------------------------------------------------------------------------

_NATION_MAPPING = {
    "UNITED STATES": "United States of America",
    "RUSSIA": "Russian Federation",
    "IRAN": "Iran, Islamic Rep.",
    "EGYPT": "Egypt, Arab Rep.",
    "VIETNAM": "Viet Nam",
    "UNITED KINGDOM": "United Kingdom of Great Britain",
}

_MAP_VALUES_ORACLE = """
SELECT CASE n_name
         WHEN 'UNITED STATES' THEN 'United States of America'
         WHEN 'RUSSIA' THEN 'Russian Federation'
         WHEN 'IRAN' THEN 'Iran, Islamic Rep.'
         WHEN 'EGYPT' THEN 'Egypt, Arab Rep.'
         WHEN 'VIETNAM' THEN 'Viet Nam'
         WHEN 'UNITED KINGDOM' THEN 'United Kingdom of Great Britain'
         ELSE n_name END AS nation_normalized,
       COUNT(*) AS customers_cnt
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


@register("map_values_case", _MAP_VALUES_ORACLE, tags=("P8",))
def map_values_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        dim_join(c, n, on=c.c_nationkey == n.n_nationkey, how="inner")
        .withColumn("nation_normalized", map_values("n_name", _NATION_MAPPING))
        .groupBy("nation_normalized")
        .agg(F.count(F.lit(1)).alias("customers_cnt"))
    )


@register("map_values_join", _MAP_VALUES_ORACLE, tags=("P8",))
def map_values_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = dim_join(c, n, on=c.c_nationkey == n.n_nationkey, how="inner")
    mapped = map_values_join(joined, "n_name", _NATION_MAPPING, out_col="nation_normalized")
    return mapped.groupBy("nation_normalized").agg(
        F.count(F.lit(1)).alias("customers_cnt")
    )


# ---------------------------------------------------------------------------
# J1 — composite-key LEFT join keeping unmatched rows with NULL key
# (fact build, process_covid_dds.py:60-64). Dim deliberately excludes one
# key value so some fact rows resolve NULL.
# ---------------------------------------------------------------------------


@register(
    "join_left_composite",
    """
    WITH dim AS (
      SELECT DISTINCT o_orderstatus AS d_status, o_orderpriority AS d_priority,
             sha256(upper(trim(o_orderstatus)) || o_orderpriority) AS status_key
      FROM orders WHERE o_orderstatus <> 'P'
    )
    SELECT o_orderkey, o_orderstatus, o_orderpriority, status_key
    FROM orders LEFT JOIN dim
      ON o_orderstatus = d_status AND o_orderpriority = d_priority
    """,
    tags=("J1", "F8"),
)
def join_left_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    dim = (
        distinct_rows(
            o.filter(F.col("o_orderstatus") != "P"),
            ["o_orderstatus", "o_orderpriority"],
        )
        .select(
            F.col("o_orderstatus").alias("d_status"),
            F.col("o_orderpriority").alias("d_priority"),
            surrogate_key("o_orderstatus", "o_orderpriority").alias("status_key"),
        )
    )
    joined = dim_join(
        o,
        dim,
        on=(o.o_orderstatus == dim.d_status) & (o.o_orderpriority == dim.d_priority),
        how="left",
    )
    return joined.select("o_orderkey", "o_orderstatus", "o_orderpriority", "status_key")


# ---------------------------------------------------------------------------
# J2/J3 — inner fact↔dim join + rollup (mart join, process_covid_data_mart.py:61).
# ---------------------------------------------------------------------------


@register(
    "join_fact_dim",
    """
    SELECT c_mktsegment, COUNT(*) AS orders_cnt,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS segment_sales
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("J2", "J3"),
    bench=True,
)
def join_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        dim_join(o, c, on=o.o_custkey == c.c_custkey, how="inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("orders_cnt"),
            # Decimal: thousands of rows per segment (queries_tpch.py note).
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("segment_sales"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — anti join (idempotency NOT EXISTS, alert_case_spike.sql:57-63).
# ---------------------------------------------------------------------------


@register(
    "anti_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995
    )
    """,
    tags=("J4",),
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Filtered to one order-year so the anti side is non-trivial (every
    # customer has *some* order in the synthetic data).
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(c, o, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "semi_join_suppliers",
    """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
    """,
    tags=("J4",),
)
def semi_join_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("s_suppkey"))
    return semi_join(s, li, ["s_suppkey"]).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# A2 — distinct projection (dim dedup, process_covid_dds.py:39).
# ---------------------------------------------------------------------------


@register(
    "distinct_dim",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    tags=("A2",),
)
def distinct_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_rows(table(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"])


# ---------------------------------------------------------------------------
# F8/F9 — sha2-256 surrogate key (process_covid_dds.py:35).
# ---------------------------------------------------------------------------


@register(
    "surrogate_key_dim",
    """
    SELECT sha256(upper(trim(n_name)) || CAST(n_regionkey AS VARCHAR)) AS location_key,
           n_name AS country_name, n_regionkey AS region_key
    FROM nation
    """,
    tags=("F8", "F9"),
)
def surrogate_key_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return n.select(
        surrogate_key("n_name", "n_regionkey").alias("location_key"),
        F.col("n_name").alias("country_name"),
        F.col("n_regionkey").alias("region_key"),
    )


# ---------------------------------------------------------------------------
# W2 — alert-policy lag: unclamped delta, first-row NULL filtered, threshold
# predicate, formatted description (alert_case_spike.sql:28-56 + F15).
# ---------------------------------------------------------------------------


@register(
    "window_lag_alert",
    """
    WITH hist AS (
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             o_totalprice,
             LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS prev_price
      FROM orders
    )
    SELECT o_custkey, o_orderkey, order_date,
           ROUND(o_totalprice - prev_price, 2) AS price_jump,
           printf('Spike of %.3f%% (order %s)',
                  (o_totalprice - prev_price) / prev_price * 100.0,
                  CAST(o_orderkey AS VARCHAR)) AS description
    FROM hist
    WHERE prev_price IS NOT NULL AND o_totalprice - prev_price > 400000
    """,
    tags=("W2", "F15"),
    bench=True,
)
def window_lag_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").withColumn(
        "order_date", F.to_date("o_orderdate")
    )
    hist = with_deltas(
        o,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        cols=["o_totalprice"],
        clamp=False,  # alert policy: no clamp (SURVEY.md §7.3)
        prev_suffix="_prev",
        delta_prefix="jump_",
    )
    return (
        hist.filter(
            F.col("o_totalprice_prev").isNotNull()
            & (F.col("jump_o_totalprice") > 400_000)
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "order_date",
            F.round("jump_o_totalprice", 2).alias("price_jump"),
            F.format_string(
                "Spike of %.3f%% (order %s)",
                F.col("jump_o_totalprice") / F.col("o_totalprice_prev") * 100.0,
                F.col("o_orderkey").cast("string"),
            ).alias("description"),
        )
    )


# ---------------------------------------------------------------------------
# F1 — multi-format timestamp parsing (process_covid_raw.py:47-51).
# Strings are derived from events.ts in two historical formats, then parsed
# back by the conform layer's coalesce chain.
# ---------------------------------------------------------------------------


@register(
    "timestamp_parse_multi",
    """
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 2 = 0
                  THEN strftime(ts, '%m/%d/%Y %H:%M')
                  ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_str
      FROM events
    )
    SELECT event_id,
           COALESCE(try_strptime(ts_str, '%Y-%m-%d %H:%M:%S'),
                    try_strptime(ts_str, '%m/%d/%Y %H:%M')) AS parsed_ts
    FROM raw
    """,
    tags=("F1",),
)
def timestamp_parse_multi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_data_pipeline_spark.functions.conform import parse_timestamp_multi

    e = table(spark, sf_dir, "events")
    raw = e.select(
        "event_id",
        F.when(
            F.col("event_id") % 2 == 0, F.date_format("ts", "MM/dd/yyyy HH:mm")
        )
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .alias("ts_str"),
    )
    return raw.select(
        "event_id",
        parse_timestamp_multi(
            "ts_str", formats=("M/d/yyyy H:mm", "yyyy-MM-dd HH:mm:ss")
        ).alias("parsed_ts"),
    )


# ---------------------------------------------------------------------------
# F6/F7 — regexp_extract + date derivation (process_covid_ods.py:32-35).
# ---------------------------------------------------------------------------


@register(
    "regexp_extract_props",
    r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k_value,
           CAST(ts AS DATE) AS event_date
    FROM events
    """,
    tags=("F6", "F7"),
)
def regexp_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k_value"),
        F.to_date("ts").alias("event_date"),
    )


# ---------------------------------------------------------------------------
# F10/F12 — year() + per-100k style ratio metrics (process_covid_dds.py:56,
# process_covid_data_mart.py:85-88).
# ---------------------------------------------------------------------------


@register(
    "year_ratio_metrics",
    """
    WITH yearly AS (
      SELECT year(o_orderdate) AS order_year,
             COUNT(*) AS orders_cnt,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS fulfilled_cnt
      FROM orders GROUP BY 1
    )
    SELECT order_year, orders_cnt,
           CAST(ROUND(CAST(fulfilled_cnt AS DOUBLE) / orders_cnt * 100000, 0) AS BIGINT)
             AS fulfilled_per_100k,
           CASE WHEN orders_cnt > 0
                THEN ROUND(CAST(fulfilled_cnt AS DOUBLE) / orders_cnt * 100, 2) END
             AS fulfilled_rate_percent
    FROM yearly
    """,
    tags=("F10", "F11", "F12"),
)
def year_ratio_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.lit(1)).alias("orders_cnt"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "fulfilled_cnt"
        ),
    )
    return yearly.select(
        "order_year",
        "orders_cnt",
        per_100k("fulfilled_cnt", "orders_cnt").alias("fulfilled_per_100k"),
        rate_percent("fulfilled_cnt", "orders_cnt").alias("fulfilled_rate_percent"),
    )


# ---------------------------------------------------------------------------
# §2.6 extension — global top-k and per-group top-k (engine primitives the
# similarity operators reuse; not in the reference, marked as extensions).
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("O-ext",),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
    tags=("O-ext", "W-ext"),
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = dim_join(o, c, on=o.o_custkey == c.c_custkey, how="inner")
    return top_k_per_group(
        joined,
        partition_by=["c_mktsegment"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select("c_mktsegment", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# §2.7 — set operations (absent from the reference; engine exposes
# unionByName for multi-epoch ingestion).
# ---------------------------------------------------------------------------


@register(
    "union_by_name",
    """
    SELECT c_custkey, c_mktsegment, 'automobile' AS cohort FROM customer
    WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'building' AS cohort FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("U-ext",),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_mktsegment", F.lit("automobile").alias("cohort")
    )
    # Deliberately different column order on the second branch: unionByName
    # resolves by name, the engine's multi-epoch ingestion contract.
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.lit("building").alias("cohort"), "c_custkey", "c_mktsegment"
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# W-ext — running cumulative sum (rows-frame window; the inverse of the
# reference's delta computation, used by its property-based test plan).
# ---------------------------------------------------------------------------


@register(
    "running_total",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS lifetime_value
    FROM orders
    """,
    tags=("W-ext",),
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("lifetime_value"),
    )


@register(
    "customers_masked_egress",
    """
    SELECT c_custkey,
           sha256(c_name) AS c_name,
           repeat('*', GREATEST(LENGTH(CAST(c_acctbal AS VARCHAR)) - 4, 0))
             || CASE WHEN LENGTH(CAST(c_acctbal AS VARCHAR)) >= 4
                     THEN RIGHT(CAST(c_acctbal AS VARCHAR), 4)
                     ELSE CAST(c_acctbal AS VARCHAR) END AS c_acctbal,
           CAST(NULL AS BIGINT) AS c_nationkey,
           c_mktsegment
    FROM customer
    """,
    tags=("core", "governance", "masking"),
)
def customers_masked_egress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed egress view of the customer dim
    (`operators/quality.py::mask_columns`): name hashed to a stable
    irreversible token (still joinable/groupable), account balance
    display-masked to its last 4 characters, nation NULLed outright,
    segment passed through. Pure projection — the masked view of a
    100 TB table costs only what the consumer's query costs."""
    from covid_data_pipeline_spark.operators.quality import mask_columns

    c = table(spark, sf_dir, "customer")
    return mask_columns(
        c,
        {
            "c_name": "hash",
            "c_acctbal": "last4",
            "c_nationkey": "null",
        },
    ).select("c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment")


@register(
    "customers_k_anonymity",
    """
    WITH ka AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             CAST(COUNT(*) AS BIGINT) AS class_size
      FROM customer GROUP BY 1, 2),
    kt AS (SELECT CAST(SUM(class_size) AS BIGINT) AS total FROM ka)
    SELECT ka.nationkey, ka.mktsegment, ka.class_size,
           ka.class_size < 10 AS below_k,
           ROUND(CAST(ka.class_size AS DOUBLE) / kt.total, 6)
             AS population_share
    FROM ka CROSS JOIN kt
    """,
    tags=("core", "privacy", "governance"),
)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer quasi-identifier tuple
    (nationkey, mktsegment): every equivalence class with its size,
    share, and a below-k flag (k=10) — the re-identification risk
    report a governance gate runs BEFORE an egress like
    customers_masked_egress ships data (classes below k need
    suppression or generalization; Sweeney 2002). One map-side-
    combinable rollup plus a broadcast scalar — the audit costs one
    shuffle at any table size."""
    c = table(spark, sf_dir, "customer")
    ka = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    kt = ka.agg(F.sum("class_size").alias("total"))
    # bcast: const(1) scalar total agg
    return ka.crossJoin(F.broadcast(kt)).select(
        "nationkey",
        "mktsegment",
        "class_size",
        (F.col("class_size") < 10).alias("below_k"),
        F.round(
            F.col("class_size").cast("double") / F.col("total"), 6
        ).alias("population_share"),
    )


@register(
    "customers_l_diversity",
    """
    WITH cls AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             CAST(FLOOR(c_acctbal / 2500.0) AS BIGINT) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2, 3),
    ent AS (
      SELECT nationkey, mktsegment,
             CAST(SUM(c) AS BIGINT) AS class_size,
             CAST(COUNT(*) AS BIGINT) AS distinct_sensitive,
             CAST(SUM(c * CAST(ROUND(ln(c) * 1e6, 0) AS BIGINT))
                  AS BIGINT) AS sum_clnc_micro
      FROM cls GROUP BY 1, 2)
    SELECT nationkey, mktsegment, class_size, distinct_sensitive,
           ROUND(exp(CAST(class_size
                            * CAST(ROUND(ln(class_size) * 1e6, 0) AS BIGINT)
                          - sum_clnc_micro AS DOUBLE)
                     / (class_size * 1e6)), 4) AS entropy_l,
           (class_size * CAST(ROUND(ln(class_size) * 1e6, 0) AS BIGINT)
            - sum_clnc_micro) >= class_size * 693147 AS meets_l2
    FROM ent
    """,
    tags=("core", "privacy", "governance"),
)
def customers_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy l-diversity audit (Machanavajjhala et al. 2007) — the
    gate AFTER customers_k_anonymity: a class can be large (k-anonymous)
    yet leak the sensitive attribute if everyone in it shares one value.
    Per quasi-identifier class (nationkey, mktsegment) over the
    sensitive balance bucket: entropy-l = exp(H) of the in-class value
    distribution, plus a meets-l2 flag.

    Exactness (the dim-MI / DSIR micro-nat construction): per-bucket
    terms c·round(ln(c)·1e6) are exact BIGINTs, n·H in micro-nats is
    n·ln_micro(n) − Σ c·ln_micro(c) — pure integer arithmetic — and the
    l≥2 flag compares that integer against n·693147 (micro-nats of
    ln 2, a shared literal), so the verdict is hash-exact; exp() only
    renders the ROUND(4) display column. One rollup + one regroup,
    both map-side combinable."""
    c = table(spark, sf_dir, "customer")
    lnr = lambda col: F.round(F.log(col.cast("double")) * 1e6, 0).cast(  # noqa: E731
        "long"
    )
    cls = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.floor(F.col("c_acctbal") / 2500.0).cast("long").alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).alias("c"))
    ent = cls.groupBy("nationkey", "mktsegment").agg(
        F.sum("c").alias("class_size"),
        F.count(F.lit(1)).alias("distinct_sensitive"),
        F.sum(F.col("c") * lnr(F.col("c"))).alias("sum_clnc_micro"),
    )
    nh_micro = (
        F.col("class_size") * lnr(F.col("class_size"))
        - F.col("sum_clnc_micro")
    )
    return ent.select(
        "nationkey",
        "mktsegment",
        "class_size",
        "distinct_sensitive",
        F.round(
            F.exp(
                nh_micro.cast("double") / (F.col("class_size") * 1e6)
            ),
            4,
        ).alias("entropy_l"),
        (nh_micro >= F.col("class_size") * 693147).alias("meets_l2"),
    )


@register(
    "customers_t_closeness",
    """
    WITH tc_cb AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             CAST(FLOOR(c_acctbal / 2500.0) AS BIGINT) AS bal_bucket,
             CAST(COUNT(*) AS HUGEINT) AS ncb
      FROM customer GROUP BY 1, 2, 3),
    tc_cls AS (SELECT nationkey, mktsegment, SUM(ncb) AS nc
               FROM tc_cb GROUP BY 1, 2),
    tc_bk AS (SELECT bal_bucket, SUM(ncb) AS nb FROM tc_cb GROUP BY 1),
    tc_tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m, SUM(nb) AS n
               FROM tc_bk),
    tc_grid AS (
      SELECT c.nationkey, c.mktsegment, b.bal_bucket, c.nc, b.nb, t.m, t.n,
             COALESCE(x.ncb, 0) AS ncb
      FROM tc_cls c CROSS JOIN tc_bk b CROSS JOIN tc_tot t
      LEFT JOIN tc_cb x ON x.nationkey = c.nationkey
                       AND x.mktsegment = c.mktsegment
                       AND x.bal_bucket = b.bal_bucket),
    tc_cum AS (
      SELECT nationkey, mktsegment, nc, m, n,
             SUM(ncb * n - nb * nc) OVER (
               PARTITION BY nationkey, mktsegment ORDER BY bal_bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM tc_grid),
    tc_agg AS (
      SELECT nationkey, mktsegment, MAX(nc) AS class_size,
             SUM(ABS(cum)) AS emd_scaled, MAX(m) AS m, MAX(n) AS n
      FROM tc_cum GROUP BY 1, 2)
    SELECT nationkey, mktsegment, CAST(class_size AS BIGINT) AS class_size,
           (ROUND(CAST(emd_scaled AS DOUBLE)
                  / CAST((m - 1) * class_size * n AS DOUBLE), 6) + 0) AS emd,
           emd_scaled * 5 <= (m - 1) * class_size * n AS meets_t
    FROM tc_agg
    """,
    tags=("core", "privacy", "governance"),
)
def customers_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the third rung of the disclosure ladder after customers_k_anonymity
    and customers_l_diversity: a class can be large AND entropy-diverse
    while its sensitive distribution still deviates sharply from the
    population's (which is exactly what an attacker learns). Per
    quasi-identifier class (nationkey, mktsegment) over the ordered
    balance buckets: unit-ground-distance EMD = mean |cumulative
    probability difference|, exact-integer scaled by class_size x N
    (`operators/privacy.py::t_closeness`), with the t<=1/5 verdict an
    integer comparison and only the ROUND(6) display column float."""
    from covid_data_pipeline_spark.operators.privacy import t_closeness

    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.floor(F.col("c_acctbal") / 2500.0).cast("long").alias("bal_bucket"),
    )
    return t_closeness(
        c, ["nationkey", "mktsegment"], "bal_bucket", t_num=1, t_den=5
    )


_FD_CANDIDATES = [
    (("l_orderkey",), "l_returnflag"),
    (("l_orderkey",), "l_linestatus"),
    (("l_partkey",), "l_suppkey"),
    (("l_orderkey", "l_linenumber"), "l_quantity"),
]


def _fd_oracle_sql() -> str:
    parts = []
    for lhs, rhs in _FD_CANDIDATES:
        lhs_sql = ", ".join(lhs)
        name = f"{','.join(lhs)} -> {rhs}"
        parts.append(f"""
    SELECT '{name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(SUM(nrows - maj) AS BIGINT) AS violating_rows,
           MAX(nv) <= 1 AS holds
    FROM (
      SELECT {lhs_sql}, COUNT(*) AS nv, SUM(c) AS nrows, MAX(c) AS maj
      FROM (SELECT {lhs_sql}, {rhs}, COUNT(*) AS c
            FROM lineitem GROUP BY {lhs_sql}, {rhs}) p
      GROUP BY {lhs_sql}) g""")
    return "\nUNION ALL\n".join(parts)


@register(
    "lineitem_fd_profile",
    _fd_oracle_sql(),
    tags=("core", "quality", "profiling", "fd"),
)
def lineitem_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (`operators/quality.py::fd_profile`,
    the TANE/Deequ-style profiling primitive): four candidate FDs over
    lineitem with their exact g3 violation costs — n_groups,
    violating groups, and the minimum row deletions that would repair
    the dependency (rows beyond each group's majority value). The
    composite order-line key holds; the three non-keys are genuinely
    violated, so the counts are non-trivial data, not zeros. Per FD:
    one (lhs, rhs) rollup + one lhs regroup, both map-side combinable
    — profiling a 100 TB table costs one shuffle per candidate, never
    a sort or a collect."""
    from covid_data_pipeline_spark.operators.quality import fd_profile

    li = table(spark, sf_dir, "lineitem")
    return fd_profile(li, _FD_CANDIDATES)
