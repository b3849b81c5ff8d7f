"""TPC-H-flavored analytics pack over the star schema — the classic
multi-join aggregate shapes (Q3 / Q5 / Q10 analogues, adapted to the
testdata's columns) an interactive consumer runs against the engine.
Every query carries a DuckDB oracle; all joins follow the engine's
dim-broadcast posture with Catalyst free to reorder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.scalar import round_stable
from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.harness.tables import dim_count
from covid_data_pipeline_spark.operators.relational import size_gated_broadcast


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) > DATE '1997-01-01'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    """,
    tags=("tpch", "q3"),
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1997-01-01").cast("date")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(
            # Decimal arithmetic: exact, summation-order-independent —
            # penny-stable across engines where double sums are not.
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select("o_orderkey", "revenue", "order_date")
    )


@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE s.s_nationkey = c.c_nationkey
      AND r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    tags=("tpch", "q5"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: the 6-way join with the 'local supplier' theta condition
    (supplier nation = customer nation) on top of the equi-joins."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        # bcast: const(25) nation dim
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        # bcast: const(5) region dim
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           ROUND(MAX(c.c_acctbal), 2) + 0 AS acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
    tags=("tpch", "q10"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        # bcast: const(25) nation dim
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            round_stable(F.max("c_acctbal"), 2).alias("acctbal"),
        )
    )


@register(
    "tpch_q6_revenue_forecast",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    tags=("tpch", "q6"),
    bench=True,
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-filter-aggregate, zero joins — the canonical
    predicate-pushdown / column-pruning showcase (reads 4 of 11 lineitem
    columns; all four predicates reach the parquet scan). At 100 TB this
    is the query where pushdown is the entire game: a full-width scan
    would read ~25x the bytes."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * F.col("l_discount").cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "q4"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS decorrelated to a LEFT SEMI join whose condition
    spans both sides (late shipment: l_shipdate > o_orderdate + 60 days
    stands in for the reference schema's commit/receipt lag). The date
    filter on orders prunes before the shuffle; the semi join keeps the
    probe side narrow (no lineitem columns survive)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = (li["l_orderkey"] == o["o_orderkey"]) & (
        F.to_date(li["l_shipdate"]) > F.date_add(F.to_date(o["o_orderdate"]), 60)
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q12_priority_shipping",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY l.l_linestatus
    """,
    tags=("tpch", "q12"),
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact-to-fact equi-join + conditional aggregation
    (l_linestatus stands in for l_shipmode, absent from the testdata).
    Both CASE branches fold into one pass; map-side partial aggregation
    shrinks the shuffle to |groups| x 2 counters per task."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    """
    SELECT CAST(ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE),
             4) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
    """,
    tags=("tpch", "q14"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: month-sliced fact scan, broadcast join to part, global
    conditional-revenue ratio. Both sums use exact decimal arithmetic so
    the ratio is bit-identical across engines; the division happens once,
    in double, after the sums are closed."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        # bcast: gated part dim (SF-scaled; metadata-count bound)
        li.join(size_gated_broadcast(p, dim_count(spark, sf_dir, "part")), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           ROUND(o.o_totalprice, 2) AS total_price,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE),
             ROUND(o.o_totalprice, 2)
    """,
    tags=("tpch", "q18"),
    bench=True,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-filtered aggregate used as a semi-filter, then a
    re-join to the fact for the detail rows. The `big` aggregate reduces
    lineitem to a narrow key list BEFORE the 3-way join — at 100 TB the
    key list is small enough for AQE to flip the join to broadcast, so
    the expensive join only ever sees qualifying orders. l_quantity sums
    are integers stored as double, so SUM is exact on both engines."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big.withColumnRenamed("l_orderkey", "_bigkey"), F.col("_bigkey") == o.o_orderkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "q19"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate spanning both join sides. Catalyst
    derives the single-side implications (p_brand IN (...), p_size <= 35,
    l_quantity BETWEEN 1 AND 40) and pushes them below the broadcast
    join, so the scan skips non-qualifying row groups even though the
    full predicate needs both tables."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    # bcast: gated part dim (SF-scaled; metadata-count bound)
    j = li.join(size_gated_broadcast(p, dim_count(spark, sf_dir, "part")), p.p_partkey == li.l_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# Round 2: the rest of the TPC-H pack (Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/
# Q20/Q21/Q22; Q1 is `sql_pricing_summary`). The testdata has no partsupp
# table and no l_commitdate/l_receiptdate, so queries that need them are
# adapted to shape-faithful analogues over lineitem (each docstring says
# exactly how). All carry DuckDB oracles.
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DOUBLE)
                 / (100.0 * l_quantity)) AS unit_price
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT o.l_partkey, o.unit_price, s.s_name, s.s_acctbal, n.n_name
      FROM offers o
      JOIN supplier s ON s.s_suppkey = o.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name,
           ROUND(e.s_acctbal, 2) + 0 AS acctbal,
           e.unit_price
    FROM part p
    JOIN eligible e ON e.l_partkey = p.p_partkey
    WHERE p.p_size = 15
      AND e.unit_price = (
        SELECT MIN(e2.unit_price) FROM eligible e2
        WHERE e2.l_partkey = p.p_partkey
      )
    """,
    tags=("tpch", "q2"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: cheapest-supplier-per-part via a correlated scalar MIN,
    restricted to one region. Adapted: no partsupp table in the testdata,
    so the "offer" is the minimum observed unit price per (part, supplier)
    in lineitem instead of ps_supplycost. The unit price is derived in
    exact integer cents with a single IEEE division (never re-rounded),
    so both engines produce bit-identical doubles — rounding the quotient
    instead hits genuine decimal ties (ext*1e4/qty can be a half-integer)
    that DuckDB and Spark break differently. The correlated subquery
    decorrelates to a window MIN over part — one shuffle on l_partkey,
    ties (all suppliers at the min) kept, matching the SQL. At scale the
    offers aggregate is the only fact-sized shuffle; supplier/nation/
    region are broadcast."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").cast("double")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents / (F.lit(100.0) * F.col("l_quantity"))).alias("unit_price")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        offers.join(s, offers.l_suppkey == s.s_suppkey)
        # bcast: const(25) nation dim
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        # bcast: const(5) region dim
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "unit_price", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    best = eligible.withColumn("_min_price", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("_min_price")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        # bcast: gated part dim (SF-scaled; metadata-count bound)
        size_gated_broadcast(p, dim_count(spark, sf_dir, "part"))
        .join(best, p.p_partkey == best.l_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            round_stable("s_acctbal", 2).alias("acctbal"),
            "unit_price",
        )
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS INTEGER) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_9')
          OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_7'))
        AND CAST(l.l_shipdate AS DATE)
              BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "q7"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by year —
    the double-nation-join (n1 on supplier, n2 on customer) with the
    symmetric OR predicate. Both nation joins broadcast; Catalyst pushes
    the derived IN ('NATION_7','NATION_9') filters into each broadcast
    build side, so the fact join only keeps rows from the two nations."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_9")
    ) | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_7"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        # bcast: const(25) nation dim
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        # bcast: const(25) nation dim
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           CAST(ROUND(
             CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND CAST(o.o_orderdate AS DATE)
              BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "q8"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — supplier-nation's slice of the
    region's order volume per year, the 8-way join with two roles for
    nation. The conditional numerator and the denominator ride one
    aggregation pass (no second scan); decimal sums close before the one
    double division."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        # bcast: gated part dim (SF-scaled; metadata-count bound)
        size_gated_broadcast(p, dim_count(spark, sf_dir, "part"))
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        # bcast: const(25) nation dim
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        # bcast: const(5) region dim
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        # bcast: const(25) nation dim
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double"),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    """
    SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
               - CAST(ROUND(p.p_retailprice * 0.4, 2) AS DECIMAL(18,4))
                 * CAST(l.l_quantity AS DECIMAL(18,4)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "q9"),
    bench=True,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and year.
    Adapted: no partsupp, so supply cost is a deterministic stand-in —
    40% of p_retailprice, pre-rounded to cents (p_retailprice has one
    decimal and 0.4*digit never lands on a rounding tie, so both engines
    agree bit-for-bit). All arithmetic closes in decimal before the final
    round. The part filter (LIKE '%widget%') broadcasts; lineitem is the
    only fact-sized input."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    ) - F.round(F.col("p_retailprice") * F.lit(0.4), 2).cast("decimal(18,4)") * F.col(
        "l_quantity"
    ).cast("decimal(18,4)")
    return (
        # bcast: gated part dim (SF-scaled; metadata-count bound)
        size_gated_broadcast(p, dim_count(spark, sf_dir, "part"))
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        # bcast: const(25) nation dim
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
    )


@register(
    "tpch_q11_important_parts",
    """
    WITH value_per_part AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT p_partkey, CAST(ROUND(part_value, 2) AS DOUBLE) AS part_value
    FROM value_per_part
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM value_per_part)
    """,
    tags=("tpch", "q11"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts representing an outsized share of one nation's
    flow — a grouped aggregate filtered against a scalar fraction of the
    global total. Adapted: value is shipped l_extendedprice instead of
    ps_supplycost*ps_availqty (no partsupp). The scalar lands via a
    broadcast cross-join (one row), so the per-part relation is computed
    once and streamed; decimal comparison is exact on both engines."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    vpp = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        # bcast: const(25) nation dim (filtered)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("part_value"))
    )
    total = vpp.agg(
        (F.sum("part_value") * F.lit("0.001").cast("decimal(8,3)")).alias("_threshold")
    )
    return (
        # bcast: const(1) scalar threshold agg
        vpp.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_threshold"))
        .select(
            "p_partkey", F.round("part_value", 2).cast("double").alias("part_value")
        )
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "q13"),
    bench=True,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: order-count histogram over customers, including the
    zero bucket — LEFT JOIN with an extra join-side predicate (priority
    filter standing in for the reference's comment NOT LIKE), then a
    count-of-counts. COUNT(o_orderkey) counts only matched rows, so
    never-ordered customers land in c_count=0. Two shuffles total
    (custkey, then c_count); both carry pre-aggregated rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "q15"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the view-backed top-supplier query — quarterly revenue
    per supplier, keep the max (ties included). The reference SQL uses a
    CREATE VIEW; here the CTE/DataFrame plays that role. Decimal revenue
    makes the equality-to-MAX comparison exact (a double sum could miss
    the max by an ULP on a different partitioning). Scalar max broadcasts;
    the revenue aggregate is computed once per side thanks to exchange
    reuse at equal plan subtrees."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    s = table(spark, sf_dir, "supplier")
    return (
        # bcast: const(1) scalar max agg
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        # bcast: gated supplier dim (SF-scaled; metadata-count bound)
        .join(size_gated_broadcast(s, dim_count(spark, sf_dir, "supplier")), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q16_supplier_part_count",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "q16"),
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: how many suppliers can furnish each niche part class,
    excluding a blacklist via NOT IN. Adapted: lineitem is the
    part-supplier bridge (no partsupp), and low s_acctbal stands in for
    the complaint-comment blacklist. NOT IN compiles to a broadcast
    LEFT ANTI join (safe: s_suppkey is non-null); COUNT(DISTINCT) runs
    as the standard two-phase expand/aggregate."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    blacklist = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    return (
        # bcast: gated supplier dim (SF-scaled; metadata-count bound)
        li.join(size_gated_broadcast(blacklist, dim_count(spark, sf_dir, "supplier")), li.l_suppkey == blacklist.s_suppkey, "left_anti")
        # bcast: gated part dim (SF-scaled; metadata-count bound)
        .join(size_gated_broadcast(p, dim_count(spark, sf_dir, "part")), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT CAST(ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                      / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.2 * t.avg_qty
    """,
    tags=("tpch", "q17"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small orders — the correlated
    AVG-per-part subquery, decorrelated into a grouped aggregate joined
    back on partkey (no p_container in the testdata, so the brand filter
    alone selects the slice). l_quantity is integer-valued, so the double
    AVG is exact (sum < 2^53) and the 0.2*avg threshold compares
    identically on both engines. The AVG aggregate shuffles on l_partkey
    once; the brand-filtered part dim broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        # bcast: gated part dim (SF-scaled; metadata-count bound)
        li.join(size_gated_broadcast(p, dim_count(spark, sf_dir, "part")), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / F.lit(7.0),
                2,
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q20_excess_shippers",
    """
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    excess AS (
      SELECT l_suppkey FROM (
        SELECT l_suppkey, qty,
               SUM(qty) OVER (PARTITION BY l_partkey) AS part_total
        FROM shipped
      ) t WHERE qty > 0.3 * part_total
    )
    SELECT s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 2) + 0 AS acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
    """,
    tags=("tpch", "q20"),
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding an outsized share of a part family's
    flow — the nested-IN pipeline. Adapted: "excess" is >30% of the
    part's shipped quantity in the year (no ps_availqty). The inner
    grouped aggregate + window share computation stays fact-side; the
    final IN collapses to a LEFT SEMI join against the (tiny) supplier
    dim. Quantity sums are integer-exact in double."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        # bcast: gated part dim (SF-scaled; metadata-count bound)
        li.join(size_gated_broadcast(p, dim_count(spark, sf_dir, "part")), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        shipped.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") > F.lit(0.3) * F.col("part_total"))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", round_stable("s_acctbal", 2).alias("acctbal")
    )


@register(
    "tpch_q21_waiting_suppliers",
    """
    WITH f_orders AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate
      FROM orders WHERE o_orderstatus = 'F'
    ),
    marked AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN CAST(l.l_shipdate AS DATE) > o.odate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l
      JOIN f_orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    order_stats AS (
      SELECT l_orderkey, COUNT(*) AS nsupp, SUM(is_late) AS nlate
      FROM marked GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM marked m
    JOIN order_stats os ON os.l_orderkey = m.l_orderkey
    JOIN supplier s ON s.s_suppkey = m.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE m.is_late = 1 AND os.nsupp >= 2 AND os.nlate = 1
      AND n.n_name = 'NATION_3'
    GROUP BY s.s_name
    """,
    tags=("tpch", "q21"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the sole supplier who held up a multi-supplier order —
    the EXISTS / NOT EXISTS double correlation. Adapted: "late" is
    l_shipdate > o_orderdate + 90 days (no commit/receipt dates), and
    the two correlated existentials are decorrelated into one per-order
    aggregate (nsupp≥2 ⟺ EXISTS another supplier; nlate=1 with this
    supplier late ⟺ NOT EXISTS another late one). Counted per
    (supplier, order) pair rather than per line — the docstring contract
    both engines implement. One shuffle on orderkey feeds both the
    per-supplier mark and the per-order stats."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    late = (
        F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 90)
    ).cast("int")
    marked = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    order_stats = marked.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.count("*").alias("nsupp"), F.sum("is_late").alias("nlate")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        marked.join(order_stats, marked.l_orderkey == F.col("os_orderkey"))
        .filter((F.col("is_late") == 1) & (F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        # bcast: gated supplier dim (SF-scaled; metadata-count bound)
        .join(size_gated_broadcast(s, dim_count(spark, sf_dir, "supplier")), marked.l_suppkey == s.s_suppkey)
        # bcast: const(25) nation dim
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q22_sales_opportunity",
    """
    WITH pool AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_nationkey IN (3, 6, 9, 12, 15)
    ),
    thr AS (
      SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM pool WHERE bal > 0
    )
    SELECT p.c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(ROUND(SUM(p.bal), 2) AS DOUBLE) AS totacctbal
    FROM pool p, thr
    WHERE p.bal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey)
    GROUP BY p.c_nationkey
    """,
    tags=("tpch", "q22"),
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: rich, dormant customers by country — scalar-average
    threshold plus NOT EXISTS against orders. Adapted: c_nationkey
    stands in for the phone-prefix country code. The threshold is
    computed as exact-decimal sum / count with ONE double division, so
    both engines derive bit-identical cutoffs (a naive double AVG would
    be summation-order dependent). NOT EXISTS is a LEFT ANTI join on
    custkey; the scalar broadcasts."""
    pool = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(3, 6, 9, 12, 15))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    thr = pool.filter(F.col("bal") > 0).agg(
        (F.sum("bal").cast("double") / F.count("*")).alias("avg_bal")
    )
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        # bcast: const(1) scalar avg agg
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("bal") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("bal"), 2).cast("double").alias("totacctbal"),
        )
    )
