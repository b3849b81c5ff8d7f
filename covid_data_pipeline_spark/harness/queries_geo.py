"""Spatial queries: grid density, radius joins, kNN, DBSCAN.

The reference lands point coordinates (`Lat`, `Long_` —
`airflow/dags/scripts/process_covid_raw.py:12-13`) but only passes them
through; these queries give the engine first-class spatial compute
over point columns (`operators/geo.py`).

The testdata has no coordinate column, so each query derives a
deterministic point per customer from the portable md5 hash
(`operators/dedup.portable_hash31`) — integer micro-degrees in a
0.2 deg x 0.2 deg box. Both engines derive the SAME points from the
same table, so the oracle verifies the whole pipeline including the
derivation. All spatial math is BIGINT-exact (squared planar
micro-degree distances — see the module docstring of
`operators/geo.py` for the geodesic note), so no float policy is
needed anywhere in this file.

Oracles are the INDEPENDENT quadratic form (brute-force distance
cross-join, plus a recursive-CTE closure for DBSCAN) — a different
algorithm than the engine's cell-bucketed joins, which is exactly what
makes the equality check meaningful. Quadratic stays feasible because
the oracle only ever runs at sf<=0.01 (1,500 points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.operators.dedup import portable_hash31
from covid_data_pipeline_spark.operators.geo import (
    cell_density,
    dbscan,
    nearest_neighbors,
    radius_pairs,
)

# 0.2-degree box in micro-degrees; radius/eps sized so sf0.01's 1,500
# customers yield ~2,200 radius pairs and a 431-core / 124-cluster
# DBSCAN (measured) — dense enough to exercise every code path, sparse
# enough that the brute oracle is trivial.
_BOX = 200_001
_RADIUS = 5_000
_EPS = 4_000
_MIN_PTS = 4


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic point per customer: md5-derived integer
    micro-degrees, salted per axis so x and y are independent."""
    c = table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    return c.select(
        "c_custkey",
        (portable_hash31(F.concat(F.lit("lat:"), key)) % _BOX).alias("x_udeg"),
        (portable_hash31(F.concat(F.lit("lon:"), key)) % _BOX).alias("y_udeg"),
    )


# Shared oracle CTE: the same derivation in DuckDB SQL (md5-prefix
# parse, Mersenne-31 fold, box modulo — all signed-64 exact).
_PTS_SQL = f"""
pts AS (
  SELECT c_custkey,
    CAST(concat('0x', substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 15))
         AS BIGINT) % 2147483647 % {_BOX} AS x_udeg,
    CAST(concat('0x', substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 15))
         AS BIGINT) % 2147483647 % {_BOX} AS y_udeg
  FROM customer)
"""


@register(
    "geo_cell_density",
    f"""
    WITH {_PTS_SQL}
    SELECT x_udeg // {_RADIUS} AS cell_x, y_udeg // {_RADIUS} AS cell_y,
           COUNT(*) AS n_points,
           MIN(x_udeg) AS x_lo, MAX(x_udeg) AS x_hi,
           MIN(y_udeg) AS y_lo, MAX(y_udeg) AS y_hi
    FROM pts GROUP BY 1, 2
    """,
    tags=("geo", "layout"),
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell point counts and coordinate extents
    (`operators/geo.py::cell_density`) — the zone-map view of a point
    table. One map-side-combining aggregation over |points| rows; at
    100 TB the output is bounded by |occupied cells|, not |points|."""
    return cell_density(
        _points(spark, sf_dir), "x_udeg", "y_udeg", cell_size=_RADIUS
    )


@register(
    "geo_radius_pairs",
    f"""
    WITH {_PTS_SQL}
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           (a.x_udeg - b.x_udeg) * (a.x_udeg - b.x_udeg)
           + (a.y_udeg - b.y_udeg) * (a.y_udeg - b.y_udeg) AS dist2
    FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
    WHERE (a.x_udeg - b.x_udeg) * (a.x_udeg - b.x_udeg)
          + (a.y_udeg - b.y_udeg) * (a.y_udeg - b.y_udeg)
          <= {_RADIUS * _RADIUS}
    """,
    tags=("geo", "join"),
    bench=True,
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 5,000 micro-degrees
    (`operators/geo.py::radius_pairs`): 3x3 neighbor-cell explode +
    cell equi-join + exact BIGINT distance check — linear candidate
    mass at constant density, where the oracle's brute form is
    quadratic. Each unordered pair emitted exactly once with no
    distinct (exploded-side < home-side id filter)."""
    return radius_pairs(
        _points(spark, sf_dir), "c_custkey", "x_udeg", "y_udeg",
        radius=_RADIUS,
    )


@register(
    "geo_nearest_neighbor",
    f"""
    WITH {_PTS_SQL},
    cand AS (
      SELECT a.c_custkey AS c_custkey, b.c_custkey AS id_b,
             (a.x_udeg - b.x_udeg) * (a.x_udeg - b.x_udeg)
             + (a.y_udeg - b.y_udeg) * (a.y_udeg - b.y_udeg) AS dist2
      FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey
      WHERE (a.x_udeg - b.x_udeg) * (a.x_udeg - b.x_udeg)
            + (a.y_udeg - b.y_udeg) * (a.y_udeg - b.y_udeg)
            <= {_RADIUS * _RADIUS})
    SELECT c_custkey, rank, id_b AS neighbor_id, dist2 FROM (
      SELECT c_custkey, id_b, dist2,
             CAST(row_number() OVER (
               PARTITION BY c_custkey ORDER BY dist2 ASC, id_b ASC
             ) AS INTEGER) AS rank
      FROM cand)
    WHERE rank <= 2
    """,
    tags=("geo", "knn"),
)
def geo_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 nearest neighbors within the radius for every customer
    point (`operators/geo.py::nearest_neighbors`). Deterministic tie
    break on neighbor id; the ranking window partitions per point, so
    no global sort — each point ranks only its own bounded candidate
    list."""
    return nearest_neighbors(
        _points(spark, sf_dir), "c_custkey", "x_udeg", "y_udeg",
        radius=_RADIUS, k=2,
    )


@register(
    "geo_dbscan_clusters",
    f"""
    WITH RECURSIVE {_PTS_SQL},
    nc AS (
      SELECT a.c_custkey AS k, COUNT(*) AS n_in_eps
      FROM pts a JOIN pts b
        ON (a.x_udeg - b.x_udeg) * (a.x_udeg - b.x_udeg)
           + (a.y_udeg - b.y_udeg) * (a.y_udeg - b.y_udeg)
           <= {_EPS * _EPS}
      GROUP BY 1),
    core AS (SELECT k FROM nc WHERE n_in_eps >= {_MIN_PTS}),
    e AS (
      SELECT a.c_custkey AS s, b.c_custkey AS d
      FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey
      JOIN core ca ON ca.k = a.c_custkey
      JOIN core cb ON cb.k = b.c_custkey
      WHERE (a.x_udeg - b.x_udeg) * (a.x_udeg - b.x_udeg)
            + (a.y_udeg - b.y_udeg) * (a.y_udeg - b.y_udeg)
            <= {_EPS * _EPS}),
    reach(node, r) AS (
      SELECT k, k FROM core
      UNION
      SELECT reach.node, e.d FROM reach JOIN e ON e.s = reach.r),
    comp AS (SELECT node, MIN(r) AS c FROM reach GROUP BY node),
    core_lab AS (
      SELECT node AS c_custkey, 'core' AS role, c AS cluster_id FROM comp),
    border AS (
      SELECT a.c_custkey, 'border' AS role, MIN(comp.c) AS cluster_id
      FROM pts a
      JOIN pts b ON a.c_custkey <> b.c_custkey
        AND (a.x_udeg - b.x_udeg) * (a.x_udeg - b.x_udeg)
            + (a.y_udeg - b.y_udeg) * (a.y_udeg - b.y_udeg)
            <= {_EPS * _EPS}
      JOIN comp ON comp.node = b.c_custkey
      WHERE a.c_custkey NOT IN (SELECT k FROM core)
      GROUP BY 1),
    lab AS (
      SELECT * FROM core_lab UNION ALL SELECT * FROM border)
    SELECT c_custkey, role, cluster_id FROM lab
    UNION ALL
    SELECT p.c_custkey, 'noise' AS role, CAST(NULL AS BIGINT) AS cluster_id
    FROM pts p WHERE p.c_custkey NOT IN (SELECT c_custkey FROM lab)
    """,
    tags=("geo", "clustering", "graph"),
    bench=True,
)
def geo_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the customer points (`operators/geo.py::dbscan`,
    eps=4000, min_pts=4): cell-bucketed eps-graph -> core
    points -> large-star/small-star connected components -> border
    assignment (min adjacent core cluster) -> noise. 431 cores / 124
    clusters / biggest 13 at sf0.01 (measured). The oracle rebuilds the
    same clustering from the brute eps-graph with a recursive-CTE
    transitive closure — an independent algorithm, same labels, because
    both sides label clusters by their minimum core id."""
    return dbscan(
        _points(spark, sf_dir), "c_custkey", "x_udeg", "y_udeg",
        eps=_EPS, min_pts=_MIN_PTS,
    )


_SUPP_RADIUS = 30_000

_SUPP_PTS_SQL = f"""
spts AS (
  SELECT s_suppkey,
    CAST(concat('0x', substr(md5('slat:' || CAST(s_suppkey AS VARCHAR)), 1, 15))
         AS BIGINT) % 2147483647 % {_BOX} AS x_udeg,
    CAST(concat('0x', substr(md5('slon:' || CAST(s_suppkey AS VARCHAR)), 1, 15))
         AS BIGINT) % 2147483647 % {_BOX} AS y_udeg
  FROM supplier)
"""


@register(
    "geo_nearest_supplier",
    f"""
    WITH {_PTS_SQL}, {_SUPP_PTS_SQL},
    scand AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.x_udeg - s.x_udeg) * (c.x_udeg - s.x_udeg)
             + (c.y_udeg - s.y_udeg) * (c.y_udeg - s.y_udeg) AS dist2
      FROM pts c JOIN spts s
        ON (c.x_udeg - s.x_udeg) * (c.x_udeg - s.x_udeg)
           + (c.y_udeg - s.y_udeg) * (c.y_udeg - s.y_udeg)
           <= {_SUPP_RADIUS * _SUPP_RADIUS})
    SELECT c_custkey, rank, s_suppkey, dist2 FROM (
      SELECT c_custkey, s_suppkey, dist2,
             CAST(row_number() OVER (
               PARTITION BY c_custkey ORDER BY dist2 ASC, s_suppkey ASC
             ) AS INTEGER) AS rank
      FROM scand)
    WHERE rank <= 2
    """,
    tags=("geo", "join", "knn"),
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-relation spatial join (`operators/geo.py::radius_join`):
    each customer point's 2 nearest supplier points within
    30,000 micro-degrees (distinct md5 salt, so the supplier
    scatter is independent of the customer scatter). Same cell-join
    plan as the self-join; at warehouse scale this is the
    facility-assignment query (point -> nearest service point) that a
    cross join would make quadratic."""
    s_key = F.col("s_suppkey").cast("string")
    spts = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (portable_hash31(F.concat(F.lit("slat:"), s_key)) % _BOX).alias(
            "x_udeg"
        ),
        (portable_hash31(F.concat(F.lit("slon:"), s_key)) % _BOX).alias(
            "y_udeg"
        ),
    )
    from covid_data_pipeline_spark.operators.geo import radius_join

    return radius_join(
        _points(spark, sf_dir),
        spts,
        "c_custkey",
        "s_suppkey",
        "x_udeg",
        "y_udeg",
        radius=_SUPP_RADIUS,
        k=2,
    )


@register(
    "geo_morans_i",
    f"""
    WITH {_PTS_SQL},
    cells AS (
      SELECT x_udeg // {_RADIUS} AS cx, y_udeg // {_RADIUS} AS cy,
             COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
    tot AS (
      SELECT COUNT(*) AS nc, CAST(SUM(n) AS BIGINT) AS s FROM cells),
    z AS (
      SELECT cx, cy, (t.nc * c.n - t.s) AS zz
      FROM cells c CROSS JOIN tot t),
    adj AS (
      SELECT a.zz AS za, b.zz AS zb
      FROM z a JOIN z b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND NOT (a.cx = b.cx AND a.cy = b.cy)),
    agg AS (
      SELECT COUNT(*) AS w,
             CAST(SUM(CAST(za AS HUGEINT) * zb) AS HUGEINT) AS num
      FROM adj),
    den AS (
      SELECT CAST(SUM(CAST(zz AS HUGEINT) * zz) AS HUGEINT) AS d FROM z)
    SELECT t.nc AS n_cells, agg.w AS w_pairs,
      (ROUND(CAST(t.nc * agg.num AS DOUBLE)
             / CAST(agg.w * den.d AS DOUBLE), 6) + 0) AS morans_i,
      (ROUND(-1.0 / (t.nc - 1), 6) + 0) AS expected_i
    FROM tot t, agg, den
    """,
    tags=("geo", "stats", "autocorrelation"),
)
def geo_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of the occupied-cell density
    lattice (queen/8-neighbor contiguity weights): THE classic
    clustered-vs-dispersed diagnostic for point data. Deviations are
    kept n-scaled integers (Z = nc*n - s, the repo's exact-centering
    construction), the numerator/denominator accumulate in
    DECIMAL(38,0)/HUGEINT, and only the final ratio is one float
    division (round_stable — the statistic is signed). The engine finds
    adjacent cell pairs with the same 3x3 explode + equi-join as every
    other operator in this file; the oracle states the quadratic
    |cells|^2 inequality join. -0.0346 at sf0.01 vs E[I] = -0.001: the
    md5 scatter is marginally more regular than CSR, a deterministic
    property of the fixture."""
    from covid_data_pipeline_spark.operators.geo import cell_density, morans_i

    cells = cell_density(
        _points(spark, sf_dir), "x_udeg", "y_udeg", cell_size=_RADIUS
    ).select("cell_x", "cell_y", "n_points")
    return morans_i(cells, value_col="n_points")



@register(
    "geo_gearys_c",
    f"""
    WITH {_PTS_SQL},
    cells AS (
      SELECT x_udeg // {_RADIUS} AS cx, y_udeg // {_RADIUS} AS cy,
             COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
    tot AS (
      SELECT COUNT(*) AS nc, CAST(SUM(n) AS BIGINT) AS s FROM cells),
    adj AS (
      SELECT a.n AS na, b.n AS nb FROM cells a JOIN cells b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND NOT (a.cx = b.cx AND a.cy = b.cy)),
    agg AS (
      SELECT COUNT(*) AS w,
             CAST(SUM(CAST((na - nb) AS HUGEINT) * (na - nb)) AS HUGEINT)
               AS num
      FROM adj),
    den AS (
      SELECT CAST(SUM(CAST(t.nc * c.n - t.s AS HUGEINT)
                      * (t.nc * c.n - t.s)) AS HUGEINT) AS d
      FROM cells c CROSS JOIN tot t)
    SELECT t.nc AS n_cells, agg.w AS w_pairs,
      (ROUND(CAST((t.nc - 1) * t.nc * t.nc * agg.num AS DOUBLE)
             / CAST(2 * agg.w * den.d AS DOUBLE), 6) + 0) AS gearys_c
    FROM tot t, agg, den
    """,
    tags=("geo", "stats", "autocorrelation"),
)
def geo_gearys_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's C — Moran's I's local-contrast companion (C < 1
    clustered, C > 1 dispersed; 1.0164 at sf0.01, consistent with the
    slightly-sub-CSR Moran). Even cleaner integer path than Moran: the
    numerator is raw squared neighbor differences (no centering
    needed); only the variance denominator uses the n-scaled exact
    centering, with nc^2 folded into the numerator scale. Same 3x3
    adjacency equi-join; one round_stable'd float division."""
    from covid_data_pipeline_spark.operators.geo import cell_density, gearys_c

    cells = cell_density(
        _points(spark, sf_dir), "x_udeg", "y_udeg", cell_size=_RADIUS
    ).select("cell_x", "cell_y", "n_points")
    return gearys_c(cells, value_col="n_points")


# --- Z-order layout (operators/geo.py::zorder_key) -------------------
_Z_BITS = 18          # box 200,001 < 2^18
_Z_SHIFT = 30         # 2^36 key space -> 64 top-level file buckets


@register(
    "geo_zorder_layout",
    f"""
    WITH {_PTS_SQL},
    zk AS (
      SELECT c_custkey,
             x_udeg, y_udeg,
             { " + ".join(
                 f"(((x_udeg >> {i}) & 1) << {2 * i})"
                 f" + (((y_udeg >> {i}) & 1) << {2 * i + 1})"
                 for i in range(18)
             ) } AS zkey
      FROM pts)
    SELECT zkey >> {_Z_SHIFT} AS file_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(x_udeg) AS x_lo, MAX(x_udeg) AS x_hi,
           MIN(y_udeg) AS y_lo, MAX(y_udeg) AS y_hi,
           (MAX(x_udeg) - MIN(x_udeg)) * (MAX(y_udeg) - MIN(y_udeg))
             AS extent_area
    FROM zk GROUP BY 1
    """,
    tags=("geo", "layout", "zorder"),
    bench=True,
)
def geo_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit (`operators/geo.py::zorder_key`):
    interleave-bit clustering keys for every customer point, bucketed
    into 64 top-of-curve file buckets (``zkey >> 30``), with each
    bucket's zone-map extents and extent area — the measurement a
    Delta/Iceberg-style OPTIMIZE ZORDER job runs to prove file-level
    min/max pruning got tighter. Everything is exact BIGINT bit
    arithmetic (disjoint shift-and-mask terms; OR == SUM), so the
    oracle replays the curve bit-for-bit. At 100 TB the write path is
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)``; this
    audit costs one map-side-combining rollup over |points|."""
    from covid_data_pipeline_spark.operators.geo import zorder_key

    pts = _points(spark, sf_dir).withColumn(
        "zkey", zorder_key("x_udeg", "y_udeg", bits=_Z_BITS)
    )
    bucket = F.shiftright(F.col("zkey"), _Z_SHIFT).alias("file_bucket")
    return pts.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("x_udeg").alias("x_lo"),
        F.max("x_udeg").alias("x_hi"),
        F.min("y_udeg").alias("y_lo"),
        F.max("y_udeg").alias("y_hi"),
        (
            (F.max("x_udeg") - F.min("x_udeg"))
            * (F.max("y_udeg") - F.min("y_udeg"))
        ).alias("extent_area"),
    )


@register(
    "geo_radius_haversine",
    None,
    tags=("geo", "join", "geodesic"),
    rows_only_reason=(
        "haversine leaves the integer lattice: sin/cos/asin are libm "
        "calls whose last-ulp behavior varies across engines, so the "
        "geodesic predicate is verified against a Python brute force "
        "with tolerance (tests/test_geo.py), not a cross-engine hash"
    ),
)
def geo_radius_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic radius self-join (`operators/geo.py::radius_pairs`
    with ``radius_m``): customer points placed at ~59°N (lat = 59° +
    y_udeg, lon = 18° + x_udeg) where longitude micro-degrees are only
    ~0.057 m wide — the regime where the planar predicate overcounts
    east-west neighbors ~2x and a geodesic verify is semantically
    required. Candidate generation is the identical 3x3 cell equi-join
    (candidate radius 6000 udeg covers 300 m at this latitude:
    300 / (111.32 * cos 59.2°) * 1e3 ≈ 5.3k udeg lon); only the final
    predicate swaps to ``haversine_meters <= 300``."""
    from covid_data_pipeline_spark.operators.geo import radius_pairs

    pts = _points(spark, sf_dir).select(
        "c_custkey",
        (F.col("x_udeg") + F.lit(18_000_000)).alias("lon_udeg"),
        (F.col("y_udeg") + F.lit(59_000_000)).alias("lat_udeg"),
    )
    return radius_pairs(
        pts, "c_custkey", "lon_udeg", "lat_udeg",
        radius=6_000, radius_m=300.0,
    )


@register(
    "geo_hilbert_layout",
    f"""
    WITH RECURSIVE {_PTS_SQL},
    hil(k, x_orig, y_orig, lvl, x, y, d) AS (
      SELECT c_custkey, x_udeg, y_udeg, {_Z_BITS - 1},
             CAST(x_udeg AS BIGINT), CAST(y_udeg AS BIGINT),
             CAST(0 AS BIGINT)
      FROM pts
      UNION ALL
      SELECT k, x_orig, y_orig, lvl - 1,
             CASE WHEN yb = 1 THEN x
                  WHEN xb = 1 THEN s - 1 - y ELSE y END,
             CASE WHEN yb = 1 THEN y
                  WHEN xb = 1 THEN s - 1 - x ELSE x END,
             d + s * s * xor(3 * xb, yb)
      FROM (
        SELECT k, x_orig, y_orig, lvl, x, y, d,
               CAST(1 AS BIGINT) << lvl AS s,
               CASE WHEN (x & (CAST(1 AS BIGINT) << lvl)) > 0
                    THEN 1 ELSE 0 END AS xb,
               CASE WHEN (y & (CAST(1 AS BIGINT) << lvl)) > 0
                    THEN 1 ELSE 0 END AS yb
        FROM hil WHERE lvl >= 0) t)
    SELECT d >> {_Z_SHIFT} AS file_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(x_orig) AS x_lo, MAX(x_orig) AS x_hi,
           MIN(y_orig) AS y_lo, MAX(y_orig) AS y_hi,
           (MAX(x_orig) - MIN(x_orig)) * (MAX(y_orig) - MIN(y_orig))
             AS extent_area
    FROM hil WHERE lvl = -1
    GROUP BY 1
    """,
    tags=("geo", "layout", "hilbert"),
    bench=True,
)
def geo_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout audit (`operators/geo.py::hilbert_key`) —
    the same 64-file-bucket zone-map measurement as geo_zorder_layout,
    on the curve with strictly better locality (consecutive indices
    are always 4-neighbors; Morton takes diagonal jumps at
    power-of-two seams, so Hilbert buckets should show smaller extent
    areas on the same points — the two queries together quantify the
    layout choice). The per-level reflect/transpose fold runs as ONE
    F.aggregate over exact BIGINT state; the oracle replays the
    identical state machine as a recursive CTE, so every bucket and
    extent hash-verifies. Pure projection + one map-side rollup."""
    from covid_data_pipeline_spark.operators.geo import hilbert_key

    pts = _points(spark, sf_dir).withColumn(
        "hkey", hilbert_key("x_udeg", "y_udeg", bits=_Z_BITS)
    )
    bucket = F.shiftright(F.col("hkey"), _Z_SHIFT).alias("file_bucket")
    return pts.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("x_udeg").alias("x_lo"),
        F.max("x_udeg").alias("x_hi"),
        F.min("y_udeg").alias("y_lo"),
        F.max("y_udeg").alias("y_hi"),
        (
            (F.max("x_udeg") - F.min("x_udeg"))
            * (F.max("y_udeg") - F.min("y_udeg"))
        ).alias("extent_area"),
    )
