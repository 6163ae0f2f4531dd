"""Geospatial workload: grid-cell density, cell-blocked nearest-neighbour
join, and bounding-box containment — the spatial layer a logistics /
geo-analytics team runs on top of the reference's scans (reference:
ABSENT — extension surface).

The synthetic tables carry no coordinates, so both engines derive
deterministic positions from the integer keys with pure modular
arithmetic (milli-degrees, BIGINT end to end):

    lat_m(k) = (k * P_lat) % 120001 - 60000      in [-60000, 60000]
    lon_m(k) = (k * P_lon) % 360001 - 180000     in [-180000, 180000]

with different primes per table so customer and supplier positions are
uncorrelated. Every hashed number stays integer (squared planar
distances in milli-degrees, counts) or is a DECIMAL-routed average —
no trigonometry reaches the output, so the DuckDB oracle is bit-exact.
The planar-squared-distance ranking is the standard flat-earth
approximation for bounded-radius nearest-neighbour work; longitude
differences wrap at the antimeridian (min(|d|, 360000-|d|)).

Scale shapes (the 100 TB story):

- density: one groupBy over pure integer expressions — cell grid is
  fixed-cardinality (13x37), never data-proportional;
- nearest: grid-cell blocking — each customer probes its own 30-degree
  cell plus the 8 neighbours (longitude ring wraps modulo 12), so the
  join is |customers| x per-cell supplier occupancy instead of the
  |customers| x |suppliers| cross product; occupancy is a resolution
  knob (finer grid at higher density). The per-customer argmin is a
  map-side-combinable min(struct) aggregate, not a window.
- bbox: the box list is dimension-sized — broadcast + range predicate,
  the facts never shuffle beyond the final dimension-sized aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

# Primes for the coordinate derivation. Values < 2^17, keys < 2^34 at
# any realistic SF: the product stays far inside BIGINT.
_CUST_LAT_P, _CUST_LON_P = 7919, 104729
_SUPP_LAT_P, _SUPP_LON_P = 7907, 104717


def _with_point(df: DataFrame, key: str, lat_p: int, lon_p: int) -> DataFrame:
    """Attach deterministic (lat_m, lon_m) milli-degree coordinates."""
    return df.withColumn(
        "lat_m", (F.col(key) * F.lit(lat_p)) % 120001 - 60000
    ).withColumn("lon_m", (F.col(key) * F.lit(lon_p)) % 360001 - 180000)


def _point_sql(key: str, lat_p: int, lon_p: int) -> str:
    """The same derivation as DuckDB SQL fragments (nonneg before %)."""
    return (
        f"({key} * {lat_p}) % 120001 - 60000 AS lat_m, "
        f"({key} * {lon_p}) % 360001 - 180000 AS lon_m"
    )


def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer density + DECIMAL-routed average balance per 10-degree
    grid cell, top-25 cells by count (ties broken by cell id). The cell
    grid is 13 lat rows x 37 lon cols — FIXED cardinality, so the
    aggregate's key space never grows with data: the canonical
    map-side-combine shape. All arithmetic is nonnegative-integer
    div/mod, identical in both engines."""
    cust = _with_point(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        _CUST_LAT_P,
        _CUST_LON_P,
    )
    cells = cust.select(
        ((F.col("lat_m") + 60000) / 10000).cast("bigint").alias("cell_row"),
        ((F.col("lon_m") + 180000) / 10000).cast("bigint").alias("cell_col"),
        "c_acctbal",
    ).withColumn("cell_id", F.col("cell_row") * 37 + F.col("cell_col"))
    return (
        cells.groupBy("cell_id", "cell_row", "cell_col")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_bal_r"),
        )
        .orderBy(F.desc("n_customers"), "cell_id")
        .limit(25)
    )


def q_geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer via 30-degree grid-cell blocking:
    each customer probes its own cell plus the 8 neighbours (longitude
    ring wraps modulo 12 columns, latitude rows clamp at the poles), and
    the candidate pairs carry the exact integer planar squared distance
    with antimeridian wrap on the longitude delta. The argmin is a
    two-level min(struct(dist2, suppkey)) aggregate — map-side
    combinable, deterministic tie-break by supplier key, NO window.
    Customers whose 9-cell neighbourhood holds no supplier are excluded
    (radius-bounded semantics — the standard blocking contract).
    Output: one row per matched customer, summarized per nearest
    supplier (how many customers it serves + distance stats) to keep
    the result dimension-sized."""
    cust = _with_point(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        _CUST_LAT_P,
        _CUST_LON_P,
    ).select("c_custkey", "lat_m", "lon_m")
    supp = _with_point(
        load_table(spark, sf_dir, "supplier"),
        "s_suppkey",
        _SUPP_LAT_P,
        _SUPP_LON_P,
    ).select(
        "s_suppkey",
        F.col("lat_m").alias("s_lat"),
        F.col("lon_m").alias("s_lon"),
        F.least(
            ((F.col("lat_m") + 60000) / 30000).cast("bigint"), F.lit(3)
        ).alias("s_row"),
        (((F.col("lon_m") + 180000) / 30000).cast("bigint") % 12).alias(
            "s_col"
        ),
    )
    probes = (
        cust.withColumn(
            "c_row",
            F.least(
                ((F.col("lat_m") + 60000) / 30000).cast("bigint"), F.lit(3)
            ),
        )
        .withColumn(
            "c_col",
            ((F.col("lon_m") + 180000) / 30000).cast("bigint") % 12,
        )
        .withColumn("dr", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dc", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("p_row", F.col("c_row") + F.col("dr"))
        .withColumn("p_col", (F.col("c_col") + F.col("dc") + 12) % 12)
        .where((F.col("p_row") >= 0) & (F.col("p_row") <= 3))
    )
    adlon = F.abs(F.col("lon_m") - F.col("s_lon"))
    cand = probes.join(
        F.broadcast(supp),
        (probes["p_row"] == supp["s_row"]) & (probes["p_col"] == supp["s_col"]),
    ).select(
        "c_custkey",
        "s_suppkey",
        (
            (F.col("lat_m") - F.col("s_lat"))
            * (F.col("lat_m") - F.col("s_lat"))
            + F.least(adlon, F.lit(360000) - adlon)
            * F.least(adlon, F.lit(360000) - adlon)
        ).alias("dist2"),
    )
    nearest = (
        cand.groupBy("c_custkey")
        .agg(F.min(F.struct("dist2", "s_suppkey")).alias("best"))
        .select(
            "c_custkey",
            F.col("best.s_suppkey").alias("nearest_suppkey"),
            F.col("best.dist2").alias("dist2"),
        )
    )
    return (
        nearest.groupBy(F.col("nearest_suppkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("dist2").alias("min_dist2"),
            F.max("dist2").alias("max_dist2"),
            F.sum("dist2").cast("bigint").alias("sum_dist2"),
        )
        .orderBy("nearest_suppkey")
    )


def q_geo_bbox_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle-containment join: five deterministic 40x80-degree sales
    boxes derived from the region keys, each counting the customers
    whose point falls inside (inclusive low edge, exclusive high edge)
    with a DECIMAL-routed average balance. The box side is
    dimension-sized and broadcast; the fact side is filtered by the
    range predicate in place and reduces straight to one row per box —
    the facts never shuffle. Boxes that catch nobody still appear with
    zero counts (left join from the box side)."""
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey",
        ((F.col("r_regionkey") * 41) % 80 * 1000 - 50000).alias("lat_lo"),
        ((F.col("r_regionkey") * 41) % 80 * 1000 - 10000).alias("lat_hi"),
        ((F.col("r_regionkey") * 97) % 300 * 1000 - 180000).alias("lon_lo"),
        ((F.col("r_regionkey") * 97) % 300 * 1000 - 100000).alias("lon_hi"),
    )
    cust = _with_point(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        _CUST_LAT_P,
        _CUST_LON_P,
    ).select("lat_m", "lon_m", "c_acctbal")
    hits = region.join(
        cust,
        (F.col("lat_m") >= F.col("lat_lo"))
        & (F.col("lat_m") < F.col("lat_hi"))
        & (F.col("lon_m") >= F.col("lon_lo"))
        & (F.col("lon_m") < F.col("lon_hi")),
        "left",
    )
    return (
        hits.groupBy("r_regionkey", "lat_lo", "lon_lo")
        .agg(
            F.sum(F.col("lat_m").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_inside"),
            F.round(
                F.coalesce(
                    F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast(
                        "double"
                    )
                    / F.nullif(
                        F.sum(F.col("lat_m").isNotNull().cast("int")), F.lit(0)
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("avg_bal_r"),
        )
        .orderBy("r_regionkey")
    )


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash6_expr(lat_col: str, lon_col: str) -> str:
    """A REAL 6-character base32 geohash as one pure-integer SQL
    expression (identical text in Spark and DuckDB): quantize lat/lon
    milli-degrees to 15-bit cell indices over the full ±90/±180 domain,
    interleave the bits lon-first (the geohash/Morton order — prefix
    sharing == spatial proximity, the property that makes a geohash a
    sort key for spatial locality at 100 TB), then emit each 5-bit
    group through the geohash base32 alphabet. 30 unrolled shift-mask
    terms — well inside codegen limits (the PQ lesson was m x n_codes
    = 2048 fold terms; this is 30)."""
    # textbook quantization: floor((x - lo) / range * 2^15), top edge
    # clamped into the last cell (the subdivision loop's closed upper
    # interval). Products stay under 1.2e10 — comfortably BIGINT.
    lon_idx = f"least((({lon_col} + 180000) * 32768 // 360000), 32767)"
    lat_idx = f"least((({lat_col} + 90000) * 32768 // 180000), 32767)"
    terms = []
    for k in range(15):
        terms.append(f"((({lon_idx} >> {14 - k}) & 1) << {29 - 2 * k})")
        terms.append(f"((({lat_idx} >> {14 - k}) & 1) << {28 - 2 * k})")
    g = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{_GH32}', CAST((({g} >> {25 - 5 * j}) & 31) + 1 "
        f"AS INTEGER), 1)"
        for j in range(6)
    ]
    return "concat(" + ", ".join(chars) + ")"


def q_geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers bucketed by REAL geohash: every customer point encodes
    to a 6-char base32 geohash (bit-interleaved Morton order — the
    encoding Elasticsearch/Lucene/Uber H3's ancestor uses for spatial
    indexing), then aggregates by the 2-char prefix (a ~1250x625 km
    cell). Prefix aggregation IS the scale story: a geohash prefix is a
    range predicate on the sorted code — writing data clustered by
    geohash makes every spatial box query a contiguous file-pruned
    range scan (the same reason events_zorder_pruned works). Output per
    prefix: count, DECIMAL-routed balance sum, and the min/max full
    hash proving the prefix ordering."""
    cust = _with_point(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        _CUST_LAT_P,
        _CUST_LON_P,
    )
    # Spark's integer division operator is `div`; the expression text
    # is shared with the oracle via the `//` -> `div` swap.
    gh = _geohash6_expr("lat_m", "lon_m").replace("//", "div")
    coded = cust.select(
        F.expr(gh).alias("gh6"),
        "c_acctbal",
    )
    return (
        coded.groupBy(F.substring("gh6", 1, 2).alias("gh_prefix"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("bal_sum"),
            F.min("gh6").alias("gh_min"),
            F.max("gh6").alias("gh_max"),
        )
        .orderBy(F.desc("n_customers"), "gh_prefix")
        .limit(30)
    )


QUERIES = {
    "geo_cell_density": q_geo_cell_density,
    "geo_nearest_supplier": q_geo_nearest_supplier,
    "geo_bbox_contains": q_geo_bbox_contains,
    "geo_geohash_encode": q_geo_geohash_encode,
}

_CUST_PT = _point_sql("c_custkey", _CUST_LAT_P, _CUST_LON_P)
_SUPP_PT = _point_sql("s_suppkey", _SUPP_LAT_P, _SUPP_LON_P)

ORACLES = {
    "geo_geohash_encode": f"""
WITH pts AS (
  SELECT {_CUST_PT}, c_acctbal FROM customer
), coded AS (
  SELECT {_geohash6_expr("lat_m", "lon_m")} AS gh6, c_acctbal FROM pts
)
SELECT substring(gh6, 1, 2) AS gh_prefix,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
       min(gh6) AS gh_min,
       max(gh6) AS gh_max
FROM coded
GROUP BY substring(gh6, 1, 2)
ORDER BY n_customers DESC, gh_prefix
LIMIT 30
""",
    "geo_cell_density": f"""
WITH pts AS (
  SELECT {_CUST_PT}, c_acctbal FROM customer
), cells AS (
  SELECT (lat_m + 60000) // 10000 AS cell_row,
         (lon_m + 180000) // 10000 AS cell_col,
         c_acctbal
  FROM pts
)
SELECT CAST(cell_row * 37 + cell_col AS BIGINT) AS cell_id,
       CAST(cell_row AS BIGINT) AS cell_row,
       CAST(cell_col AS BIGINT) AS cell_col,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 2) AS avg_bal_r
FROM cells
GROUP BY cell_row, cell_col
ORDER BY n_customers DESC, cell_id
LIMIT 25
""",
    "geo_nearest_supplier": f"""
WITH cpts AS (
  SELECT c_custkey, {_CUST_PT} FROM customer
), spts AS (
  SELECT s_suppkey, {_SUPP_PT} FROM supplier
), supp AS (
  SELECT s_suppkey, lat_m AS s_lat, lon_m AS s_lon,
         least((lat_m + 60000) // 30000, 3) AS s_row,
         ((lon_m + 180000) // 30000) % 12 AS s_col
  FROM spts
), probes AS (
  SELECT c_custkey, lat_m, lon_m,
         least((lat_m + 60000) // 30000, 3) + dr.d AS p_row,
         (((lon_m + 180000) // 30000) % 12 + dc.d + 12) % 12 AS p_col
  FROM cpts,
       (VALUES (-1), (0), (1)) AS dr(d),
       (VALUES (-1), (0), (1)) AS dc(d)
  WHERE least((lat_m + 60000) // 30000, 3) + dr.d BETWEEN 0 AND 3
), cand AS MATERIALIZED (
  SELECT c_custkey, s_suppkey,
         (lat_m - s_lat) * (lat_m - s_lat)
         + least(abs(lon_m - s_lon), 360000 - abs(lon_m - s_lon))
           * least(abs(lon_m - s_lon), 360000 - abs(lon_m - s_lon)) AS dist2
  FROM probes JOIN supp ON p_row = s_row AND p_col = s_col
), best_d AS (
  SELECT c_custkey, min(dist2) AS d FROM cand GROUP BY c_custkey
), nearest AS (
  SELECT c.c_custkey, min(c.s_suppkey) AS nearest_suppkey, b.d AS dist2
  FROM cand c JOIN best_d b ON c.c_custkey = b.c_custkey AND c.dist2 = b.d
  GROUP BY c.c_custkey, b.d
)
SELECT nearest_suppkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(dist2) AS BIGINT) AS min_dist2,
       CAST(max(dist2) AS BIGINT) AS max_dist2,
       CAST(sum(dist2) AS BIGINT) AS sum_dist2
FROM nearest
GROUP BY nearest_suppkey
ORDER BY nearest_suppkey
""",
    "geo_bbox_contains": f"""
WITH boxes AS (
  SELECT r_regionkey,
         (r_regionkey * 41) % 80 * 1000 - 50000 AS lat_lo,
         (r_regionkey * 41) % 80 * 1000 - 10000 AS lat_hi,
         (r_regionkey * 97) % 300 * 1000 - 180000 AS lon_lo,
         (r_regionkey * 97) % 300 * 1000 - 100000 AS lon_hi
  FROM region
), pts AS (
  SELECT {_CUST_PT}, c_acctbal FROM customer
)
SELECT b.r_regionkey, b.lat_lo, b.lon_lo,
       CAST(count(p.lat_m) AS BIGINT) AS n_inside,
       round(coalesce(
         CAST(sum(CAST(p.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         / nullif(count(p.lat_m), 0), 0.0), 2) AS avg_bal_r
FROM boxes b
LEFT JOIN pts p
  ON p.lat_m >= b.lat_lo AND p.lat_m < b.lat_hi
 AND p.lon_m >= b.lon_lo AND p.lon_m < b.lon_hi
GROUP BY b.r_regionkey, b.lat_lo, b.lon_lo
ORDER BY b.r_regionkey
""",
}


# Fixed audit polygons (milli-degrees, lon=x lat=y). The L-shape is
# deliberately NON-convex — a bbox test cannot fake it; the diamond has
# no axis-aligned edge. One source of truth for the Spark literal frame
# AND the oracle's VALUES list.
_POLYGONS: list[tuple[str, list[tuple[int, int]]]] = [
    ("diamond", [(0, 0), (20000, 30000), (40000, 0), (20000, -30000)]),
    (
        "lshape",
        [
            (-150000, -50000),
            (-150000, 10000),
            (-110000, 10000),
            (-110000, -20000),
            (-70000, -20000),
            (-70000, -50000),
        ],
    ),
    ("east_tri", [(90000, -30000), (170000, 50000), (130000, -50000)]),
]


def _polygon_edges() -> list[tuple[str, int, int, int, int]]:
    out = []
    for name, verts in _POLYGONS:
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            out.append((name, x1, y1, x2, y2))
    return out


def q_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT integer point-in-polygon census: every customer point is
    tested against three audit regions (one non-convex) by the crossing
    -number rule, with the ray test done in cross-multiplied BIGINTs —
    no division, no floats, so the odd/even parity is bit-identical on
    any engine. Inside = odd crossings of the +x ray.

    Scale shape: the edge list is dimension-sized (13 rows) and
    broadcast; each point does O(edges) integer work map-side; the only
    shuffle is the per-(point, polygon) parity aggregate keyed by a
    bounded polygon set. The standard blocking upgrade at higher
    polygon counts is an r-tree/grid prefilter — here the polygon list
    is fixed, so the broadcast IS the plan."""
    cust = _with_point(
        load_table(spark, sf_dir, "customer"), "c_custkey", _CUST_LAT_P, _CUST_LON_P
    ).select(
        "c_custkey",
        F.col("lon_m").alias("px"),
        F.col("lat_m").alias("py"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    edges = spark.createDataFrame(
        _polygon_edges(), "polygon string, x1 long, y1 long, x2 long, y2 long"
    )
    j = cust.crossJoin(F.broadcast(edges))
    straddle = (F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py"))
    dy = F.col("y2") - F.col("y1")
    lhs = (F.col("px") - F.col("x1")) * dy
    rhs = (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1"))
    crossed = straddle & (
        ((dy > 0) & (lhs < rhs)) | ((dy < 0) & (lhs > rhs))
    )
    parity = (
        j.select(
            "c_custkey",
            "bal_c",
            "polygon",
            crossed.cast("int").alias("c"),
        )
        .groupBy("c_custkey", "bal_c", "polygon")
        .agg(F.sum("c").alias("ncross"))
        .where(F.col("ncross") % 2 == 1)
    )
    return (
        parity.groupBy("polygon")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_inside"),
            F.sum("bal_c").cast("bigint").alias("sum_bal_cents"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .orderBy("polygon")
    )


QUERIES["geo_point_in_polygon"] = q_geo_point_in_polygon


def _pip_oracle() -> str:
    values = ",\n    ".join(
        f"('{n}', {x1}, {y1}, {x2}, {y2})"
        for n, x1, y1, x2, y2 in _polygon_edges()
    )
    return f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * {_CUST_LON_P}) % 360001 - 180000 AS px,
         (c_custkey * {_CUST_LAT_P}) % 120001 - 60000 AS py,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
), edges(polygon, x1, y1, x2, y2) AS (
  VALUES
    {values}
), j AS (
  SELECT p.c_custkey, p.bal_c, e.polygon,
         CASE WHEN ((e.y1 > p.py) <> (e.y2 > p.py))
               AND (((e.y2 - e.y1) > 0
                     AND (p.px - e.x1) * (e.y2 - e.y1)
                         < (p.py - e.y1) * (e.x2 - e.x1))
                    OR ((e.y2 - e.y1) < 0
                        AND (p.px - e.x1) * (e.y2 - e.y1)
                            > (p.py - e.y1) * (e.x2 - e.x1)))
              THEN 1 ELSE 0 END AS c
  FROM pts p CROSS JOIN edges e
), parity AS (
  SELECT c_custkey, bal_c, polygon, SUM(c) AS ncross
  FROM j GROUP BY 1, 2, 3
  HAVING SUM(c) % 2 = 1
)
SELECT polygon,
       CAST(COUNT(*) AS BIGINT) AS n_inside,
       CAST(SUM(bal_c) AS BIGINT) AS sum_bal_cents,
       MIN(c_custkey) AS min_custkey,
       MAX(c_custkey) AS max_custkey
FROM parity
GROUP BY polygon
ORDER BY polygon
"""


ORACLES["geo_point_in_polygon"] = _pip_oracle()
