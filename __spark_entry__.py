"""Driver contract for the spark-graft builder (PySpark target).

Every SURVEY.md §2 operator is exposed as a named query over the synthetic
star schema at ``sf_dir`` with a DuckDB oracle. Astronomy-domain semantics
(spatial cross-match, inverse-variance weighting, cutout refs, unpivots) are
demonstrated on synthetic coordinates/uncertainties derived deterministically
from the TPC-H keys; the full domain engine lives in ``hiss_cube_spark/`` and
is additionally unit-tested on FIXTURES.md-shaped synthetic tables.

Oracle-parity rules used throughout (see tests/test_oracle_parity.py):
* Float aggregations go through DECIMAL-quantized sums — exact and
  reduction-order-independent in both engines — then one final round(x, 6).
* Scalar IEEE ops (/, *, sqrt, abs, least) on identical doubles are bitwise
  deterministic across engines; transcendentals (sin/cos) are avoided.
* Window/top-k orderings always carry a unique tiebreaker column.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hiss_cube_spark.functions.spatial import grid_cell, grid_disc_cells
from hiss_cube_spark.functions.timeparse import ts_to_mjd
from hiss_cube_spark.operators.crossmatch import crossmatch

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLE[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with nanosecond timestamps normalized to DuckDB parity.

    The parquet stores TIMESTAMP(NANOS); Spark reads it as a long (legacy
    conf), DuckDB truncates to microseconds on scan — so we truncate
    identically and expose both `ts` (timestamp, µs) and `ts_us` (bigint).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.expr("ts DIV 1000").alias("ts_us"),
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def _dec(c, scale: int = 8):
    """Quantize a double for an order-independent exact sum."""
    return c.cast(f"decimal(30,{scale})")


def _r6(c):
    return F.round(c.cast("double"), 6)


# --------------------------------------------------------------------------
# Synthetic sky: deterministic coordinates + uncertainties from TPC-H keys.
# "Images" = part rows, "spectra" = customer rows (matches the reference's
# image/spectrum cardinality ratio). Kept in exact sync with the SQL
# fragments below — identical double arithmetic on both sides.
# --------------------------------------------------------------------------

_RADIUS_DEG = 5.0

_SQL_IMG = (
    "SELECT p_partkey AS img_id, (p_partkey * 7.919) % 360.0 AS ra, "
    "((p_partkey * 3.571) % 170.0) - 85.0 AS dec FROM part"
)
_SQL_SPEC = (
    "SELECT c_custkey AS spec_id, (c_custkey * 11.317) % 360.0 AS ra, "
    "((c_custkey * 5.113) % 170.0) - 85.0 AS dec, "
    "c_acctbal AS flux, 0.5 + (c_custkey % 10) * 0.25 AS sigma FROM customer"
)
_SQL_DIST = (
    "sqrt(least(abs(s.ra - i.ra), 360.0 - abs(s.ra - i.ra)) * "
    "least(abs(s.ra - i.ra), 360.0 - abs(s.ra - i.ra)) + "
    "(s.dec - i.dec) * (s.dec - i.dec))"
)


def _images(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("img_id"),
        F.pmod(F.col("p_partkey") * F.lit(7.919), F.lit(360.0)).alias("ra"),
        (F.pmod(F.col("p_partkey") * F.lit(3.571), F.lit(170.0)) - F.lit(85.0)).alias("dec"),
    )


def _spectra(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("spec_id"),
        F.pmod(F.col("c_custkey") * F.lit(11.317), F.lit(360.0)).alias("ra"),
        (F.pmod(F.col("c_custkey") * F.lit(5.113), F.lit(170.0)) - F.lit(85.0)).alias("dec"),
        F.col("c_acctbal").alias("flux"),
        (F.lit(0.5) + F.pmod(F.col("c_custkey"), F.lit(10)) * F.lit(0.25)).alias("sigma"),
    )


def _ivw_sums(flux, sigma):
    """Decimal-quantized ivw partial sums (see module docstring)."""
    w = F.lit(1.0) / (sigma * sigma)
    fw = flux * w
    return F.sum(_dec(fw)).alias("_sfw"), F.sum(_dec(w)).alias("_sw")


_SQL_IVW_SUMS = (
    "sum(CAST({flux} * (1.0 / ({sigma} * {sigma})) AS DECIMAL(30,8))) AS _sfw, "
    "sum(CAST(1.0 / ({sigma} * {sigma}) AS DECIMAL(30,8))) AS _sw"
)


# ==========================================================================
# Flagship: ML-cube analogue — spatial cross-match (J2) + per-target
# inverse-variance-weighted aggregation (A1+J6), the reference's
# "Global DB query" re-expressed on the synthetic sky.
# ==========================================================================

@_q(
    "flagship_ml_cube",
    f"""
    WITH img AS ({_SQL_IMG}), spec AS ({_SQL_SPEC}),
    m AS (
      SELECT i.img_id, s.flux, s.sigma FROM spec s JOIN img i
      ON {_SQL_DIST} <= {_RADIUS_DEG}
    ),
    g AS (
      SELECT img_id, count(*) AS n_obs,
             {_SQL_IVW_SUMS.format(flux='flux', sigma='sigma')}
      FROM m GROUP BY img_id
    )
    SELECT img_id, n_obs,
           round(CAST(_sfw AS DOUBLE) / CAST(_sw AS DOUBLE), 6) AS ivw_mean,
           round(sqrt(1.0 / CAST(_sw AS DOUBLE)), 6) AS ivw_sigma
    FROM g
    """,
)
def flagship_ml_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = crossmatch(
        _spectra(spark, sf_dir),
        _images(spark, sf_dir),
        radius_deg=_RADIUS_DEG,
        broadcast_targets=True,
    )
    sfw, sw = _ivw_sums(F.col("p_flux"), F.col("p_sigma"))
    g = m.groupBy(F.col("t_img_id").alias("img_id")).agg(
        F.count(F.lit(1)).alias("n_obs"), sfw, sw
    )
    return g.select(
        "img_id",
        "n_obs",
        _r6(F.col("_sfw").cast("double") / F.col("_sw").cast("double")).alias("ivw_mean"),
        _r6(F.sqrt(F.lit(1.0) / F.col("_sw").cast("double"))).alias("ivw_sigma"),
    )


# ==========================================================================
# J2: cross-match candidate statistics per probe (link-phase shape)
# ==========================================================================

@_q(
    "j2_crossmatch",
    f"""
    WITH img AS ({_SQL_IMG}), spec AS ({_SQL_SPEC})
    SELECT s.spec_id, count(*) AS n_matches,
           round(min({_SQL_DIST}), 6) AS min_dist
    FROM spec s JOIN img i ON {_SQL_DIST} <= {_RADIUS_DEG}
    GROUP BY s.spec_id
    """,
)
def j2_crossmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = crossmatch(_spectra(spark, sf_dir), _images(spark, sf_dir), radius_deg=_RADIUS_DEG)
    return m.groupBy(F.col("p_spec_id").alias("spec_id")).agg(
        F.count(F.lit(1)).alias("n_matches"),
        _r6(F.min("match_dist")).alias("min_dist"),
    )


# ==========================================================================
# A1: scalar inverse-variance-weighted mean (core scientific aggregate)
# ==========================================================================

@_q(
    "a1_ivw_mean",
    f"""
    WITH src AS (
      SELECT l_returnflag, l_linestatus, l_extendedprice AS flux,
             1.0 + l_tax AS sigma FROM lineitem
    ),
    g AS (
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             {_SQL_IVW_SUMS.format(flux='flux', sigma='sigma')}
      FROM src GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus, n,
           round(CAST(_sfw AS DOUBLE) / CAST(_sw AS DOUBLE), 6) AS ivw_mean,
           round(sqrt(1.0 / CAST(_sw AS DOUBLE)), 6) AS ivw_sigma
    FROM g
    """,
)
def a1_ivw_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_extendedprice").alias("flux"),
        (F.lit(1.0) + F.col("l_tax")).alias("sigma"),
    )
    sfw, sw = _ivw_sums(F.col("flux"), F.col("sigma"))
    g = li.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"), sfw, sw)
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        _r6(F.col("_sfw").cast("double") / F.col("_sw").cast("double")).alias("ivw_mean"),
        _r6(F.sqrt(F.lit(1.0) / F.col("_sw").cast("double"))).alias("ivw_sigma"),
    )


# ==========================================================================
# Q1-style pricing summary: grouped decimal aggregation + sort (A-family, O1)
# ==========================================================================

@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE), 6) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE), 6) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))) AS DOUBLE), 6) AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,8))) AS DOUBLE), 6) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) / count(*), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec(F.col("l_quantity"))).alias("_q"),
        F.sum(_dec(F.col("l_extendedprice"))).alias("_b"),
        F.sum(_dec(disc)).alias("_d"),
        F.sum(_dec(charge)).alias("_c"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        _r6(F.col("_q")).alias("sum_qty"),
        _r6(F.col("_b")).alias("sum_base_price"),
        _r6(F.col("_d")).alias("sum_disc_price"),
        _r6(F.col("_c")).alias("sum_charge"),
        _r6(F.col("_q").cast("double") / F.col("count_order")).alias("avg_qty"),
        "count_order",
    )


# ==========================================================================
# J1: broadcast theta-join — range-predicate config lookup
# (reference ccd gain tables carry run-range predicates, photometry.py:352-357)
# ==========================================================================

_TIERS = [(0, "low", 0.0, 3000.0), (1, "mid", 3000.0, 7000.0), (2, "high", 7000.0, 1e18)]
_SQL_TIERS = "(VALUES (0,'low',0.0,3000.0),(1,'mid',3000.0,7000.0),(2,'high',7000.0,1e18)) AS t(tier_id, tier, lo, hi)"


@_q(
    "j1_theta_lookup",
    f"""
    SELECT t.tier, count(*) AS n_suppliers,
           round(CAST(sum(CAST(s.s_acctbal AS DECIMAL(30,8))) AS DOUBLE), 6) AS total_bal
    FROM supplier s JOIN {_SQL_TIERS}
    ON s.s_acctbal >= t.lo AND s.s_acctbal < t.hi
    GROUP BY t.tier
    """,
)
def j1_theta_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    tiers = spark.createDataFrame(_TIERS, "tier_id int, tier string, lo double, hi double")
    j = s.join(
        F.broadcast(tiers),
        (F.col("s_acctbal") >= F.col("lo")) & (F.col("s_acctbal") < F.col("hi")),
    )
    return j.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        _r6(F.sum(_dec(F.col("s_acctbal")))).alias("total_bal"),
    )


# ==========================================================================
# J4: SFR-style left equi-join with null accounting (sfr.py:43-48 semantics)
# ==========================================================================

@_q(
    "j4_left_join",
    """
    SELECT o.o_orderpriority,
           count(*) AS n_orders,
           count(c.c_name) AS n_matched,
           count(*) - count(c.c_name) AS n_unmatched
    FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
    ON o.o_custkey = c.c_custkey
    GROUP BY o.o_orderpriority
    """,
)
def j4_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 3 == 0)
    j = o.join(c, o.o_custkey == c.c_custkey, "left")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("c_name").alias("n_matched"),
        (F.count(F.lit(1)) - F.count("c_name")).alias("n_unmatched"),
    )


# ==========================================================================
# J6/A3: target self-grouping — distinct spatial cells (grid index, F1)
# ==========================================================================

@_q(
    "j6_target_grouping",
    """
    WITH spec AS (
      SELECT c_custkey,
             CAST(floor(((((c_custkey * 5.113) % 170.0) - 85.0) + 90.0) / 5.0) * 72
                  + floor(((c_custkey * 11.317) % 360.0) / 5.0) AS BIGINT) AS cell
      FROM customer
    )
    SELECT count(DISTINCT cell) AS n_targets, count(*) AS n_spectra,
           round(count(*) / (1.0 * count(DISTINCT cell)), 6) AS avg_group_size
    FROM spec
    """,
)
def j6_target_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _spectra(spark, sf_dir).withColumn("cell", grid_cell(F.col("ra"), F.col("dec"), 5.0))
    return s.agg(
        F.countDistinct("cell").alias("n_targets"),
        F.count(F.lit(1)).alias("n_spectra"),
        _r6(F.count(F.lit(1)) / (F.lit(1.0) * F.countDistinct("cell"))).alias("avg_group_size"),
    )


# ==========================================================================
# J7: first-observation-per-group (row_number window, cube_ml.py:652-655)
# ==========================================================================

@_q(
    "j7_first_in_group",
    """
    SELECT user_id, event_id AS first_event, event_type AS first_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def j7_first_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("first_event"), F.col("event_type").alias("first_type"))
    )


# ==========================================================================
# P7: completeness predicate — keep groups covered in all 5 categories
# (5-band completeness, metadata_strategy_cube_ml.py:260-262)
# ==========================================================================

@_q(
    "p7_completeness",
    """
    SELECT user_id, count(DISTINCT event_type) AS n_types, count(*) AS n_events
    FROM events GROUP BY user_id HAVING count(DISTINCT event_type) = 5
    """,
)
def p7_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_types"), F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_types") == 5)
    )


# ==========================================================================
# F5: time → Modified Julian Date (utils/io.py:426-432)
# ==========================================================================

@_q(
    "f5_time_to_mjd",
    """
    SELECT o_orderkey, round(epoch(o_orderdate) / 86400.0 + 40587.0, 6) AS mjd
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def f5_time_to_mjd(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    return o.select("o_orderkey", _r6(ts_to_mjd(F.col("o_orderdate"))).alias("mjd"))


# ==========================================================================
# O3: cap refs per key — sorted array slice (MAX_CUTOUT_REFS, config.ini:36)
# ==========================================================================

@_q(
    "o3_cap_refs",
    """
    SELECT user_id,
           (array_agg(event_id ORDER BY event_id))[1:5] AS first_refs,
           least(count(*), 5) AS n_kept
    FROM events GROUP BY user_id
    """,
)
def o3_cap_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.slice(F.sort_array(F.collect_list("event_id")), 1, 5).alias("first_refs"),
        F.least(F.count(F.lit(1)), F.lit(5)).alias("n_kept"),
    )


# ==========================================================================
# Dedup (exact): hash-groupBy keeping canonical representative
# ==========================================================================

@_q(
    "dedup_exact",
    """
    SELECT text_hash, canonical_id, n_copies FROM (
      SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
      FROM documents GROUP BY md5(text)
    )
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ==========================================================================
# F17: unpivot arrays → per-sample rows (visualization-cube table shape,
# cube_visualization.py:110-145)
# ==========================================================================

@_q(
    "f17_unpivot",
    """
    SELECT e.vec_id, g.i - 1 AS pos, round(CAST(e.embedding[g.i] AS DOUBLE), 6) AS val
    FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS g(i)
    WHERE e.vec_id < 50
    """,
)
def f17_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "_v")).select(
        "vec_id", "pos", _r6(F.col("_v")).alias("val")
    )


# ==========================================================================
# driver contract
# ==========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_ml_cube(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
