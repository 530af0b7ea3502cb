"""Relational-core declared queries (SURVEY.md §2.2 G1-G38).

Each query follows the oracle determinism protocol (§2.4): deterministic
ORDER BY ending in a unique key, decimal-cast money math, aliased outputs
matching the DuckDB SQL exactly.

Scale notes are inline per query; the common posture: filters/projections
expressed declaratively so Catalyst pushes them to the parquet scan, small
dims (region/nation/supplier/part at TPC-H ratios) broadcast, aggregations
rely on partial+final hash agg, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from . import register


def _dec(col: str):
    """Money math: cast doubles to decimal(18,4) *before* aggregation so
    sums are exact and engine-order-independent (§2.4 rule 2)."""
    return F.col(col).cast("decimal(18,4)")


# --------------------------------------------------------------------------
# G20/G27/G32 + G7/G8: the M0 walking-skeleton query (TPC-H Q1 style).
# --------------------------------------------------------------------------
def _dbl(col: Column) -> Column:
    """Final-projection convention (§2.4 + round-1 driver finding): decimal
    aggregates are exact/order-independent *inside* the plan, but the
    driver canonicalizer renders Spark Decimal and DuckDB decimal-as-float
    differently — so every declared query emits aggregates as
    round(cast(x AS double), 4) on BOTH engines."""
    return F.round(col.cast("double"), 4)


@register(
    "agg_pricing_summary",
    sql="""
    SELECT
      l_returnflag, l_linestatus,
      round(cast(sum(cast(l_quantity      AS decimal(18,4))) AS double), 4) AS sum_qty,
      round(cast(sum(cast(l_extendedprice AS decimal(18,4))) AS double), 4) AS sum_base_price,
      round(cast(sum(cast(l_extendedprice AS decimal(18,4))
        * cast(1 - l_discount  AS decimal(18,4))) AS double), 4) AS sum_disc_price,
      round(cast(sum(cast(l_extendedprice AS decimal(18,4))
        * cast(1 - l_discount  AS decimal(18,4))
        * cast(1 + l_tax       AS decimal(18,4))) AS double), 4) AS sum_charge,
      round(cast(sum(cast(l_quantity AS decimal(18,4))) AS double)
            / count(*), 4) AS avg_qty,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("G1", "G7", "G8", "G20", "G32", "G41", "G43"),
    doc="Grouped pricing summary over lineitem (TPC-H Q1 shape). "
    "Scale: partial+final hash agg on 6 groups; shipdate filter pushed "
    "to parquet scan; no join, one shuffle of 6 rows. Sums are decimal "
    "inside the agg (exact, order-independent), doubles in the output.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = _dec("l_extendedprice") * (1 - F.col("l_discount")).cast(
        "decimal(18,4)"
    )
    charge = disc_price * (1 + F.col("l_tax")).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dbl(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            _dbl(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            _dbl(F.sum(disc_price)).alias("sum_disc_price"),
            _dbl(F.sum(charge)).alias("sum_charge"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# G7-G10: projection + predicate surface.
# --------------------------------------------------------------------------
@register(
    "filter_predicates",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
           round(o_totalprice, 2) AS price2,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS v,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS w,
           ((CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END)
            IS NOT DISTINCT FROM
            (CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END))
             AS nullsafe_same
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND (o_custkey % 2 = 0 OR NOT (o_orderkey % 3 = 0))
      AND o_orderdate IS NOT NULL
    ORDER BY o_orderkey
    """,
    tags=("G7", "G8", "G9", "G10", "G41", "G42"),
    doc="BETWEEN / IN / LIKE / IS NULL / AND-OR-NOT composition, plus a "
    "null-safe <=> compare of two nullable derivations (the watcher's "
    "Option[String] cache compare, CacheListenerRegistry.scala:49). "
    "Scale: all predicates are Catalyst-pushable; scan prunes to 5 cols.",
)
def filter_predicates(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    v = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderstatus"))
    w = F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_orderstatus"))
    return (
        o.filter(
            F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").like("%URGENT%")
            & ((F.col("o_custkey") % 2 == 0) | ~(F.col("o_orderkey") % 3 == 0))
            & F.col("o_orderdate").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price2"),
            v.alias("v"),
            w.alias("w"),
            v.eqNullSafe(w).alias("nullsafe_same"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# G11/G12: star-schema join with broadcast dims (TPC-H Q5 shape).
# --------------------------------------------------------------------------
@register(
    "join_star_revenue",
    sql="""
    SELECT n_name,
           round(cast(sum(cast(l_extendedprice AS decimal(18,4))
             * cast(1 - l_discount AS decimal(18,4))) AS double), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("G11", "G12", "G20", "G32"),
    doc="Revenue by nation over the full star join. Scale: region/nation/"
    "customer broadcast (small dims), lineitem->orders is the only big "
    "shuffle; AQE may convert to broadcast at low SF.",
)
def join_star_revenue(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    rev = _dec("l_extendedprice") * (1 - F.col("l_discount")).cast("decimal(18,4)")
    return (
        c.lineitem.join(
            c.orders.filter(
                F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(c.region.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(_dbl(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# G13: outer joins (the snapshot-diff R10 shape needs full outer).
# --------------------------------------------------------------------------
@register(
    "join_outer_counts",
    sql="""
    SELECT c_custkey, c_name,
           count(o_orderkey) AS n_orders,
           round(cast(coalesce(sum(cast(o_totalprice AS decimal(18,4))), 0)
                 AS double), 4) AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    tags=("G13", "G20", "G42"),
    doc="Left-outer join keeping zero-order customers (count of nullable "
    "key skips nulls). Scale: shuffle join on custkey; partial agg first.",
)
def join_outer_counts(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _dbl(
                F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,4)"))
            ).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# G14/G15: semi/anti joins (exists / insert-if-not-exists R5 analog).
# --------------------------------------------------------------------------
@register(
    "join_semi_anti",
    sql="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_custkey IN (SELECT o_custkey FROM orders)
                THEN 'has_orders' ELSE 'no_orders' END AS status
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("G14", "G15"),
    doc="Semi (exists) + anti (not exists) in one result; the batch analog "
    "of CAS INSERT IF NOT EXISTS precondition (R5).",
)
def join_semi_anti(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    keys = c.orders.select("o_custkey")
    semi = c.customer.join(keys, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
    anti = c.customer.join(keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        semi.select("c_custkey", "c_mktsegment", F.lit("has_orders").alias("status"))
        .unionByName(
            anti.select("c_custkey", "c_mktsegment", F.lit("no_orders").alias("status"))
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# G16/G17: theta / range join (price-band bucketing via non-equi join).
# --------------------------------------------------------------------------
@register(
    "join_range_bands",
    sql="""
    SELECT b.band, count(*) AS n_parts,
           round(cast(sum(cast(p_retailprice AS decimal(18,4))) AS double), 4)
             AS band_value
    FROM part p
    JOIN (VALUES ('low', 0.0, 500.0), ('mid', 500.0, 1200.0),
                 ('high', 1200.0, 100000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
    tags=("G16", "G17", "G12"),
    doc="Non-equi (range) join against a tiny literal band table. Scale: "
    "band side broadcast -> BroadcastNestedLoopJoin, no shuffle of part.",
)
def join_range_bands(spark, sf_dir):
    p = Catalog(spark, sf_dir).part
    bands = spark.createDataFrame(
        [("low", 0.0, 500.0), ("mid", 500.0, 1200.0), ("high", 1200.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _dbl(F.sum(_dec("p_retailprice"))).alias("band_value"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# G18: as-of semantics - last prior purchase per user at each event
# (window formulation; the scalable Spark pattern for "latest ts <= t").
# --------------------------------------------------------------------------
@register(
    "asof_last_purchase",
    sql="""
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_purchase_id
    FROM events
    ORDER BY event_id
    """,
    tags=("G18", "G29", "G31"),
    doc="As-of join (latest purchase at ts < t) via IGNORE NULLS last_value "
    "window - no self-join, single shuffle by user_id.",
)
def asof_last_purchase(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "prev_purchase_id",
            F.last(
                F.when(F.col("event_type") == "purchase", F.col("event_id")),
                ignorenulls=True,
            ).over(w),
        )
        .select("event_id", "user_id", "event_type", "prev_purchase_id")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# G21/G23: distinct aggregation + sorted set materialization (the R4
# key-set snapshot, CassandraListenerRegistry.scala:54, as an agg).
# --------------------------------------------------------------------------
@register(
    "agg_distinct_sets",
    sql="""
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',')
             AS nation_set
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("G21", "G23", "R4"),
    doc="count(distinct) + array_sort(collect_set) per group; the set is "
    "serialized to a sorted CSV string in the final projection so the "
    "output is deterministic AND canonicalizer-safe (driver round-1 "
    "finding: raw array cells crash the external canon sort).",
)
def agg_distinct_sets(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("c_nationkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("nation_set"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# G24: rollup/cube (grouping sets). CUBE over the region->nation join
# covers both shapes: Spark expands either to one Expand + agg pass.
# --------------------------------------------------------------------------
@register(
    "agg_grouping_sets",
    sql="""
    SELECT r_name, n_name, count(*) AS n_customers,
           round(cast(sum(cast(c_acctbal AS decimal(18,4))) AS double), 4)
             AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("G24", "G11", "G12"),
    doc="CUBE over the region->nation hierarchy: per-(region,nation), "
    "per-region, per-nation and grand-total rows in one pass (covers "
    "ROLLUP, whose grouping sets are a subset). Scale: Expand + single "
    "partial+final hash agg; dims broadcast.",
)
def agg_grouping_sets(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    j = c.customer.join(
        F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        j.cube("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dbl(F.sum(_dec("c_acctbal"))).alias("total_bal"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# G25/G26 (+R2): deterministic first/last via min_by/max_by on a unique
# key (R2 collectFirst made deterministic, CassandraLeaderElection.scala:68)
# together with the statistical + exact-percentile aggregates, one pass.
# --------------------------------------------------------------------------
@register(
    "agg_stats_profile",
    sql="""
    SELECT l_returnflag,
           max_by(l_extendedprice, l_orderkey * 8 + l_linenumber) AS last_price,
           min_by(l_extendedprice, l_orderkey * 8 + l_linenumber) AS first_price,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(min(l_quantity), 4) AS min_qty,
           round(max(l_quantity), 4) AS max_qty,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           quantile_cont(l_discount, 0.25) AS p25_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("G25", "G26", "G20", "R2"),
    doc="min_by/max_by keyed on the unique (orderkey,linenumber) encoding "
    "(fully deterministic first/last row pick - no partition-order "
    "dependence), stddev/variance (rounded per §2.4), and exact "
    "interpolated percentiles (Spark percentile == DuckDB quantile_cont, "
    "deterministic order statistics emitted raw).",
)
def agg_stats_profile(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("max_by(l_extendedprice, l_orderkey * 8 + l_linenumber)").alias(
                "last_price"
            ),
            F.expr("min_by(l_extendedprice, l_orderkey * 8 + l_linenumber)").alias(
                "first_price"
            ),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.min("l_quantity"), 4).alias("min_qty"),
            F.round(F.max("l_quantity"), 4).alias("max_qty"),
            F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
            F.expr("percentile(l_discount, 0.25)").alias("p25_disc"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# G27: filtered aggregation (conditional pivot).
# --------------------------------------------------------------------------
@register(
    "agg_filtered_pivot",
    sql="""
    SELECT o_orderpriority,
           cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS n_f,
           cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS n_o,
           cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS n_p,
           round(cast(sum(CASE WHEN o_orderstatus = 'F'
                    THEN cast(o_totalprice AS decimal(18,4)) END) AS double), 4)
             AS f_value
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("G27", "G42"),
    doc="sum(CASE WHEN ...) conditional aggregation - one scan, no joins.",
)
def agg_filtered_pivot(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    def n_of(s):
        return F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            n_of("F").alias("n_f"),
            n_of("O").alias("n_o"),
            n_of("P").alias("n_p"),
            _dbl(
                F.sum(F.when(F.col("o_orderstatus") == "F", _dec("o_totalprice")))
            ).alias("f_value"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# G30/G31: frame-spec running aggregates.
# --------------------------------------------------------------------------
@register(
    "window_running_total",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(cast(sum(cast(o_totalprice AS decimal(18,4)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS double), 4) AS running_spend,
           first_value(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_order,
           round(avg(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("G30", "G31"),
    doc="Running sum (decimal inside the frame agg, double in the output) "
    "+ first_value + 3-row moving average over explicit frames.",
)
def window_running_total(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            _dbl(F.sum(_dec("o_totalprice")).over(run)).alias("running_spend"),
            F.first("o_orderkey").over(run).alias("first_order"),
            F.round(F.avg("o_totalprice").over(mov), 4).alias("moving_avg3"),
        ).orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# G34: per-group top-k via ranking window.
# --------------------------------------------------------------------------
@register(
    "topk_per_group",
    sql="""
    WITH ranked AS (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    )
    SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rn
    FROM ranked WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
    tags=("G34", "G28"),
    doc="Top-3 parts per brand: row_number + filter; single shuffle by "
    "brand, AQE handles skewed brands.",
)
def topk_per_group(spark, sf_dir):
    p = Catalog(spark, sf_dir).part
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            "rn",
        )
        .orderBy("p_brand", "rn")
    )


# --------------------------------------------------------------------------
# G35-G37: set operations (the KeySetWatcher R10 added/removed family).
# --------------------------------------------------------------------------
@register(
    "set_operations",
    sql="""
    WITH h1 AS (SELECT DISTINCT o_custkey AS k FROM orders
                WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
         h2 AS (SELECT DISTINCT o_custkey AS k FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
    SELECT 'union_all' AS op, count(*) AS n FROM (SELECT k FROM h1 UNION ALL SELECT k FROM h2)
    UNION ALL
    SELECT 'union_distinct', count(*) FROM (SELECT k FROM h1 UNION SELECT k FROM h2)
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT k FROM h1 INTERSECT SELECT k FROM h2)
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT k FROM h1 EXCEPT SELECT k FROM h2)
    ORDER BY op
    """,
    tags=("G35", "G36", "G37", "R10"),
    doc="union all/distinct, intersect, except over two key snapshots.",
)
def set_operations(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    cut = F.lit("1996-01-01").cast("timestamp_ntz")
    h1 = o.filter(F.col("o_orderdate") < cut).select(F.col("o_custkey").alias("k")).distinct()
    h2 = o.filter(F.col("o_orderdate") >= cut).select(F.col("o_custkey").alias("k")).distinct()
    rows = [
        h1.unionAll(h2).agg(F.lit("union_all").alias("op"), F.count(F.lit(1)).alias("n")),
        h1.union(h2).distinct().agg(F.lit("union_distinct").alias("op"), F.count(F.lit(1)).alias("n")),
        h1.intersect(h2).agg(F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("n")),
        h1.exceptAll(h2.distinct()).agg(F.lit("except").alias("op"), F.count(F.lit(1)).alias("n")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("op")


# --------------------------------------------------------------------------
# G38: dedup-by-subset with deterministic tie-break (latest order per
# customer) - the engine's canonical "keep one row per key" pattern.
# --------------------------------------------------------------------------
@register(
    "dedup_latest_per_key",
    sql="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM ranked WHERE rn = 1
    ORDER BY o_custkey
    """,
    tags=("G38", "G28", "R9"),
    doc="dropDuplicates with an explicit deterministic winner (newest "
    "order, keys desc) - unlike raw dropDuplicates, stable across runs "
    "and engines.",
)
def dedup_latest_per_key(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# G28/G31: full ranking-window battery + distribution analytics + nth_value
# over an explicit full frame, one windowed pass per spec.
# --------------------------------------------------------------------------
@register(
    "window_rank_stats",
    sql="""
    SELECT s_suppkey, s_nationkey,
           row_number() OVER wd AS rn,
           rank()       OVER wd AS rk,
           dense_rank() OVER wd AS drk,
           ntile(4)     OVER wd AS quartile,
           round(percent_rank() OVER wa, 6) AS pr,
           round(cume_dist() OVER wa, 6) AS cd,
           nth_value(s_suppkey, 2)
             OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_richest
    FROM supplier
    WINDOW wd AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey),
           wa AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
    tags=("G28", "G31"),
    doc="row_number/rank/dense_rank/ntile + percent_rank/cume_dist (exact "
    "rank rationals, rounded identically on both engines) + nth_value "
    "over the full frame; order keys end in the unique suppkey for "
    "determinism. Scale: one shuffle by nationkey, both window specs "
    "evaluated in the same partitioned sort.",
)
def window_rank_stats(spark, sf_dir):
    s = Catalog(spark, sf_dir).supplier
    wd = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    wa = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    full = wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        s.select(
            "s_suppkey",
            "s_nationkey",
            F.row_number().over(wd).alias("rn"),
            F.rank().over(wd).alias("rk"),
            F.dense_rank().over(wd).alias("drk"),
            F.ntile(4).over(wd).alias("quartile"),
            F.round(F.percent_rank().over(wa), 6).alias("pr"),
            F.round(F.cume_dist().over(wa), 6).alias("cd"),
            F.nth_value("s_suppkey", 2).over(full).alias("second_richest"),
        ).orderBy("s_suppkey")
    )
