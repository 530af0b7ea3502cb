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

from pyspark.sql import DataFrame, SparkSession
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
@register(
    "agg_pricing_summary",
    sql="""
    SELECT
      l_returnflag, l_linestatus,
      sum(cast(l_quantity      AS decimal(18,4))) AS sum_qty,
      sum(cast(l_extendedprice AS decimal(18,4))) AS sum_base_price,
      sum(cast(l_extendedprice AS decimal(18,4))
        * cast(1 - l_discount  AS decimal(18,4))) AS sum_disc_price,
      sum(cast(l_extendedprice AS decimal(18,4))
        * cast(1 - l_discount  AS decimal(18,4))
        * cast(1 + l_tax       AS decimal(18,4))) AS sum_charge,
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
    "to parquet scan; no join, one shuffle of 6 rows.",
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
            F.sum(_dec("l_quantity")).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
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
           round(o_totalprice, 2) AS price2
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND (o_custkey % 2 = 0 OR NOT (o_orderkey % 3 = 0))
      AND o_orderdate IS NOT NULL
    ORDER BY o_orderkey
    """,
    tags=("G7", "G8", "G9", "G41"),
    doc="BETWEEN / IN / LIKE / IS NULL / AND-OR-NOT composition. Scale: "
    "all predicates are Catalyst-pushable; parquet scan prunes to 5 cols.",
)
def filter_predicates(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
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
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# G10: null-safe equality (the ValueWatcher Option[String] compare,
# CacheListenerRegistry.scala:49).
# --------------------------------------------------------------------------
@register(
    "nullsafe_compare",
    sql="""
    WITH prev AS (
      SELECT o_custkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS v,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS w
      FROM orders
    )
    SELECT o_custkey, v, w, (v IS NOT DISTINCT FROM w) AS same
    FROM prev
    WHERE NOT (v IS NOT DISTINCT FROM w)
    ORDER BY o_custkey, v NULLS FIRST, w NULLS FIRST
    """,
    tags=("G10", "G42"),
    doc="Null-safe <=> compare of two nullable derivations; mirrors the "
    "watcher's Option[String] cache compare.",
)
def nullsafe_compare(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    d = o.select(
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("v"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("w"),
    )
    d = d.withColumn("same", F.col("v").eqNullSafe(F.col("w")))
    return d.filter(~F.col("same")).orderBy(
        "o_custkey",
        F.col("v").asc_nulls_first(),
        F.col("w").asc_nulls_first(),
    )


# --------------------------------------------------------------------------
# G11/G12: star-schema join with broadcast dims (TPC-H Q5 shape).
# --------------------------------------------------------------------------
@register(
    "join_star_revenue",
    sql="""
    SELECT n_name,
           sum(cast(l_extendedprice AS decimal(18,4))
             * cast(1 - l_discount AS decimal(18,4))) AS revenue,
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
        .agg(F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
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
           coalesce(sum(cast(o_totalprice AS decimal(18,4))), 0) AS total_spend
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
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,4)")).alias(
                "total_spend"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer_diff",
    sql="""
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
         b AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
    SELECT coalesce(a.k, b.k) AS custkey,
           CASE WHEN a.k IS NULL THEN 'added'
                WHEN b.k IS NULL THEN 'removed'
                ELSE 'kept' END AS change
    FROM a FULL OUTER JOIN b ON a.k = b.k
    ORDER BY custkey
    """,
    tags=("G13", "G38", "R10"),
    doc="Full-outer snapshot diff of two key sets - the batch formulation "
    "of KeySetWatcher (CacheListenerRegistry.scala:63-81).",
)
def join_full_outer_diff(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    cut = F.lit("1997-01-01").cast("timestamp_ntz")
    a = o.filter(F.col("o_orderdate") < cut).select(F.col("o_custkey").alias("ak")).distinct()
    b = o.filter(F.col("o_orderdate") >= cut).select(F.col("o_custkey").alias("bk")).distinct()
    j = a.join(b, F.col("ak") == F.col("bk"), "outer")
    return (
        j.select(
            F.coalesce("ak", "bk").alias("custkey"),
            F.when(F.col("ak").isNull(), "added")
            .when(F.col("bk").isNull(), "removed")
            .otherwise("kept")
            .alias("change"),
        ).orderBy("custkey")
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
           sum(cast(p_retailprice AS decimal(18,4))) AS band_value
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
            F.sum(_dec("p_retailprice")).alias("band_value"),
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
# G19: cross join (the brute-force similarity substrate).
# --------------------------------------------------------------------------
@register(
    "cross_join_pairs",
    sql="""
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a CROSS JOIN nation b
    WHERE a.n_regionkey = 0 AND b.n_regionkey = 1 AND a.n_nationkey < b.n_nationkey
    ORDER BY n1, n2
    """,
    tags=("G19",),
    doc="Filtered cross join of two small dims (broadcast NL join).",
)
def cross_join_pairs(spark, sf_dir):
    n = Catalog(spark, sf_dir).nation
    a = n.filter(F.col("n_regionkey") == 0).select(
        F.col("n_name").alias("n1"), F.col("n_nationkey").alias("k1")
    )
    b = n.filter(F.col("n_regionkey") == 1).select(
        F.col("n_name").alias("n2"), F.col("n_nationkey").alias("k2")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("k1") < F.col("k2"))
        .select("n1", "n2")
        .orderBy("n1", "n2")
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
           list_sort(list(DISTINCT c_nationkey)) AS nation_set
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("G21", "G23", "R4"),
    doc="count(distinct) + array_sort(collect_set) per group; sorted-array "
    "protocol makes set output deterministic (SURVEY §2.4 rule 4).",
)
def agg_distinct_sets(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.array_sort(F.collect_set("c_nationkey")).alias("nation_set"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# G24: rollup / grouping sets.
# --------------------------------------------------------------------------
@register(
    "agg_rollup",
    sql="""
    SELECT r_name, n_name, count(*) AS n_customers,
           sum(cast(c_acctbal AS decimal(18,4))) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("G24", "G11", "G12"),
    doc="ROLLUP over region->nation hierarchy with grand total. Scale: "
    "Spark expands rollup to grouping sets in one pass (Expand + agg).",
)
def agg_rollup(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    j = c.customer.join(
        F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).alias("total_bal"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "agg_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("G24",),
    doc="CUBE across two independent dimensions.",
)
def agg_cube(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# G25: deterministic first/last via min_by/max_by (R2 collectFirst made
# deterministic - CassandraLeaderElection.scala:68).
# --------------------------------------------------------------------------
@register(
    "agg_minmax_by",
    sql="""
    SELECT c_mktsegment,
           max_by(c_acctbal, c_custkey) AS bal_of_latest_cust,
           min_by(c_acctbal, c_custkey) AS bal_of_first_cust,
           round(max(c_acctbal), 4) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("G25", "R2"),
    doc="min_by/max_by keyed on the unique custkey => fully deterministic "
    "first/last row pick (no partition-order dependence).",
)
def agg_minmax_by(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.expr("max_by(c_acctbal, c_custkey)").alias("bal_of_latest_cust"),
            F.expr("min_by(c_acctbal, c_custkey)").alias("bal_of_first_cust"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# G26: statistical aggregates.
# --------------------------------------------------------------------------
@register(
    "agg_stats",
    sql="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(min(l_quantity), 4) AS min_qty,
           round(max(l_quantity), 4) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("G26",),
    doc="stddev/variance (rounded per §2.4; percentile_approx is declared "
    "non-oracle and exercised in unit tests).",
)
def agg_stats(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.min("l_quantity"), 4).alias("min_qty"),
            F.round(F.max("l_quantity"), 4).alias("max_qty"),
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
           sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_f,
           sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_o,
           sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_p,
           sum(CASE WHEN o_orderstatus = 'F'
                    THEN cast(o_totalprice AS decimal(18,4)) END) AS f_value
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
            F.sum(
                F.when(F.col("o_orderstatus") == "F", _dec("o_totalprice"))
            ).alias("f_value"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# G28: ranking windows.
# --------------------------------------------------------------------------
@register(
    "window_rank",
    sql="""
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rk,
           dense_rank() OVER w AS drk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
    tags=("G28",),
    doc="row_number/rank/dense_rank/ntile in one windowed pass; order key "
    "ends in unique custkey for determinism.",
)
def window_rank(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("quartile"),
        ).orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# G29: lag/lead - THE batch formulation of ValueWatcher change detection
# (CacheListenerRegistry.scala:47-52).
# --------------------------------------------------------------------------
@register(
    "window_lag_change",
    sql="""
    WITH t AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT user_id, event_id, prev_type, event_type
    FROM t
    WHERE prev_type IS DISTINCT FROM event_type
    ORDER BY user_id, event_id
    """,
    tags=("G29", "G10", "R9"),
    doc="Emit rows only where the per-key value changed vs the previous "
    "observation - ValueWatcher.run() as a single windowed scan.",
)
def window_lag_change(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(~F.col("prev_type").eqNullSafe(F.col("event_type")))
        .select("user_id", "event_id", "prev_type", "event_type")
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# G30/G31: frame-spec running aggregates.
# --------------------------------------------------------------------------
@register(
    "window_running_total",
    sql="""
    SELECT o_custkey, o_orderkey,
           sum(cast(o_totalprice AS decimal(18,4)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_spend,
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
    doc="Running decimal sum + first_value + 3-row moving average over "
    "explicit frames.",
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
            F.sum(_dec("o_totalprice")).over(run).alias("running_spend"),
            F.first("o_orderkey").over(run).alias("first_order"),
            F.round(F.avg("o_totalprice").over(mov), 4).alias("moving_avg3"),
        ).orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# G32/G33: global sort + top-k (TakeOrderedAndProject).
# --------------------------------------------------------------------------
@register(
    "sort_topk_orders",
    sql="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("G32", "G33"),
    doc="Global top-50. Scale: Spark plans TakeOrderedAndProject - per-"
    "partition heaps + driver merge, never a full sort of the table.",
)
def sort_topk_orders(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy(F.col("price").desc(), "o_orderkey")
        .limit(50)
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


@register(
    "window_distribution",
    sql="""
    SELECT s_suppkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           nth_value(s_suppkey, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_richest
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
    tags=("G28", "G31"),
    doc="Distribution analytics: percent_rank/cume_dist (rank ratios - "
    "exact rationals, rounded identically) + nth_value over the full "
    "frame.",
)
def window_distribution(spark, sf_dir):
    s = Catalog(spark, sf_dir).supplier
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    full = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        s.select(
            "s_suppkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.nth_value("s_suppkey", 2).over(full).alias("second_richest"),
        ).orderBy("s_suppkey")
    )
