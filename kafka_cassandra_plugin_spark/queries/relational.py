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
