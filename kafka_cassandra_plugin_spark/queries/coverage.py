"""Remaining-inventory declared queries: sources/sinks round-trips
(G2/G5), the spark.sql entry point over temp views (G6), approximate
aggregates (G22/G26 - declared non-oracle), and the multimodal planning
ops (G62) whose metadata arithmetic IS SQL-expressible."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators import multimodal as M
from . import register


# --------------------------------------------------------------------------
# G2 + G5: CSV and parquet round-trips.  The oracle runs on the original
# view: round-trip losslessness IS the assertion.
# --------------------------------------------------------------------------
_RT_COLS = "n_nationkey int, n_name string, n_regionkey int"


@register(
    "csv_roundtrip",
    sql="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    tags=("G2", "G5"),
    doc="nation -> CSV (header) -> read back with explicit schema; must "
    "equal the source (schema inference is deliberately never used).",
)
def csv_roundtrip(spark, sf_dir):
    n = Catalog(spark, sf_dir).nation
    path = os.path.join(tempfile.gettempdir(), "kcp_csv_rt")
    n.write.mode("overwrite").option("header", True).csv(path)
    return (
        spark.read.csv(path, schema=_RT_COLS, header=True)
        .orderBy("n_nationkey")
    )


@register(
    "parquet_roundtrip",
    sql="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier ORDER BY s_suppkey
    """,
    tags=("G1", "G5"),
    doc="supplier -> parquet sink -> re-read; lossless incl. doubles.",
)
def parquet_roundtrip(spark, sf_dir):
    s = Catalog(spark, sf_dir).supplier
    path = os.path.join(tempfile.gettempdir(), "kcp_parquet_rt")
    s.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).orderBy("s_suppkey")


# --------------------------------------------------------------------------
# G6: the spark.sql entry point over registered temp views (lifecycle
# entry point 1 of SURVEY §3.5).
# --------------------------------------------------------------------------
@register(
    "sql_entry_point",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("G6", "G14", "G20"),
    doc="TPC-H Q4 shape through spark.sql over temp views - parser/"
    "analyzer path incl. a correlated EXISTS (planned as left-semi).",
)
def sql_entry_point(spark, sf_dir):
    Catalog(spark, sf_dir).register_views(("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# G22 + G26: approximate aggregates - declared NON-oracle (sketches are
# engine-specific); bound-checked rows-only + pinned in unit tests.
# --------------------------------------------------------------------------
@register(
    "approx_aggregates",
    sql=None,
    tags=("G22", "G26"),
    doc="approx_count_distinct (HLL++) + percentile_approx per segment; "
    "sketch outputs are engine-specific => rows-only here, error bounds "
    "asserted in tests/test_coverage.py (HLL within 5% of exact).",
)
def approx_aggregates(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.approx_count_distinct("c_custkey").alias("approx_customers"),
            F.percentile_approx("c_acctbal", 0.5).alias("approx_median_bal"),
            F.percentile_approx("c_acctbal", [0.25, 0.75]).alias("approx_quartiles"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# G62: multimodal planning ops - metadata arithmetic, fully
# SQL-expressible, so the planning layer gets a real oracle.
# --------------------------------------------------------------------------
@register(
    "media_resize_plan",
    sql="""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             cast(doc_id % 640 + 32 AS int) AS width,
             cast(doc_id % 480 + 32 AS int) AS height
      FROM documents
    )
    SELECT media_id,
           width AS src_w, height AS src_h,
           least(224.0 / width, 224.0 / height, 1.0) AS scale,
           cast(least(ceil(width * least(224.0 / width, 224.0 / height, 1.0)), 224) AS int) AS dst_w,
           cast(least(ceil(height * least(224.0 / width, 224.0 / height, 1.0)), 224) AS int) AS dst_h,
           least(224.0 / width, 224.0 / height, 1.0) < 1.0 AS needs_resize
    FROM media WHERE kind = 'image'
    ORDER BY media_id
    """,
    tags=("G62", "G41", "G42"),
    doc="resize_plan over the synthetic media table: pure metadata "
    "arithmetic (payload bytes untouched) - the prune-before-decode "
    "split that matters at 100 TB.",
)
def media_resize_plan(spark, sf_dir):
    media = M.synth_media_table(Catalog(spark, sf_dir).documents)
    return M.resize_plan(media, 224, 224).orderBy("media_id")


@register(
    "media_frame_plan",
    sql="""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             cast(doc_id % 5000 + 100 AS int) AS duration_ms
      FROM documents
    )
    SELECT media_id, unnest(range(0, greatest(duration_ms - 1, 0) + 1, 1000)) AS frame_ts_ms
    FROM media WHERE kind = 'video'
    ORDER BY media_id, frame_ts_ms
    """,
    tags=("G62", "G44"),
    doc="frame_sample_plan: explode each video into the frame timestamps "
    "to decode (1 fps) from duration metadata alone.",
)
def media_frame_plan(spark, sf_dir):
    media = M.synth_media_table(Catalog(spark, sf_dir).documents)
    return M.frame_sample_plan(media, every_ms=1000).orderBy(
        "media_id", "frame_ts_ms"
    )


@register(
    "media_decode_features",
    sql=None,
    tags=("G62", "G50"),
    doc="decode_features: Arrow-batched mapInPandas over binary payloads "
    "(deterministic stub kernel - real decoders are not in this "
    "container; plumbing, schema and batch shape are the tested part).",
)
def media_decode_features(spark, sf_dir):
    media = M.synth_media_table(Catalog(spark, sf_dir).documents)
    feats = M.decode_features(media, batch_note_col=None)
    return feats.select(
        "media_id", F.round(F.element_at("features", 1), 6).alias("f0")
    ).orderBy("media_id")
