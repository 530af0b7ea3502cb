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
    sql="""
    SELECT n_nationkey, n_name, n_regionkey, r_name
    FROM nation JOIN region ON r_regionkey = n_regionkey
    ORDER BY n_nationkey
    """,
    tags=("G2", "G5"),
    doc="nation -> CSV (header) -> read back, region -> JSON lines -> "
    "read back, joined: both text formats must round-trip losslessly "
    "against the parquet source (explicit schemas - inference is "
    "deliberately never used).",
)
def csv_roundtrip(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(), "kcp_csv_rt")
    c.nation.write.mode("overwrite").option("header", True).csv(path)
    n = spark.read.csv(path, schema=_RT_COLS, header=True)
    jpath = os.path.join(tempfile.gettempdir(), "kcp_json_rt")
    c.region.select("r_regionkey", "r_name").write.mode("overwrite").json(jpath)
    r = spark.read.json(jpath, schema="r_regionkey int, r_name string")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name", "n_regionkey", "r_name")
        .orderBy("n_nationkey")
    )


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
            # quartiles as two scalar columns (array outputs crash the
            # external canonicalizer - round-1 driver finding)
            F.percentile_approx("c_acctbal", 0.25).alias("approx_p25"),
            F.percentile_approx("c_acctbal", 0.75).alias("approx_p75"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# G62: multimodal planning ops - metadata arithmetic, fully
# SQL-expressible, so the planning layer gets a real oracle.
# --------------------------------------------------------------------------
@register(
    "media_plans",
    sql="""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             cast(doc_id % 640 + 32 AS int) AS width,
             cast(doc_id % 480 + 32 AS int) AS height,
             cast(doc_id % 5000 + 100 AS int) AS duration_ms
      FROM documents
    ),
    resize AS (
      SELECT media_id, 'resize' AS plan,
             cast(least(ceil(width * least(224.0 / width, 224.0 / height, 1.0)), 224) AS bigint) AS a,
             cast(least(ceil(height * least(224.0 / width, 224.0 / height, 1.0)), 224) AS bigint) AS b
      FROM media WHERE kind = 'image'
    ),
    frames AS (
      SELECT media_id, 'frame' AS plan,
             cast(unnest(range(0, greatest(duration_ms - 1, 0) + 1, 1000)) AS bigint) AS a,
             cast(NULL AS bigint) AS b
      FROM media WHERE kind = 'video'
    )
    SELECT media_id, plan, a, b FROM resize
    UNION ALL
    SELECT media_id, plan, a, b FROM frames
    ORDER BY media_id, plan, a
    """,
    tags=("G62", "G41", "G42", "G44"),
    doc="resize_plan (images: target dims from width/height metadata) + "
    "frame_sample_plan (videos: 1 fps decode timestamps from duration "
    "metadata) in one tall result - pure metadata arithmetic, payload "
    "bytes untouched: the prune-before-decode split that matters at "
    "100 TB. Image and video media_ids are disjoint, so the union is a "
    "partition of the plan work list.",
)
def media_plans(spark, sf_dir):
    media = M.synth_media_table(Catalog(spark, sf_dir).documents)
    resize = M.resize_plan(media, 224, 224).select(
        "media_id",
        F.lit("resize").alias("plan"),
        F.col("dst_w").cast("bigint").alias("a"),
        F.col("dst_h").cast("bigint").alias("b"),
    )
    frames = M.frame_sample_plan(media, every_ms=1000).select(
        "media_id",
        F.lit("frame").alias("plan"),
        F.col("frame_ts_ms").cast("bigint").alias("a"),
        F.lit(None).cast("bigint").alias("b"),
    )
    return resize.unionByName(frames).orderBy("media_id", "plan", "a")


# The stub kernel is sha256(payload) bytes / 255.0 (one digest for
# FEATURE_DIM=16), and payload = utf-8 of the text - so DuckDB can
# re-derive every feature from sha256(text)'s hex output.  Byte i of
# the digest = the i-th hex PAIR, decoded by position arithmetic
# (DuckDB has no hex-pair-to-int builtin):
def _hexbyte(i: int) -> str:
    p = 2 * i + 1
    return (
        f"((strpos('0123456789abcdef', substr(h,{p},1))-1)*16"
        f" + strpos('0123456789abcdef', substr(h,{p + 1},1))-1)"
    )


# fold-ordered mean: the SAME left-associated double additions the
# Spark side chains below (((0.0+v0)+v1)+... - never a SUM() whose
# accumulation order the engine may choose)
_MEDIA_SUM = "0.0"
for _i in range(16):
    _MEDIA_SUM = f"({_MEDIA_SUM} + {_hexbyte(_i)}/255.0)"

MEDIA_DECODE_SQL = f"""
    WITH d AS (SELECT doc_id AS media_id, sha256(text) AS h
               FROM documents)
    SELECT media_id,
           round({_hexbyte(0)}/255.0, 6) AS f0,
           round({_hexbyte(7)}/255.0, 6) AS f7,
           round({_hexbyte(8)}/255.0, 6) AS f8,
           round({_hexbyte(15)}/255.0, 6) AS f15,
           round({_MEDIA_SUM}/16.0, 6) AS f_mean
    FROM d
    ORDER BY media_id
"""


@register(
    "media_decode_features",
    sql=MEDIA_DECODE_SQL,
    tags=("G62", "G50"),
    doc="decode_features: Arrow-batched mapInPandas over binary payloads. "
    "Round-14: VALUE-VERIFIED - the stub kernel is one sha256 expansion, "
    "which DuckDB re-derives from sha256(text) hex (feature bytes by "
    "hex-pair arithmetic, fold-ordered mean), so the declared row "
    "hash-matches end-to-end through the real mapInPandas plumbing.  "
    "Only the REAL byte-decode (kernel=codec - pure-stdlib PNG/WAV "
    "decoders in operators/media_codecs.py, which no SQL engine runs) "
    "stays pytest-gated on planted real bytes in tests/test_multimodal.py "
    "and benched as media_codec_features.",
)
def media_decode_features(spark, sf_dir):
    media = M.synth_media_table(Catalog(spark, sf_dir).documents)
    feats = M.decode_features(media, batch_note_col=None)
    mean = F.lit(0.0)
    for i in range(1, 17):
        mean = mean + F.element_at(F.col("features"), i)
    return feats.select(
        "media_id",
        F.round(F.element_at(F.col("features"), 1), 6).alias("f0"),
        F.round(F.element_at(F.col("features"), 8), 6).alias("f7"),
        F.round(F.element_at(F.col("features"), 9), 6).alias("f8"),
        F.round(F.element_at(F.col("features"), 16), 6).alias("f15"),
        F.round(mean / 16.0, 6).alias("f_mean"),
    ).orderBy("media_id")


# --------------------------------------------------------------------------
# G8+G20: TPC-H Q6 shape - the canonical scan-dominated filter+agg
# (pure pushdown + map-side aggregation, zero-row shuffle).
# --------------------------------------------------------------------------
@register(
    "agg_forecast_revenue",
    sql="""
    SELECT round(cast(sum(cast(l_extendedprice AS decimal(18,4))
             * cast(l_discount AS decimal(18,4))) AS double), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("G8", "G20", "G1"),
    doc="TPC-H Q6 shape: every predicate parquet-pushable, single global "
    "agg - the scan-bandwidth benchmark.",
)
def agg_forecast_revenue(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * F.col("l_discount").cast("decimal(18,4)")
            ).cast("double"),
            4,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# G53: a real Python UDTF (table function) - one input row -> many output
# rows with computed columns.
# --------------------------------------------------------------------------
@register(
    "udtf_token_table",
    sql=r"""
    WITH ex AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token,
             generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id, pos, token, length(token) AS token_len
    FROM ex
    ORDER BY doc_id, pos
    """,
    tags=("G53", "G49"),
    doc="Python UDTF (@udtf): text -> (pos, token, token_len) rows; the "
    "lateral-join table-function surface. Hot paths use explode(split) "
    "instead (fn_explode) - this pins the UDTF API itself. Round-15 "
    "(guide §4, §6): the doc_id filter moved into a subquery UNDER the "
    "lateral join - the optimizer does not push filters through a "
    "Python UDTF, so the WHERE-above form tokenized all docs and threw "
    "98% away (plan: Filter above BatchEvalPythonUDTF, no "
    "PushedFilters); and the UDTF opts into Arrow serialization "
    "(useArrow=True - eval is still per row, §4.1, only the boundary "
    "encoding changes).",
)
def udtf_token_table(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int", useArrow=True)
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for pos, tok in enumerate(text.strip().split()):
                yield pos, tok, len(tok)

    spark.udtf.register("kcp_tokenize", Tokenize)
    Catalog(spark, sf_dir).register_views(("documents",))
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token, t.token_len
        FROM (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0) d,
             LATERAL kcp_tokenize(text) AS t
        ORDER BY doc_id, t.pos
        """
    )


# --------------------------------------------------------------------------
# G5 at scale: PARTITIONED parquet sink + partition-pruned re-read.
# --------------------------------------------------------------------------
@register(
    "parquet_roundtrip",
    sql="""
    SELECT o_orderkey, o_orderstatus, year(o_orderdate) AS y
    FROM orders
    WHERE year(o_orderdate) = 1997
    ORDER BY o_orderkey
    """,
    tags=("G5", "G1", "G40"),
    doc="orders written partitionBy(year) to a parquet sink then re-read "
    "with a partition predicate: the 100 TB layout pattern - the y=1997 "
    "filter prunes directories, non-matching files are never opened "
    "(PartitionFilters pinned in tests/test_plans.py). Losslessness of "
    "the sink IS the assertion (oracle runs on the source view).",
)
def parquet_roundtrip(spark, sf_dir):
    import os, tempfile

    o = Catalog(spark, sf_dir).orders
    path = os.path.join(tempfile.gettempdir(), "kcp_parquet_part_rt")
    (
        o.withColumn("y", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("y")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("y") == 1997)
        .select("o_orderkey", "o_orderstatus", F.col("y").cast("bigint").alias("y"))
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# ORC round-trip (round 9): the third text/columnar format the G2/G5
# rows cover.  Spark writes/reads ORC natively; DuckDB has no ORC
# reader, so — exactly like csv_roundtrip — the oracle runs the SAME
# relational core on the parquet source views: round-trip
# LOSSLESSNESS (schema + values through the ORC writer/reader) is the
# assertion.  Declared-query window is full (50), so this runs
# pytest-oracled like the tier-D queries.
# --------------------------------------------------------------------------

ORC_ROUNDTRIP_SQL = """
    SELECT n_nationkey, n_name, n_regionkey, r_name
    FROM nation JOIN region ON r_regionkey = n_regionkey
    ORDER BY n_nationkey
"""


def orc_roundtrip(spark, sf_dir):
    """nation AND region -> ORC -> read back (explicit schemas — the
    same no-inference discipline as csv_roundtrip), joined."""
    c = Catalog(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(), "kcp_orc_rt")
    c.nation.write.mode("overwrite").orc(path)
    n = spark.read.schema(_RT_COLS).orc(path)
    rpath = os.path.join(tempfile.gettempdir(), "kcp_orc_rt_region")
    c.region.select("r_regionkey", "r_name").write.mode("overwrite").orc(rpath)
    r = spark.read.schema("r_regionkey int, r_name string").orc(rpath)
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name", "n_regionkey", "r_name")
        .orderBy("n_nationkey")
    )
