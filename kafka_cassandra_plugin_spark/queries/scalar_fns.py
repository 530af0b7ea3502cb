"""Scalar-function surface queries (SURVEY.md §2.2 G39-G48 + G49-G53 UDFs).

Every function family is exercised by >=1 oracle-matched query.  Dialect
notes are inline wherever Spark and DuckDB spell the same function
differently (ln vs log, pmod emulation, list_* vs array_*).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ..catalog import Catalog
from . import register


# --------------------------------------------------------------------------
# G39: string functions.
# --------------------------------------------------------------------------
@register(
    "fn_string",
    sql="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           length(p_name) AS name_len,
           substring(p_name, 1, 8) AS name_pre,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(concat('  ', p_name, '  ')) AS name_trim,
           replace(p_type, ' ', '_') AS type_us,
           lpad(cast(p_size AS varchar), 4, '0') AS size_pad,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '.', 'g') AS devowel,
           (p_name LIKE '%a%') AS has_a
    FROM part
    ORDER BY p_partkey
    """,
    tags=("G39",),
    doc="concat/substring/case/trim/length/replace/lpad/regexp/like in one "
    "projection - all JVM-side, whole-stage-codegen'd.",
)
def fn_string(spark, sf_dir):
    p = Catalog(spark, sf_dir).part
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_pre"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
            F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("p_name", r"[aeiou]", ".").alias("devowel"),
            F.col("p_name").like("%a%").alias("has_a"),
        ).orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# G40: date/time functions (TTL arithmetic of R12 lives on these).
# --------------------------------------------------------------------------
@register(
    "fn_datetime",
    sql="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           dayofmonth(o_orderdate) AS d,
           cast(date_trunc('month', o_orderdate) AS timestamp) AS month_start,
           cast(o_orderdate AS date) + INTERVAL 30 DAY AS plus30,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
           cast(epoch(o_orderdate) AS bigint) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    WHERE o_orderkey % 10 = 0
    ORDER BY o_orderkey
    """,
    tags=("G40", "G43"),
    doc="year/month/day extraction, date_trunc, interval add, datediff, "
    "epoch seconds, formatting. Dialect: Spark datediff(end,start) == "
    "DuckDB datediff('day',start,end); Spark date_format == strftime.",
)
def fn_datetime(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp_ntz").alias("plus30"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
            ).alias("days_since_95"),
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# G41: math functions.
# --------------------------------------------------------------------------
@register(
    "fn_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS r2,
           cast(floor(l_extendedprice) AS bigint) AS fl,
           cast(ceil(l_extendedprice) AS bigint) AS ce,
           abs(l_discount - 0.05) AS ad,
           round(pow(l_quantity, 2), 4) AS q2,
           round(sqrt(l_extendedprice), 4) AS sq,
           round(ln(l_extendedprice + 1), 4) AS lg,
           round(exp(l_discount), 4) AS ex,
           ((cast(l_orderkey AS bigint) % 7) + 7) % 7 AS pm,
           cast(sign(l_discount - 0.05) AS double) AS sg
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("G41",),
    doc="round/floor/ceil/abs/pow/sqrt/ln/exp/pmod/sign. Dialect: Spark "
    "log() is natural log == DuckDB ln() (DuckDB log() is log10!); DuckDB "
    "lacks pmod -> ((a%b)+b)%b.",
)
def fn_math(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("r2"),
            F.floor("l_extendedprice").alias("fl"),
            F.ceil("l_extendedprice").alias("ce"),
            F.abs(F.col("l_discount") - 0.05).alias("ad"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("q2"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
            F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("lg"),
            F.round(F.exp("l_discount"), 4).alias("ex"),
            F.pmod(F.col("l_orderkey"), F.lit(7)).alias("pm"),
            F.signum(F.col("l_discount") - 0.05).alias("sg"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# G42: conditionals (the R15 state-machine branches as expressions).
# --------------------------------------------------------------------------
@register(
    "fn_conditional",
    sql="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_class,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_nationkey, 10) AS nk_cap,
           if(c_custkey % 2 = 0, 'even', 'odd') AS parity
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("G42",),
    doc="CASE/coalesce/nullif/greatest/least/if - leader-election branch "
    "logic (CassandraLeaderElection.scala:111-137) as pure expressions.",
)
def fn_conditional(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer
    return (
        c.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("bal_class"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
                "seg_or_other"
            ),
            F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
            F.least(F.col("c_nationkey"), F.lit(10)).alias("nk_cap"),
            F.when(F.col("c_custkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
        ).orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# G43: casts across the type lattice (the reference's string-typed
# payloads, SURVEY §1.2, demand ubiquitous casts).
# --------------------------------------------------------------------------
@register(
    "fn_casts",
    sql="""
    SELECT o_orderkey,
           cast(o_orderkey AS varchar) AS key_str,
           cast(cast(o_orderkey AS varchar) AS bigint) AS key_rt,
           cast(o_totalprice AS decimal(18,2)) AS price_dec,
           cast(trunc(o_totalprice) AS bigint) AS price_int,
           cast(o_orderdate AS date) AS order_date,
           cast(cast(o_orderdate AS date) AS varchar) AS date_str,
           cast('42' AS int) AS lit_int,
           cast('3.5' AS double) AS lit_dbl
    FROM orders
    WHERE o_orderkey % 25 = 0
    ORDER BY o_orderkey
    """,
    tags=("G43",),
    doc="string<->int/double/decimal/timestamp/date casts round-tripping. "
    "Note: double->bigint truncates toward zero in both engines.",
)
def fn_casts(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderkey") % 25 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.col("o_orderkey").cast("string").cast("bigint").alias("key_rt"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
            F.col("o_totalprice").cast("bigint").alias("price_int"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
            F.lit("42").cast("int").alias("lit_int"),
            F.lit("3.5").cast("double").alias("lit_dbl"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# G44: array functions over the embeddings table.
# --------------------------------------------------------------------------
@register(
    "fn_array",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(embedding[1], 4) AS first_el,
           round(list_aggregate(embedding[1:3], 'sum'), 4) AS head3_sum,
           list_contains(list_transform(embedding, x -> x > 0), true) AS any_pos,
           round(list_aggregate(embedding, 'max'), 4) AS max_el,
           round(list_aggregate(embedding, 'min'), 4) AS min_el
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("G44", "G48"),
    doc="size/index/slice/max/min over array<float>. Dialect: DuckDB "
    "1-based list slicing l[1:4] == Spark slice(l,1,3); array_max == "
    "list_aggregate('max').",
)
def fn_array(spark, sf_dir):
    e = Catalog(spark, sf_dir).embeddings
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.col("embedding")[0], 4).alias("first_el"),
            F.round(
                F.aggregate(
                    F.slice("embedding", 1, 3),
                    F.lit(0.0),
                    lambda acc, v: acc + v.cast("double"),
                ),
                4,
            ).alias("head3_sum"),
            F.array_contains(
                F.transform("embedding", lambda v: v > 0), True
            ).alias("any_pos"),
            F.round(F.array_max("embedding"), 4).alias("max_el"),
            F.round(F.array_min("embedding"), 4).alias("min_el"),
        ).orderBy("vec_id")
    )


@register(
    "fn_explode",
    sql="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 20 = 0
    ORDER BY doc_id, token
    """,
    tags=("G44", "G53", "G56"),
    doc="explode(split(text)) tokenization - the UDTF-shaped operator "
    "done with built-ins (no Python in the hot path).",
)
def fn_explode(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .orderBy("doc_id", "token")
    )


# --------------------------------------------------------------------------
# G45: map functions (the KV model of SURVEY §1.1 as first-class values).
# --------------------------------------------------------------------------
@register(
    "fn_map",
    sql="""
    SELECT o_orderkey,
           map_extract(map(['status','priority'],
                           [o_orderstatus, o_orderpriority]), 'status')[1] AS status_v,
           list_sort(map_keys(map(['status','priority'],
                           [o_orderstatus, o_orderpriority]))) AS keys_sorted
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
    tags=("G45",),
    doc="map construction + lookup + sorted key list; mirrors the "
    "reference's kv table as an in-row value.",
)
def fn_map(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            m.getItem("status").alias("status_v"),
            F.array_sort(F.map_keys(m)).alias("keys_sorted"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# G46: JSON extraction over events.props.
# --------------------------------------------------------------------------
@register(
    "fn_json",
    sql="""
    SELECT event_id,
           cast(props->>'k' AS int) AS k_val,
           (props->>'k') AS k_str
    FROM events
    WHERE event_id % 10 = 0
    ORDER BY event_id
    """,
    tags=("G46",),
    doc="get_json_object / from_json over the JSON-string props column. "
    "Spark get_json_object == DuckDB ->> (text extraction).",
)
def fn_json(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return (
        ev.filter(F.col("event_id") % 10 == 0)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_val"),
            F.get_json_object("props", "$.k").alias("k_str"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# G47: deterministic hash functions (dedup keys; the oracle protocol
# itself hashes rows this way).
# --------------------------------------------------------------------------
@register(
    "fn_hash",
    sql="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256
    FROM documents
    WHERE doc_id % 10 = 0
    ORDER BY doc_id
    """,
    tags=("G47", "G54"),
    doc="md5/sha256 content hashes (lowercase hex in both engines); "
    "xxhash64/hash are Spark-specific and kept out of oracle queries.",
)
def fn_hash(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.md5("text").alias("h_md5"), F.sha2("text", 256).alias("h_sha256"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# G48: higher-order array functions - vector math without UDFs.
# --------------------------------------------------------------------------
@register(
    "fn_higher_order",
    sql="""
    SELECT vec_id,
           round(sqrt(list_aggregate(
             list_transform(embedding, x -> cast(x AS double) * x), 'sum')), 4)
             AS l2_norm,
           round(list_aggregate(
             list_filter(list_transform(embedding, x -> cast(x AS double)),
                         x -> x > 0), 'sum'), 4) AS pos_sum,
           len(list_filter(embedding, x -> x < 0)) AS n_neg
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("G48", "G44", "G59"),
    doc="transform/filter/aggregate lambda pipeline: L2 norm + signed "
    "sums, fully JVM-side (Catalyst HigherOrderFunctions), no Python.",
)
def fn_higher_order(spark, sf_dir):
    e = Catalog(spark, sf_dir).embeddings
    sq_sum = F.aggregate(
        F.transform("embedding", lambda v: v.cast("double") * v),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pos_sum = F.aggregate(
        F.filter(
            F.transform("embedding", lambda v: v.cast("double")), lambda v: v > 0
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        e.select(
            "vec_id",
            F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
            F.round(pos_sum, 4).alias("pos_sum"),
            F.size(F.filter("embedding", lambda v: v < 0)).alias("n_neg"),
        ).orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# G50: vectorized pandas UDF (Arrow path) - checked against the same
# logic in SQL on the oracle side.
# --------------------------------------------------------------------------
@register(
    "udf_pandas_scalar",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS total_cost
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("G50",),
    doc="Series->Series pandas UDF over Arrow batches; emits the raw "
    "double product (bit-identical to the SQL formulation - rounding "
    "would reintroduce engine round-rule drift on repr ties).",
)
def udf_pandas_scalar(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem

    @F.pandas_udf("double")
    def total_cost(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    return (
        li.filter(F.col("l_orderkey") % 20 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            total_cost("l_extendedprice", "l_discount", "l_tax").alias("total_cost"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# G49: row-at-a-time Python UDF (the declared escape hatch - kept tiny
# and off the hot path by design).
# --------------------------------------------------------------------------
@register(
    "udf_python_scalar",
    sql="""
    SELECT doc_id,
           CASE WHEN n_chars > 400 THEN 'long'
                WHEN n_chars > 150 THEN 'medium'
                ELSE 'short' END AS size_class
    FROM documents
    WHERE doc_id % 25 = 0
    ORDER BY doc_id
    """,
    tags=("G49",),
    doc="Plain Python UDF; declared as the slow-path escape hatch "
    "(SURVEY §2.2 G49) - bench queries never use it.",
)
def udf_python_scalar(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents

    @F.udf("string")
    def size_class(n):
        if n is None:
            return None
        if n > 400:
            return "long"
        if n > 150:
            return "medium"
        return "short"

    return (
        d.filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", size_class("n_chars").alias("size_class"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# G51/G52: grouped-map applyInPandas + grouped-agg pandas UDAF.
# --------------------------------------------------------------------------
@register(
    "udf_grouped_map",
    sql="""
    SELECT c_nationkey, c_custkey,
           round(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey), 4)
             AS bal_centered
    FROM customer
    ORDER BY c_nationkey, c_custkey
    """,
    tags=("G51",),
    doc="applyInPandas per-group mean-centering (deterministic per-group "
    "transform); oracle side is the equivalent window expression.",
)
def udf_grouped_map(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["bal_centered"] = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()).round(4)
        return pdf[["c_nationkey", "c_custkey", "bal_centered"]]

    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(center, "c_nationkey int, c_custkey long, bal_centered double")
        .orderBy("c_nationkey", "c_custkey")
    )


@register(
    "udf_grouped_agg",
    sql="""
    SELECT c_mktsegment,
           round(sum(c_acctbal) / count(*), 4) AS mean_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("G52",),
    doc="GROUPED_AGG pandas UDAF (mean); Arrow-batched partial per group.",
)
def udf_grouped_agg(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer

    @F.pandas_udf("double")
    def mean_bal(v: pd.Series) -> float:
        return round(v.sum() / len(v), 4)

    return (
        c.groupBy("c_mktsegment")
        .agg(mean_bal("c_acctbal").alias("mean_bal"))
        .orderBy("c_mktsegment")
    )


@register(
    "fn_string2",
    sql="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
             w -> upper(w[1:1]) || lower(w[2:])), ' ') AS name_cap,
           reverse(p_brand) AS brand_rev,
           repeat(p_type[1:1], 3) AS first3,
           left(p_name, 4) AS l4,
           right(p_name, 4) AS r4,
           strpos(p_name, ' ') AS sp_pos,
           split_part(p_name, ' ', 1) AS first_part,
           ltrim('  ' || p_name) AS lt,
           rtrim(p_name || '  ') AS rt,
           translate(p_brand, '#', '-') AS brand_t,
           (p_name ILIKE '%A%') AS has_a_ci
    FROM part
    WHERE p_partkey % 3 = 0
    ORDER BY p_partkey
    """,
    tags=("G39",),
    doc="Second string batch: initcap/reverse/repeat/left/right/position/"
    "split_part/ltrim/rtrim/translate/ilike. Dialect: DuckDB 1-based "
    "slice s[1:1] == Spark substring(s,1,1); strpos == instr; DuckDB "
    "has no initcap - emulated per word with upper(head)||lower(tail).",
)
def fn_string2(spark, sf_dir):
    p = Catalog(spark, sf_dir).part
    return (
        p.filter(F.col("p_partkey") % 3 == 0)
        .select(
            "p_partkey",
            F.initcap("p_name").alias("name_cap"),
            F.reverse("p_brand").alias("brand_rev"),
            F.repeat(F.substring("p_type", 1, 1), 3).alias("first3"),
            F.substring("p_name", 1, 4).alias("l4"),
            F.expr("right(p_name, 4)").alias("r4"),
            F.instr("p_name", " ").alias("sp_pos"),
            F.expr("split_part(p_name, ' ', 1)").alias("first_part"),
            F.ltrim(F.concat(F.lit("  "), F.col("p_name"))).alias("lt"),
            F.rtrim(F.concat(F.col("p_name"), F.lit("  "))).alias("rt"),
            F.translate("p_brand", "#", "-").alias("brand_t"),
            F.col("p_name").ilike("%A%").alias("has_a_ci"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_datetime2",
    sql="""
    SELECT o_orderkey,
           last_day(cast(o_orderdate AS date)) AS month_end,
           cast(date_trunc('quarter', o_orderdate) AS date) AS q_start,
           quarter(o_orderdate) AS q,
           isodow(o_orderdate) - 1 AS weekday_mon0,
           dayofyear(o_orderdate) AS doy,
           cast(o_orderdate AS date) - INTERVAL 90 DAY AS minus90,
           greatest(cast(o_orderdate AS date),
                    DATE '1997-06-01') AS clamped,
           datediff('month', DATE '1995-01-01',
                    cast(o_orderdate AS date)) AS months_since
    FROM orders
    WHERE o_orderkey % 40 = 0
    ORDER BY o_orderkey
    """,
    tags=("G40",),
    doc="Second date batch: last_day / quarter trunc / weekday / "
    "dayofyear / date-interval arithmetic / months_between-style diff. "
    "Dialect: Spark weekday(0=Mon) == DuckDB isodow-1; Spark "
    "months_between truncated == DuckDB datediff('month') only for "
    "month-start anchors (exact-boundary semantics differ mid-month).",
)
def fn_datetime2(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    d = F.col("o_orderdate").cast("date")
    return (
        o.filter(F.col("o_orderkey") % 40 == 0)
        .select(
            "o_orderkey",
            F.last_day(d).alias("month_end"),
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("q_start"),
            F.quarter("o_orderdate").alias("q"),
            F.weekday("o_orderdate").alias("weekday_mon0"),
            F.dayofyear("o_orderdate").alias("doy"),
            F.date_sub(d, 90).cast("timestamp_ntz").alias("minus90"),
            F.greatest(d, F.lit("1997-06-01").cast("date")).alias("clamped"),
            (
                (F.year(d) - F.lit(1995)) * 12 + (F.month(d) - F.lit(1))
            ).cast("bigint").alias("months_since"),
        )
        .orderBy("o_orderkey")
    )
