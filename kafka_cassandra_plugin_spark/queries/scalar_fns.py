"""Scalar-function surface queries (SURVEY.md §2.2 G39-G48 + G49-G53 UDFs).

Every function family is exercised by >=1 oracle-matched query.  Dialect
notes are inline wherever Spark and DuckDB spell the same function
differently (ln vs log, pmod emulation, list_* vs array_*).

Output-type protocol (driver round-1 finding): declared queries emit only
atomic, non-decimal columns — decimal math is cast back to double (or
rendered as a string) and collection values are serialized in the final
projection, because the external canonicalizer renders Spark Decimal and
DuckDB decimal differently and crashes on array cells.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ..catalog import Catalog
from . import register


# --------------------------------------------------------------------------
# G39: the string-function battery (both batches in one projection).
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
           (p_name LIKE '%a%') AS has_a,
           array_to_string(list_transform(string_split(p_name, ' '),
             w -> upper(w[1:1]) || lower(w[2:])), ' ') AS name_cap,
           reverse(p_brand) AS brand_rev,
           repeat(p_type[1:1], 3) AS first3,
           right(p_name, 4) AS r4,
           strpos(p_name, ' ') AS sp_pos,
           split_part(p_name, ' ', 1) AS first_part,
           ltrim('  ' || p_name) AS lt,
           rtrim(p_name || '  ') AS rt,
           translate(p_brand, '#', '-') AS brand_t,
           (p_name ILIKE '%A%') AS has_a_ci
    FROM part
    ORDER BY p_partkey
    """,
    tags=("G39",),
    doc="concat/substring/case/trim/length/replace/lpad/regexp/like plus "
    "initcap/reverse/repeat/right/position/split_part/ltrim/rtrim/"
    "translate/ilike in one projection - all JVM-side, whole-stage-"
    "codegen'd. Dialect: DuckDB 1-based slice s[1:1] == Spark "
    "substring(s,1,1); strpos == instr; DuckDB has no initcap - emulated "
    "per word with upper(head)||lower(tail).",
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
            F.initcap("p_name").alias("name_cap"),
            F.reverse("p_brand").alias("brand_rev"),
            F.repeat(F.substring("p_type", 1, 1), 3).alias("first3"),
            F.expr("right(p_name, 4)").alias("r4"),
            F.instr("p_name", " ").alias("sp_pos"),
            F.expr("split_part(p_name, ' ', 1)").alias("first_part"),
            F.ltrim(F.concat(F.lit("  "), F.col("p_name"))).alias("lt"),
            F.rtrim(F.concat(F.col("p_name"), F.lit("  "))).alias("rt"),
            F.translate("p_brand", "#", "-").alias("brand_t"),
            F.col("p_name").ilike("%A%").alias("has_a_ci"),
        ).orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# G40: the date/time battery (TTL arithmetic of R12 lives on these).
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
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           last_day(cast(o_orderdate AS date)) AS month_end,
           cast(date_trunc('quarter', o_orderdate) AS date) AS q_start,
           quarter(o_orderdate) AS q,
           isodow(o_orderdate) - 1 AS weekday_mon0,
           dayofyear(o_orderdate) AS doy,
           cast(o_orderdate AS date) - INTERVAL 90 DAY AS minus90,
           greatest(cast(o_orderdate AS date), DATE '1997-06-01') AS clamped,
           datediff('month', DATE '1995-01-01',
                    cast(o_orderdate AS date)) AS months_since
    FROM orders
    WHERE o_orderkey % 10 = 0
    ORDER BY o_orderkey
    """,
    tags=("G40", "G43"),
    doc="year/month/day extraction, date_trunc (month+quarter), interval "
    "add/sub, datediff, epoch seconds, formatting, last_day, quarter, "
    "weekday, dayofyear, date clamp, month diff. Dialect: Spark "
    "datediff(end,start) == DuckDB datediff('day',start,end); Spark "
    "date_format == strftime; Spark weekday(0=Mon) == DuckDB isodow-1; "
    "month diff anchored at month starts so truncation semantics agree.",
)
def fn_datetime(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    d = F.col("o_orderdate").cast("date")
    return (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
            F.date_add(d, 30).cast("timestamp_ntz").alias("plus30"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
            ).alias("days_since_95"),
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
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
# G42 + G43: conditionals (the R15 state-machine branches as expressions)
# and casts across the type lattice (the reference's string-typed payloads,
# SURVEY §1.2, demand ubiquitous casts) — one projection over orders.
# --------------------------------------------------------------------------
@register(
    "fn_conditional_casts",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_class,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           greatest(o_totalprice, 100000.0) AS price_floor,
           least(length(o_orderpriority), 8) AS prio_cap,
           if(o_orderkey % 2 = 0, 'even', 'odd') AS parity,
           cast(o_orderkey AS varchar) AS key_str,
           cast(cast(o_orderkey AS varchar) AS bigint) AS key_rt,
           cast(cast(o_totalprice AS decimal(18,2)) AS varchar) AS price_dec_str,
           cast(trunc(o_totalprice) AS bigint) AS price_int,
           cast(o_orderdate AS date) AS order_date,
           cast(cast(o_orderdate AS date) AS varchar) AS date_str,
           cast('42' AS int) AS lit_int,
           cast('3.5' AS double) AS lit_dbl
    FROM orders
    WHERE o_orderkey % 25 = 0
    ORDER BY o_orderkey
    """,
    tags=("G42", "G43"),
    doc="CASE/coalesce/nullif/greatest/least/if (leader-election branch "
    "logic, CassandraLeaderElection.scala:111-137, as pure expressions) + "
    "string<->int/double/decimal/timestamp/date cast round-trips. The "
    "decimal(18,2) cast is rendered as a string on both engines "
    "(canonicalizer-safe); double->bigint truncates toward zero in both.",
)
def fn_conditional_casts(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderkey") % 25 == 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") < 50000, "low")
            .when(F.col("o_totalprice") < 150000, "mid")
            .otherwise("high")
            .alias("price_class"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
            ).alias("status_or_open"),
            F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor"),
            F.least(F.length("o_orderpriority"), F.lit(8)).alias("prio_cap"),
            F.when(F.col("o_orderkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.col("o_orderkey").cast("string").cast("bigint").alias("key_rt"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias(
                "price_dec_str"
            ),
            F.col("o_totalprice").cast("bigint").alias("price_int"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
            F.lit("42").cast("int").alias("lit_int"),
            F.lit("3.5").cast("double").alias("lit_dbl"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# G44 + G48: array functions and higher-order lambda pipelines over the
# embeddings table — vector math without UDFs.
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
           round(list_aggregate(embedding, 'min'), 4) AS min_el,
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
    tags=("G44", "G48", "G59"),
    doc="size/index/slice/max/min plus transform/filter/aggregate lambda "
    "pipelines (L2 norm, signed sums) over array<float> — fully JVM-side "
    "(Catalyst HigherOrderFunctions), no Python. Dialect: DuckDB 1-based "
    "list slicing l[1:4] == Spark slice(l,1,3); array_max == "
    "list_aggregate('max'); F.aggregate == list_reduce with seed.",
)
def fn_array(spark, sf_dir):
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
            F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
            F.round(pos_sum, 4).alias("pos_sum"),
            F.size(F.filter("embedding", lambda v: v < 0)).alias("n_neg"),
        ).orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# G45/G46/G47: semi-structured battery over events — JSON extraction,
# deterministic content hashes, and map construction/lookup (the KV model
# of SURVEY §1.1 as an in-row value), serialized canonicalizer-safe.
# --------------------------------------------------------------------------
@register(
    "fn_semistructured",
    sql="""
    SELECT event_id,
           cast(props->>'k' AS int) AS k_val,
           (props->>'k') AS k_str,
           md5(props) AS h_md5,
           sha256(props) AS h_sha256,
           map_extract(map(['type','k'], [event_type, props->>'k']), 'type')[1]
             AS type_v,
           array_to_string(list_sort(map_keys(
             map(['type','k'], [event_type, props->>'k']))), ',') AS keys_csv
    FROM events
    WHERE event_id % 10 = 0
    ORDER BY event_id
    """,
    tags=("G45", "G46", "G47", "G54"),
    doc="get_json_object (Spark) == ->> (DuckDB) text extraction over the "
    "JSON-string props column; md5/sha256 content hashes (lowercase hex "
    "both engines — the dedup-key primitives; xxhash64 is Spark-specific "
    "and stays out of oracle queries); map construction + lookup with the "
    "key set serialized to sorted CSV (canonicalizer-safe).",
)
def fn_semistructured(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    k_str = F.get_json_object("props", "$.k")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("k"), k_str
    )
    return (
        ev.filter(F.col("event_id") % 10 == 0)
        .select(
            "event_id",
            k_str.cast("int").alias("k_val"),
            k_str.alias("k_str"),
            F.md5("props").alias("h_md5"),
            F.sha2("props", 256).alias("h_sha256"),
            m.getItem("type").alias("type_v"),
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# G49 + G50: both scalar UDF tiers in one query — the vectorized pandas
# UDF (Arrow path, the sanctioned escape hatch) and the row-at-a-time
# Python UDF (the slow path, declared for API parity, never on hot paths).
# --------------------------------------------------------------------------
@register(
    "udf_scalar",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS total_cost,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_class
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("G49", "G50"),
    doc="Series->Series pandas UDF over Arrow batches (raw double product "
    "— bit-identical to the SQL formulation) + a plain Python UDF "
    "(threshold classification; thresholds fall between the integral "
    "quantity values so float compare is exact). Bench hot paths never "
    "use the row-at-a-time tier. The plain UDF opts into Arrow "
    "serialization (useArrow=True, guide §4.3): the body is still "
    "invoked per row — the G49 surface — but batches cross the "
    "JVM/Python boundary as Arrow instead of pickled rows; returns "
    "exactly match the declared string type so the Arrow/pickle "
    "coercion differences cannot bite.",
)
def udf_scalar(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem

    @F.pandas_udf("double")
    def total_cost(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    @F.udf("string", useArrow=True)
    def qty_class(q):
        if q is None:
            return None
        if q < 10:
            return "low"
        if q < 30:
            return "mid"
        return "high"

    return (
        li.filter(F.col("l_orderkey") % 20 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            total_cost("l_extendedprice", "l_discount", "l_tax").alias("total_cost"),
            qty_class("l_quantity").alias("qty_class"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# G51 + G52: grouped-map applyInPandas feeding a grouped-agg pandas UDAF —
# the full grouped-Python surface in one pipeline.
# --------------------------------------------------------------------------
@register(
    "udf_grouped",
    sql="""
    WITH centered AS (
      SELECT c_nationkey, c_custkey,
             round(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey), 4)
               AS bal_centered
      FROM customer
    )
    SELECT c_nationkey,
           round(sum(abs(bal_centered)) / count(*), 4) AS mean_abs_dev,
           count(*) AS n
    FROM centered
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("G51", "G52"),
    doc="applyInPandas per-group mean-centering (deterministic grouped-map "
    "transform) piped into a GROUPED_AGG pandas UDAF (mean absolute "
    "deviation); oracle side is the equivalent window + aggregate. "
    "Scale: one shuffle by nationkey feeds both Python stages.",
)
def udf_grouped(spark, sf_dir):
    c = Catalog(spark, sf_dir).customer

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["bal_centered"] = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()).round(4)
        return pdf[["c_nationkey", "c_custkey", "bal_centered"]]

    @F.pandas_udf("double")
    def mean_abs_dev(v: pd.Series) -> float:
        return round(float(v.abs().sum()) / len(v), 4)

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # GROUPED_AGG UDFs cannot mix with JVM aggregates in one agg(),
        # so the row count is a pandas UDAF too
        return len(v)

    centered = (
        c.select("c_nationkey", "c_custkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(center, "c_nationkey int, c_custkey long, bal_centered double")
    )
    return (
        centered.groupBy("c_nationkey")
        .agg(
            mean_abs_dev("bal_centered").alias("mean_abs_dev"),
            n_rows("bal_centered").alias("n"),
        )
        .orderBy("c_nationkey")
    )
