"""Bound checks for the declared-non-oracle aggregates (G22/G26) and the
Engine facade lifecycle."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.engine import Engine


class TestApproxBounds:
    def test_hll_within_5_percent(self, spark, oracle_sf_dir):
        c = Catalog(spark, oracle_sf_dir).customer
        rows = (
            c.groupBy("c_mktsegment")
            .agg(
                F.approx_count_distinct("c_custkey").alias("approx"),
                F.countDistinct("c_custkey").alias("exact"),
            )
            .collect()
        )
        for r in rows:
            assert abs(r.approx - r.exact) <= max(1, 0.05 * r.exact), r

    def test_percentile_approx_within_range(self, spark, oracle_sf_dir):
        c = Catalog(spark, oracle_sf_dir).customer
        r = c.agg(
            F.percentile_approx("c_acctbal", 0.5).alias("p50"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
        ).collect()[0]
        assert r.lo <= r.p50 <= r.hi


class TestEngineFacade:
    def test_lifecycle_and_sql(self, spark, sf_dir):
        eng = Engine(spark, sf_dir)
        eng.catalog.register_views(("nation", "region"))
        out = eng.sql(
            "SELECT r_name, count(*) AS n FROM nation "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        )
        assert out.count() == 5

    def test_library_binding(self, spark, sf_dir):
        eng = Engine(spark, sf_dir)
        kv = spark.createDataFrame([("a", "1")], "key string, value string")
        assert eng.kv_get(kv, ["a"]).count() == 1
        docs = eng.table("documents")
        assert "quality" in eng.text_profile(docs).columns


class TestSaltedJoin:
    def test_equals_plain_join(self, spark, sf_dir):
        from kafka_cassandra_plugin_spark.operators import salted_join
        from kafka_cassandra_plugin_spark.catalog import Catalog

        c = Catalog(spark, sf_dir)
        li = c.lineitem.select("l_orderkey", "l_quantity")
        o = c.orders.select("o_orderkey", "o_orderstatus").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        plain = li.join(o, "l_orderkey").groupBy("o_orderstatus").count()
        salted = salted_join(li, o, "l_orderkey", salt=4).groupBy(
            "o_orderstatus"
        ).count()
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )
