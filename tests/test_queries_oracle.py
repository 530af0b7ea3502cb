"""Primary correctness gate: every declared query with oracle SQL is run on
Spark and DuckDB at sf0.01 and compared under the §2.4 canonical protocol.

This mirrors the driver's CORRECTNESS gate, so failures here predict
failures there.
"""

from __future__ import annotations

import pytest

from kafka_cassandra_plugin_spark import oracle
from kafka_cassandra_plugin_spark.queries import load_all

QUERIES = load_all()
WITH_SQL = sorted(n for n, q in QUERIES.items() if q.sql is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.sql is None)


@pytest.mark.parametrize("name", WITH_SQL)
def test_oracle_match(name, spark, duck, oracle_sf_dir):
    q = QUERIES[name]
    df = q.build(spark, oracle_sf_dir)
    n = oracle.compare(df, duck, q.sql, name=name)
    assert n >= 0


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, oracle_sf_dir):
    q = QUERIES[name]
    df = q.build(spark, oracle_sf_dir)
    assert df.count() >= 0
