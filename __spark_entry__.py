"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` export the declared-query registry
(``kafka_cassandra_plugin_spark/queries/``), one entry per implemented
operator group from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_cassandra_plugin_spark.session import ensure_engine_confs
from kafka_cassandra_plugin_spark.queries import load_all

_REGISTRY = load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "agg_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_engine_confs(spark)
    return _REGISTRY[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_confs(spark)
            return q.build(spark, sf_dir)

        run.__doc__ = q.doc
        return run

    return {name: _wrap(q) for name, q in sorted(_REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return {name: q.sql for name, q in sorted(_REGISTRY.items()) if q.sql is not None}
