"""SparkSession factory with engine defaults.

Mirrors the *semantics* of the reference's config loading
(`/root/reference/src/main/scala/ly/stealth/kafka/plugin/cassandra/util/Config.scala:26-52`:
properties file + override map, typed getters) re-expressed as Spark conf:
a layered dict of defaults < file/env < explicit overrides, applied to the
SparkSession builder.

Scale posture (100 TB target, tested on local[32]):
- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- `spark.sql.shuffle.partitions` default 32 locally; on a real cluster this
  is expected to be overridden (AQE coalesces down, so erring high is safe).
- Arrow enabled for every pandas-UDF path (vectorized python boundary).
- Session timezone pinned to UTC so timestamp semantics are deterministic
  across driver/executors regardless of host TZ.
- `spark.sql.legacy.parquet.nanosAsLong=true`: the events table carries
  nanosecond parquet timestamps which Spark 4 otherwise refuses to read;
  the catalog layer converts the raw long to timestamp_ntz explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "kafka-cassandra-plugin-spark",
    master: str | None = None,
    overrides: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``overrides`` wins over defaults, like the reference's
    ``Config(file, overrides)`` layering (Config.scala:26-52).
    """
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or default_master())
    conf = dict(ENGINE_DEFAULTS)
    if overrides:
        conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an externally-created
    session (the driver passes us its own SparkSession in ``entry()``)."""
    static = {"spark.driver.memory", "spark.ui.enabled"}
    for k, v in ENGINE_DEFAULTS.items():
        if k in static:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session - keep going
    return spark
